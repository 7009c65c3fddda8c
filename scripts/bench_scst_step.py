"""SCST step throughput benchmark (fused device-reward path vs host-reward path).

Measures steps/sec and samples/sec for the full-size grid model SCST step —
rollouts (sample + greedy), CIDEr-D reward, REINFORCE update.

    python scripts/bench_scst_step.py --batch 16 --steps 10
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--host-reward", action="store_true", help="benchmark the host CIDEr path")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        from image_caption_tpu.utils.platform import force_cpu

        force_cpu()

    import jax
    import jax.numpy as jnp

    from image_caption_tpu.eval.cider_device import CiderDevice
    from image_caption_tpu.models.runtime import build_module
    from image_caption_tpu.train import steps as S
    from image_caption_tpu.train.optim import EMA, make_optimizer
    from image_caption_tpu.train.schedules import warmup_cosine_schedule
    from image_caption_tpu.train.scst import get_reference_captions, make_reward

    PAD, START, END, V, MAXLEN = 0, 107, 108, 109, 52
    config = dict(
        model_type="grid_transformer", d_model=512, nhead=8, num_encoder_layers=6,
        num_decoder_layers=6, dim_feedforward=2048, dropout=0.1, max_len=54,
    )
    module = build_module(V, config)
    # match the driver's default PRNG (rbg on TPU — see train/driver.py
    # _apply_rng_impl; the sampling rollout draws categoricals per token step)
    jax.config.update("jax_default_prng_impl", os.environ.get("ICT_RNG_IMPL", "rbg"))
    key = jax.random.PRNGKey(0)
    variables = module.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 4), jnp.int32), jnp.array([4], jnp.int32),
    )
    ema = EMA(0.9999)
    tx = make_optimizer(warmup_cosine_schedule(5e-6, 10, 10_000), kind="adamw",
                        weight_decay=0.01, clip_norm=1.0)
    state = S.create_train_state(variables, tx, ema=ema)
    reward = make_reward("cider", PAD, START, END)
    device_cider = None if args.host_reward else CiderDevice(PAD, START, END, V, MAXLEN)
    step = S.make_scst_step(
        module, tx, reward, pad_id=PAD, start_id=START, end_id=END,
        max_len=MAXLEN, augment="baseline", ema=ema, device_cider=device_cider,
    )

    b = args.batch
    rng_np = np.random.default_rng(0)
    cap = rng_np.integers(1, 100, size=(b, MAXLEN)).astype(np.int32)
    cap[:, 0], cap[:, -1] = START, END
    batch = {
        "image": rng_np.integers(0, 255, size=(b, 256, 256, 3), dtype=np.uint8),
        "caption": cap,
        "length": np.full((b,), MAXLEN, dtype=np.int32),
    }
    refs = get_reference_captions(batch["caption"], PAD, START, END)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(1)

    if device_cider is not None:
        # block_until_ready is a no-op on this tunneled backend (CLAUDE.md) —
        # only a VALUE fetch synchronizes, and each fetch pays ~35-40 ms RTT.
        # Time n1 and n2 step loops ending in a float(acc) fetch; the slope is
        # the true per-step time (host pack + device step, RTT cancelled).
        def run_n(n):
            # fresh deep copy each call: the fused step DONATES its state, so
            # reusing the outer `state` buffers after a donation would crash
            st = jax.tree_util.tree_map(jnp.array, state)
            acc = S.init_scst_acc()
            t0 = time.perf_counter()
            for _ in range(n):
                pack = device_cider.pack(refs)  # host work, overlaps device
                st, acc = step(st, jb, pack, rng, acc)
            float(acc["loss"])  # true sync
            return time.perf_counter() - t0

        run_n(1)  # compile + warm
        n1, n2 = max(args.steps // 5, 1), args.steps
        t1 = min(run_n(n1) for _ in range(3))
        t2 = min(run_n(n2) for _ in range(3))
        dt = (t2 - t1) / (n2 - n1)
        if dt <= 0:
            sys.exit(
                f"slope {dt * 1e3:.2f} ms/step is inside the tunnel RTT jitter — "
                f"re-run with a larger --steps (got {args.steps})"
            )
    else:
        state, m = step(state, jb, refs, rng)  # compile
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, jb, refs, rng)
        dt = (time.perf_counter() - t0) / args.steps

    print(json.dumps({
        "mode": "host_reward" if args.host_reward else "fused_device_reward",
        "batch": b, "ms_per_step": round(dt * 1e3, 2),
        "steps_per_sec": round(1 / dt, 2),
        "samples_per_sec": round(b / dt, 1),
    }))


if __name__ == "__main__":
    main()
