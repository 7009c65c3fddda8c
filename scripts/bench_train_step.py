"""Train-step benchmark across batch sizes, with MFU accounting.

Measures ms/step and samples/s for the full-size models on the current
backend, reporting the device kind, analytic FLOPs/sample and
``MFU = achieved FLOPs / (time x chip peak)`` so a throughput that implies
an impossible fraction of peak is caught at the source (round-2 lesson: the
10-step timings shipped numbers exceeding the claimed chip's nominal peak
with nothing to flag them).

Timing method (utils/timing.py): on this tunneled backend
``block_until_ready`` does NOT wait for device execution (round-2's
impossible numbers came exactly from that), so k1 and k2 train steps are
chained inside one jitted fori_loop ending in a scalar that depends on the
final params, a true value fetch synchronizes, and the slope
(t(k2)-t(k1))/(k2-k1) is pure device time — tunnel RTT and dispatch cancel.
``ms_per_step_e2e`` additionally reports one step + scalar fetch end-to-end
(what a per-step-syncing host loop would see through the ~35-40 ms tunnel).

    python scripts/bench_train_step.py --model grid_transformer
    python scripts/bench_train_step.py --model vit_transformer --profile /tmp/tr
    python scripts/bench_train_step.py --train-backbone   # unfrozen phase

Prints one JSON line per batch size.
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
    ap.add_argument("--model", default="grid_transformer",
                    choices=["grid_transformer", "vit_transformer"])
    ap.add_argument("--batches", default="64,128,256")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--train-backbone", action="store_true",
                    help="benchmark the unfrozen phase (backbone takes gradients)")
    ap.add_argument("--r-drop", action="store_true")
    ap.add_argument("--dropout", type=float, default=0.1,
                    help="model dropout rate (0 isolates RNG/dropout cost)")
    ap.add_argument("--rng-impl", default="threefry2x32",
                    choices=["threefry2x32", "rbg"],
                    help="PRNG for dropout masks (rbg = TPU-native hardware RNG)")
    ap.add_argument("--profile", default=None, metavar="DIR")
    ap.add_argument("--split", action="store_true",
                    help="also time the step's slices (augment / +encode fwd / "
                         "full fwd loss) to attribute the ms_per_step")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        from image_caption_tpu.utils.platform import force_cpu

        force_cpu()

    import jax
    import jax.numpy as jnp

    from image_caption_tpu.models.runtime import build_module
    from image_caption_tpu.train import steps as S
    from image_caption_tpu.train.optim import EMA, make_optimizer
    from image_caption_tpu.train.schedules import warmup_cosine_schedule
    from image_caption_tpu.utils import flops as F

    device_kind = jax.devices()[0].device_kind
    peak = F.device_peak_flops(device_kind)
    print(f"# device: {device_kind} (bf16 peak {'%.0f TFLOP/s' % (peak / 1e12) if peak else 'unknown'})",
          file=sys.stderr)

    config = dict(
        model_type=args.model, d_model=512, nhead=8, num_encoder_layers=6,
        num_decoder_layers=6, dim_feedforward=2048, dropout=args.dropout, max_len=54,
    )
    module = build_module(109, config)
    key = jax.random.PRNGKey(0)
    variables = module.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 4), jnp.int32), jnp.array([4], jnp.int32),
    )
    ema = EMA(0.999)
    tx = make_optimizer(
        warmup_cosine_schedule(3e-4, 100, 10_000), kind="adamw",
        weight_decay=0.01, clip_norm=1.0,
    )
    step_fn = S.make_train_step(
        module, tx, loss_kind="label_smoothing", pad_id=0, augment="baseline",
        train_backbone=args.train_backbone, ema=ema,
        r_drop_alpha=0.5 if args.r_drop else 0.0,
    )
    fps = F.train_step_flops(
        args.model, config, train_backbone=args.train_backbone, r_drop=args.r_drop
    )

    rng_np = np.random.default_rng(0)
    for b in (int(x) for x in args.batches.split(",")):
        state = S.create_train_state(variables, tx, ema=ema)
        cap = rng_np.integers(1, 100, size=(b, 52)).astype(np.int32)
        cap[:, 0], cap[:, -1] = 107, 108
        batch = {
            "image": jnp.asarray(
                rng_np.integers(0, 255, size=(b, 256, 256, 3), dtype=np.uint8)
            ),
            "caption": jnp.asarray(cap),
            "length": jnp.full((b,), 52, dtype=jnp.int32),
        }
        # legacy raw keys get re-wrapped with the DEFAULT impl inside split(),
        # so the impl must be switched globally, not per-key
        jax.config.update("jax_default_prng_impl", args.rng_impl)
        rng = jax.random.PRNGKey(1)

        @jax.jit
        def run(state, batch, k):
            # dynamic trip count: ONE tunnel compile serves every k; batch is
            # an ARGUMENT (closure constants that big overflow remote_compile)
            def body(i, st):
                st, _ = step_fn(st, batch, rng)
                return st

            st = jax.lax.fori_loop(0, k, body, state)
            # scalar that depends on the FINAL params: forces the whole
            # chain to execute before the fetch returns (each step's loss
            # depends on every param of the previous step)
            return jnp.sum(jax.tree_util.tree_leaves(st.params)[0]).astype(jnp.float32)

        k1, k2 = max(args.steps // 10, 2), args.steps

        def fetch_time(k):
            t0 = time.perf_counter()
            float(run(state, batch, jnp.int32(k)))
            return time.perf_counter() - t0

        fetch_time(k1)  # compile + warm
        if args.profile:
            tdir = os.path.join(args.profile, f"{args.model}_b{b}")
            with jax.profiler.trace(tdir):
                fetch_time(k1)
            print(f"# trace -> {tdir}", file=sys.stderr)
        t1 = min(fetch_time(k1) for _ in range(3))
        t2 = min(fetch_time(k2) for _ in range(3))
        dt = (t2 - t1) / (k2 - k1)
        e2e = min(fetch_time(1) for _ in range(3))
        sps = b / dt
        rec = {
            "model": args.model, "batch": b, "train_backbone": args.train_backbone,
            "device": device_kind,
            "ms_per_step": round(dt * 1e3, 2),
            "ms_per_step_e2e": round(e2e * 1e3, 2),
            "samples_per_sec": round(sps, 1),
            "gflops_per_sample": round(fps / 1e9, 2),
            "achieved_tflops": round(fps * sps / 1e12, 1),
        }
        if peak:
            rec["mfu"] = round(fps * sps / peak, 3)

        if args.split:
            from image_caption_tpu.data.transforms import train_augment
            from image_caption_tpu.train.steps import make_eval_step
            from image_caption_tpu.utils.timing import device_time

            eval_step = make_eval_step(module, loss_kind="label_smoothing", pad_id=0)

            def _perturb(images_u8, s):
                # Thread the loop carry into the INPUT so XLA cannot hoist the
                # slice's work out of the fori_loop as loop-invariant.
                return images_u8 + (jnp.int32(s % 7.0) % 2).astype(jnp.uint8)

            def aug_only(i, s, variables, batch):
                key = jax.random.fold_in(rng, jnp.int32(s % 1024.0))
                imgs = train_augment(key, _perturb(batch["image"], s))
                return s * 1e-9 + jnp.sum(imgs).astype(jnp.float32)

            def aug_encode(i, s, variables, batch):
                key = jax.random.fold_in(rng, jnp.int32(s % 1024.0))
                imgs = train_augment(key, _perturb(batch["image"], s))
                mem = module.apply(variables, imgs, method=module.encode)
                return s * 1e-9 + jnp.sum(mem).astype(jnp.float32)

            def fwd_loss(i, s, variables, batch):
                b2 = dict(batch, image=_perturb(batch["image"], s))
                loss, _ = eval_step(variables, b2)  # eval path: preprocess+fwd+loss
                return s * 1e-9 + loss

            from image_caption_tpu.train import losses as L

            def _train_loss(params, imgs, batch, k_do):
                logits = module.apply(
                    {"params": params, "batch_stats": variables.get("batch_stats", {})},
                    imgs, batch["caption"], batch["length"],
                    deterministic=False, train_backbone=args.train_backbone,
                    rngs={"dropout": k_do},
                    mutable=["batch_stats"] if args.train_backbone else False,
                )
                if args.train_backbone:
                    logits = logits[0]
                return L.label_smoothing_loss(logits, batch["caption"][:, 1:], 0, 0.1)

            def fwd_train(i, s, variables, batch):
                # train-mode forward: same augment + DROPOUT MASKS as the step,
                # no backward — (this - preprocess+fwd_loss) ~ mask-gen cost
                key = jax.random.fold_in(rng, jnp.int32(s % 1024.0))
                k_aug, k_do = jax.random.split(key)
                imgs = train_augment(k_aug, _perturb(batch["image"], s))
                return s * 1e-9 + _train_loss(variables["params"], imgs, batch, k_do)

            def fwd_bwd(i, s, variables, batch):
                # + full backward (no clip/optimizer/EMA): step - this = update
                key = jax.random.fold_in(rng, jnp.int32(s % 1024.0))
                k_aug, k_do = jax.random.split(key)
                imgs = train_augment(k_aug, _perturb(batch["image"], s))
                loss, grads = jax.value_and_grad(_train_loss)(
                    variables["params"], imgs, batch, k_do
                )
                # depend on EVERY grad leaf so XLA cannot prune any of the
                # backward (a single-leaf dependency would)
                gsum = sum(jnp.sum(g).astype(jnp.float32) for g in jax.tree_util.tree_leaves(grads))
                return s * 1e-9 + loss + 0.0 * gsum

            ks = (2, max(args.steps // 10, 6))
            for name, fn in (("augment", aug_only), ("augment+encode_fwd", aug_encode),
                             ("preprocess+fwd_loss", fwd_loss),
                             ("augment+fwd_train", fwd_train),
                             ("augment+fwd_bwd", fwd_bwd)):
                dt_s = device_time(fn, variables, batch, iters=ks, reps=3)
                rec[f"ms_{name}"] = round(dt_s * 1e3, 2)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
