"""Attribute in-kernel time of the fused decode step (ops/fused_decode.py).

Times ONE fused_decode_step (slope method, utils/timing.py) at configs that
vary the number of attention KV blocks actually processed:

  full        s_len=49 (4 cross blocks/layer), idx=48 (3 self blocks/layer)
  cross-lite  s_len=16 (1 cross block/layer),  idx=48
  self-lite   s_len=49,                        idx=0  (0 self blocks)

The deltas attribute per-block attention cost (the per-head VPU loop with its
cross-LANE reductions is the prime suspect) vs the fixed floor (weight DMA
pipeline + matmuls + LNs + vocab head).

    python scripts/bench_fused_micro.py [--batch 64] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--sweep", action="store_true",
                    help="batch/tile sweep at fixed per-row work (b=256 "
                         "regression attribution)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        from image_caption_tpu.utils.platform import force_cpu

        force_cpu()

    import jax
    import jax.numpy as jnp

    from image_caption_tpu.ops import fused_decode as F
    from image_caption_tpu.utils.timing import device_time

    interpret = jax.devices()[0].platform != "tpu"
    L, d, H, vocab, vpad, max_len = 6, 512, 8, 109, 128, 52
    b = args.batch
    rng = jax.random.PRNGKey(0)

    def mk(shape, dt=jnp.bfloat16):
        nonlocal rng
        rng, k = jax.random.split(rng)
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dt)

    weights = F.FusedWeights(
        embed=mk((vpad, d)),
        pe=mk((64, d)),
        qkv_w=mk((L, d, 3 * d)), qkv_b=mk((L, 3 * d)),
        out_w=mk((L, d, d)), out_b=mk((L, d)),
        q_w=mk((L, d, d)), q_b=mk((L, d)),
        co_w=mk((L, d, d)), co_b=mk((L, d)),
        l1_w=mk((L, d, 2048)), l1_b=mk((L, 2048)),
        l2_w=mk((L, 2048, d)), l2_b=mk((L, d)),
        ln_s=jnp.ones((3, L, d), jnp.float32),
        ln_b=jnp.zeros((3, L, d), jnp.float32),
        fc_w=mk((d, vpad), jnp.float32), fc_b=mk((1, vpad), jnp.float32),
    )
    kc, vc = F.init_fused_cache(b, max_len, d, L)
    kc = kc + mk(kc.shape)
    vc = vc + mk(vc.shape)
    cross_full = mk((b, L, 64, d)), mk((b, L, 64, d))
    cross_lite = cross_full[0][:, :, :16, :], cross_full[1][:, :, :16, :]

    configs = [
        ("full", cross_full, 49, 48),
        ("cross-lite", cross_lite, 16, 48),
        ("self-lite", cross_full, 49, 0),
    ]
    out = {"batch": b, "device": jax.devices()[0].device_kind}
    for name, (ck, cv, *_), s_len, idx in [
        (n, (c[0], c[1]), s, i) for n, c, s, i in configs
    ]:
        def body(i, s, kc, vc, ck, cv):
            tok = (s.astype(jnp.int32) + i) % vocab
            toks = jnp.full((b,), 0, jnp.int32) + tok
            _, nxt, _, _ = F.fused_decode_step(
                toks, kc, vc, ck, cv, weights, jnp.int32(idx),
                num_layers=L, nheads=H, s_len=s_len, vocab=vocab,
                interpret=interpret,
            )
            return s + nxt.sum().astype(jnp.float32) * 1e-9

        sec = device_time(body, kc, vc, ck, cv, iters=(4, 44), reps=3)
        out[name] = round(sec * 1e3, 4)
        print(f"# {name}: {sec * 1e3:.3f} ms/step", flush=True)

    # attribution: full has 3 self + 4 cross blocks; deltas are per 3 blocks
    if out.get("full") and out.get("cross-lite") and out.get("self-lite"):
        out["cross_3blocks_ms"] = round(out["full"] - out["cross-lite"], 4)
        out["self_3blocks_ms"] = round(out["full"] - out["self-lite"], 4)
    print(json.dumps(out))

    if args.sweep:
        # Attribute the b=256 per-caption regression (VERDICT r4 weak #1):
        # sweep the in-kernel tile count at FIXED per-row work and split
        # attention-block scaling (idx=48: 3 self blocks) from the
        # attention-free floor (idx=0).  Per-row us flat in b => linear
        # scaling (b=64's advantage is elsewhere); growing => per-tile
        # overhead (each tile's attend re-pays the unhidden first-block DMA
        # latency per layer, 2 attends x 6 layers x ntiles).
        sweep = {"sweep": [], "device": out["device"]}
        for bs in (64, 128, 192, 256):
            kc_s, vc_s = F.init_fused_cache(bs, max_len, d, L)
            kc_s = kc_s + mk(kc_s.shape)
            vc_s = vc_s + mk(vc_s.shape)
            ck_s, cv_s = mk((bs, L, 64, d)), mk((bs, L, 64, d))
            row = {"batch": bs, "tiles": bs // 64}
            for label, idx in (("idx48_ms", 48), ("idx0_ms", 0)):
                def body(i, s, kc, vc, ck, cv):
                    tok = (s.astype(jnp.int32) + i) % vocab
                    toks = jnp.full((bs,), 0, jnp.int32) + tok
                    _, nxt, _, _ = F.fused_decode_step(
                        toks, kc, vc, ck, cv, weights, jnp.int32(idx),
                        num_layers=L, nheads=H, s_len=49, vocab=vocab,
                        interpret=interpret,
                    )
                    return s + nxt.sum().astype(jnp.float32) * 1e-9

                sec = device_time(body, kc_s, vc_s, ck_s, cv_s, iters=(4, 44), reps=3)
                row[label] = round(sec * 1e3, 4)
                row[label.replace("_ms", "_us_per_row")] = round(sec * 1e6 / bs, 3)
            print(f"# sweep b={bs}: {row}", flush=True)
            sweep["sweep"].append(row)
        print(json.dumps(sweep))


if __name__ == "__main__":
    main()
