"""Decode benchmark: greedy vs beam search, Pallas kernel on/off, b=1 latency.

Covers the round-2 gaps: beam search (the reference's flagship inference
feature, inference_vit_transformer.py:227-251 / vit:327-420) had zero perf
evidence, and the b=1 interactive path never touched the flash-decoding
kernel.  All A/B comparisons interleave single runs pairwise in ONE process
(chip noise is +-10% between processes — CLAUDE.md).

    python scripts/bench_decode.py                 # greedy + beam, kernel A/B
    python scripts/bench_decode.py --batches 1,8,64,256 --beam 5

Prints one JSON line per (mode, batch).
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
    ap.add_argument("--batches", default="1,64,256")
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--runs", type=int, default=10, help="interleaved A/B pairs")
    ap.add_argument("--max-len", type=int, default=52)
    ap.add_argument("--model", default="grid_transformer",
                    choices=["grid_transformer", "vit_transformer"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        from image_caption_tpu.utils.platform import force_cpu

        force_cpu()

    import jax
    import jax.numpy as jnp

    from image_caption_tpu.data.transforms import eval_preprocess
    from image_caption_tpu.decode import engine
    from image_caption_tpu.models.runtime import build_module
    from image_caption_tpu.ops import decode_attention as DA
    from image_caption_tpu.utils import flops as F

    device_kind = jax.devices()[0].device_kind
    print(f"# device: {device_kind}", file=sys.stderr)

    max_len = args.max_len
    config = dict(
        model_type=args.model, d_model=512, nhead=8, num_encoder_layers=6,
        num_decoder_layers=6, dim_feedforward=2048, dropout=0.1, max_len=max_len,
    )
    module = build_module(109, config)
    rng = jax.random.PRNGKey(0)
    variables = module.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 4), jnp.int32), jnp.array([4], jnp.int32),
    )

    def make_fn(method):
        @jax.jit
        def fn(variables, images_u8):
            imgs = eval_preprocess(images_u8)
            memory = module.apply(variables, imgs, method=module.encode)
            # end_id=-1 never matches: full-length decode, worst-case honest
            return engine.generate(
                module, variables, memory, start_id=107, end_id=-1,
                max_len=max_len, method=method, beam_size=args.beam,
            )
        return fn

    greedy_fn, beam_fn = make_fn("greedy"), make_fn("beam_search")
    rng_np = np.random.default_rng(0)

    for b in (int(x) for x in args.batches.split(",")):
        images = rng_np.integers(0, 255, size=(b, 256, 256, 3), dtype=np.uint8)
        for mode, fn in (("greedy", greedy_fn), ("beam%d" % args.beam, beam_fn)):
            # kernel A/B: toggle via env var BEFORE each trace; interleaved
            times = {"pallas": [], "xla": []}
            for variant in times:  # compile both variants first
                os.environ["ICT_DISABLE_PALLAS"] = "0" if variant == "pallas" else "1"
                fn_v = make_fn("greedy" if mode == "greedy" else "beam_search")
                jax.block_until_ready(fn_v(variables, images))
                times[variant + "_fn"] = fn_v  # type: ignore[index]
            for _ in range(args.runs):
                for variant in ("pallas", "xla"):
                    os.environ["ICT_DISABLE_PALLAS"] = "0" if variant == "pallas" else "1"
                    fn_v = times[variant + "_fn"]
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn_v(variables, images))
                    times[variant].append(time.perf_counter() - t0)
            p50 = {v: float(np.median(times[v])) * 1e3 for v in ("pallas", "xla")}
            wins = sum(a < x for a, x in zip(times["pallas"], times["xla"]))
            caps = b / (p50["pallas"] / 1e3)
            fpc = F.decode_flops(args.model, config, gen_len=max_len)
            eff = args.beam if mode != "greedy" else 1
            rec = {
                "mode": mode, "batch": b, "device": device_kind,
                "p50_ms_pallas": round(p50["pallas"], 2),
                "p50_ms_xla": round(p50["xla"], 2),
                "pallas_wins": f"{wins}/{args.runs}",
                "captions_per_sec": round(caps, 1),
                "gflops_per_caption_min": round(fpc / 1e9, 2),
                "note": "beam decodes B*K sequences" if eff > 1 else "",
            }
            mfu = F.mfu(fpc * eff, caps, device_kind)
            if mfu is not None:
                rec["mfu_lower_bound"] = round(mfu, 3)
            print(json.dumps(rec))


if __name__ == "__main__":
    main()
