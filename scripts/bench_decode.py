"""Decode benchmark: greedy vs beam search, Pallas kernel on/off, b=1 latency.

Covers the round-2 gaps: beam search (the reference's flagship inference
feature, inference_vit_transformer.py:227-251 / vit:327-420) had zero perf
evidence, and the b=1 interactive path never touched the flash-decoding
kernel.

Timing (utils/timing.py): ``block_until_ready`` is a no-op on this tunneled
backend, so each measurement chains k dependent decodes inside one jitted
fori_loop (input perturbed by the previous iteration's token checksum) and
times a true scalar fetch at two values of k — the slope is pure device time.
Kernel A/B runs interleaved fetch pairs in ONE process.

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
    ap.add_argument("--reps", type=int, default=5, help="interleaved fetch pairs per k")
    ap.add_argument("--max-len", type=int, default=52)
    ap.add_argument("--model", default="grid_transformer",
                    choices=["grid_transformer", "vit_transformer"])
    ap.add_argument("--modes", default="greedy,beam")
    ap.add_argument("--ab", default="pallas", choices=["pallas", "weights", "unroll", "fused"],
                    help="A/B axis: Pallas-vs-XLA decode-attention kernel, bf16-vs-f32 "
                         "weight stream (utils/precision.py; bit-identical tokens), greedy "
                         "loop unroll 2-vs-1 (identical captions; greedy mode only), or the "
                         "fused whole-step kernel vs the layerwise path (greedy + beam)")
    ap.add_argument("--unroll", type=int, default=2, help="unroll factor for --ab unroll")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.ab == "unroll" and args.unroll < 2:
        ap.error("--ab unroll needs --unroll >= 2 (unroll=1 would A/B a variant against itself)")
    if args.cpu:
        from image_caption_tpu.utils.platform import force_cpu

        force_cpu()

    import jax
    import jax.numpy as jnp

    from image_caption_tpu.data.transforms import eval_preprocess
    from image_caption_tpu.decode import engine
    from image_caption_tpu.models.runtime import build_module
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

    def make_chain(method, unroll=1, end_id=-1, fused=None):
        """jitted DYNAMIC-k chained decode ending in a scalar (true dependency);
        one tunnel compile serves every k.  variables/images are jit ARGUMENTS
        (big closure constants overflow the tunnel's remote_compile request).

        ``end_id``: any negative value never matches a token (full worst-case
        rollout); the --ab pallas arms use DIFFERENT negatives so the two arms
        get separate greedy_decode jit cache entries — the ICT_DISABLE_PALLAS
        env is read at TRACE time, so arms sharing a cache entry would silently
        measure the same program (self-vs-self A/B).
        ``fused``: explicit fused-kernel control (engine.greedy_decode)."""

        @jax.jit
        def run(seed, k, variables, images_u8):
            def body(i, s):
                imgs = eval_preprocess(images_u8) + s * 1e-30
                memory = module.apply(variables, imgs, method=module.encode)
                if method == "encode":  # encode-only: isolates the decode loop's share
                    return s * 1e-9 + jnp.sum(memory).astype(jnp.float32)
                if method == "greedy":
                    tokens = engine.greedy_decode(
                        module, variables, memory, start_id=107, end_id=end_id,
                        max_len=max_len, unroll=unroll, fused=fused,
                    )
                else:
                    tokens = engine.beam_search_decode(
                        module, variables, memory, start_id=107, end_id=end_id,
                        max_len=max_len, beam_size=args.beam, fused=fused,
                    )
                return s * 1e-9 + jnp.sum(tokens).astype(jnp.float32)

            return jax.lax.fori_loop(0, k, body, seed)

        return run

    from image_caption_tpu.utils.precision import bf16_inference_variables

    variables_bf16 = bf16_inference_variables(variables)
    # The production decode path ships the bf16 weight stream (bit-identical
    # tokens, half the per-step weight traffic); the pallas/xla A/B uses it on
    # both arms so the kernel comparison stays single-variable.
    varmap = {"pallas": variables_bf16, "xla": variables_bf16,
              "bf16": variables_bf16, "f32": variables}

    def fetch(run, k, images, variant):
        t0 = time.perf_counter()
        # unroll variants ("uN") run the production bf16 stream on both arms
        float(run(jnp.float32(0.0), jnp.int32(k), varmap.get(variant, variables_bf16), images))
        return time.perf_counter() - t0

    rng_np = np.random.default_rng(0)
    modes = []
    if "encode" in args.modes:
        modes.append(("encode", "encode"))
    if "greedy" in args.modes:
        modes.append(("greedy", "greedy"))
    if "beam" in args.modes:
        modes.append((f"beam{args.beam}", "beam_search"))

    for b in (int(x) for x in args.batches.split(",")):
        images = jnp.asarray(rng_np.integers(0, 255, size=(b, 256, 256, 3), dtype=np.uint8))
        k1, k2 = (2, 6) if b >= 64 else (2, 10)
        for mode, method in modes:
            if args.ab == "pallas":
                variants = ("pallas", "xla")
            elif args.ab == "weights":
                variants = ("bf16", "f32")
            elif args.ab == "fused":
                if method == "encode":
                    continue
                variants = ("fused", "layerwise")  # greedy AND beam (round 5)
            else:
                if method != "greedy":
                    continue  # unroll is a greedy_decode knob
                variants = (f"u{args.unroll}", "u1")
            runs = {}
            for variant in variants:
                # fused=False pins the layerwise path on every non-fused A/B so
                # the comparison stays single-variable (auto-dispatch would
                # route both pallas/weights arms through the fused kernel).
                fused = {"fused": True, "layerwise": False}.get(variant, False)
                end_id = -1
                if args.ab == "pallas":
                    os.environ["ICT_DISABLE_PALLAS"] = "0" if variant == "pallas" else "1"
                    # distinct (behaviorally identical) end_ids -> distinct jit
                    # cache entries, see make_chain docstring
                    end_id = -1 if variant == "pallas" else -2
                unroll = int(variant[1:]) if variant.startswith("u") and args.ab == "unroll" else 1
                runs[variant] = make_chain(method, unroll=unroll, end_id=end_id, fused=fused)
                fetch(runs[variant], k1, images, variant)  # compile + warm under the right dispatch
            times = {v: ([], []) for v in runs}
            for _ in range(args.reps):  # interleaved: a k1, b k1, a k2, b k2
                for ki, k in ((0, k1), (1, k2)):
                    for v in variants:
                        times[v][ki].append(fetch(runs[v], k, images, v))
            out = {}
            for v in variants:
                t1, t2 = min(times[v][0]), min(times[v][1])
                out[v] = max((t2 - t1) / (k2 - k1), 1e-9)
            fpc = F.decode_flops(args.model, config, gen_len=max_len)
            eff = args.beam if method == "beam_search" else 1
            fast, slow = variants
            caps = b / out[fast]
            rec = {
                "mode": mode, "batch": b, "device": device_kind,
                f"ms_device_{fast}": round(out[fast] * 1e3, 2),
                f"ms_device_{slow}": round(out[slow] * 1e3, 2),
                f"{fast}_speedup": round(out[slow] / out[fast], 3),
            }
            if mode == "encode":
                print(json.dumps(rec), flush=True)
                continue
            rec.update({
                "captions_per_sec": round(caps, 1),
                "gflops_per_caption_min": round(fpc / 1e9, 2),
            })
            mfu = F.mfu(fpc * eff, caps, device_kind)
            if mfu is not None:
                rec["mfu_lower_bound"] = round(mfu, 3)
            if eff > 1:
                rec["note"] = "decodes B*%d beam sequences" % args.beam
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
