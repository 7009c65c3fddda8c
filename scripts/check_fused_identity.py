"""On-TPU token-identity check: fused whole-step kernel vs the layerwise path.

Decodes the same batch of (synthetic-deterministic) images through both
greedy paths — ``engine.fused_greedy_decode`` (ops/fused_decode.py) and the
layerwise ``engine.greedy_decode(fused=False)`` — and reports per-token and
per-caption agreement.  Runs with the TRAINED checkpoint when one exists
(sharp logits make near-ties rare — the regime that matters for users) and
with random init otherwise (near-flat logits are the adversarial tie-heavy
case; disagreements there sit on bf16-noise-level ties, see
tests/test_fused_decode.py).

    python scripts/check_fused_identity.py --ckpt checkpoints/grid_transformer/best_model.ckpt
    python scripts/check_fused_identity.py --random --cpu   # interpret-mode path check
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="checkpoints/grid_transformer/best_model.ckpt")
    ap.add_argument("--random", action="store_true", help="random init instead of checkpoint")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--max-len", type=int, default=52)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--beam", type=int, default=0, metavar="K",
                    help="ALSO compare beam-K: fused_beam_search_decode vs the "
                         "layerwise beam (result equality per caption)")
    ap.add_argument("--logits-delta", action="store_true",
                    help="also teacher-force both per-step paths and report "
                         "max logit delta + margins at argmax flips")
    args = ap.parse_args()
    if args.cpu:
        from image_caption_tpu.utils.platform import force_cpu

        force_cpu()

    import jax
    import jax.numpy as jnp

    from image_caption_tpu.data.transforms import eval_preprocess
    from image_caption_tpu.decode import engine
    from image_caption_tpu.models.runtime import build_module
    from image_caption_tpu.utils.precision import bf16_inference_variables

    if not args.random and os.path.exists(args.ckpt):
        from image_caption_tpu.utils.checkpoint import load_checkpoint, restore_into

        ck = load_checkpoint(args.ckpt)
        config = dict(ck["config"])
        module = build_module(109, config)
        rng = jax.random.PRNGKey(0)
        variables = jax.jit(module.init)(
            {"params": rng, "dropout": rng},
            jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 4), jnp.int32), jnp.array([4], jnp.int32),
        )
        variables = {
            "params": restore_into(variables["params"], ck["params"]),
            "batch_stats": restore_into(variables.get("batch_stats", {}), ck["batch_stats"])
            if ck.get("batch_stats") else variables.get("batch_stats", {}),
        }
        src = args.ckpt
    else:
        config = dict(
            model_type="grid_transformer", d_model=512, nhead=8, num_encoder_layers=6,
            num_decoder_layers=6, dim_feedforward=2048, dropout=0.1, max_len=args.max_len,
        )
        module = build_module(109, config)
        rng = jax.random.PRNGKey(0)
        variables = jax.jit(module.init)(
            {"params": rng, "dropout": rng},
            jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 4), jnp.int32), jnp.array([4], jnp.int32),
        )
        src = "random-init"
    variables = bf16_inference_variables(variables)

    interpret = jax.default_backend() != "tpu"
    rng_np = np.random.default_rng(0)
    tok_same = tok_total = cap_same = cap_total = 0
    from image_caption_tpu.decode.engine import sequence_lengths

    for bi in range(args.batches):
        images = jnp.asarray(
            rng_np.integers(0, 255, size=(args.batch, 256, 256, 3), dtype=np.uint8)
        )
        imgs = eval_preprocess(images)
        memory = module.apply(variables, imgs, method=module.encode)
        ref = np.asarray(engine.greedy_decode(
            module, variables, memory, start_id=107, end_id=108,
            max_len=args.max_len, fused=False,
        ))
        fused = np.asarray(engine.fused_greedy_decode(
            module, variables, memory, start_id=107, end_id=108,
            max_len=args.max_len, interpret=interpret,
        ))
        # compare the CAPTION region (up to and including the first <end>);
        # post-finish positions follow the reference loop's junk-token
        # semantics and are not part of the caption contract
        lens = np.asarray(sequence_lengths(jnp.asarray(ref), 108))
        for r in range(args.batch):
            n = int(lens[r])
            same = np.array_equal(ref[r, :n], fused[r, :n])
            cap_same += int(same)
            cap_total += 1
            tok_same += int(np.sum(ref[r, :n] == fused[r, :n]))
            tok_total += n

    beam_stats = None
    if args.beam:
        beam_tok_same = beam_tok_total = beam_cap_same = beam_cap_total = 0
        for bi in range(args.batches):
            images = jnp.asarray(
                rng_np.integers(0, 255, size=(args.batch, 256, 256, 3), dtype=np.uint8)
            )
            memory = module.apply(variables, eval_preprocess(images), method=module.encode)
            ref = np.asarray(engine.beam_search_decode(
                module, variables, memory, start_id=107, end_id=108,
                max_len=args.max_len, beam_size=args.beam, fused=False,
            ))
            fused = np.asarray(engine.fused_beam_search_decode(
                module, variables, memory, start_id=107, end_id=108,
                max_len=args.max_len, beam_size=args.beam, interpret=interpret,
            ))
            lens = np.asarray(sequence_lengths(jnp.asarray(ref), 108))
            for r in range(args.batch):
                n = int(lens[r])
                beam_cap_same += int(np.array_equal(ref[r, :n], fused[r, :n]))
                beam_cap_total += 1
                beam_tok_same += int(np.sum(ref[r, :n] == fused[r, :n]))
                beam_tok_total += n
        beam_stats = {
            "beam_size": args.beam,
            "token_identity": round(beam_tok_same / max(beam_tok_total, 1), 6),
            "caption_identity": round(beam_cap_same / max(beam_cap_total, 1), 6),
            "captions": beam_cap_total,
        }

    out = {
        "weights": src,
        "backend": jax.default_backend(),
        "interpret": interpret,
        "batches": args.batches,
        "batch": args.batch,
        "max_len": args.max_len,
        "token_identity": round(tok_same / max(tok_total, 1), 6),
        "caption_identity": round(cap_same / max(cap_total, 1), 6),
        "tokens": tok_total,
        "captions": cap_total,
    }
    if beam_stats is not None:
        out["beam"] = beam_stats

    if args.logits_delta:
        # Teacher-force the LAYERWISE rollout's own tokens through BOTH
        # per-step paths and compare logits: if argmax disagreements only
        # occur where the layerwise top1-top2 margin is ~ the measured
        # fused-vs-layerwise logit delta, divergences are reduction-order
        # near-tie flips, not a kernel bug.
        from image_caption_tpu.decode import engine as E
        from image_caption_tpu.ops import fused_decode as F

        spec = E._fused_spec(module, variables) or dict(
            num_layers=module.num_decoder_layers, d_model=module.d_model,
            nhead=module.nhead, vocab=module.vocab_size,
        )
        images = jnp.asarray(
            rng_np.integers(0, 255, size=(args.batch, 256, 256, 3), dtype=np.uint8)
        )
        memory = module.apply(variables, eval_preprocess(images), method=module.encode)
        ref_toks = np.asarray(engine.greedy_decode(
            module, variables, memory, start_id=107, end_id=108,
            max_len=args.max_len, fused=False,
        ))
        d, L, V = spec["d_model"], spec["num_layers"], spec["vocab"]
        dec = variables["params"]["decoder"]
        w = F.pack_weights(dec, num_layers=L, d_model=d, vocab_size=V,
                           padded_vocab=F._round_up(V, 128), max_len=args.max_len)
        ck, cv, s_len = F.pack_cross_kv(dec, memory, num_layers=L)
        kc, vc = F.init_fused_cache(args.batch, args.max_len, d, L)
        cache = module.apply(variables, memory, args.max_len, method=module.init_cache)
        n_steps = min(args.max_len - 1, 24)
        max_d = 0.0
        n_flips = 0
        min_flip_margin = None
        for t in range(n_steps):
            tok = jnp.asarray(ref_toks[:, t])
            lg, _, kc, vc = F.fused_decode_step(
                tok, kc, vc, ck, cv, w, jnp.int32(t),
                num_layers=L, nheads=spec["nhead"], s_len=s_len,
                vocab=V, interpret=interpret)
            rl, cache = module.apply(variables, tok, cache, jnp.int32(t),
                                     method=module.decode_step)
            got = np.asarray(lg)[:, :V]
            want = np.asarray(rl)[:, :V]
            max_d = max(max_d, float(np.max(np.abs(got - want))))
            flip = np.argmax(got, -1) != np.argmax(want, -1)
            if flip.any():
                n_flips += int(flip.sum())
                srt = np.sort(want[flip], axis=-1)
                margin = float(np.min(srt[:, -1] - srt[:, -2]))
                min_flip_margin = margin if min_flip_margin is None else min(
                    min_flip_margin, margin)
        out["logits_delta"] = {
            "steps": n_steps,
            "max_abs_logit_delta": round(max_d, 6),
            "argmax_flips": n_flips,
            "min_margin_at_flip": None if min_flip_margin is None
            else round(min_flip_margin, 6),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
