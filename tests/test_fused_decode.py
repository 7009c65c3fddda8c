"""Fused whole-step decode kernel vs the layerwise XLA path.

Runs the Pallas kernel in interpreter mode on CPU (tiling constraints don't
apply; the MATH is checked here, the on-TPU timing/identity in
scripts/bench_decode.py --ab fused).  The vocab head is sharpened (x4) so
random-init near-ties can't flip argmax between two float-noise-level-equal
implementations — the same device-vs-host tie discipline as
test_sharding.py::test_sharded_beam_matches_unsharded.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_caption_tpu.decode import engine
from image_caption_tpu.models.runtime import build_module

VOCAB, PAD, START, END = 23, 0, 20, 21


def _model_and_vars(d_model=128, nhead=2, layers=2):
    cfg = dict(
        model_type="grid_transformer", d_model=d_model, nhead=nhead,
        num_decoder_layers=layers, num_encoder_layers=1, dim_feedforward=256,
        dropout=0.1, max_len=60, resnet_stages=(1, 1, 1, 1),
    )
    module = build_module(VOCAB, cfg)
    key = jax.random.PRNGKey(0)
    variables = module.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 4), jnp.int32), jnp.array([4]),
    )
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: x * 4.0 if any(getattr(k, "key", None) == "fc_out" for k in path) else x,
        variables["params"],
    )
    return module, {"params": params, "batch_stats": variables.get("batch_stats", {})}


@pytest.fixture(scope="module")
def decode_setup():
    module, vs = _model_and_vars()
    imgs = jnp.asarray(np.random.default_rng(7).normal(size=(5, 224, 224, 3)).astype(np.float32))
    memory = module.apply(vs, imgs, method=module.encode)
    return module, vs, memory


def test_fused_matches_layerwise_teacher_forced(decode_setup):
    """Step the fused kernel and the layerwise path on the SAME token stream
    and compare per-step logits.  On CPU the two backends round bf16 matmuls
    differently (oneDNN vs explicit f32-accumulate-then-round), so logits can
    differ at bf16-noise scale (~0.05 measured) — a real bug would produce
    O(1) differences.  Argmax must agree wherever the decision isn't a
    bf16-noise-level near-tie; on-TPU token identity is measured separately
    (scripts/bench_decode.py --ab fused, PERF.md)."""
    from image_caption_tpu.ops import fused_decode as F

    module, vs, memory = decode_setup
    b = memory.shape[0]
    bp = 16
    mem = jnp.pad(memory, ((0, bp - b), (0, 0), (0, 0)))
    dec = vs["params"]["decoder"]
    L, d, H = module.num_decoder_layers, module.d_model, module.nhead
    w = F.pack_weights(dec, num_layers=L, d_model=d, vocab_size=VOCAB,
                       padded_vocab=128, max_len=12)
    ck, cv, s_len = F.pack_cross_kv(dec, mem, num_layers=L)
    kc, vc = F.init_fused_cache(bp, 12, d, L)
    cache = module.apply(vs, memory, 12, method=module.init_cache)

    ref_tokens = np.asarray(
        engine.greedy_decode(module, vs, memory, start_id=START, end_id=END, max_len=12)
    )
    assert ref_tokens.shape == (b, 12)
    for idx in range(11):
        tok = jnp.asarray(ref_tokens[:, idx])
        tok_pad = jnp.concatenate([tok, jnp.full((bp - b,), START, jnp.int32)])
        lg, nxt, kc, vc = F.fused_decode_step(
            tok_pad, kc, vc, ck, cv, w, jnp.int32(idx),
            num_layers=L, nheads=H, s_len=s_len, vocab=VOCAB, interpret=True,
        )
        rl, cache = module.apply(vs, tok, cache, jnp.int32(idx), method=module.decode_step)
        got = np.asarray(lg)[:b, :VOCAB]
        want = np.asarray(rl)[:, :VOCAB]
        np.testing.assert_allclose(got, want, atol=0.15, rtol=0.05)
        # argmax agrees except on bf16-noise near-ties of the reference
        srt = np.sort(want, axis=-1)
        gap = srt[:, -1] - srt[:, -2]
        clear = gap > 0.2
        am_f = np.asarray(nxt)[:b]
        am_r = np.argmax(np.asarray(rl), axis=-1)
        assert np.array_equal(am_f[clear], am_r[clear]), (idx, gap)


def test_fused_greedy_decode_contract(decode_setup):
    """fused_greedy_decode: shape/start-token contract and early-step
    agreement with the layerwise rollout (before noise-level tie flips can
    compound into divergent suffixes)."""
    module, vs, memory = decode_setup
    ref = np.asarray(
        engine.greedy_decode(module, vs, memory, start_id=START, end_id=END, max_len=12)
    )
    fused = np.asarray(
        engine.fused_greedy_decode(
            module, vs, memory, start_id=START, end_id=END, max_len=12, interpret=True
        )
    )
    assert fused.shape == ref.shape == (5, 12)
    assert np.array_equal(fused[:, :4], ref[:, :4])
    agree = np.mean(fused == ref)
    assert agree >= 0.8, f"fused rollout agreement {agree:.0%}"


def test_fused_step_logits_match_layerwise(decode_setup):
    """First-step logits from the fused kernel vs the layerwise step fn."""
    from image_caption_tpu.ops import fused_decode as F

    module, vs, memory = decode_setup
    b = memory.shape[0]
    bp = -(-b // 16) * 16
    mem = jnp.pad(memory, ((0, bp - b), (0, 0), (0, 0)))
    dec = vs["params"]["decoder"]
    L, d, H = module.num_decoder_layers, module.d_model, module.nhead
    vpad = -(-VOCAB // 128) * 128
    w = F.pack_weights(dec, num_layers=L, d_model=d, vocab_size=VOCAB,
                       padded_vocab=vpad, max_len=12)
    ck, cv, s_len = F.pack_cross_kv(dec, mem, num_layers=L)
    kc, vc = F.init_fused_cache(bp, 12, d, L)
    tok = jnp.full((bp,), START, jnp.int32)
    logits, nxt, kc, vc = F.fused_decode_step(
        tok, kc, vc, ck, cv, w, jnp.int32(0),
        num_layers=L, nheads=H, s_len=s_len, vocab=VOCAB, interpret=True,
    )

    cache = module.apply(vs, memory, 12, method=module.init_cache)
    ref_logits, _ = module.apply(
        vs, jnp.full((b,), START, jnp.int32), cache, jnp.int32(0),
        method=module.decode_step,
    )
    got = np.asarray(logits)[:b, :VOCAB]
    want = np.asarray(ref_logits)[:, :VOCAB]
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.02)
    np.testing.assert_array_equal(
        np.asarray(nxt)[:b], np.argmax(np.asarray(ref_logits), axis=-1)
    )
    # padded logit columns are masked exactly like the layerwise head
    assert np.all(np.asarray(logits)[:, VOCAB:] <= -1e29)


def test_fused_multi_tile_matches_single_tile():
    """The in-kernel batch-tile loop (b > 64 -> layer-major tiles over shared
    weight buffers, per-tile cache-write slots) must produce row-for-row the
    same step outputs as the same rows decoded in a single tile."""
    from image_caption_tpu.ops import fused_decode as F

    module, vs = _model_and_vars()
    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.normal(size=(128, 224, 224, 3)).astype(np.float32))
    memory = module.apply(vs, imgs, method=module.encode)
    dec = vs["params"]["decoder"]
    L, d, H = module.num_decoder_layers, module.d_model, module.nhead
    w = F.pack_weights(dec, num_layers=L, d_model=d, vocab_size=VOCAB,
                       padded_vocab=128, max_len=12)
    tok = jnp.asarray(rng.integers(1, VOCAB - 3, size=(128,)).astype(np.int32))

    def step0(mem_rows, tok_rows):
        b = mem_rows.shape[0]
        ck, cv, s_len = F.pack_cross_kv(dec, mem_rows, num_layers=L)
        kc, vc = F.init_fused_cache(b, 12, d, L)
        lg, nxt, kc, vc = F.fused_decode_step(
            tok_rows, kc, vc, ck, cv, w, jnp.int32(0),
            num_layers=L, nheads=H, s_len=s_len, vocab=VOCAB, interpret=True,
        )
        return np.asarray(lg), np.asarray(nxt), np.asarray(kc)

    lg_all, nxt_all, kc_all = step0(memory, tok)            # ntiles = 2
    lg_one, nxt_one, kc_one = step0(memory[:64], tok[:64])  # ntiles = 1
    np.testing.assert_array_equal(lg_all[:64], lg_one)
    np.testing.assert_array_equal(nxt_all[:64], nxt_one)
    np.testing.assert_array_equal(kc_all[:, :64], kc_one)
    # second tile actually computed (not zero/stale)
    assert np.any(kc_all[:, 64:, 0] != 0)
    assert np.all(lg_all[:, VOCAB:] <= -1e29)


def test_fused_cache_write_roundtrip(decode_setup):
    """The in-place cache rows written at step 0 must equal the layerwise
    cache's K/V at position 0 (the kernel's DMA write path)."""
    from image_caption_tpu.ops import fused_decode as F

    module, vs, memory = decode_setup
    b = memory.shape[0]
    bp = -(-b // 16) * 16
    mem = jnp.pad(memory, ((0, bp - b), (0, 0), (0, 0)))
    dec = vs["params"]["decoder"]
    L, d, H = module.num_decoder_layers, module.d_model, module.nhead
    vpad = -(-VOCAB // 128) * 128
    w = F.pack_weights(dec, num_layers=L, d_model=d, vocab_size=VOCAB,
                       padded_vocab=vpad, max_len=12)
    ck, cv, s_len = F.pack_cross_kv(dec, mem, num_layers=L)
    kc, vc = F.init_fused_cache(bp, 12, d, L)
    tok = jnp.full((bp,), START, jnp.int32)
    _, _, kc, vc = F.fused_decode_step(
        tok, kc, vc, ck, cv, w, jnp.int32(0),
        num_layers=L, nheads=H, s_len=s_len, vocab=VOCAB, interpret=True,
    )

    cache = module.apply(vs, memory, 12, method=module.init_cache)
    _, cache = module.apply(
        vs, jnp.full((b,), START, jnp.int32), cache, jnp.int32(0),
        method=module.decode_step,
    )
    for i in range(L):
        ref_k = np.asarray(cache[f"layer_{i}"]["self"]["k"])[:, 0]  # [b, d]
        got_k = np.asarray(kc)[i, :b, 0]
        np.testing.assert_allclose(got_k, ref_k, atol=0.02, rtol=0.02)
        # untouched rows stay zero
        assert np.all(np.asarray(kc)[i, :b, 1:] == 0)
