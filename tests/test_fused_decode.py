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
    np.testing.assert_array_equal(kc_all[:64], kc_one)
    # second tile actually computed (not zero/stale)
    assert np.any(kc_all[64:, :, 0] != 0)
    assert np.all(lg_all[:, VOCAB:] <= -1e29)


def test_fused_vit_geometry_cross_blocks(decode_setup):
    """Pin the ViT-geometry kernel path (196-token memory -> 13 cross blocks):
    the fori_loop regime where Mosaic's scoped-VMEM OOM forced the rewrite
    (ops/fused_decode.py) and where round-4 token identity degraded.  The
    round-5 exact two-pass cross softmax (bf16-rounded normalized probs —
    mha_reference's value) is exercised at its real block count here, per
    commit, in interpret mode.  Memory content is synthetic — the kernel only
    sees [B, S, d]."""
    from image_caption_tpu.ops import fused_decode as F

    module, vs, _ = decode_setup
    rng = np.random.default_rng(3)
    memory = jnp.asarray(rng.normal(size=(5, 196, 128)).astype(np.float32))
    b = memory.shape[0]
    bp = 16
    mem = jnp.pad(memory, ((0, bp - b), (0, 0), (0, 0)))
    dec = vs["params"]["decoder"]
    L, d, H = module.num_decoder_layers, module.d_model, module.nhead
    w = F.pack_weights(dec, num_layers=L, d_model=d, vocab_size=VOCAB,
                       padded_vocab=128, max_len=12)
    ck, cv, s_len = F.pack_cross_kv(dec, mem, num_layers=L)
    assert s_len == 196 and ck.shape[2] == 208  # 13 BLK-16 cross blocks
    kc, vc = F.init_fused_cache(bp, 12, d, L)
    cache = module.apply(vs, memory, 12, method=module.init_cache)

    tok = jnp.full((b,), START, jnp.int32)
    for idx in range(4):
        tok_pad = jnp.concatenate([tok, jnp.full((bp - b,), START, jnp.int32)])
        lg, nxt, kc, vc = F.fused_decode_step(
            tok_pad, kc, vc, ck, cv, w, jnp.int32(idx),
            num_layers=L, nheads=H, s_len=s_len, vocab=VOCAB, interpret=True,
        )
        rl, cache = module.apply(vs, tok, cache, jnp.int32(idx), method=module.decode_step)
        got = np.asarray(lg)[:b, :VOCAB]
        want = np.asarray(rl)[:, :VOCAB]
        np.testing.assert_allclose(got, want, atol=0.15, rtol=0.05)
        srt = np.sort(want, axis=-1)
        clear = (srt[:, -1] - srt[:, -2]) > 0.2
        am_f = np.asarray(nxt)[:b]
        am_r = np.argmax(np.asarray(rl), axis=-1)
        assert np.array_equal(am_f[clear], am_r[clear]), idx
        tok = jnp.asarray(am_r, jnp.int32)  # follow the layerwise stream


def _trim_after_end(tokens: np.ndarray, end_id: int = END) -> np.ndarray:
    """Zero positions after the first <end> (paths differ there by contract:
    finished rows keep receiving argmax tokens until their loop's global
    early-exit, which fires at different steps for different paths)."""
    out = tokens.copy()
    for row in out:
        hits = np.flatnonzero(row == end_id)
        if hits.size:
            row[hits[0] + 1:] = 0
    return out


def test_fused_beam_matches_layerwise(decode_setup):
    """Fused beam search (one pallas_call per token for all B*K rows) vs the
    layerwise beam: the selection/harvest logic is shared by construction
    (engine._beam_select), so any disagreement is kernel numerics — with the
    sharpened vocab head, captions must match exactly."""
    module, vs, memory = decode_setup
    ref = np.asarray(engine.beam_search_decode(
        module, vs, memory, start_id=START, end_id=END, max_len=10,
        beam_size=3, fused=False,
    ))
    got = np.asarray(engine.fused_beam_search_decode(
        module, vs, memory, start_id=START, end_id=END, max_len=10,
        beam_size=3, interpret=True,
    ))
    assert got.shape == ref.shape == (5, 10)
    agree = np.mean(got == ref)
    assert agree == 1.0, f"fused beam vs layerwise agreement {agree:.0%}\n{got}\n{ref}"
    # grid stop rule variant too (stop_when_harvested threads through)
    ref_g = np.asarray(engine.beam_search_decode(
        module, vs, memory, start_id=START, end_id=END, max_len=10,
        beam_size=3, stop_when_harvested=True, fused=False,
    ))
    got_g = np.asarray(engine.fused_beam_search_decode(
        module, vs, memory, start_id=START, end_id=END, max_len=10,
        beam_size=3, stop_when_harvested=True, interpret=True,
    ))
    assert np.array_equal(got_g, ref_g)


def test_fused_sample_decode_contract(decode_setup):
    """Fused sampling rollout (the SCST hot loop): at near-zero temperature
    the categorical collapses to argmax, so the sampled tokens must equal the
    fused greedy rollout (trimmed past <end>, where the contracts differ:
    sampling forces <pad>, greedy keeps emitting argmax).  At temperature 1,
    same-seed runs are deterministic and log-probs honor the finished-mask
    zeroing."""
    module, vs, memory = decode_setup
    mem16 = jnp.concatenate([memory, memory, memory, memory])[:16]
    key = jax.random.PRNGKey(5)

    greedy = np.asarray(engine.fused_greedy_decode(
        module, vs, mem16, start_id=START, end_id=END, max_len=10, interpret=True
    ))
    cold, _ = engine.fused_sample_decode(
        module, vs, mem16, key, start_id=START, end_id=END, pad_id=PAD,
        max_len=10, temperature=1e-4, interpret=True,
    )
    # random-init logits are near-flat, so a handful of true near-ties (top-2
    # gap ~ the 1e-4-scaled gumbel race) can legitimately flip — and one flip
    # diverges that row's suffix; require dominant agreement, not equality
    cold_agree = np.mean(_trim_after_end(np.asarray(cold)) == _trim_after_end(greedy))
    assert cold_agree >= 0.95, f"cold-temperature sampling vs greedy {cold_agree:.0%}"

    toks, logps = engine.fused_sample_decode(
        module, vs, mem16, key, start_id=START, end_id=END, pad_id=PAD,
        max_len=10, interpret=True,
    )
    toks2, logps2 = engine.fused_sample_decode(
        module, vs, mem16, key, start_id=START, end_id=END, pad_id=PAD,
        max_len=10, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))
    np.testing.assert_array_equal(np.asarray(logps), np.asarray(logps2))
    toks, logps = np.asarray(toks), np.asarray(logps)
    assert toks.shape == logps.shape == (16, 10)
    assert np.all(logps <= 0.0) and np.all(logps[:, 0] == 0.0)
    # positions written after a row finished are <pad> with logp 0
    for r in range(16):
        hits = np.flatnonzero(toks[r] == END)
        if hits.size:
            assert np.all(toks[r, hits[0] + 1:] == PAD)
            assert np.all(logps[r, hits[0] + 1:] == 0.0)
    # the layerwise path under the same seed: identical rng draw shapes
    # (b=16 is the kernel's pad multiple), so tokens agree wherever the two
    # implementations' float-noise logit deltas don't cross a gumbel race
    lt, _ = engine.sample_decode(
        module, vs, mem16, key, start_id=START, end_id=END, pad_id=PAD,
        max_len=10, fused=False,
    )
    agree = np.mean(np.asarray(lt) == toks)
    assert agree >= 0.5, f"fused vs layerwise sampled agreement {agree:.0%}"


def test_fused_greedy_decode_sharded(decode_setup):
    """shard_map fused decode on the 8-virtual-device CPU mesh: per-shard
    kernels must reproduce the single-shard fused rollout row-for-row, and
    the layerwise sharded result on clear-margin streams (VERDICT r4 #9)."""
    from jax.sharding import Mesh

    module, vs, memory = decode_setup
    n = 8
    devices = jax.devices()[:n]
    if len(devices) < n:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devices), ("data",))
    mem16 = jnp.concatenate([memory, memory, memory, memory])[:16]

    sharded = np.asarray(engine.fused_greedy_decode_sharded(
        module, vs, mem16, mesh=mesh, start_id=START, end_id=END, max_len=8,
        interpret=True,
    ))
    single = np.asarray(engine.fused_greedy_decode(
        module, vs, mem16, start_id=START, end_id=END, max_len=8, interpret=True
    ))
    assert sharded.shape == (16, 8)
    np.testing.assert_array_equal(_trim_after_end(sharded), _trim_after_end(single))
    layerwise = np.asarray(engine.greedy_decode(
        module, vs, mem16, start_id=START, end_id=END, max_len=8, fused=False
    ))
    agree = np.mean(_trim_after_end(sharded) == _trim_after_end(layerwise))
    assert agree >= 0.9, f"sharded fused vs layerwise agreement {agree:.0%}"


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
        got_k = np.asarray(kc)[:b, i, 0]
        np.testing.assert_allclose(got_k, ref_k, atol=0.02, rtol=0.02)
        # untouched rows stay zero
        assert np.all(np.asarray(kc)[:b, i, 1:] == 0)
