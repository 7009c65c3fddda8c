"""Decode engine: KV-cache exactness, greedy vs naive full-prefix, beam vs a
straightforward reimplementation of the reference algorithm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_caption_tpu.core.dtypes import DTypePolicy
from image_caption_tpu.decode import engine
from image_caption_tpu.models.decoder import TransformerDecoder

V, D, H, LAYERS, S = 23, 32, 4, 2, 6
START, END = 20, 21
F32 = DTypePolicy(compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def decoder_and_vars():
    dec = TransformerDecoder(
        vocab_size=V, d_model=D, nhead=H, num_layers=LAYERS, dim_feedforward=64,
        dropout=0.0, max_len=40, policy=F32,
    )
    key = jax.random.PRNGKey(3)
    mem = jax.random.normal(key, (4, S, D))
    tgt = jax.random.randint(key, (4, 7), 0, V)
    vars_ = dec.init({"params": key, "dropout": key}, tgt, mem)
    return dec, vars_, mem


def test_cache_step_equals_full_forward(decoder_and_vars):
    dec, vars_, mem = decoder_and_vars
    T = 7
    tgt = jax.random.randint(jax.random.PRNGKey(5), (4, T), 0, V)
    full = dec.apply(vars_, tgt, mem)
    cache = dec.apply(vars_, mem, T, method=dec.init_cache)
    outs = []
    for i in range(T):
        lg, cache = dec.apply(vars_, tgt[:, i], cache, jnp.int32(i), method=dec.step)
        outs.append(lg[:, :V])
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full), atol=1e-4)


def _naive_greedy(dec, vars_, mem, max_len):
    """Reference-style greedy: re-decode the full prefix each step (vit:296-325)."""
    b = mem.shape[0]
    gen = np.full((b, 1), START, dtype=np.int32)
    for _ in range(max_len - 1):
        logits = np.asarray(dec.apply(vars_, jnp.asarray(gen), mem))
        nxt = logits[:, -1].argmax(-1).astype(np.int32)
        gen = np.concatenate([gen, nxt[:, None]], axis=1)
        if (nxt == END).all():
            break
    return gen


def test_greedy_matches_naive(decoder_and_vars):
    dec, vars_, mem = decoder_and_vars
    max_len = 12
    fast = np.asarray(
        engine.greedy_decode(dec, vars_, mem, start_id=START, end_id=END, max_len=max_len)
    )
    naive = _naive_greedy(dec, vars_, mem, max_len)
    # compare up to naive length; engine pads with 0 after global finish
    L = naive.shape[1]
    np.testing.assert_array_equal(fast[:, :L], naive)


@pytest.mark.parametrize("unroll", [2, 3, 5])
def test_greedy_unroll_identical_captions(decoder_and_vars, unroll):
    """Unrolled loop checks the early-exit every `unroll` steps — captions must be
    identical up to each row's first <end> (positions after it are reference-
    undefined: the baseline pads them once ALL rows finish, the unrolled loop may
    run up to unroll-1 extra argmax steps first)."""
    dec, vars_, mem = decoder_and_vars
    max_len = 13
    base = np.asarray(
        engine.greedy_decode(dec, vars_, mem, start_id=START, end_id=END, max_len=max_len)
    )
    out = np.asarray(
        engine.greedy_decode(
            dec, vars_, mem, start_id=START, end_id=END, max_len=max_len, unroll=unroll
        )
    )
    assert out.shape == base.shape
    lengths = np.asarray(engine.sequence_lengths(jnp.asarray(base), END))
    for r in range(base.shape[0]):
        np.testing.assert_array_equal(out[r, : lengths[r]], base[r, : lengths[r]])


def _naive_beam(dec, vars_, mem_row, max_len, beam_size, stop_when_harvested):
    """Reference beam semantics (vit:327-420), list-based, batch of 1."""
    mem = jnp.repeat(mem_row[None], beam_size, axis=0)
    sequences = np.full((beam_size, 1), START, dtype=np.int32)
    scores = np.zeros(beam_size)
    completed, completed_scores = [], []
    k = beam_size
    for step in range(max_len - 1):
        logits = np.asarray(dec.apply(vars_, jnp.asarray(sequences), mem[:k]))[:, -1]
        logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True) * 0
        # proper log_softmax:
        m = logits.max(-1, keepdims=True)
        logp = logits - m - np.log(np.exp(logits - m).sum(-1, keepdims=True))
        if step == 0:
            s = logp[0]
            top_idx = np.argsort(-s)[:k]
            sequences = np.concatenate(
                [np.repeat(sequences[0:1], k, 0), top_idx[:, None].astype(np.int32)], axis=1
            )
            scores = s[top_idx]
        else:
            cand = (scores[:, None] + logp).reshape(-1)
            top = np.argsort(-cand)[:k]
            beam_idx, word_idx = top // V, top % V
            sequences = np.concatenate(
                [sequences[beam_idx], word_idx[:, None].astype(np.int32)], axis=1
            )
            scores = cand[top]
        end_mask = sequences[:, -1] == END
        if end_mask.any():
            for idx in np.nonzero(end_mask)[0]:
                completed.append(sequences[idx])
                completed_scores.append(scores[idx])
            # Grid stop rule (grid:310): compares against the CURRENT (shrunken)
            # beam size, before this step's shrink rebinds it.
            if stop_when_harvested and len(completed) >= k:
                break
            if end_mask.all():
                break
            keep = ~end_mask
            sequences, scores = sequences[keep], scores[keep]
            k = len(sequences)
    if completed:
        return completed[int(np.argmax(completed_scores))]
    return sequences[int(np.argmax(scores))]


@pytest.mark.parametrize("stop_when_harvested", [False, True])
def test_beam_matches_reference_algorithm(decoder_and_vars, stop_when_harvested):
    dec, vars_, mem = decoder_and_vars
    max_len, k = 10, 3
    fast = np.asarray(
        engine.beam_search_decode(
            dec, vars_, mem, start_id=START, end_id=END, max_len=max_len, beam_size=k,
            stop_when_harvested=stop_when_harvested,
        )
    )
    for b in range(mem.shape[0]):
        naive = _naive_beam(dec, vars_, mem[b], max_len, k, stop_when_harvested)
        got = fast[b][: len(naive)]
        np.testing.assert_array_equal(got, naive)


class _ScriptedModel:
    """Fake decode session whose next-token logits depend only on the current
    token (a Markov table) — lets tests construct exact beam-search landscapes."""

    def __init__(self, table):
        self.table = tuple(map(tuple, table))

    def init_cache(self, memory, max_len):
        b = memory.shape[0]
        return {"l0": {"self": jnp.zeros((b, 1)), "cross_kv": jnp.zeros((b, 1))}}

    def step(self, token, cache, index):
        return jnp.asarray(self.table, dtype=jnp.float32)[token], cache

    def apply(self, variables, *args, method=None):
        return method(self, *args)


def test_grid_stop_rule_changes_beam_output():
    """Constructed case where the grid stop rule (break once len(completed) >=
    current beam_size, grid:310) returns a different caption than the vit rule
    (run until all live beams finish, vit:406).

    vocab: 0=pad 1=w1 2=w2 3=a 4=end 7=start.  With k=3: step 0 harvests
    <start,end>; step 1 harvests <start,w2,end> making completed(2) >= live(2)
    so grid stops there — but the best path <start,w1,a,end> only completes at
    step 2, which the vit rule reaches and returns.
    """
    NEG = -30.0
    table = np.full((8, 8), NEG, dtype=np.float32)
    table[7, 1], table[7, 2], table[7, 4] = 3.0, 2.0, 0.5  # start -> w1 | w2 | end
    table[1, 3], table[1, 4] = 3.0, -2.0                   # w1 -> a (end weak)
    table[2, 4] = 3.0                                      # w2 -> end
    table[3, 4] = 3.0                                      # a -> end
    model = _ScriptedModel(table)
    mem = jnp.zeros((2, 1, 1))  # two identical images: exercises per-row freeze

    kw = dict(start_id=7, end_id=4, max_len=6, beam_size=3)
    vit = np.asarray(engine.beam_search_decode(model, {}, mem, stop_when_harvested=False, **kw))
    grid = np.asarray(engine.beam_search_decode(model, {}, mem, stop_when_harvested=True, **kw))
    np.testing.assert_array_equal(vit, [[7, 1, 3, 4, 0, 0]] * 2)
    np.testing.assert_array_equal(grid, [[7, 2, 4, 0, 0, 0]] * 2)


def test_live_set_shrinks_like_reference():
    """After a harvest the live set must SHRINK (the reference rebinds
    beam_size to sequences.size(0), vit:413) — an implementation that
    replenishes back to k live beams tracks an illegal extra lineage.

    k=2: step 0 harvests <start,end>, leaving ONE live beam (w1) whose
    children are a (kept) and t5 (cut by the shrink).  The illegal t5 lineage
    ends immediately at score ~-1.06; the legal a lineage ends later at
    ~-0.96 but would be dropped by a full done-pool if t5 had been harvested.
    Shrinking semantics must return <start,w1,a,t6,end>.
    """
    NEG = -30.0
    table = np.full((8, 8), NEG, dtype=np.float32)
    table[7, 1], table[7, 4] = 3.0, 2.0   # start -> w1 | end (end harvested step 0)
    table[1, 3], table[1, 5] = 1.0, 0.9   # w1 -> a | t5 (near-tie; shrink keeps a only)
    table[5, 4] = 5.0                     # t5 -> end (the illegal quick finish)
    table[3, 6] = 0.0                     # a -> t6
    table[6, 4] = 5.0                     # t6 -> end
    model = _ScriptedModel(table)
    mem = jnp.zeros((1, 1, 1))

    out = np.asarray(
        engine.beam_search_decode(
            model, {}, mem, start_id=7, end_id=4, max_len=6, beam_size=2,
            stop_when_harvested=False,
        )
    )[0]
    np.testing.assert_array_equal(out, [7, 1, 3, 6, 4, 0])


def test_sample_logprobs_consistent(decoder_and_vars):
    dec, vars_, mem = decoder_and_vars
    toks, logps = engine.sample_decode(
        dec, vars_, mem, jax.random.PRNGKey(0), start_id=START, end_id=END, max_len=10
    )
    toks, logps = np.asarray(toks), np.asarray(logps)
    assert toks.shape == logps.shape
    assert (logps <= 1e-6).all()
    assert logps[:, 0].sum() == 0.0  # start position carries no log-prob
    # verify a recorded log-prob against the teacher-forced forward
    full = np.asarray(dec.apply(vars_, jnp.asarray(toks), mem))
    logp_full = full - full.max(-1, keepdims=True)
    logp_full = logp_full - np.log(np.exp(logp_full).sum(-1, keepdims=True))
    for b in range(toks.shape[0]):
        for t in range(1, 5):
            if logps[b, t] == 0.0:
                continue
            expect = logp_full[b, t - 1, toks[b, t]]
            assert abs(logps[b, t] - expect) < 1e-4


def test_sequence_lengths():
    toks = jnp.asarray([[START, 1, 2, END, 0, 0], [START, 1, 2, 3, 4, 5]])
    lens = np.asarray(engine.sequence_lengths(toks, END))
    np.testing.assert_array_equal(lens, [4, 6])
