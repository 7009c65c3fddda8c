"""The decode engine: KV-cached greedy / sampling / batched beam search.

ONE engine serves inference, per-epoch validation, beam demos, and SCST rollouts —
the reference instead re-ran the decoder over the full growing prefix every step
with no KV cache (vit_transformer_model.py:296-325 greedy, :327-420 beam;
utils/scst_loss.py:202-254 sampling), an O(L^2) pattern this engine replaces with
O(L) cached steps under ``jax.lax.while_loop`` (early exit when every sequence has
emitted <end>, exactly like the reference's ``.all()`` break).

Greedy parity notes:
- logits are f32 and argmax ties break toward the lower index (jnp.argmax), same
  as torch.argmax
- finished rows keep receiving argmax tokens until the global early-exit, matching
  the reference loop; text decoding stops at the first <end> either way.

Beam search reproduces the reference algorithm shape-statically:
- score = summed log-probs, NO length normalization
- step 0 expands from beam 0 only (vit:370-378)
- a beam that emits <end> is "harvested" and the live set SHRINKS — the
  reference removes completed rows and rebinds ``beam_size = sequences.size(0)``
  (vit:398-413, grid:310-317), so later steps keep only top-|live| candidates
  and at most K sequences ever complete.  Implemented shape-statically by
  tracking a per-image live count and masking candidate ranks >= live.
- vit stop rule: all live beams finished; grid stop rule: break once
  ``len(completed) >= beam_size`` where beam_size is the CURRENT (shrunken)
  live count (grid:304-317 rebinds it) — selectable via ``stop_when_harvested``.
  The grid rule can stop with live beams remaining, so the two rules can
  return different captions (tested by a constructed case in test_decode.py).
- returns best completed sequence, else best live (vit:415-420)
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30

StepFn = Callable[[jnp.ndarray, Dict[str, Any], jnp.ndarray], Tuple[jnp.ndarray, Dict[str, Any]]]


def sequence_lengths(tokens: jnp.ndarray, end_id: int) -> jnp.ndarray:
    """Length including <start> and the first <end> (or full length if no <end>)."""
    is_end = tokens == end_id
    any_end = jnp.any(is_end, axis=-1)
    first_end = jnp.argmax(is_end, axis=-1)
    return jnp.where(any_end, first_end + 1, tokens.shape[-1]).astype(jnp.int32)


def _apply_fns(model, variables) -> Tuple[Callable, StepFn]:
    # CaptioningModel exposes decode_step/init_cache; a bare TransformerDecoder
    # exposes step/init_cache — accept either.
    step_method = getattr(type(model), "decode_step", None) or type(model).step

    def init_cache(memory, max_len):
        return model.apply(variables, memory, max_len, method=type(model).init_cache)

    def step(token, cache, index):
        return model.apply(variables, token, cache, index, method=step_method)

    return init_cache, step


# Fused-by-default cross-attention span limit: spans up to this many memory
# tokens (grid: 49) measure token/caption identity 1.0/1.0 vs the layerwise
# path on TPU with trained weights, greedy AND beam (PERF.md).  Longer spans
# (ViT: 196 -> 13 KV blocks) accumulate f32 block-grouping noise that
# amplifies through the 6 layers: measured 0.992/0.965 greedy, 0.934/0.895
# beam — every argmax flip at a <=7e-5 top-2 margin (true near-ties), but the
# decode-fidelity north star is token-for-token, so long spans default to the
# layerwise path.  ICT_FUSED_DECODE=all (or fused=True) opts such geometries
# into the kernel's 1.5x speedup.
_FUSED_SPAN_LIMIT = 64

# Kernel row budget for auto-dispatch: the x_all/logits/new-K/V VMEM buffers
# scale ~14 KB/row (d=512/L=6) next to ~11 MB of fixed weight/KV buffers.
# The kernel requests a 64 MB scoped-VMEM window (ops/fused_decode.py —
# the v5e has 128 MB physical VMEM; the 16 MB default OOM'd at 192 rows),
# which serves ~3.8k rows; cap dispatch at 2048 (beam-5 at b=256 = 1280 rows
# verified on hardware).  fused=True still forces the kernel beyond the cap.
_FUSED_MAX_ROWS = 2048


def _fused_rows_ok(rows: int) -> bool:
    return -(-rows // 16) * 16 <= _FUSED_MAX_ROWS


def _fused_spec(model, variables, memory=None) -> Optional[dict]:
    """Kernel-compatibility check for the fused decode path.

    The fused whole-step kernel (ops/fused_decode.py) serves any
    CaptioningModel whose decoder matches the standard geometry: head_dim a
    lane-tileable 64+ and params under ``params/decoder``.  Single-device TPU
    only — under a multi-device mesh XLA cannot auto-partition a pallas_call,
    so sharded decode keeps the layerwise XLA path.  ``memory`` (when given)
    gates by cross span: see ``_FUSED_SPAN_LIMIT``.
    """
    import os

    mode = os.environ.get("ICT_FUSED_DECODE", "1")
    if mode not in ("1", "all"):
        return None
    if os.environ.get("ICT_DISABLE_PALLAS", "0") == "1":
        return None
    if mode != "all" and memory is not None and memory.shape[1] > _FUSED_SPAN_LIMIT:
        return None
    try:
        if jax.default_backend() != "tpu" or len(jax.devices()) != 1:
            return None
    except Exception:  # pragma: no cover
        return None
    d = getattr(model, "d_model", None)
    h = getattr(model, "nhead", None)
    layers = getattr(model, "num_decoder_layers", None)
    vocab = getattr(model, "vocab_size", None)
    if not all(isinstance(v, int) for v in (d, h, layers, vocab)):
        return None
    if d % 128 != 0 or d % h != 0 or (d // h) % 64 != 0:
        return None
    params = variables.get("params", {})
    if "decoder" not in params or "layer_0" not in params["decoder"]:
        return None
    return dict(num_layers=layers, d_model=d, nhead=h, vocab=vocab)


def _fused_pack(model, variables, memory, max_len: int):
    """Shared packing for the fused decode paths (greedy/beam/sample): pad the
    row count to the kernel's 16-multiple contract, pack decoder weights and
    per-layer cross K/V, allocate zeroed self caches.  Pure jnp — safe inside
    jit.  Returns ``(weights, ck, cv, s_len, kc, vc, bp)``."""
    from image_caption_tpu.ops import fused_decode as F

    b, _, d = memory.shape
    bp = -(-b // 16) * 16
    mem = jnp.pad(memory, ((0, bp - b), (0, 0), (0, 0))) if bp != b else memory
    dec_params = variables["params"]["decoder"]
    vpad = -(-model.vocab_size // 128) * 128
    weights = F.pack_weights(
        dec_params, num_layers=model.num_decoder_layers, d_model=d,
        vocab_size=model.vocab_size, padded_vocab=vpad, max_len=max_len,
    )
    ck, cv, s_len = F.pack_cross_kv(dec_params, mem, num_layers=model.num_decoder_layers)
    kc, vc = F.init_fused_cache(bp, max_len, d, model.num_decoder_layers)
    return weights, ck, cv, s_len, kc, vc, bp


@functools.partial(
    jax.jit, static_argnames=("model", "start_id", "end_id", "max_len", "interpret")
)
def fused_greedy_decode(
    model,
    variables,
    memory: jnp.ndarray,
    *,
    start_id: int,
    end_id: int,
    max_len: int = 50,
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy decode through the fused whole-step kernel (ops/fused_decode.py):
    ONE pallas_call per token instead of ~60 XLA ops.  Same contract and (for
    unroll=1) same output as ``greedy_decode``; tokens are argmax-identical up
    to float-noise ties (PERF.md records the on-TPU identity measurement)."""
    from image_caption_tpu.ops import fused_decode as F

    spec = dict(
        num_layers=model.num_decoder_layers, d_model=model.d_model,
        nhead=model.nhead, vocab=model.vocab_size,
    )
    b = memory.shape[0]
    weights, ck, cv, s_len, kc, vc, bp = _fused_pack(model, variables, memory, max_len)

    tokens = jnp.zeros((bp, max_len), dtype=jnp.int32).at[:, 0].set(start_id)
    cur = jnp.full((bp,), start_id, dtype=jnp.int32)
    # padded rows are born finished so they never delay the global early exit
    finished = jnp.arange(bp) >= b

    def cond(state):
        idx, _, _, _, _, finished = state
        return (idx < max_len - 1) & ~jnp.all(finished)

    def body(state):
        idx, tokens, kc, vc, cur, finished = state
        _, nxt, kc, vc = F.fused_decode_step(
            cur, kc, vc, ck, cv, weights, idx,
            num_layers=spec["num_layers"], nheads=spec["nhead"],
            s_len=s_len, vocab=spec["vocab"], interpret=interpret,
        )
        tokens = tokens.at[:, idx + 1].set(nxt)
        finished = finished | (nxt == end_id)
        return idx + 1, tokens, kc, vc, nxt, finished

    _, tokens, _, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tokens, kc, vc, cur, finished)
    )
    return tokens[:b]


def fused_greedy_decode_sharded(
    model,
    variables,
    memory: jnp.ndarray,
    *,
    mesh,
    axis_name: str = "data",
    start_id: int,
    end_id: int,
    max_len: int = 50,
    interpret: bool = False,
) -> jnp.ndarray:
    """Data-parallel fused greedy decode over a ``jax.sharding.Mesh``.

    XLA cannot auto-partition a ``pallas_call``, so decode under a mesh
    normally forfeits the fused kernel's 1.5-2x win and runs layerwise.
    ``shard_map`` restores it: each device runs its own fused whole-step
    kernel over its batch shard (decode is embarrassingly data-parallel —
    no collectives; the per-device early exit can only fire sooner than the
    global one).  Weights/params ride in replicated; the per-shard row count
    is padded to the kernel's 16-multiple inside, so any shard size works.

    Greedy parity with the unsharded fused path is exact: each row's compute
    never depends on other rows.  Serves the v5e-8 serving layout
    (BASELINE.md north star); reference scale-out had no equivalent (one
    image per generate call, vit_transformer_model.py:296-325).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def shard_fn(vs, mem):
        return fused_greedy_decode(
            model, vs, mem, start_id=start_id, end_id=end_id, max_len=max_len,
            interpret=interpret,
        )

    return shard_map(
        shard_fn, mesh=mesh, in_specs=(P(), P(axis_name)),
        out_specs=P(axis_name), check_rep=False,
    )(variables, memory)


@functools.partial(
    jax.jit, static_argnames=("model", "start_id", "end_id", "max_len", "unroll", "fused")
)
def greedy_decode(
    model,
    variables,
    memory: jnp.ndarray,
    *,
    start_id: int,
    end_id: int,
    max_len: int = 50,
    unroll: int = 1,
    fused: Optional[bool] = None,
) -> jnp.ndarray:
    """Batched greedy decode from precomputed memory. Returns int32 [B, max_len].

    With ``unroll=1`` (the shipped default), positions after global termination
    are <pad> (0).  With ``unroll>1`` up to ``unroll-1`` positions after the
    global finish may contain argmax tokens (the extra steps of the final loop
    iteration) — *captions* are still identical because text decoding stops at
    the first <end>; callers comparing raw token arrays or relying on trailing
    pad must use ``sequence_lengths`` or unroll=1.

    ``unroll`` runs that many token steps per ``while_loop`` iteration to
    amortize the loop's fixed per-iteration cost (the step itself is
    latency-bound, PERF.md).  Finished rows keep receiving argmax tokens until
    the global early-exit either way (the reference loop's behavior), so
    checking the exit every ``unroll`` steps instead of every step cannot
    change a caption, only run up to ``unroll-1`` extra steps.
    """
    if unroll < 1:
        raise ValueError(f"unroll must be >= 1, got {unroll}")
    # ``fused``: None = auto (TPU single-device, compatible decoder geometry);
    # False = force the layerwise path; True = force the fused kernel.  A
    # STATIC argument so the two paths never share a jit cache entry (an env
    # flag read at trace time would leave the second variant of an A/B stale).
    if unroll == 1 and fused is not False and (
        fused is True
        or (_fused_rows_ok(memory.shape[0])
            and _fused_spec(model, variables, memory) is not None)
    ):
        # TPU fast path: one fused pallas_call per token (ops/fused_decode.py)
        return fused_greedy_decode(
            model, variables, memory, start_id=start_id, end_id=end_id, max_len=max_len
        )
    init_cache, step = _apply_fns(model, variables)
    b = memory.shape[0]
    # The last loop iteration can run steps at idx up to max_len+unroll-2;
    # size the cache for them so the KV scatter / kernel prefetch index never
    # exceeds the allocated (BLK-rounded) cache length.
    cache = init_cache(memory, max_len + unroll - 1)
    # Up to unroll-1 writes can land past max_len; give them scratch columns
    # and slice back at the end.
    tokens = jnp.zeros((b, max_len + unroll - 1), dtype=jnp.int32).at[:, 0].set(start_id)
    cur = jnp.full((b,), start_id, dtype=jnp.int32)
    finished = jnp.zeros((b,), dtype=bool)

    def cond(state):
        idx, _, _, _, finished = state
        return (idx < max_len - 1) & ~jnp.all(finished)

    def body(state):
        idx, tokens, cache, cur, finished = state
        for _ in range(unroll):
            logits, cache = step(cur, cache, idx)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            tokens = tokens.at[:, idx + 1].set(nxt)
            finished = finished | (nxt == end_id)
            cur = nxt
            idx = idx + 1
        return idx, tokens, cache, cur, finished

    _, tokens, _, _, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), tokens, cache, cur, finished))
    return tokens[:, :max_len]


@functools.partial(
    jax.jit,
    static_argnames=("model", "start_id", "end_id", "pad_id", "max_len",
                     "temperature", "interpret"),
)
def fused_sample_decode(
    model,
    variables,
    memory: jnp.ndarray,
    rng: jax.Array,
    *,
    start_id: int,
    end_id: int,
    pad_id: int = 0,
    max_len: int = 50,
    temperature: float = 1.0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sampling rollout through the fused whole-step kernel — the SCST hot
    loop (train/steps.py::make_scst_step draws one categorical per token,
    utils/scst_loss.py:202-254 in the reference).  Same contract as
    ``sample_decode``; when B is already a 16-multiple (the SCST default
    b=16) the per-step rng draw shapes match the layerwise path exactly, so
    the sampled stream is identical up to float-noise logit ties."""
    from image_caption_tpu.ops import fused_decode as F

    b = memory.shape[0]
    weights, ck, cv, s_len, kc, vc, bp = _fused_pack(model, variables, memory, max_len)
    tokens = jnp.zeros((bp, max_len), dtype=jnp.int32).at[:, 0].set(start_id)
    logps = jnp.zeros((bp, max_len), dtype=jnp.float32)
    cur = jnp.full((bp,), start_id, dtype=jnp.int32)
    # padded rows are born finished so they never delay the global early exit
    finished = jnp.arange(bp) >= b

    def cond(state):
        idx = state[0]
        finished = state[-1]
        return (idx < max_len - 1) & ~jnp.all(finished)

    def body(state):
        idx, rng, tokens, logps, kc, vc, cur, finished = state
        rng, key = jax.random.split(rng)
        logits, _, kc, vc = F.fused_decode_step(
            cur, kc, vc, ck, cv, weights, idx,
            num_layers=model.num_decoder_layers, nheads=model.nhead,
            s_len=s_len, vocab=model.vocab_size, interpret=interpret,
        )
        scaled = logits / temperature
        nxt = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
        logp = jax.nn.log_softmax(scaled, axis=-1)
        tok_logp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        nxt = jnp.where(finished, pad_id, nxt)
        tok_logp = jnp.where(finished, 0.0, tok_logp)
        tokens = tokens.at[:, idx + 1].set(nxt)
        logps = logps.at[:, idx + 1].set(tok_logp)
        finished = finished | (nxt == end_id)
        return idx + 1, rng, tokens, logps, kc, vc, nxt, finished

    _, _, tokens, logps, _, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), rng, tokens, logps, kc, vc, cur, finished)
    )
    return tokens[:b], logps[:b]


@functools.partial(
    jax.jit,
    static_argnames=("model", "start_id", "end_id", "pad_id", "max_len",
                     "temperature", "fused"),
)
def sample_decode(
    model,
    variables,
    memory: jnp.ndarray,
    rng: jax.Array,
    *,
    start_id: int,
    end_id: int,
    pad_id: int = 0,
    max_len: int = 50,
    temperature: float = 1.0,
    fused: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multinomial sampling rollout for SCST (scst_loss.py:202-254 equivalent).

    Returns ``(tokens [B, max_len], log_probs [B, max_len])`` where ``log_probs[:, t]``
    is the f32 log-probability of the token WRITTEN at position t (0 at position 0
    and at positions after a row finished — the reference's finished-mask zeroing).
    Post-finish tokens are forced to <pad>.

    ``fused``: None = auto-dispatch to the fused whole-step kernel (same
    policy as ``greedy_decode``); False/True force layerwise/fused.
    """
    if fused is not False and (
        fused is True
        or (_fused_rows_ok(memory.shape[0])
            and _fused_spec(model, variables, memory) is not None)
    ):
        return fused_sample_decode(
            model, variables, memory, rng, start_id=start_id, end_id=end_id,
            pad_id=pad_id, max_len=max_len, temperature=temperature,
        )
    init_cache, step = _apply_fns(model, variables)
    b = memory.shape[0]
    cache = init_cache(memory, max_len)
    tokens = jnp.zeros((b, max_len), dtype=jnp.int32).at[:, 0].set(start_id)
    logps = jnp.zeros((b, max_len), dtype=jnp.float32)
    cur = jnp.full((b,), start_id, dtype=jnp.int32)
    finished = jnp.zeros((b,), dtype=bool)

    def cond(state):
        idx = state[0]
        finished = state[-1]
        return (idx < max_len - 1) & ~jnp.all(finished)

    def body(state):
        idx, rng, tokens, logps, cache, cur, finished = state
        rng, key = jax.random.split(rng)
        logits, cache = step(cur, cache, idx)
        scaled = logits / temperature
        nxt = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
        logp = jax.nn.log_softmax(scaled, axis=-1)
        tok_logp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        nxt = jnp.where(finished, pad_id, nxt)
        tok_logp = jnp.where(finished, 0.0, tok_logp)
        tokens = tokens.at[:, idx + 1].set(nxt)
        logps = logps.at[:, idx + 1].set(tok_logp)
        finished = finished | (nxt == end_id)
        return idx + 1, rng, tokens, logps, cache, nxt, finished

    _, _, tokens, logps, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), rng, tokens, logps, cache, cur, finished)
    )
    return tokens, logps


def _gather_beams(tree, beam_idx: jnp.ndarray, batch: int, k: int):
    """Reorder the [B*K, ...] leading axis of every leaf by per-batch beam index."""

    def gather(leaf):
        leaf = leaf.reshape(batch, k, *leaf.shape[1:])
        out = jnp.take_along_axis(
            leaf, beam_idx.reshape(batch, k, *([1] * (leaf.ndim - 2))), axis=1
        )
        return out.reshape(batch * k, *leaf.shape[2:])

    return jax.tree_util.tree_map(gather, tree)


def _gather_cache(cache, beam_idx: jnp.ndarray, batch: int, k: int):
    """Reorder only the self-attn KV by parent beam; cross K/V are identical across
    beams of one image (memory was jnp.repeat-ed), so reordering them is a no-op —
    skip the gather to save HBM bandwidth."""
    return {
        name: {"self": _gather_beams(layer["self"], beam_idx, batch, k), "cross_kv": layer["cross_kv"]}
        for name, layer in cache.items()
    }


def _beam_select(idx, logp, seqs0, live_scores0, done_seqs0, done_scores0,
                 done_count0, live_count0, stopped0, *, b, k, end_id,
                 stop_when_harvested):
    """One beam-search selection/harvest update, shared by the layerwise and
    fused bodies (identical semantics by construction).  ``logp`` is
    [B, K, Vp] log-probs for this step; returns the updated beam state plus
    ``(beam_idx, word_idx)`` for the caller's cache reorder.  See
    ``beam_search_decode``'s docstring for the algorithm/quirk notes."""
    active = (live_count0 > 0) & ~stopped0  # [B] rows still decoding
    vp = logp.shape[-1]
    cand = live_scores0[:, :, None] + logp  # dead beams stay at -inf
    flat = cand.reshape(b, k * vp)
    top_scores, top_idx = jax.lax.top_k(flat, k)  # [B, K], sorted descending
    # The reference keeps topk(|live|) candidates (beam_size rebinds to the
    # shrunken live count, vit:413 / grid:317): mask ranks >= live_count.
    rank_live = jnp.arange(k)[None, :] < live_count0[:, None]
    top_scores = jnp.where(rank_live, top_scores, _NEG_INF)
    beam_idx = top_idx // vp
    word_idx = (top_idx % vp).astype(jnp.int32)

    # Reorder sequences by winning parent beam, append the word.
    seqs = jnp.take_along_axis(seqs0, beam_idx[:, :, None], axis=1)
    seqs = seqs.at[:, :, idx + 1].set(word_idx)

    # Harvest candidates that just emitted <end>.
    newly_done = (word_idx == end_id) & (top_scores > _NEG_INF / 2)
    # Insert each newly-done beam into the done pool at slot done_count + rank.
    rank = jnp.cumsum(newly_done.astype(jnp.int32), axis=1) - 1
    slot = jnp.where(newly_done, done_count0[:, None] + rank, k)
    slot = jnp.clip(slot, 0, k)  # safety: slots >= k dropped below
    in_range = newly_done & (slot < k)
    done_scores = jax.vmap(
        lambda ds, s, sc, m: ds.at[jnp.where(m, s, k)].set(jnp.where(m, sc, _NEG_INF), mode="drop")
    )(done_scores0, slot, top_scores, in_range)
    done_seqs = jax.vmap(
        lambda dq, s, sq, m: dq.at[jnp.where(m, s, k)].set(
            jnp.where(m[:, None], sq, 0), mode="drop"
        )
    )(done_seqs0, slot, seqs, in_range)
    n_done = jnp.sum(newly_done, axis=1)
    done_count = jnp.minimum(done_count0 + n_done, k)

    # Finished beams leave the live set (score -> -inf); the live count
    # shrinks like the reference's keep_mask re-slice.
    live_scores = jnp.where(newly_done, _NEG_INF, top_scores)
    live_count = live_count0 - n_done
    # Grid stop rule (grid:310): after appending this step's completions,
    # break if len(completed) >= beam_size — beam_size being the live count
    # that ENTERED the step (it rebinds only after the check).
    stopped = stopped0
    if stop_when_harvested:
        stopped = stopped | ((n_done > 0) & (done_count >= live_count0))

    # Freeze rows whose decode already ended so extra loop iterations for
    # other images can't mutate their result (pool/live state).
    def keep(new, old):
        a = active.reshape((b,) + (1,) * (new.ndim - 1))
        return jnp.where(a, new, old)

    return (
        keep(seqs, seqs0), keep(live_scores, live_scores0),
        keep(done_seqs, done_seqs0), keep(done_scores, done_scores0),
        keep(done_count, done_count0), keep(live_count, live_count0),
        keep(stopped, stopped0), beam_idx, word_idx,
    )


def _beam_init(b: int, k: int, max_len: int, start_id: int):
    """Initial beam state (shared).  Step-0 trick (vit:370-378): only beam 0
    is live so every beam doesn't pick the same token; implemented by
    initializing all but beam 0 to -inf."""
    seqs = jnp.zeros((b, k, max_len), dtype=jnp.int32).at[:, :, 0].set(start_id)
    live_scores = jnp.full((b, k), _NEG_INF, dtype=jnp.float32).at[:, 0].set(0.0)
    # Harvested (completed) pool: at most K sequences ever complete (the live
    # set shrinks by one per completion), so K slots are exact, never dropped.
    done_seqs = jnp.zeros((b, k, max_len), dtype=jnp.int32)
    done_scores = jnp.full((b, k), _NEG_INF, dtype=jnp.float32)
    done_count = jnp.zeros((b,), dtype=jnp.int32)
    live_count = jnp.full((b,), k, dtype=jnp.int32)
    stopped = jnp.zeros((b,), dtype=bool)  # grid stop rule fired for this image
    return seqs, live_scores, done_seqs, done_scores, done_count, live_count, stopped


def _beam_pick(seqs, live_scores, done_seqs, done_scores, done_count):
    """Best completed if any, else best live (vit:415-420)."""
    have_done = done_count > 0
    best_done = jnp.argmax(done_scores, axis=1)
    best_live = jnp.argmax(live_scores, axis=1)
    pick = jnp.where(have_done, best_done, best_live)
    src = jnp.where(have_done[:, None, None], done_seqs, seqs)
    return jnp.take_along_axis(src, pick[:, None, None], axis=1)[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("model", "start_id", "end_id", "max_len", "beam_size",
                     "stop_when_harvested", "interpret"),
)
def fused_beam_search_decode(
    model,
    variables,
    memory: jnp.ndarray,
    *,
    start_id: int,
    end_id: int,
    max_len: int = 50,
    beam_size: int = 5,
    stop_when_harvested: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Beam search through the fused whole-step kernel: the B*K rows step in
    ONE pallas_call per token (the kernel already emits full logits —
    ops/fused_decode.py); top-k, harvest, and the parent-beam cache reorder
    stay in XLA.  Same algorithm as ``beam_search_decode`` by construction
    (shared ``_beam_select``); replaces the reference flagship inference
    feature (vit_transformer_model.py:327-420) on the TPU hot path."""
    from image_caption_tpu.ops import fused_decode as F

    b, k = memory.shape[0], beam_size
    # Expand memory to [B*K, S, d] with beams contiguous per batch element.
    mem = jnp.repeat(memory, k, axis=0)
    weights, ck, cv, s_len, kc, vc, bp = _fused_pack(model, variables, mem, max_len)
    bk = b * k
    seqs, live_scores, done_seqs, done_scores, done_count, live_count, stopped = (
        _beam_init(b, k, max_len, start_id)
    )
    cur = jnp.full((bk,), start_id, dtype=jnp.int32)
    # rows bk..bp are kernel padding: never read back, never reordered
    pad_cur = jnp.full((bp - bk,), start_id, dtype=jnp.int32)

    def cond(state):
        idx, _, _, _, _, _, live_count, stopped, _, _, _ = state
        return (idx < max_len - 1) & jnp.any((live_count > 0) & ~stopped)

    def body(state):
        (idx, seqs0, live_scores0, done_seqs0, done_scores0, done_count0,
         live_count0, stopped0, kc, vc, cur) = state
        cur_p = jnp.concatenate([cur, pad_cur]) if bp != bk else cur
        logits, _, kc, vc = F.fused_decode_step(
            cur_p, kc, vc, ck, cv, weights, idx,
            num_layers=model.num_decoder_layers, nheads=model.nhead,
            s_len=s_len, vocab=model.vocab_size, interpret=interpret,
        )
        logp = jax.nn.log_softmax(logits[:bk], axis=-1).reshape(b, k, -1)
        (seqs, live_scores, done_seqs, done_scores, done_count, live_count,
         stopped, beam_idx, word_idx) = _beam_select(
            idx, logp, seqs0, live_scores0, done_seqs0, done_scores0,
            done_count0, live_count0, stopped0, b=b, k=k, end_id=end_id,
            stop_when_harvested=stop_when_harvested,
        )
        # Parent-beam reorder of the flat self caches (global row = img*k +
        # parent); cross K/V are identical across beams of one image, so like
        # the layerwise _gather_cache they are never reordered.
        # Row-major cache layout [B, L, Lpad, d]: one beam row = one
        # contiguous L*Lpad*d chunk, so this gather is a straight row copy.
        # (The first layout, [L, B, ...], made it 2.25 ms/step — L strided
        # 64 KB chunks per row — vs 1.07 ms/step for the whole fused kernel;
        # measured via a temporary gather-disabled attribution build, PERF.md.)
        # (Measured at b=64, 320 rows: this batched take_along_axis and the
        # equivalent jnp.take(rowmap, axis=0) both cost ~1.5 ms/step — the
        # fused beam's dominant cost (the kernel itself is 1.07 ms/step); a
        # flattened take_along_axis is pathological (8+ ms/step, index
        # broadcast over the trailing 393 KB); the original [L, B, ...]
        # layout cost 2.25 ms/step.  PERF.md "Fused beam search".)
        def reorder(cache):
            shaped = cache[:bk].reshape(b, k, *cache.shape[1:])
            idx = beam_idx.reshape(b, k, *([1] * (cache.ndim - 1)))
            out = jnp.take_along_axis(shaped, idx, axis=1).reshape(bk, *cache.shape[1:])
            return jnp.concatenate([out, cache[bk:]]) if bp != bk else out

        kc = reorder(kc)
        vc = reorder(vc)
        cur = word_idx.reshape(bk)
        return (idx + 1, seqs, live_scores, done_seqs, done_scores, done_count,
                live_count, stopped, kc, vc, cur)

    state = (
        jnp.int32(0), seqs, live_scores, done_seqs, done_scores, done_count,
        live_count, stopped, kc, vc, cur,
    )
    _, seqs, live_scores, done_seqs, done_scores, done_count, _, _, _, _, _ = (
        jax.lax.while_loop(cond, body, state)
    )
    return _beam_pick(seqs, live_scores, done_seqs, done_scores, done_count)


@functools.partial(
    jax.jit,
    static_argnames=("model", "start_id", "end_id", "max_len", "beam_size",
                     "stop_when_harvested", "fused"),
)
def beam_search_decode(
    model,
    variables,
    memory: jnp.ndarray,
    *,
    start_id: int,
    end_id: int,
    max_len: int = 50,
    beam_size: int = 5,
    stop_when_harvested: bool = False,  # grid stop rule (grid:308); vit uses False
    fused: Optional[bool] = None,
) -> jnp.ndarray:
    """Batched beam search (no per-image Python recursion). Returns [B, max_len].

    ``fused``: None = auto-dispatch to the fused whole-step kernel (TPU
    single-device, compatible decoder geometry — same policy as
    ``greedy_decode``); False/True force the layerwise/fused path.
    """
    if fused is not False and (
        fused is True
        or (_fused_rows_ok(memory.shape[0] * beam_size)
            and _fused_spec(model, variables, memory) is not None)
    ):
        return fused_beam_search_decode(
            model, variables, memory, start_id=start_id, end_id=end_id,
            max_len=max_len, beam_size=beam_size,
            stop_when_harvested=stop_when_harvested,
        )
    init_cache, step = _apply_fns(model, variables)
    b, k = memory.shape[0], beam_size
    # Expand memory to [B*K, S, d] with beams contiguous per batch element.
    mem = jnp.repeat(memory, k, axis=0)
    cache = init_cache(mem, max_len)

    seqs, live_scores, done_seqs, done_scores, done_count, live_count, stopped = (
        _beam_init(b, k, max_len, start_id)
    )
    cur = jnp.full((b * k,), start_id, dtype=jnp.int32)

    def cond(state):
        idx, _, _, _, _, _, live_count, stopped, _, _ = state
        return (idx < max_len - 1) & jnp.any((live_count > 0) & ~stopped)

    def body(state):
        (idx, seqs0, live_scores0, done_seqs0, done_scores0, done_count0,
         live_count0, stopped0, cache, cur) = state
        logits, cache = step(cur, cache, idx)  # [B*K, Vp]
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, -1)
        (seqs, live_scores, done_seqs, done_scores, done_count, live_count,
         stopped, beam_idx, word_idx) = _beam_select(
            idx, logp, seqs0, live_scores0, done_seqs0, done_scores0,
            done_count0, live_count0, stopped0, b=b, k=k, end_id=end_id,
            stop_when_harvested=stop_when_harvested,
        )
        cache = _gather_cache(cache, beam_idx, b, k)
        cur = word_idx.reshape(b * k)
        return (idx + 1, seqs, live_scores, done_seqs, done_scores, done_count,
                live_count, stopped, cache, cur)

    state = (
        jnp.int32(0), seqs, live_scores, done_seqs, done_scores, done_count,
        live_count, stopped, cache, cur,
    )
    _, seqs, live_scores, done_seqs, done_scores, done_count, _, _, _, _ = jax.lax.while_loop(
        cond, body, state
    )
    return _beam_pick(seqs, live_scores, done_seqs, done_scores, done_count)


def generate(
    model,
    variables,
    memory: jnp.ndarray,
    *,
    start_id: int,
    end_id: int,
    max_len: int = 50,
    method: str = "greedy",
    beam_size: int = 5,
    stop_when_harvested: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Reference ``model.generate`` surface (vit:276-294)."""
    if method == "greedy":
        return greedy_decode(model, variables, memory, start_id=start_id, end_id=end_id, max_len=max_len)
    if method == "beam_search":
        return beam_search_decode(
            model,
            variables,
            memory,
            start_id=start_id,
            end_id=end_id,
            max_len=max_len,
            beam_size=beam_size,
            stop_when_harvested=stop_when_harvested,
        )
    if method == "sample":
        if rng is None:
            raise ValueError("method='sample' requires rng")
        return sample_decode(
            model, variables, memory, rng, start_id=start_id, end_id=end_id, max_len=max_len
        )[0]
    raise ValueError(f"Unknown generation method: {method}")
