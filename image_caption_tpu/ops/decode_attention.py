"""Pallas flash-decoding kernel for the KV-cached single-token attention step.

Replaces torch MHA on the decode hot path (SURVEY §2.8 row 1; reference
re-ran full-prefix attention per token, vit_transformer_model.py:296-325).

Why this kernel wins where the generic flash kernel didn't: at bench shapes
(B=256, L=64, d=512) the decode step is HBM-bandwidth-bound, and the XLA path
must read the ENTIRE K/V cache every step because the `pos > index` mask is
applied after the reads.  Here `index` arrives as a scalar-prefetch argument
and the cache-length loop runs INSIDE the kernel with a dynamic trip count
(``index // BLK + 1``) and manual double-buffered HBM->VMEM DMA — cache
blocks past the decode index are provably never fetched, cutting K/V traffic
to ceil((index+1)/BLK)/ceil(L/BLK) of the XLA path (≈2x less averaged over a
full 52-step decode, ~4x less on early steps).  Compute is VPU-only
(per-head dot products + online softmax) — irrelevant next to the DMAs.

The caches are stored FLAT [B, L, H*Dh] (SelfAttention.init_cache) — exactly
the layout this kernel consumes, so the loop-carried buffers never need a
layout copy before the call (an earlier pipelined-grid variant paid one full
cache copy per call and lost to XLA because of it).

Semantics match ops/attention.py::mha_reference for the decode-step case
(single query, keys masked at positions > index): 1/sqrt(Dh) scaling and
softmax statistics in f32; probabilities stay f32 in the PV accumulation
(strictly more accurate than the reference's bf16-probs cast;
tolerance-tested in tests/test_decode_attention.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

BLK = 16  # cache-length block (== bf16 sublane tile)
_NEG_INF = -1e30


def _make_kernel(nheads: int, head_dim: int, tile_b: int, scale: float):
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, q_ref, k_hbm, v_hbm, o_ref, acc_ref, m_ref, l_ref, kbuf, vbuf, sems):
        i = pl.program_id(0)
        idx = idx_ref[0]
        nblk = idx // BLK + 1
        row0 = i * tile_b

        def k_dma(slot, blk):
            return pltpu.make_async_copy(
                k_hbm.at[pl.ds(row0, tile_b), pl.ds(blk * BLK, BLK), :],
                kbuf.at[slot],
                sems.at[slot, 0],
            )

        def v_dma(slot, blk):
            return pltpu.make_async_copy(
                v_hbm.at[pl.ds(row0, tile_b), pl.ds(blk * BLK, BLK), :],
                vbuf.at[slot],
                sems.at[slot, 1],
            )

        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        k_dma(0, 0).start()
        v_dma(0, 0).start()

        def body(blk, carry):
            slot = lax.rem(blk, 2)
            nxt = lax.rem(blk + 1, 2)

            @pl.when(blk + 1 < nblk)
            def _prefetch():
                k_dma(nxt, blk + 1).start()
                v_dma(nxt, blk + 1).start()

            k_dma(slot, blk).wait()
            v_dma(slot, blk).wait()

            pos = blk * BLK + lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
            valid = pos <= idx  # [1, BLK]
            # per-head slices of the lane dim (Mosaic cannot re-tile the
            # 512-lane minor into [..., H, Dh], so heads stay a loop)
            for h in range(nheads):
                hs = slice(h * head_dim, (h + 1) * head_dim)
                q_h = q_ref[:, hs].astype(jnp.float32)            # [TB, Dh]
                k_h = kbuf[slot][:, :, hs].astype(jnp.float32)    # [TB, BLK, Dh]
                scores = jnp.sum(q_h[:, None, :] * k_h, axis=-1) * scale
                scores = jnp.where(valid, scores, _NEG_INF)       # [TB, BLK]
                m_old = m_ref[:, h : h + 1]                       # [TB, 1]
                m_new = jnp.maximum(m_old, jnp.max(scores, axis=1, keepdims=True))
                alpha = jnp.exp(m_old - m_new)
                p = jnp.exp(scores - m_new)                       # [TB, BLK] f32
                l_ref[:, h : h + 1] = l_ref[:, h : h + 1] * alpha + jnp.sum(
                    p, axis=1, keepdims=True
                )
                # f32 probs x f32-upcast values (Mosaic can't insert a minor
                # dim on 16-bit vectors; f32 probs are strictly more accurate
                # than mha_reference's bf16-probs cast)
                pv = jnp.sum(
                    p[:, :, None] * vbuf[slot][:, :, hs].astype(jnp.float32), axis=1
                )
                acc_ref[:, hs] = acc_ref[:, hs] * alpha + pv
                m_ref[:, h : h + 1] = m_new
            return carry

        lax.fori_loop(0, nblk, body, 0)
        for h in range(nheads):
            hs = slice(h * head_dim, (h + 1) * head_dim)
            o_ref[:, hs] = (acc_ref[:, hs] / l_ref[:, h : h + 1]).astype(o_ref.dtype)

    return kernel


def _pick_tile_b(b: int) -> int:
    """Largest batch tile <=128 that divides ``b`` exactly (multiple of 8).

    The grid's last tile issues a manual HBM DMA at ``row0 = i * tile_b``; a
    tile that does not divide ``b`` would read past the end of the cache (the
    slice start gets clamped, silently attending to the wrong rows' K/V — e.g.
    B=192 with tile 128 corrupted rows 128-191).  Exact divisors keep every
    DMA in bounds.  ``b`` is a multiple of 8 by the dispatch contract.
    """
    tile = 8
    for t in range(16, 129, 8):
        if b % t == 0:
            tile = t
    return tile


@functools.partial(jax.jit, static_argnames=("nheads", "interpret"))
def _decode_attention_pallas(q, k_cache, v_cache, index, *, nheads, interpret=False):
    """q [B, 1, H, Dh]; caches FLAT [B, L, H*Dh] (the kernel's native layout)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, l, hd = k_cache.shape
    assert b % 8 == 0, f"kernel batch must be sublane-aligned (got {b}); pad first"
    h, dh = nheads, hd // nheads
    q2 = q.reshape(b, hd)
    tile_b = _pick_tile_b(b)
    nb = b // tile_b
    scale = 1.0 / (dh**0.5)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tile_b, hd), lambda i, idx: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # K cache stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # V cache stays in HBM
        ],
        out_specs=pl.BlockSpec((tile_b, hd), lambda i, idx: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((tile_b, hd), jnp.float32),                 # acc
            pltpu.VMEM((tile_b, h), jnp.float32),                  # running max
            pltpu.VMEM((tile_b, h), jnp.float32),                  # running denom
            pltpu.VMEM((2, tile_b, BLK, hd), k_cache.dtype),       # K double buffer
            pltpu.VMEM((2, tile_b, BLK, hd), v_cache.dtype),       # V double buffer
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(nheads, dh, tile_b, scale),
        out_shape=jax.ShapeDtypeStruct((b, hd), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray([index], jnp.int32), q2, k_cache, v_cache)
    return out.reshape(b, 1, h, dh)


def _use_pallas(batch: int) -> bool:
    """On by default on TPU (ICT_DISABLE_PALLAS=1 to opt out).

    Aligned batches (b % 8 == 0) run the kernel directly.  Sub-8 batches —
    the interactive b=1 latency case — are padded to one 8-row tile by
    ``_padded_pallas`` (the pad copies a <=7-row sliver of cache, negligible
    next to the weight reads that dominate small-batch decode).  Mid-size
    ragged batches (e.g. 12, 100) fall back to XLA: padding them would copy
    the whole K/V cache every step, spending the very HBM traffic the kernel
    exists to save (and the eval tail batch is padded at the driver level, so
    ragged shapes are rare).
    """
    if os.environ.get("ICT_DISABLE_PALLAS", "0") == "1":
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    return batch % 8 == 0 or batch < 8


def _padded_pallas(q, k_cache, v_cache, index, *, nheads, interpret=False):
    """Pad a sub-8 batch to one sublane tile, run the kernel, slice back.

    Padded rows are all-zero: their scores are 0 at valid positions, so the
    online softmax stays finite (l >= 1 because position 0 is always valid);
    the rows are dropped before returning.
    """
    b = q.shape[0]
    pad = (-b) % 8
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0), (0, 0)))
        k_cache = jnp.pad(k_cache, ((0, pad), (0, 0), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, pad), (0, 0), (0, 0)))
    out = _decode_attention_pallas(q, k_cache, v_cache, index, nheads=nheads, interpret=interpret)
    return out[:b] if pad else out


def decode_attention(
    q: jnp.ndarray,          # [B, 1, H, Dh] single query token
    k_cache: jnp.ndarray,    # [B, L, H*Dh] (flat — SelfAttention.init_cache layout)
    v_cache: jnp.ndarray,    # [B, L, H*Dh]
    index,                   # scalar int32: current position (keys at pos > index are masked)
    nheads: int,
) -> jnp.ndarray:
    """Single-token cached attention; returns [B, 1, H, Dh]."""
    if _use_pallas(q.shape[0]):
        return _padded_pallas(q, k_cache, v_cache, index, nheads=nheads)
    from image_caption_tpu.ops.attention import mha_reference

    b, l, hd = k_cache.shape
    dh = hd // nheads
    mask = jnp.broadcast_to(jnp.arange(l)[None, :] > index, (b, l))
    return mha_reference(
        q,
        k_cache.reshape(b, l, nheads, dh),
        v_cache.reshape(b, l, nheads, dh),
        causal=False,
        kv_padding_mask=mask,
    )
