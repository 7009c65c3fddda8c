"""Fused greedy-decode step: the ENTIRE token step in one Pallas kernel.

Round-3 profiling (PERF.md "Where the time goes") showed the 52-step decode
loop bounded by per-op dispatch latency: ~60 small XLA ops per step cost
~0.34 ms while the analytic HBM-traffic bound is ~0.1 ms.  Neither traffic
reduction (flash-decoding kernel, bf16 weight stream) nor loop unrolling
moved it, because the op COUNT was the bottleneck.  This kernel removes it:
one ``pallas_call`` per token computes

    token embedding (+PE)  ->  6 x [qkv -> cached flash self-attn ->
    cross-attn over memory -> FFN, each + residual + post-LN]  ->
    f32 vocab head -> argmax

with the new self-attention K/V rows emitted per layer (scattered into the
HBM caches by one XLA dynamic_update_slice per cache — Mosaic cannot
DMA-write a 1-row slice at a dynamic position of a tiled HBM memref, and the
row traffic is noise), decoder weights streamed HBM->VMEM
per weight-kind behind a semaphore pipeline (weights do not fit VMEM: ~44 MB
bf16 vs ~16 MB; each kind's next-layer DMA starts right after its last use,
overlapping the rest of the layer's compute), and the self-attn cache loop
fetching only blocks at positions < index (the same dynamic-trip-count DMA
loop as ops/decode_attention.py).  Batches larger than one 64-row tile loop
tiles INSIDE the kernel, layer-major, so weights are still read exactly once
per step.

Numerics mirror the XLA path op-for-op so greedy tokens match:
- every Dense: bf16 x bf16 matmul, f32 accumulate, round to bf16, add bf16
  bias (what flax Dense + XLA emit)
- embedding: ``bf16(embed_f32 * sqrt(d))`` rows are precomputed at pack time,
  so the in-kernel one-hot matmul reproduces the gather bit-exactly; the PE
  row adds in bf16 (models/decoder.py::_embed)
- LayerNorm: flax recipe in f32 — mu, mu2, var = max(0, mu2 - mu^2),
  y = (x - mu) * (rsqrt(var + eps) * scale) + bias
- attention: f32 scores/softmax statistics; self-attn keeps f32 probs in the
  PV accumulation (the flash-decoding kernel's numerics — that kernel IS the
  layerwise cached-self-attn path); cross-attn uses a two-pass EXACT softmax
  whose normalized probs are rounded to bf16 before PV, the precise value
  mha_reference feeds its einsum (see ``attend``'s docstring — this bf16
  rounding, not reduction order, dominated the round-4 ViT divergence);
  1/sqrt(Dh) scale
- vocab head: f32 input x f32 weights, padded columns forced to -1e30
  (decoder.py::_logits), argmax ties break toward the lower index

Reduction orders (LayerNorm sums, online vs full softmax) can differ from
XLA at float-noise level; on-TPU token identity vs the layerwise path is
asserted empirically in tests/bench (PERF.md records the measured rate).

Replaces: the decode hot path of the reference
(vit_transformer_model.py:296-325), which re-ran the full decoder stack per
token from Python.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from image_caption_tpu.models.layers import sinusoidal_position_encoding

BLK = 16  # cache/memory block (bf16 sublane tile), shared with decode_attention
TILE_B = 64  # batch rows per in-kernel tile
_CHUNK_D = 256  # d-chunk for f32 attention temporaries (scoped-VMEM budget)
_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class FusedWeights(NamedTuple):
    """Stacked per-layer decoder weights in kernel layout (leading dim = layer)."""

    embed: jnp.ndarray     # [Vp, d] bf16 — bf16(embedding * sqrt(d)), zero-padded rows
    pe: jnp.ndarray        # [Lpad, d] bf16 — bf16(sinusoidal PE)
    qkv_w: jnp.ndarray     # [L, d, 3d] bf16
    qkv_b: jnp.ndarray     # [L, 3d] bf16
    out_w: jnp.ndarray     # [L, d, d] bf16
    out_b: jnp.ndarray     # [L, d] bf16
    q_w: jnp.ndarray       # [L, d, d] bf16
    q_b: jnp.ndarray       # [L, d] bf16
    co_w: jnp.ndarray      # [L, d, d] bf16 (cross-attn out)
    co_b: jnp.ndarray      # [L, d] bf16
    l1_w: jnp.ndarray      # [L, d, F] bf16
    l1_b: jnp.ndarray      # [L, F] bf16
    l2_w: jnp.ndarray      # [L, F, d] bf16
    l2_b: jnp.ndarray      # [L, d] bf16
    ln_s: jnp.ndarray      # [3, L, d] f32 (norm1/2/3 scale)
    ln_b: jnp.ndarray      # [3, L, d] f32 (norm1/2/3 bias)
    fc_w: jnp.ndarray      # [d, Vp] f32
    fc_b: jnp.ndarray      # [1, Vp] f32


def _dig(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def pack_weights(decoder_params: Dict[str, Any], *, num_layers: int, d_model: int,
                 vocab_size: int, padded_vocab: int, max_len: int) -> FusedWeights:
    """Flax decoder params -> stacked kernel layout (pure jnp; jit-safe)."""
    p = decoder_params
    bf = jnp.bfloat16

    def stack(path, dtype=bf):
        return jnp.stack(
            [jnp.asarray(_dig(p[f"layer_{i}"], path), dtype) for i in range(num_layers)]
        )

    embed = jnp.asarray(p["embedding"]["embedding"], jnp.float32) * math.sqrt(d_model)
    embed = jnp.pad(embed.astype(bf), ((0, padded_vocab - vocab_size), (0, 0)))
    lpad = _round_up(max_len, BLK)
    pe = sinusoidal_position_encoding(lpad, d_model).astype(bf)
    return FusedWeights(
        embed=embed,
        pe=pe,
        qkv_w=stack(("self_attn", "qkv", "kernel")),
        qkv_b=stack(("self_attn", "qkv", "bias")),
        out_w=stack(("self_attn", "out", "kernel")),
        out_b=stack(("self_attn", "out", "bias")),
        q_w=stack(("cross_attn", "q_proj", "kernel")),
        q_b=stack(("cross_attn", "q_proj", "bias")),
        co_w=stack(("cross_attn", "out", "kernel")),
        co_b=stack(("cross_attn", "out", "bias")),
        l1_w=stack(("ffn", "linear1", "kernel")),
        l1_b=stack(("ffn", "linear1", "bias")),
        l2_w=stack(("ffn", "linear2", "kernel")),
        l2_b=stack(("ffn", "linear2", "bias")),
        ln_s=jnp.stack([stack((f"norm{k}", "scale"), jnp.float32) for k in (1, 2, 3)]),
        ln_b=jnp.stack([stack((f"norm{k}", "bias"), jnp.float32) for k in (1, 2, 3)]),
        fc_w=jnp.asarray(p["fc_out"]["kernel"], jnp.float32),
        fc_b=jnp.asarray(p["fc_out"]["bias"], jnp.float32)[None, :],
    )


def pack_cross_kv(decoder_params: Dict[str, Any], memory: jnp.ndarray, *,
                  num_layers: int) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Per-layer cross K/V from encoder memory, stacked [B, L, Spad, d] bf16.

    Same values CrossAttention.memory_kv computes (models/layers.py:145-148),
    kept FLAT and padded to a BLK multiple; padded positions are masked in the
    kernel by the true length S.  Layout is ROW-major (batch leading, layer
    second) like the self caches — one row = one contiguous chunk, which is
    what makes the beam-search parent reorder a straight row gather.
    """
    _, s, _ = memory.shape
    mem = memory.astype(jnp.bfloat16)
    ks, vs = [], []
    for i in range(num_layers):
        p_l = decoder_params[f"layer_{i}"]["cross_attn"]["kv_proj"]
        w = jnp.asarray(p_l["kernel"], jnp.bfloat16)
        bias = jnp.asarray(p_l["bias"], jnp.bfloat16)
        kv = jnp.dot(mem, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16) + bias
        k, v = jnp.split(kv, 2, axis=-1)
        ks.append(k)
        vs.append(v)
    spad = _round_up(s, BLK)
    ck = jnp.pad(jnp.stack(ks, axis=1), ((0, 0), (0, 0), (0, spad - s), (0, 0)))
    cv = jnp.pad(jnp.stack(vs, axis=1), ((0, 0), (0, 0), (0, spad - s), (0, 0)))
    return ck, cv, s


def init_fused_cache(batch: int, max_len: int, d_model: int, num_layers: int):
    """Zeroed stacked self-attn caches [B, L, Lpad, d] bf16 (k, v) — row-major
    so a beam reorder gathers whole contiguous rows."""
    lpad = _round_up(max_len, BLK)
    z = jnp.zeros((batch, num_layers, lpad, d_model), jnp.bfloat16)
    return z, jnp.copy(z)


def _make_kernel(num_layers: int, nheads: int, head_dim: int,
                 tile_b: int, ntiles: int, s_len: int, s_pad: int,
                 vocab: int, vpad: int):
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = nheads * head_dim
    scale = 1.0 / (head_dim ** 0.5)
    bf = jnp.bfloat16
    n_cross_blk = s_pad // BLK
    W_KINDS = 6  # 0 qkv, 1 out, 2 q, 3 co, 4 l1, 5 l2

    def layer_norm(xf, scale_row, bias_row):
        # flax _compute_stats/_normalize, f32, use_fast_variance=True
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        mul = lax.rsqrt(var + 1e-5) * scale_row
        return (xf - mu) * mul + bias_row

    def kernel(idx_ref, tok_ref,                        # SMEM scalar, VMEM tokens
               embed_ref, pe_row_ref, fc_w_ref, fc_b_ref,  # resident VMEM
               ln_s_ref, ln_b_ref,
               qkv_b_ref, out_b_ref, q_b_ref, co_b_ref, l1_b_ref, l2_b_ref,
               qkv_w_hbm, out_w_hbm, q_w_hbm, co_w_hbm, l1_w_hbm, l2_w_hbm,
               ck_hbm, cv_hbm, kc_hbm, vc_hbm,          # HBM cross K/V + self caches
               logits_ref, next_ref, knew_ref, vnew_ref,  # outputs
               x_all, kbuf, vbuf,
               qkv_buf, out_buf, q_buf, co_buf, l1_buf, l2_buf,
               w_sems, kv_sems):
        # The self caches are READ-ONLY here.  The new K/V row for position
        # ``idx`` is returned per layer in knew/vnew [L, B, d] and scattered
        # into the caches by one XLA dynamic_update_slice per cache outside
        # the kernel: Mosaic cannot DMA-write a 1-row slice at a dynamic
        # position of a (8,128)-tiled HBM memref.  Attention still sees the
        # current token via the cur_k/cur_v fold-in below.
        idx = idx_ref[0, 0]
        nblk_self = (idx + BLK - 1) // BLK  # blocks covering pos < idx

        w_bufs = (qkv_buf, out_buf, q_buf, co_buf, l1_buf, l2_buf)
        w_hbms = (qkv_w_hbm, out_w_hbm, q_w_hbm, co_w_hbm, l1_w_hbm, l2_w_hbm)

        def w_dma(kind, layer):
            return pltpu.make_async_copy(
                w_hbms[kind].at[layer], w_bufs[kind], w_sems.at[kind]
            )

        # warm up: stream layer 0's weights
        for kind in range(W_KINDS):
            w_dma(kind, 0).start()

        # ---- embedding + PE (exact-parity one-hot matmul over bf16 rows) ----
        onehot = (
            lax.broadcasted_iota(jnp.int32, (tile_b * ntiles, vpad), 1) == tok_ref[:]
        ).astype(bf)
        x = jnp.dot(onehot, embed_ref[:], preferred_element_type=jnp.float32).astype(bf)
        # PE row for position idx is sliced OUTSIDE the kernel (Mosaic cannot
        # vector.load a dynamically-indexed single bf16 row from VMEM)
        x_all[:] = x + pe_row_ref[:]

        # Constant 0/1 head matrices: HS [d, H] sums each head's 64 lanes via
        # ONE MXU matmul (a cross-LANE reduction is ~10x slower on the VPU —
        # the round-3 per-head loop spent 80% of the kernel there); HE [H, d]
        # broadcasts per-head scalars back across the head's lanes, also MXU.
        _dr = lax.broadcasted_iota(jnp.int32, (d, nheads), 0)
        _hc = lax.broadcasted_iota(jnp.int32, (d, nheads), 1)
        head_sum = (_dr // head_dim == _hc).astype(jnp.float32)
        head_expand = head_sum.T

        def attend(q_rows, kv_k_hbm, kv_v_hbm, layer, row0, nblk,
                   valid_len, cur_k=None, cur_v=None, exact=False):
            """Attention of q_rows [TB, d] over blocked HBM K/V.

            ``fori_loop``s over KV blocks (single body trace — unrolling
            the blocks in Python made Mosaic keep every block's temporaries
            alive on the scoped-VMEM stack, OOMing at ViT's 13 cross blocks).
            Per block, QK contracts per head via one MXU matmul against the
            constant 0/1 ``head_sum`` [d, H] (a cross-LANE reduce on the VPU
            was 10x slower); PV expands probs back across each head's lanes
            with ``head_expand`` on the MXU and reduces over the cheap
            sublane axis.  Optionally folds in the current token's K/V held
            in VMEM (its cache row is scattered after the kernel).

            ``exact=False`` (self-attn): online softmax, f32 probs in the PV
            accumulation — the flash-decoding kernel's numerics
            (ops/decode_attention.py), which IS the layerwise default path
            for cached self-attn, so greedy tokens match it.

            ``exact=True`` (cross-attn): two passes.  Pass A computes the
            global softmax statistics (K DMA + QK only); pass B recomputes
            the scores (cheaper than storing them — a [.., H] f32 scratch
            pads H=8 lanes to 128, a 16x VMEM waste), normalizes with the
            GLOBAL stats, and rounds the normalized probabilities to bf16 —
            the exact value the layerwise path feeds its PV einsum
            (``probs.astype(v.dtype)`` in ops/attention.py::mha_reference).
            Round 4 kept f32 probs here ("strictly more accurate"), but more
            accurate is not identical: the ~2^-9 bf16 rounding of the probs
            was the dominant fused-vs-layerwise logit delta (0.08 at ViT's
            196-token span), flipping near-tie argmaxes.  With it matched,
            the remaining divergence is f32 sum-order noise (~1e-7 relative).
            """

            def k_dma(slot, blk):
                return pltpu.make_async_copy(
                    kv_k_hbm.at[pl.ds(row0, tile_b), layer, pl.ds(blk * BLK, BLK), :],
                    kbuf.at[slot], kv_sems.at[slot, 0],
                )

            def v_dma(slot, blk):
                return pltpu.make_async_copy(
                    kv_v_hbm.at[pl.ds(row0, tile_b), layer, pl.ds(blk * BLK, BLK), :],
                    vbuf.at[slot], kv_sems.at[slot, 1],
                )

            def qk(slot, blk):
                """Masked scaled scores for one K block: [TB, BLK, H] f32."""
                s_blk = None
                for c0 in range(0, d, _CHUNK_D):
                    cw = min(_CHUNK_D, d - c0)
                    pp = (q_rows[:, c0:c0 + cw].astype(jnp.float32)[:, None, :]
                          * kbuf[slot][:, :, c0:c0 + cw].astype(jnp.float32))
                    part = jnp.dot(
                        pp.reshape(tile_b * BLK, cw), head_sum[c0:c0 + cw, :],
                        preferred_element_type=jnp.float32,
                    )
                    s_blk = part if s_blk is None else s_blk + part
                s_blk = (s_blk * scale).reshape(tile_b, BLK, nheads)
                pos = blk * BLK + lax.broadcasted_iota(jnp.int32, (1, BLK, 1), 1)
                return jnp.where(pos < valid_len, s_blk, _NEG_INF)

            def pv(pr_flat, slot):
                """Probs [TB*BLK, H] f32 -> weighted V sum [TB, d] (chunked MXU)."""
                out = None
                for c0 in range(0, d, _CHUNK_D):
                    cw = min(_CHUNK_D, d - c0)
                    w = jnp.dot(
                        pr_flat, head_expand[:, c0:c0 + cw],
                        preferred_element_type=jnp.float32,
                    ).reshape(tile_b, BLK, cw)
                    part = jnp.sum(
                        w * vbuf[slot][:, :, c0:c0 + cw].astype(jnp.float32), axis=1
                    )
                    out = part if out is None else jnp.concatenate([out, part], axis=-1)
                return out

            m0 = jnp.full((tile_b, nheads), _NEG_INF, jnp.float32)
            l0 = jnp.zeros((tile_b, nheads), jnp.float32)
            a0 = jnp.zeros((tile_b, d), jnp.float32)

            if exact:
                assert cur_k is None, "exact path serves cross-attn (no current-token fold-in)"

                @pl.when(nblk > 0)
                def _start_a():
                    k_dma(0, 0).start()

                def blk_stats(blk, carry):
                    m_old, l_old = carry
                    slot = lax.rem(blk, 2)

                    @pl.when(blk + 1 < nblk)
                    def _prefetch():
                        k_dma(lax.rem(blk + 1, 2), blk + 1).start()

                    k_dma(slot, blk).wait()
                    s_blk = qk(slot, blk)
                    m_new = jnp.maximum(m_old, jnp.max(s_blk, axis=1))
                    alpha = jnp.exp(m_old - m_new)
                    l_new = l_old * alpha + jnp.sum(jnp.exp(s_blk - m_new[:, None, :]), axis=1)
                    return m_new, l_new

                # m is the EXACT global max (max is order-invariant); l's add
                # order differs from XLA's flat sum at f32-last-bit level only,
                # 4 decades below the bf16 prob rounding applied next.
                m, l = lax.fori_loop(0, nblk, blk_stats, (m0, l0))

                @pl.when(nblk > 0)
                def _start_b():
                    k_dma(0, 0).start()
                    v_dma(0, 0).start()

                def blk_pv(blk, acc):
                    slot = lax.rem(blk, 2)

                    @pl.when(blk + 1 < nblk)
                    def _prefetch():
                        k_dma(lax.rem(blk + 1, 2), blk + 1).start()
                        v_dma(lax.rem(blk + 1, 2), blk + 1).start()

                    k_dma(slot, blk).wait()
                    s_blk = qk(slot, blk)
                    # normalized probs, rounded to bf16 = mha_reference's value
                    pr = (jnp.exp(s_blk - m[:, None, :]) / l[:, None, :]).astype(bf)
                    v_dma(slot, blk).wait()
                    pr_flat = pr.astype(jnp.float32).reshape(tile_b * BLK, nheads)
                    return acc + pv(pr_flat, slot)

                out = lax.fori_loop(0, nblk, blk_pv, a0)
                return out.astype(bf)

            @pl.when(nblk > 0)
            def _start():
                k_dma(0, 0).start()
                v_dma(0, 0).start()

            def blk_body(blk, carry):
                m_old, l_old, acc_old = carry
                slot = lax.rem(blk, 2)

                @pl.when(blk + 1 < nblk)
                def _prefetch():
                    k_dma(lax.rem(blk + 1, 2), blk + 1).start()
                    v_dma(lax.rem(blk + 1, 2), blk + 1).start()

                k_dma(slot, blk).wait()
                s_blk = qk(slot, blk)

                m_new = jnp.maximum(m_old, jnp.max(s_blk, axis=1))   # [TB, H]
                alpha = jnp.exp(m_old - m_new)
                pr_blk = jnp.exp(s_blk - m_new[:, None, :])          # [TB, BLK, H]
                l_new = l_old * alpha + jnp.sum(pr_blk, axis=1)

                v_dma(slot, blk).wait()
                alpha_d = jnp.dot(alpha, head_expand,
                                  preferred_element_type=jnp.float32)  # [TB, d]
                pr_flat = pr_blk.reshape(tile_b * BLK, nheads)
                return m_new, l_new, acc_old * alpha_d + pv(pr_flat, slot)

            m, l, out = lax.fori_loop(0, nblk, blk_body, (m0, l0, a0))

            if cur_k is not None:
                ppc = q_rows.astype(jnp.float32) * cur_k.astype(jnp.float32)
                s_cur = jnp.dot(ppc, head_sum,
                                preferred_element_type=jnp.float32) * scale  # [TB, H]
                m_new = jnp.maximum(m, s_cur)
                alpha = jnp.exp(m - m_new)
                pr_cur = jnp.exp(s_cur - m_new)
                l = l * alpha + pr_cur
                alpha_d = jnp.dot(alpha, head_expand,
                                  preferred_element_type=jnp.float32)
                wc = jnp.dot(pr_cur, head_expand, preferred_element_type=jnp.float32)
                out = out * alpha_d + wc * cur_v.astype(jnp.float32)

            inv = jnp.dot(1.0 / l, head_expand,
                          preferred_element_type=jnp.float32)        # [TB, d]
            return (out * inv).astype(bf)

        def bias_row(ref, layer):
            return ref[pl.ds(layer, 1), :]  # [1, n] broadcasts over rows

        def ln_rows(layer, which):
            return (
                ln_s_ref[which, pl.ds(layer, 1), :],
                ln_b_ref[which, pl.ds(layer, 1), :],
            )

        # The layer loop is PYTHON-UNROLLED (num_layers is static): Mosaic
        # requires static indices for the per-layer bias/LN row loads from
        # VMEM, and static `layer` also makes every weight-DMA source slice
        # static.  6 layers x <=4 tiles of straight-line body compiles fine.
        for layer in range(num_layers):
            for t in range(ntiles):
                row0 = t * tile_b
                x_t = x_all[pl.ds(row0, tile_b), :]

                # -- self-attention ------------------------------------------
                if t == 0:
                    w_dma(0, layer).wait()
                qkv = jnp.dot(x_t, qkv_buf[:], preferred_element_type=jnp.float32
                              ).astype(bf) + bias_row(qkv_b_ref, layer)
                q_rows, k_row, v_row = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
                knew_ref[layer, pl.ds(row0, tile_b), :] = k_row
                vnew_ref[layer, pl.ds(row0, tile_b), :] = v_row
                o = attend(q_rows, kc_hbm, vc_hbm, layer, row0,
                           nblk_self, idx, cur_k=k_row, cur_v=v_row)
                if t == ntiles - 1:
                    if layer + 1 < num_layers:
                        w_dma(0, layer + 1).start()
                    w_dma(1, layer).wait()
                delta = jnp.dot(o, out_buf[:], preferred_element_type=jnp.float32
                                ).astype(bf) + bias_row(out_b_ref, layer)
                if t == ntiles - 1 and layer + 1 < num_layers:
                    w_dma(1, layer + 1).start()
                xf = (x_t + delta).astype(jnp.float32)
                s_r, b_r = ln_rows(layer, 0)
                x_t = layer_norm(xf, s_r, b_r).astype(bf)

                # -- cross-attention -----------------------------------------
                if t == 0:
                    w_dma(2, layer).wait()
                q2 = jnp.dot(x_t, q_buf[:], preferred_element_type=jnp.float32
                             ).astype(bf) + bias_row(q_b_ref, layer)
                if t == ntiles - 1 and layer + 1 < num_layers:
                    w_dma(2, layer + 1).start()
                # Exact two-pass softmax only where it matters: spans beyond
                # engine._FUSED_SPAN_LIMIT (=64; ViT's 196), where bf16-prob
                # rounding parity with mha_reference reduces near-tie argmax
                # flips (0.986->0.992 measured).  Short spans (grid: 49) are
                # identity-certified 1.0/1.0 on the online f32-probs path,
                # and the exact path's second QK+K-DMA sweep costs ~10% of
                # the whole decode step there — pure loss.
                o2 = attend(q2, ck_hbm, cv_hbm, layer, row0, n_cross_blk, s_len,
                            exact=(s_pad > 64))
                if t == 0:
                    w_dma(3, layer).wait()
                delta2 = jnp.dot(o2, co_buf[:], preferred_element_type=jnp.float32
                                 ).astype(bf) + bias_row(co_b_ref, layer)
                if t == ntiles - 1 and layer + 1 < num_layers:
                    w_dma(3, layer + 1).start()
                xf = (x_t + delta2).astype(jnp.float32)
                s_r, b_r = ln_rows(layer, 1)
                x_t = layer_norm(xf, s_r, b_r).astype(bf)

                # -- FFN ------------------------------------------------------
                if t == 0:
                    w_dma(4, layer).wait()
                h1 = jnp.dot(x_t, l1_buf[:], preferred_element_type=jnp.float32
                             ).astype(bf) + bias_row(l1_b_ref, layer)
                h1 = jnp.maximum(h1, jnp.zeros_like(h1))
                if t == ntiles - 1 and layer + 1 < num_layers:
                    w_dma(4, layer + 1).start()
                if t == 0:
                    w_dma(5, layer).wait()
                delta3 = jnp.dot(h1, l2_buf[:], preferred_element_type=jnp.float32
                                 ).astype(bf) + bias_row(l2_b_ref, layer)
                if t == ntiles - 1 and layer + 1 < num_layers:
                    w_dma(5, layer + 1).start()
                xf = (x_t + delta3).astype(jnp.float32)
                s_r, b_r = ln_rows(layer, 2)
                x_all[pl.ds(row0, tile_b), :] = layer_norm(xf, s_r, b_r).astype(bf)


        # ---- vocab head + argmax (f32, padded cols -> -1e30) ----------------
        for t in range(ntiles):
            row0 = t * tile_b
            xf = x_all[pl.ds(row0, tile_b), :].astype(jnp.float32)
            lg = jnp.dot(xf, fc_w_ref[:], preferred_element_type=jnp.float32) + fc_b_ref[:]
            cols = lax.broadcasted_iota(jnp.int32, (tile_b, vpad), 1)
            lg = jnp.where(cols < vocab, lg, _NEG_INF)
            logits_ref[pl.ds(row0, tile_b), :] = lg
            mx = jnp.max(lg, axis=-1, keepdims=True)
            pick = jnp.where(lg == mx, cols, vpad)
            next_ref[pl.ds(row0, tile_b), :] = jnp.min(pick, axis=-1, keepdims=True)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_layers", "nheads", "s_len", "vocab", "interpret"),
)
def fused_decode_step(
    tok: jnp.ndarray,          # [B] int32 current tokens
    k_cache: jnp.ndarray,      # [B, L, Lpad, d] bf16 (read-only; row `index` updated via DUS after the kernel)
    v_cache: jnp.ndarray,      # [B, L, Lpad, d] bf16 (read-only; row `index` updated via DUS after the kernel)
    cross_k: jnp.ndarray,      # [B, L, Spad, d] bf16
    cross_v: jnp.ndarray,      # [B, L, Spad, d] bf16
    weights: FusedWeights,
    index,                     # scalar int32 decode position
    *,
    num_layers: int,
    nheads: int,
    s_len: int,
    vocab: int,
    interpret: bool = False,
):
    """One fused decode step.  Returns (logits [B, Vp] f32, next_tok [B] i32,
    k_cache, v_cache) with position ``index`` of the caches updated (the
    kernel emits the new K/V rows; one XLA dynamic_update_slice per cache
    scatters them — in-place inside the decode while_loop).

    ``B`` must be a multiple of 16 (bf16 sublane tile); the engine pads.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, L, lpad, d = k_cache.shape
    assert L == num_layers and b % BLK == 0, (L, b)
    head_dim = d // nheads
    s_pad = cross_k.shape[2]
    vpad = weights.embed.shape[0]
    ffn = weights.l1_w.shape[2]
    # largest 16-multiple tile <= TILE_B that divides b exactly (b is a
    # 16-multiple by the engine's pad contract; e.g. b=80 -> 5 tiles of 16)
    tile_b = BLK
    for t in range(BLK, min(TILE_B, b) + 1, BLK):
        if b % t == 0:
            tile_b = t
    ntiles = b // tile_b
    assert b % tile_b == 0 and b % BLK == 0, (b, tile_b)

    kernel = _make_kernel(
        num_layers, nheads, head_dim, tile_b, ntiles, s_len, s_pad, vocab, vpad
    )
    f32, bf = jnp.float32, jnp.bfloat16
    vmem = lambda shape, dt: pltpu.VMEM(shape, dt)  # noqa: E731
    out_shapes = (
        jax.ShapeDtypeStruct((b, vpad), f32),        # logits
        jax.ShapeDtypeStruct((b, 1), jnp.int32),     # next token
        jax.ShapeDtypeStruct((L, b, d), bf),         # new K rows (per layer;
        jax.ShapeDtypeStruct((L, b, d), bf),         #  layer-major: [B, L, d]
        # VMEM would pad L=6 -> 8 sublanes, +33% on the row-scaled budget —
        # the [B,L,..] reorder is a cheap XLA transpose in the scatter below)
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    # PE row for this position, sliced by XLA (one tiny dynamic-slice op —
    # Mosaic cannot do a dynamically-indexed single-row VMEM load in-kernel)
    pe_row = jax.lax.dynamic_slice_in_dim(weights.pe, jnp.asarray(index, jnp.int32), 1, 0)
    logits, nxt, k_new, v_new = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[
            smem_spec,                    # index
            vmem_spec,                    # tok [B, 1]
            vmem_spec, vmem_spec, vmem_spec, vmem_spec,  # embed, pe, fc_w, fc_b
            vmem_spec, vmem_spec,         # ln_s, ln_b
            vmem_spec, vmem_spec, vmem_spec, vmem_spec, vmem_spec, vmem_spec,  # biases
            any_spec, any_spec, any_spec, any_spec, any_spec, any_spec,  # weights HBM
            any_spec, any_spec,           # cross K/V
            any_spec, any_spec,           # self caches
        ],
        out_specs=(vmem_spec, vmem_spec, vmem_spec, vmem_spec),
        scratch_shapes=[
            vmem((b, d), bf),                       # x_all
            vmem((2, tile_b, BLK, d), bf),          # kbuf
            vmem((2, tile_b, BLK, d), bf),          # vbuf
            vmem((d, 3 * d), bf),                   # qkv_buf
            vmem((d, d), bf),                       # out_buf
            vmem((d, d), bf),                       # q_buf
            vmem((d, d), bf),                       # co_buf
            vmem((d, ffn), bf),                     # l1_buf
            vmem((ffn, d), bf),                     # l2_buf
            pltpu.SemaphoreType.DMA((6,)),          # weight sems
            pltpu.SemaphoreType.DMA((2, 2)),        # kv read sems
        ],
        # The default 16 MB scoped-VMEM window is the binding constraint on
        # batch (the x_all/logits/new-KV buffers scale ~14 KB/row: b=192 was
        # 71 KB over); the v5e has 128 MB physical VMEM, so raise the window —
        # 64 MB serves ~3.8k rows (beam-5 at b=256 = 1280 rows needs ~23 MB).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray(index, jnp.int32).reshape(1, 1),
        tok.astype(jnp.int32).reshape(b, 1),
        weights.embed, pe_row, weights.fc_w, weights.fc_b,
        weights.ln_s, weights.ln_b,
        weights.qkv_b, weights.out_b, weights.q_b, weights.co_b,
        weights.l1_b, weights.l2_b,
        weights.qkv_w, weights.out_w, weights.q_w, weights.co_w,
        weights.l1_w, weights.l2_w,
        cross_k, cross_v, k_cache, v_cache,
    )
    # Scatter the new K/V rows into the caches (all layers in one DUS each).
    # XLA keeps this in-place inside the decode while_loop; the traffic is
    # L*B*d*2 bytes per cache (~0.8 MB at b=64) — noise next to the weights.
    idx32 = jnp.asarray(index, jnp.int32)
    zero = jnp.zeros((), jnp.int32)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_new.transpose(1, 0, 2)[:, :, None, :], (zero, zero, idx32, zero)
    )
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v_new.transpose(1, 0, 2)[:, :, None, :], (zero, zero, idx32, zero)
    )  # [B, L, Lpad, d]: new rows [B, L, 1, d] land at position `index`
    return logits, nxt[:, 0], k_cache, v_cache
