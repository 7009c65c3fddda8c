"""Fused multi-head attention Pallas kernel for TPU.

One VMEM-resident kernel computes QK^T -> masked f32 softmax -> PV per
(batch, head) grid cell — the whole attention block in one HBM round trip,
replacing three separate HBM-bound ops.  At this framework's sequence lengths
(<=52 decoder tokens, 49/196/197 image tokens) each head's Q/K/V tiles fit VMEM
comfortably, so no K/V streaming loop is needed; lengths are padded to MXU/VPU
tile boundaries outside the kernel and sliced back after.

Used by ops/attention.py::mha_attention on the TPU backend for every attention
in the framework (ViT encoder, grid Transformer encoder, decoder self/cross,
cached decode steps).  Gradients: custom_vjp whose backward recomputes through
the XLA reference path (cheap at these sizes, keeps the fused forward on the
inference/serving hot path).

Masking convention matches ops/attention.py: additive -1e30, never -inf, so
fully-masked rows stay NaN-free.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    # Interpreter mode off-TPU so the same kernel code is exercised by CPU tests.
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float, causal: bool, causal_offset: int):
    # Blocks: q [1, 1, T, D]; k/v [1, 1, S, D]; bias [1, S]; out [1, 1, T, D].
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    t, _ = q.shape
    s_len = k.shape[0]

    scores = (
        jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        * scale
    )  # [T, S]
    scores = scores + bias_ref[0, 0][None, :]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (t, s_len), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (t, s_len), 1)
        # causal_offset = original S - original T (queries sit at the END of the
        # key sequence when S > T); computed from UNPADDED sizes — padded key
        # columns are already bias-masked, padded query rows get sliced off.
        scores = jnp.where(col <= row + causal_offset, scores, _NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _flash_fwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # [B, S] additive f32 (0 or -1e30)
    causal: bool,
) -> jnp.ndarray:
    b, t, h, d = q.shape
    s = k.shape[1]
    scale = 1.0 / (d ** 0.5)

    # [B, T, H, D] -> [B, H, T, D]; pad T (sublane, x8) and S (lane dim of the
    # score matrix, x128).
    tp = _round_up(t, 8)
    sp = _round_up(s, 128)
    qt = jnp.pad(q.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, tp - t), (0, 0)))
    kt = jnp.pad(k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sp - s), (0, 0)))
    vt = jnp.pad(v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sp - s), (0, 0)))
    # [B, 8, Sp]: the sublane dim must be 8-divisible (Mosaic block rule); the
    # 8 replicated rows cost nothing at this size.
    bias_p = jnp.pad(bias, ((0, 0), (0, sp - s)), constant_values=_NEG_INF)
    bias_p = jnp.broadcast_to(bias_p[:, None, :], (b, 8, sp))

    kernel = functools.partial(_attn_kernel, scale=scale, causal=causal, causal_offset=s - t)
    out = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, tp, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, sp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tp, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tp * sp * d,
            bytes_accessed=(2 * b * h * tp * d + 2 * b * h * sp * d) * q.dtype.itemsize,
            transcendentals=b * h * tp * sp,
        ),
        interpret=_interpret(),
    )(qt, kt, vt, bias_p)
    return out[:, :, :t].transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash(q, k, v, bias, causal):
    return _flash_fwd(q, k, v, bias, causal)


def _flash_vjp_fwd(q, k, v, bias, causal):
    return _flash_fwd(q, k, v, bias, causal), (q, k, v, bias)


def _flash_vjp_bwd(causal, residuals, g):
    from image_caption_tpu.ops.attention import mha_reference

    q, k, v, bias = residuals
    mask = bias < _NEG_INF / 2  # [B, S] True = masked

    def ref(q, k, v):
        return mha_reference(q, k, v, causal=causal, kv_padding_mask=mask)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(bias)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    kv_padding_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Drop-in for ops.attention.mha_reference on TPU: [B, T/S, H, Dh] in/out."""
    b, s = k.shape[0], k.shape[1]
    if kv_padding_mask is None:
        bias = jnp.zeros((b, s), dtype=jnp.float32)
    else:
        bias = jnp.where(kv_padding_mask, _NEG_INF, 0.0).astype(jnp.float32)
    return _flash(q, k, v, bias, causal)
