"""Transformer building blocks (flax.linen) with exact reference semantics.

The reference decoder/encoder stacks are torch ``nn.TransformerDecoderLayer`` /
``nn.TransformerEncoderLayer`` with defaults (models/vit_transformer_model.py:123-134,
grid_transformer_model.py:60-70): post-LayerNorm, ReLU FFN, LayerNorm eps 1e-5,
per-head scaling 1/sqrt(Dh), fused qkv input projection with bias.  These blocks
reproduce that math (so torch weights port over and greedy decode matches
token-for-token) while running bf16 on the MXU with f32 params and f32 softmax.

Parameter layout is chosen for clean torch porting:
  SelfAttention:  qkv kernel [d, 3d] (split of torch in_proj_weight^T), out [d, d]
  CrossAttention: q kernel [d, d], kv kernel [d, 2d], out [d, d]
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from image_caption_tpu.core.dtypes import POLICY, DTypePolicy
from image_caption_tpu.ops.attention import mha_attention


def sinusoidal_position_encoding(max_len: int, d_model: int) -> jnp.ndarray:
    """Precomputed sin/cos table [max_len, d_model] (vit_transformer_model.py:19-24)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model))
    angles = position * div_term  # [max_len, d_model/2]
    pe = jnp.zeros((max_len, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe


class PositionalEncoding(nn.Module):
    """Add sinusoidal PE + dropout (vit_transformer_model.py:11-33)."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True, offset=0) -> jnp.ndarray:
        pe = sinusoidal_position_encoding(self.max_len, self.d_model)
        # offset may be a traced scalar (KV-cached decode step) — use a dynamic slice.
        pe_slice = jax.lax.dynamic_slice_in_dim(pe, offset, x.shape[-2], axis=0)
        x = x + pe_slice.astype(x.dtype)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


def _dense(features: int, name: str, policy: DTypePolicy) -> nn.Dense:
    # NOTE: these module names ("qkv", "out", "q_proj", "kv_proj", "linear1",
    # "linear2", ...) are matched BY NAME in utils/precision.py::_BF16_MODULES
    # to pre-cast their params to bf16 for inference.  If you add or rename a
    # Dense here — or reuse one of those names for a module that computes in
    # f32 — update _BF16_MODULES and tests/test_precision.py in the same
    # change, or the cast silently changes numerics.
    return nn.Dense(features, name=name, param_dtype=policy.param_dtype, dtype=policy.compute_dtype)


class SelfAttention(nn.Module):
    """Fused-qkv multi-head self-attention, optional causal mask + KV cache step."""

    d_model: int
    nhead: int
    dropout: float = 0.1
    policy: DTypePolicy = POLICY

    def setup(self):
        self.qkv = _dense(3 * self.d_model, "qkv", self.policy)
        self.out = _dense(self.d_model, "out", self.policy)

    def _heads(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        return x.reshape(b, t, self.nhead, self.d_model // self.nhead)

    def __call__(
        self,
        x: jnp.ndarray,
        *,
        causal: bool = False,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        qkv = self.qkv(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # torch MHA drops attention PROBABILITIES in training (the reference
        # trains with dropout=0.1 inside every encoder/decoder layer,
        # vit_transformer_model.py:123-134); residual dropout is the enclosing
        # layer's job (torch dropout1/2/3).
        rate = 0.0 if deterministic else self.dropout
        rng = self.make_rng("dropout") if rate > 0.0 else None
        o = mha_attention(
            self._heads(q), self._heads(k), self._heads(v), causal=causal,
            kv_padding_mask=key_padding_mask, dropout_rate=rate, dropout_rng=rng,
        )
        return self.out(o.reshape(x.shape))

    def init_cache(self, batch: int, max_len: int) -> Dict[str, jnp.ndarray]:
        # Cache is stored FLAT [B, L, d_model] — exactly the layout the
        # flash-decoding kernel consumes, so the loop-carried buffers never
        # need a layout copy before the pallas call.  Length rounds up to the
        # kernel block size (ops/decode_attention.py); padded positions are
        # always beyond `index` and thus masked on every path.
        from image_caption_tpu.ops.decode_attention import BLK

        pad_len = -(-max_len // BLK) * BLK
        z = jnp.zeros((batch, pad_len, self.d_model), dtype=self.policy.compute_dtype)
        return {"k": z, "v": z}

    def step(
        self, x: jnp.ndarray, cache: Dict[str, jnp.ndarray], index: jnp.ndarray
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """One-token decode: x [B, 1, d]; appends K/V at ``index`` and attends to the prefix."""
        b = x.shape[0]
        qkv = self.qkv(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        cache_k = cache["k"].at[:, index].set(k[:, 0].astype(cache["k"].dtype))
        cache_v = cache["v"].at[:, index].set(v[:, 0].astype(cache["v"].dtype))
        # Flash-decoding attention: positions beyond `index` are masked AND
        # their cache blocks are never fetched on TPU (ops/decode_attention.py);
        # CPU/odd-batch falls back to the identical-semantics XLA path.
        from image_caption_tpu.ops.decode_attention import decode_attention

        o = decode_attention(self._heads(q), cache_k, cache_v, index, nheads=self.nhead)
        o = self.out(o.reshape(b, 1, self.d_model))
        return o, {"k": cache_k, "v": cache_v}


class CrossAttention(nn.Module):
    """Multi-head cross-attention (q from decoder, k/v from encoder memory)."""

    d_model: int
    nhead: int
    dropout: float = 0.1
    policy: DTypePolicy = POLICY

    def setup(self):
        self.q_proj = _dense(self.d_model, "q_proj", self.policy)
        self.kv_proj = _dense(2 * self.d_model, "kv_proj", self.policy)
        self.out = _dense(self.d_model, "out", self.policy)

    def _heads(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        return x.reshape(b, t, self.nhead, self.d_model // self.nhead)

    def memory_kv(self, memory: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Precompute cross K/V once per decode session (encode once, reuse every step)."""
        k, v = jnp.split(self.kv_proj(memory), 2, axis=-1)
        return {"k": self._heads(k), "v": self._heads(v)}

    def __call__(
        self,
        x: jnp.ndarray,
        memory: Optional[jnp.ndarray] = None,
        *,
        memory_kv: Optional[Dict[str, jnp.ndarray]] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if memory_kv is None:
            memory_kv = self.memory_kv(memory)
        q = self._heads(self.q_proj(x))
        rate = 0.0 if deterministic else self.dropout  # see SelfAttention.__call__
        rng = self.make_rng("dropout") if rate > 0.0 else None
        o = mha_attention(
            q, memory_kv["k"], memory_kv["v"], causal=False,
            kv_padding_mask=key_padding_mask, dropout_rate=rate, dropout_rng=rng,
        )
        return self.out(o.reshape(x.shape))


class FeedForward(nn.Module):
    """linear -> ReLU -> dropout -> linear (torch TransformerLayer FFN)."""

    d_model: int
    dim_feedforward: int
    dropout: float = 0.1
    policy: DTypePolicy = POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = _dense(self.dim_feedforward, "linear1", self.policy)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _dense(self.d_model, "linear2", self.policy)(h)
        return h


def _ln(name: str, policy: DTypePolicy) -> nn.LayerNorm:
    # torch LayerNorm eps=1e-5; keep f32 for numerics.
    return nn.LayerNorm(epsilon=1e-5, name=name, param_dtype=policy.param_dtype, dtype=jnp.float32)


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer: x = LN1(x + SA(x)); x = LN2(x + FFN(x))."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    policy: DTypePolicy = POLICY

    def setup(self):
        self.self_attn = SelfAttention(self.d_model, self.nhead, self.dropout, self.policy)
        self.ffn = FeedForward(self.d_model, self.dim_feedforward, self.dropout, self.policy)
        self.norm1 = _ln("norm1", self.policy)
        self.norm2 = _ln("norm2", self.policy)
        self.drop1 = nn.Dropout(self.dropout)
        self.drop2 = nn.Dropout(self.dropout)

    def __call__(
        self,
        x: jnp.ndarray,
        *,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        a = self.self_attn(x, causal=False, key_padding_mask=key_padding_mask, deterministic=deterministic)
        x = self.norm1((x + self.drop1(a, deterministic=deterministic)).astype(jnp.float32)).astype(x.dtype)
        f = self.ffn(x, deterministic=deterministic)
        x = self.norm2((x + self.drop2(f, deterministic=deterministic)).astype(jnp.float32)).astype(x.dtype)
        return x


class TransformerDecoderLayer(nn.Module):
    """Post-LN decoder layer: self-attn (causal) -> cross-attn -> FFN, each +res+LN."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    policy: DTypePolicy = POLICY

    def setup(self):
        self.self_attn = SelfAttention(self.d_model, self.nhead, self.dropout, self.policy)
        self.cross_attn = CrossAttention(self.d_model, self.nhead, self.dropout, self.policy)
        self.ffn = FeedForward(self.d_model, self.dim_feedforward, self.dropout, self.policy)
        self.norm1 = _ln("norm1", self.policy)
        self.norm2 = _ln("norm2", self.policy)
        self.norm3 = _ln("norm3", self.policy)
        self.drop1 = nn.Dropout(self.dropout)
        self.drop2 = nn.Dropout(self.dropout)
        self.drop3 = nn.Dropout(self.dropout)

    def _res_ln(self, norm, x, delta, deterministic, drop):
        return norm((x + drop(delta, deterministic=deterministic)).astype(jnp.float32)).astype(x.dtype)

    def __call__(
        self,
        x: jnp.ndarray,
        memory: jnp.ndarray,
        *,
        tgt_key_padding_mask: Optional[jnp.ndarray] = None,
        memory_key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        a = self.self_attn(x, causal=True, key_padding_mask=tgt_key_padding_mask, deterministic=deterministic)
        x = self._res_ln(self.norm1, x, a, deterministic, self.drop1)
        c = self.cross_attn(
            x, memory, key_padding_mask=memory_key_padding_mask, deterministic=deterministic
        )
        x = self._res_ln(self.norm2, x, c, deterministic, self.drop2)
        f = self.ffn(x, deterministic=deterministic)
        x = self._res_ln(self.norm3, x, f, deterministic, self.drop3)
        return x

    # -- KV-cached single-token decode ------------------------------------

    def init_cache(self, batch: int, max_len: int, memory: jnp.ndarray) -> Dict[str, Any]:
        return {
            "self": self.self_attn.init_cache(batch, max_len),
            "cross_kv": self.cross_attn.memory_kv(memory),
        }

    def step(
        self, x: jnp.ndarray, cache: Dict[str, Any], index: jnp.ndarray
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        a, self_cache = self.self_attn.step(x, cache["self"], index)
        x = self._res_ln(self.norm1, x, a, True, self.drop1)
        c = self.cross_attn(x, memory_kv=cache["cross_kv"], deterministic=True)
        x = self._res_ln(self.norm2, x, c, True, self.drop2)
        f = self.ffn(x, deterministic=True)
        x = self._res_ln(self.norm3, x, f, True, self.drop3)
        return x, {"self": self_cache, "cross_kv": cache["cross_kv"]}
