"""Regularization modules from the reference's optimization toolkit.

These are defined-but-unused by the reference's training scripts
(utils/optimizations.py:228-346) but are part of its public surface, so the
rebuild carries them: ``DropPath`` (stochastic depth, :306-326), ``LayerDropout``
(whole-layer drop, :329-346), ``RelativePositionalEncoding`` (learnable relative
positions, :280-301), and ``AttentionWithProbDropout`` (MHA with dropout on the
attention probabilities, :228-277 — the one attention variant that materializes
probs, so it uses the XLA path by construction).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from image_caption_tpu.core.dtypes import POLICY, DTypePolicy


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample."""

    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.drop_prob == 0.0:
            return x
        keep = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class LayerDropout(nn.Module):
    """Drop an entire sublayer's contribution with probability p (train only)."""

    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, residual: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.drop_prob == 0.0:
            return x + residual
        rng = self.make_rng("dropout")
        drop = jax.random.bernoulli(rng, self.drop_prob)
        return jnp.where(drop, x, x + residual)


class RelativePositionalEncoding(nn.Module):
    """Learnable relative-position embeddings, returned as an additive bias
    [T, T, d] lookup (clipped to +-max_relative_position)."""

    d_model: int
    max_relative_position: int = 32
    policy: DTypePolicy = POLICY

    @nn.compact
    def __call__(self, seq_len: int) -> jnp.ndarray:
        table = self.param(
            "rel_embedding",
            nn.initializers.normal(stddev=0.02),
            (2 * self.max_relative_position + 1, self.d_model),
            self.policy.param_dtype,
        )
        pos = jnp.arange(seq_len)
        rel = pos[None, :] - pos[:, None]
        rel = jnp.clip(rel, -self.max_relative_position, self.max_relative_position)
        return table[rel + self.max_relative_position]


class AttentionWithProbDropout(nn.Module):
    """MHA applying dropout to the attention probabilities (torch MHA semantics).

    The framework's standard attention (ops/attention.py) never materializes the
    prob matrix (fusion-friendly); this variant exists for exact torch-style
    regularization experiments.
    """

    d_model: int
    nhead: int
    dropout: float = 0.1
    policy: DTypePolicy = POLICY

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: Optional[jnp.ndarray] = None,
        v: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        k = q if k is None else k
        v = k if v is None else v
        dh = self.d_model // self.nhead

        def proj(name, x):
            return nn.Dense(self.d_model, name=name, param_dtype=self.policy.param_dtype)(x).reshape(
                x.shape[0], x.shape[1], self.nhead, dh
            )

        qh, kh, vh = proj("q", q), proj("k", k), proj("v", v)
        logits = jnp.einsum("bthd,bshd->bhts", qh, kh) / jnp.sqrt(dh)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhts,bshd->bthd", probs.astype(vh.dtype), vh)
        return nn.Dense(self.d_model, name="out", param_dtype=self.policy.param_dtype)(
            out.reshape(q.shape[0], q.shape[1], self.d_model)
        )
