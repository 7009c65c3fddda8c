"""Caption losses — jit-pure functions over f32 logits.

Reference semantics reproduced exactly:
- ``cross_entropy_loss``: torch ``CrossEntropyLoss(ignore_index=pad)`` over
  flattened [B*(L-1), V] logits vs shifted targets (train_vit_transformer.py:322,
  :174-177) — mean over non-pad tokens.
- ``label_smoothing_loss``: the reference's ``LabelSmoothingLoss``
  (utils/optimizations.py:25-61): smoothed target mass ``smoothing/(V-2)`` (the
  quirky V-2 denominator is preserved), pad column zeroed, -sum(q log p),
  mean over non-pad positions.
- ``focal_loss``: (1-p_t)^gamma * CE, pad-masked (optimizations.py:64-103;
  defined-but-unused in the reference scripts, provided for parity).
- ``r_drop_kl``: symmetric KL between two stochastic passes (optimizations.py:349-372).

All take logits [B, T, V] and targets [B, T] (already shifted: targets =
captions[:, 1:]) and return a scalar f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _valid_mask(targets: jnp.ndarray, pad_id: int) -> jnp.ndarray:
    return (targets != pad_id).astype(jnp.float32)


def cross_entropy_loss(logits: jnp.ndarray, targets: jnp.ndarray, pad_id: int = 0) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = _valid_mask(targets, pad_id)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def label_smoothing_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, pad_id: int = 0, smoothing: float = 0.1
) -> jnp.ndarray:
    vocab = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    confidence = 1.0 - smoothing
    # Reference denominator: vocab_size - 2 (optimizations.py:47) — preserved quirk.
    smooth_val = smoothing / (vocab - 2)
    one_hot = jax.nn.one_hot(targets, vocab, dtype=jnp.float32)
    # torch scatter_ SETS confidence at the target column (does not add) — :46-48
    q = jnp.where(one_hot > 0, confidence, smooth_val)
    q = q.at[..., pad_id].set(0.0)
    loss_per_pos = -jnp.sum(q * logp, axis=-1)
    mask = _valid_mask(targets, pad_id)
    return jnp.sum(loss_per_pos * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def focal_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, pad_id: int = 0, gamma: float = 2.0, alpha: float = 1.0
) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    p_t = jnp.exp(tgt_logp)
    loss = -alpha * (1.0 - p_t) ** gamma * tgt_logp
    mask = _valid_mask(targets, pad_id)
    return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def r_drop_kl(
    logits1: jnp.ndarray, logits2: jnp.ndarray, targets: jnp.ndarray, pad_id: int = 0
) -> jnp.ndarray:
    """Symmetric KL(p1 || p2)/2 + KL(p2 || p1)/2 over non-pad positions."""
    lp1 = jax.nn.log_softmax(logits1.astype(jnp.float32), axis=-1)
    lp2 = jax.nn.log_softmax(logits2.astype(jnp.float32), axis=-1)
    p1, p2 = jnp.exp(lp1), jnp.exp(lp2)
    kl12 = jnp.sum(p1 * (lp1 - lp2), axis=-1)
    kl21 = jnp.sum(p2 * (lp2 - lp1), axis=-1)
    mask = _valid_mask(targets, pad_id)
    sym = 0.5 * (kl12 + kl21)
    return jnp.sum(sym * mask) / jnp.maximum(jnp.sum(mask), 1.0)
