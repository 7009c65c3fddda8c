"""Caption Transformer decoder.

Reference: ``TransformerDecoder`` (models/vit_transformer_model.py:103-182, duplicated
at grid_transformer_model.py:113-158): embedding x sqrt(d_model) -> sinusoidal PE
(+dropout) -> 6 post-LN decoder layers (causal self-attn, cross-attn to image memory,
ReLU FFN) -> Linear d_model -> vocab.  Init is uniform(-0.1, 0.1) for embedding and
output head, zero output bias (reference init_weights :142-147).

TPU-first details:
- the vocab head is padded up to a multiple of 128 lanes so the final matmul tiles
  onto the MXU; padded logit columns are forced to -1e30 and the public ``__call__``
  slices back to ``vocab_size``
- logits are always float32 (decode parity / stable softmax)
- ``init_cache``/``step`` give O(1)-per-token KV-cached decode; cross-attention K/V
  are computed once per session from the encoder memory
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from image_caption_tpu.core.dtypes import POLICY, DTypePolicy
from image_caption_tpu.models.layers import PositionalEncoding, TransformerDecoderLayer

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class TransformerDecoder(nn.Module):
    vocab_size: int
    d_model: int = 512
    nhead: int = 8
    num_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    max_len: int = 100
    policy: DTypePolicy = POLICY

    @property
    def padded_vocab(self) -> int:
        return _round_up(self.vocab_size, 128)

    def setup(self):
        init = nn.initializers.uniform(scale=0.2)  # uniform(0, 0.2); shifted below

        def uniform_pm(key, shape, dtype):
            # torch init: uniform(-0.1, 0.1)
            return init(key, shape, dtype) - 0.1

        self.embedding = nn.Embed(
            self.vocab_size,
            self.d_model,
            embedding_init=uniform_pm,
            param_dtype=self.policy.param_dtype,
            name="embedding",
        )
        self.pos_encoder = PositionalEncoding(self.d_model, self.dropout, self.max_len)
        self.layers = [
            TransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout, self.policy, name=f"layer_{i}"
            )
            for i in range(self.num_layers)
        ]
        self.fc_out = nn.Dense(
            self.padded_vocab,
            kernel_init=uniform_pm,
            bias_init=nn.initializers.zeros,
            param_dtype=self.policy.param_dtype,
            dtype=jnp.float32,  # f32 logits
            name="fc_out",
        )

    def _embed(self, tgt: jnp.ndarray, deterministic: bool, offset: int = 0) -> jnp.ndarray:
        x = self.embedding(tgt) * math.sqrt(self.d_model)
        x = self.pos_encoder(x.astype(self.policy.compute_dtype), deterministic=deterministic, offset=offset)
        return x

    def _logits(self, x: jnp.ndarray, pad_mask_value: bool = True) -> jnp.ndarray:
        logits = self.fc_out(x.astype(jnp.float32))
        if pad_mask_value and self.padded_vocab != self.vocab_size:
            logits = logits.at[..., self.vocab_size :].set(_NEG_INF)
        return logits

    def __call__(
        self,
        tgt: jnp.ndarray,  # [B, T] token ids
        memory: jnp.ndarray,  # [B, S, d_model]
        *,
        tgt_key_padding_mask: Optional[jnp.ndarray] = None,  # [B, T] True = pad
        memory_key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_padded: bool = False,
    ) -> jnp.ndarray:
        """Teacher-forced forward: returns [B, T, vocab] f32 logits."""
        x = self._embed(tgt, deterministic)
        memory = memory.astype(self.policy.compute_dtype)
        for layer in self.layers:
            x = layer(
                x,
                memory,
                tgt_key_padding_mask=tgt_key_padding_mask,
                memory_key_padding_mask=memory_key_padding_mask,
                deterministic=deterministic,
            )
        logits = self._logits(x)
        return logits if return_padded else logits[..., : self.vocab_size]

    # -- KV-cached decode ---------------------------------------------------

    def init_cache(self, memory: jnp.ndarray, max_len: int) -> Dict[str, Any]:
        """Allocate per-layer self-attn caches and precompute cross K/V from memory."""
        memory = memory.astype(self.policy.compute_dtype)
        batch = memory.shape[0]
        return {
            f"layer_{i}": layer.init_cache(batch, max_len, memory) for i, layer in enumerate(self.layers)
        }

    def step(
        self, token: jnp.ndarray, cache: Dict[str, Any], index: jnp.ndarray
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """One decode step: token [B] -> (padded f32 logits [B, padded_vocab], cache).

        Padded columns carry -1e30 so argmax/top-k/softmax over the padded axis are
        exactly equivalent to the unpadded computation.
        """
        x = self._embed(token[:, None], deterministic=True, offset=index)
        new_cache: Dict[str, Any] = {}
        for i, layer in enumerate(self.layers):
            x, new_cache[f"layer_{i}"] = layer.step(x, cache[f"layer_{i}"], index)
        logits = self._logits(x)[:, 0]
        return logits, new_cache
