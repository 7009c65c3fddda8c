"""Captioning models: encoder ∘ decoder composition.

Reference: ``ViTTransformerCaptioning`` (models/vit_transformer_model.py:185-420) and
``GridTransformerCaptioning`` (models/grid_transformer_model.py:161-322).  Teacher-
forced forward: encode image -> shift target (``captions[:, :-1]``) -> causal +
padding masks -> decode -> [B, L-1, vocab] logits.

Behavioral quirk preserved (SURVEY §7): the vit model builds its padding mask from
the UNADJUSTED caption lengths (vit:242-243) while the grid model subtracts 1 for
the dropped <end> (grid:196-201) — controlled here by ``length_adjust``.

The flax module is pure; the user-facing runtime object (holding params and
exposing ``forward``/``generate`` like the reference) is
``image_caption_tpu.models.runtime.Captioner``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from image_caption_tpu.core.dtypes import POLICY, DTypePolicy
from image_caption_tpu.models.decoder import TransformerDecoder
from image_caption_tpu.models.encoders import GridFeatureEncoder, VisionTransformerEncoder


def lengths_to_padding_mask(lengths: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, seq_len] bool mask, True at padded positions (pos >= len)."""
    pos = jnp.arange(seq_len)[None, :]
    return pos >= lengths[:, None]


class CaptioningModel(nn.Module):
    """Shared composition; subclasses provide the encoder."""

    vocab_size: int
    d_model: int = 512
    nhead: int = 8
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    max_len: int = 100
    length_adjust: int = 0  # vit: 0 (quirk); grid: -1
    policy: DTypePolicy = POLICY

    def make_encoder(self) -> nn.Module:
        raise NotImplementedError

    def setup(self):
        self.encoder = self.make_encoder()
        self.decoder = TransformerDecoder(
            vocab_size=self.vocab_size,
            d_model=self.d_model,
            nhead=self.nhead,
            num_layers=self.num_decoder_layers,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            max_len=self.max_len,
            policy=self.policy,
            name="decoder",
        )

    # -- encoder pass ------------------------------------------------------

    def encode(self, images: jnp.ndarray, deterministic: bool = True, train_backbone: bool = False) -> jnp.ndarray:
        raise NotImplementedError

    # -- teacher-forced training forward ----------------------------------

    def __call__(
        self,
        images: jnp.ndarray,
        captions: jnp.ndarray,  # [B, L] with <start>/<end>
        caption_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        train_backbone: bool = False,
    ) -> jnp.ndarray:
        memory = self.encode(images, deterministic=deterministic, train_backbone=train_backbone)
        return self.decode_train(captions, memory, caption_lengths, deterministic=deterministic)

    def decode_train(
        self,
        captions: jnp.ndarray,
        memory: jnp.ndarray,
        caption_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        tgt = captions[:, :-1]
        mask = None
        if caption_lengths is not None:
            mask = lengths_to_padding_mask(caption_lengths + self.length_adjust, tgt.shape[1])
        return self.decoder(
            tgt, memory, tgt_key_padding_mask=mask, deterministic=deterministic
        )

    # -- decode-session plumbing (used by decode/engine.py) ----------------

    def init_cache(self, memory: jnp.ndarray, max_len: int) -> Dict[str, Any]:
        return self.decoder.init_cache(memory, max_len)

    def decode_step(
        self, token: jnp.ndarray, cache: Dict[str, Any], index: jnp.ndarray
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        return self.decoder.step(token, cache, index)


class ViTCaptioningModel(CaptioningModel):
    """ViT-B/16 + Transformer decoder (vit_transformer_model.py:185)."""

    vit_hidden: int = 768
    vit_layers: int = 12
    vit_heads: int = 12
    vit_mlp: int = 3072

    def make_encoder(self) -> nn.Module:
        return VisionTransformerEncoder(
            d_model=self.d_model,
            vit_hidden=self.vit_hidden,
            vit_layers=self.vit_layers,
            vit_heads=self.vit_heads,
            vit_mlp=self.vit_mlp,
            policy=self.policy,
            name="encoder",
        )

    def encode(self, images, deterministic: bool = True, train_backbone: bool = False):
        # ViT has no BN so no mode change; train_backbone controls whether the
        # frozen trunk cuts the gradient graph (see VisionTransformerEncoder).
        return self.encoder(images, deterministic=deterministic, train_backbone=train_backbone)


class GridCaptioningModel(CaptioningModel):
    """ResNet-101 grid + Transformer encoder + Transformer decoder (grid:161)."""

    num_encoder_layers: int = 6
    length_adjust: int = -1
    resnet_stages: tuple = (3, 4, 23, 3)

    def make_encoder(self) -> nn.Module:
        return GridFeatureEncoder(
            d_model=self.d_model,
            nhead=self.nhead,
            num_encoder_layers=self.num_encoder_layers,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            resnet_stages=self.resnet_stages,
            policy=self.policy,
            name="encoder",
        )

    def encode(self, images, deterministic: bool = True, train_backbone: bool = False):
        return self.encoder(images, deterministic=deterministic, train_cnn=train_backbone)
