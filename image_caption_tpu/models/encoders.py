"""Image encoders producing decoder memory.

- ``VisionTransformerEncoder``: ViT-B/16 backbone, class token dropped, Linear
  768 -> d_model projection (reference models/vit_transformer_model.py:36-100).
- ``GridFeatureEncoder``: ResNet-101 -> 7x7x2048 grid, 1x1 conv to d_model,
  flatten to 49 tokens, sinusoidal PE (max_len 100), N-layer Transformer encoder
  (reference models/grid_transformer_model.py:34-110).

Both return [B, S, d_model] memory.  ``frozen_backbone`` mirrors the reference's
set_trainable/set_cnn_trainable freeze — here it is enforced by optimizer masking
(train/optim.py), not by mutating modules.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from image_caption_tpu.core.dtypes import POLICY, DTypePolicy
from image_caption_tpu.models.layers import PositionalEncoding, TransformerEncoderLayer
from image_caption_tpu.models.resnet import ResNet
from image_caption_tpu.models.vit import ViT


class VisionTransformerEncoder(nn.Module):
    d_model: int = 512
    dropout: float = 0.0  # torchvision vit_b_16 default has dropout 0.0
    # ViT-B/16 by default; smaller values for smoke tests.
    vit_hidden: int = 768
    vit_layers: int = 12
    vit_heads: int = 12
    vit_mlp: int = 3072
    policy: DTypePolicy = POLICY

    def setup(self):
        self.vit = ViT(
            hidden_dim=self.vit_hidden,
            num_layers=self.vit_layers,
            nhead=self.vit_heads,
            mlp_dim=self.vit_mlp,
            policy=self.policy,
            dropout=self.dropout,
            name="vit",
        )
        self.projection = nn.Dense(
            self.d_model, name="projection", param_dtype=self.policy.param_dtype, dtype=self.policy.compute_dtype
        )

    def __call__(
        self, images: jnp.ndarray, deterministic: bool = True, train_backbone: bool = False
    ) -> jnp.ndarray:
        """images NHWC normalized -> [B, 196, d_model] (cls token dropped, :95).

        When the ViT is frozen (the reference's default until ``unfreeze_epoch``,
        vit_transformer_model.py:64) its params take no gradient, so we cut the
        graph at the trunk output: XLA then skips the entire ViT backward AND
        frees its saved activations — the frozen phase costs a forward only,
        like torch's ``requires_grad=False``.  The projection stays trainable.
        """
        tokens = self.vit(images, deterministic=deterministic)
        if not train_backbone:
            tokens = jax.lax.stop_gradient(tokens)
        patch_features = tokens[:, 1:, :]
        return self.projection(patch_features)


class GridFeatureEncoder(nn.Module):
    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    resnet_stages: tuple = (3, 4, 23, 3)  # resnet101; smaller for smoke tests
    policy: DTypePolicy = POLICY

    def setup(self):
        self.cnn = ResNet(stage_sizes=self.resnet_stages, policy=self.policy, name="cnn")
        self.projection = nn.Conv(
            self.d_model,
            (1, 1),
            name="projection",
            param_dtype=self.policy.param_dtype,
            dtype=self.policy.compute_dtype,
        )
        self.pos_encoder = PositionalEncoding(self.d_model, self.dropout, max_len=100)
        self.encoder_layers = [
            TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout, self.policy, name=f"layer_{i}"
            )
            for i in range(self.num_encoder_layers)
        ]

    def __call__(
        self, images: jnp.ndarray, deterministic: bool = True, train_cnn: bool = False
    ) -> jnp.ndarray:
        """images NHWC normalized -> [B, 49, d_model]."""
        x = self.cnn(images, train=train_cnn)  # [B, 7, 7, 2048]
        if not train_cnn:
            # Frozen CNN (reference default until unfreeze_epoch, grid:79):
            # cut the graph so XLA skips the ResNet-101 backward and frees all
            # its saved activations — torch requires_grad=False semantics.
            x = jax.lax.stop_gradient(x)
        x = self.projection(x)  # [B, 7, 7, d_model]
        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d)
        x = self.pos_encoder(x, deterministic=deterministic)
        for layer in self.encoder_layers:
            x = layer(x, deterministic=deterministic)
        return x
