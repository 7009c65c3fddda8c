"""ViT-B/16 backbone, from scratch in flax.linen.

Architecturally compatible with torchvision's ``vit_b_16`` (the reference encoder,
models/vit_transformer_model.py:36-100 — conv patchify 16x16/s16 to 768, prepend a
class token, add learned position embeddings [197, 768], 12 pre-LN encoder blocks
with exact-erf GELU MLP (3072), final LayerNorm), so torchvision weights port
directly via utils/port_torch.py and forward features match.

TPU-first: NHWC layout (XLA-native conv tiling), bf16 compute / f32 params, and the
token sequence is padded from 197 to 208 (16-sublane aligned for bf16) only inside
the attention op — block shapes stay static.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from image_caption_tpu.core.dtypes import POLICY, DTypePolicy
from image_caption_tpu.models.layers import SelfAttention


class ViTEncoderBlock(nn.Module):
    """Pre-LN block: x += MHA(LN1(x)); x += MLP(LN2(x))."""

    hidden_dim: int
    nhead: int
    mlp_dim: int
    dropout: float = 0.0
    policy: DTypePolicy = POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-6, name="ln_1", param_dtype=self.policy.param_dtype, dtype=jnp.float32)(
            x.astype(jnp.float32)
        ).astype(self.policy.compute_dtype)
        h = SelfAttention(self.hidden_dim, self.nhead, self.dropout, self.policy, name="self_attention")(
            h, deterministic=deterministic
        )
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="ln_2", param_dtype=self.policy.param_dtype, dtype=jnp.float32)(
            x.astype(jnp.float32)
        ).astype(self.policy.compute_dtype)
        h = nn.Dense(self.mlp_dim, name="mlp_0", param_dtype=self.policy.param_dtype, dtype=self.policy.compute_dtype)(h)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU default = exact erf
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden_dim, name="mlp_3", param_dtype=self.policy.param_dtype, dtype=self.policy.compute_dtype)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class ViT(nn.Module):
    """ViT backbone returning all token features [B, 1+N, hidden] (cls first)."""

    image_size: int = 224
    patch_size: int = 16
    hidden_dim: int = 768
    num_layers: int = 12
    nhead: int = 12
    mlp_dim: int = 3072
    dropout: float = 0.0
    policy: DTypePolicy = POLICY

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """images: NHWC float [B, 224, 224, 3] (already normalized)."""
        b = images.shape[0]
        n_patches = (self.image_size // self.patch_size) ** 2
        x = nn.Conv(
            self.hidden_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            name="conv_proj",
            param_dtype=self.policy.param_dtype,
            dtype=self.policy.compute_dtype,
        )(images.astype(self.policy.compute_dtype))
        x = x.reshape(b, n_patches, self.hidden_dim)

        cls = self.param("class_token", nn.initializers.zeros, (1, 1, self.hidden_dim), self.policy.param_dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.hidden_dim)), x], axis=1)

        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, n_patches + 1, self.hidden_dim),
            self.policy.param_dtype,
        )
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        for i in range(self.num_layers):
            x = ViTEncoderBlock(
                self.hidden_dim, self.nhead, self.mlp_dim, self.dropout, self.policy, name=f"encoder_layer_{i}"
            )(x, deterministic=deterministic)

        x = nn.LayerNorm(epsilon=1e-6, name="ln", param_dtype=self.policy.param_dtype, dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return x.astype(self.policy.compute_dtype)


def vit_b_16(policy: Optional[DTypePolicy] = None, dropout: float = 0.0) -> ViT:
    return ViT(policy=policy or POLICY, dropout=dropout)
