"""ResNet-101 backbone, from scratch in flax.linen.

Architecturally compatible with torchvision ``resnet101`` truncated before
avgpool/fc — the reference grid encoder's CNN (models/grid_transformer_model.py:44-54)
— returning the 7x7x2048 feature map for 224x224 inputs.  Weights port via
utils/port_torch.py (OIHW -> HWIO).

TPU-first: NHWC layout, bf16 compute.  BatchNorm keeps torch structure (scale,
bias, running mean/var in a ``batch_stats`` collection).  The reference freezes the
CNN initially and unfreezes at epoch 5; when frozen we run BN on running stats
(inference mode) — torch would still update running stats in train() mode even with
frozen weights, which we deliberately do not reproduce (documented divergence:
running stats only update when the CNN is trainable).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from image_caption_tpu.core.dtypes import POLICY, DTypePolicy


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    policy: DTypePolicy = POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # torch-style symmetric padding (k-1)//2 — NOT XLA "SAME", whose lo/hi split
        # differs for strided convs and would misalign ported torch weights.
        pad = tuple(((k - 1) // 2, (k - 1) // 2) for k in self.kernel)
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=pad,
            use_bias=False,
            name="conv",
            param_dtype=self.policy.param_dtype,
            dtype=self.policy.compute_dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="bn",
            param_dtype=self.policy.param_dtype,
            dtype=jnp.float32,
        )(x.astype(jnp.float32)).astype(self.policy.compute_dtype)
        return x


class Bottleneck(nn.Module):
    """torch Bottleneck: 1x1 reduce -> 3x3 (stride here) -> 1x1 expand x4, +res."""

    features: int  # bottleneck width; output is 4x
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    policy: DTypePolicy = POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        h = nn.relu(ConvBN(self.features, (1, 1), name="conv1", policy=self.policy)(x, train))
        h = nn.relu(ConvBN(self.features, (3, 3), strides=self.strides, name="conv2", policy=self.policy)(h, train))
        h = ConvBN(self.features * 4, (1, 1), name="conv3", policy=self.policy)(h, train)
        if self.downsample:
            residual = ConvBN(
                self.features * 4, (1, 1), strides=self.strides, name="downsample", policy=self.policy
            )(x, train)
        return nn.relu(h + residual)


class ResNet(nn.Module):
    """Feature-extractor ResNet (children()[:-2] of the torch model)."""

    stage_sizes: Sequence[int] = (3, 4, 23, 3)  # resnet101
    policy: DTypePolicy = POLICY

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """images: NHWC normalized float [B, H, W, 3] -> [B, H/32, W/32, 2048]."""
        x = images.astype(self.policy.compute_dtype)
        x = nn.relu(ConvBN(64, (7, 7), strides=(2, 2), name="stem", policy=self.policy)(x, train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        widths = (64, 128, 256, 512)
        for stage, (blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            for i in range(blocks):
                strides = (2, 2) if (i == 0 and stage > 0) else (1, 1)
                x = Bottleneck(
                    w,
                    strides=strides,
                    downsample=(i == 0),
                    name=f"layer{stage + 1}_{i}",
                    policy=self.policy,
                )(x, train)
        return x


def resnet101(policy: Optional[DTypePolicy] = None) -> ResNet:
    return ResNet(policy=policy or POLICY)


def resnet50(policy: Optional[DTypePolicy] = None) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), policy=policy or POLICY)
