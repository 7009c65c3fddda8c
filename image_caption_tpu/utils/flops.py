"""Analytic FLOPs accounting for MFU reporting.

Every benchmark number must be sanity-checkable against the chip's peak:
``MFU = achieved FLOPs/s / peak FLOPs/s``.  A throughput that implies >100%
MFU is a measurement bug, not a result (the round-2 PERF.md tables had no such
check and shipped physically impossible numbers).

Conventions:
- 1 MAC = 2 FLOPs (the convention hardware peak specs use).  NOTE: published
  "GFLOPs" for torchvision models (ResNet-101 "7.8 GFLOPs", ViT-B/16
  "17.6 GFLOPs") count MACs; the numbers here are 2x those.
- Only matmul/conv FLOPs are counted (norms/activations/softmax are
  bandwidth, not MXU work) — standard MFU practice.
- Backward pass = 2x forward for layers that take gradients; a frozen
  backbone (stop_gradient) contributes forward only.

Model shapes follow the full-size reference configs (d_model 512, nhead 8,
6+6 layers, ff 2048, max_len 52 -> T=51 teacher-forcing positions;
ViT-B/16 -> S=196 memory tokens after cls drop, grid ResNet-101 -> S=49).
"""

from __future__ import annotations

from typing import Dict, Optional

# ---------------------------------------------------------------------------
# Backbones
# ---------------------------------------------------------------------------


def resnet101_fwd_flops(image: int = 224) -> float:
    """Exact conv MACs x2 for torchvision-layout ResNet-101 (+1x1 downsamples)."""

    def conv(out_hw: int, cin: int, cout: int, k: int) -> float:
        return 2.0 * out_hw * out_hw * cin * cout * k * k

    hw = image // 2  # conv1 stride 2
    total = conv(hw, 3, 64, 7)
    hw //= 2  # maxpool
    cin = 64
    for width, blocks, stride in ((64, 3, 1), (128, 4, 2), (256, 23, 2), (512, 3, 2)):
        hw_out = hw // stride
        for b in range(blocks):
            o = hw_out if b == 0 else hw_out
            total += conv(hw if b == 0 and stride > 1 else o, cin if b == 0 else width * 4, width, 1)  # 1x1 reduce (stride lives in 3x3 per torchvision)
            total += conv(o, width, width, 3)
            total += conv(o, width, width * 4, 1)
            if b == 0:
                total += conv(o, cin, width * 4, 1)  # downsample projection
            cin = width * 4
        hw = hw_out
    return total


def vit_b16_fwd_flops(
    image: int = 224, patch: int = 16, hidden: int = 768, layers: int = 12, mlp: int = 3072
) -> float:
    """ViT-B/16 encoder forward (patch conv + 12 transformer layers, 197 tokens)."""
    n = (image // patch) ** 2 + 1  # + cls token
    total = 2.0 * (image // patch) ** 2 * hidden * 3 * patch * patch  # patchify conv
    per_layer = (
        2.0 * n * hidden * hidden * 4          # qkv + out projections
        + 2.0 * 2.0 * n * n * hidden           # qk^T and pv
        + 2.0 * 2.0 * n * hidden * mlp         # MLP in + out
    )
    return total + layers * per_layer


# ---------------------------------------------------------------------------
# Transformer encoder / decoder stacks (reference geometry)
# ---------------------------------------------------------------------------


def encoder_layer_fwd_flops(s: int, d: int = 512, ff: int = 2048) -> float:
    return 2.0 * s * d * d * 4 + 2.0 * 2.0 * s * s * d + 2.0 * 2.0 * s * d * ff


def decoder_fwd_flops(
    t: int = 51, s: int = 196, d: int = 512, ff: int = 2048, layers: int = 6,
    vocab_padded: int = 128,
) -> float:
    """Teacher-forced decoder forward: self-attn (causal) + cross-attn + FFN
    per layer, plus the 128-lane-padded vocab head."""
    per_layer = (
        2.0 * t * d * d * 4          # self qkv + out
        + 2.0 * 2.0 * t * t * d      # self qk^T + pv (full T x T; causal mask discards half post-hoc)
        + 2.0 * t * d * d * 2        # cross q + out
        + 2.0 * s * d * d * 2        # cross k/v over memory
        + 2.0 * 2.0 * t * s * d      # cross qk^T + pv
        + 2.0 * 2.0 * t * d * ff     # FFN
    )
    return layers * per_layer + 2.0 * t * d * vocab_padded


def _geom(config: Optional[Dict] = None):
    c = config or {}
    return (
        c.get("d_model", 512), c.get("dim_feedforward", 2048),
        c.get("num_decoder_layers", 6), c.get("max_len", 52) - 1,
    )


def encode_fwd_flops(model_type: str, config: Optional[Dict] = None) -> float:
    d, ff, _, _ = _geom(config)
    if model_type == "grid_transformer":
        enc_layers = (config or {}).get("num_encoder_layers", 6)
        proj = 2.0 * 49 * 2048 * d  # 1x1 conv 2048 -> d over the 7x7 grid
        return resnet101_fwd_flops() + proj + enc_layers * encoder_layer_fwd_flops(49, d, ff)
    if model_type == "vit_transformer":
        proj = 2.0 * 196 * 768 * d
        return vit_b16_fwd_flops() + proj
    raise ValueError(model_type)


def memory_tokens(model_type: str) -> int:
    return 49 if model_type == "grid_transformer" else 196


def forward_flops(model_type: str, config: Optional[Dict] = None) -> float:
    """Teacher-forced forward pass, FLOPs per sample."""
    d, ff, layers, t = _geom(config)
    return encode_fwd_flops(model_type, config) + decoder_fwd_flops(
        t, memory_tokens(model_type), d, ff, layers
    )


def train_step_flops(
    model_type: str,
    config: Optional[Dict] = None,
    train_backbone: bool = False,
    r_drop: bool = False,
) -> float:
    """Forward + backward FLOPs per sample for one XE train step.

    Frozen phase: backbone forward only (stop_gradient cuts its backward);
    the transformer encoder head + decoder always train (3x forward).
    R-Drop doubles the forward/backward of the trained decoder path AND the
    backbone forward (two stochastic passes).
    """
    d, ff, layers, t = _geom(config)
    backbone = encode_fwd_flops(model_type, config)
    dec = decoder_fwd_flops(t, memory_tokens(model_type), d, ff, layers)
    if model_type == "grid_transformer":
        # split the encode cost: the transformer-encoder head trains from epoch 1
        enc_layers = (config or {}).get("num_encoder_layers", 6)
        head = enc_layers * encoder_layer_fwd_flops(49, d, ff) + 2.0 * 49 * 2048 * d
        backbone_only = backbone - head
        per_pass = (backbone_only * (3.0 if train_backbone else 1.0)) + 3.0 * (head + dec)
    else:
        per_pass = (backbone * (3.0 if train_backbone else 1.0)) + 3.0 * dec
    return per_pass * (2.0 if r_drop else 1.0)


def decode_flops(model_type: str, config: Optional[Dict] = None, gen_len: int = 52) -> float:
    """Greedy decode FLOPs per caption: encode + cross-KV precompute + per-token
    decoder steps (KV-cached: each step is one-token matmuls + growing-prefix
    attention reads, counted at the padded cache length)."""
    d, ff, layers, _ = _geom(config)
    s = memory_tokens(model_type)
    cache_len = -(-gen_len // 16) * 16  # BLK-padded cache (ops/decode_attention.py)
    cross_kv = layers * 2.0 * s * d * d * 2
    per_token = layers * (
        2.0 * d * d * 4                # self qkv + out (1 token)
        + 2.0 * d * d * 2              # cross q + out
        + 2.0 * 2.0 * cache_len * d    # self-attention against the padded cache
        + 2.0 * 2.0 * s * d            # cross-attention reads
        + 2.0 * 2.0 * d * ff           # FFN
    ) + 2.0 * d * 128                  # padded vocab head
    return encode_fwd_flops(model_type, config) + cross_kv + gen_len * per_token


# ---------------------------------------------------------------------------
# Device peaks
# ---------------------------------------------------------------------------

# bf16 peak FLOPs/s per chip, keyed by substrings of jax's device_kind.
_PEAKS = (
    ("v6e", 918e12), ("v6 lite", 918e12),
    ("v5p", 459e12),
    ("v5e", 197e12), ("v5 lite", 197e12), ("v5litepod", 197e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def device_peak_flops(device_kind: str) -> Optional[float]:
    dk = device_kind.lower().replace("tpu ", "")
    for key, peak in _PEAKS:
        if key in dk:
            return peak
    return None


def mfu(flops_per_sample: float, samples_per_sec: float, device_kind: str) -> Optional[float]:
    peak = device_peak_flops(device_kind)
    if peak is None:
        return None
    return flops_per_sample * samples_per_sec / peak
