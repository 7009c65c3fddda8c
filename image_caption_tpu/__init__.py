"""image_caption_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image-captioning framework.

A from-scratch rebuild of the capabilities of the reference PyTorch project
``wonder-dream/image_caption`` (DeepFashion-MultiModal captioning: ViT-B/16 and
ResNet-101-grid encoders + Transformer decoder, XE / optimized-XE / SCST training,
greedy + beam decode, CIDEr/METEOR/ROUGE-L/BLEU evaluation), re-designed TPU-first:

- single KV-cached decode engine (``jax.lax.scan``) shared by inference,
  validation, beam search and SCST rollouts
- bf16 compute / f32 params dtype policy, MXU-aligned (128-padded) vocab head
- Pallas fused attention kernels on the hot paths
- data/tensor parallelism via ``jax.sharding.Mesh`` + NamedSharding, with
  collectives emitted by XLA (no hand-rolled comm layer)
- vectorized, id-space CIDEr-D reward so SCST never round-trips through text
"""

__version__ = "0.1.0"

from image_caption_tpu.core.config import (  # noqa: F401
    default_vit_config,
    default_grid_config,
    get_optimized_config,
)
