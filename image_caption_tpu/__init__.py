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

import os as _os


def _host_cache_tag() -> str:
    """Short tag identifying this host's CPU feature set (+ jax version).

    XLA:CPU persists AOT executables; replaying one compiled with different
    host CPU features emits 'could lead to execution errors such as SIGILL'
    and risks crashes on heterogeneous hosts sharing ~/.cache.  Keying the
    cache dir on the host's /proc/cpuinfo flags isolates each feature set
    (TPU executables are host-independent, but per-host dirs are harmless
    there and the compiles happen on the same host anyway).
    """
    import hashlib
    import platform

    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    try:
        import jax

        feats += " jax-" + jax.__version__
    except Exception:
        pass
    return hashlib.sha256(feats.encode()).hexdigest()[:10]


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (set ICT_COMPILATION_CACHE=0 to disable).

    On tunneled/remote TPU backends a full-size train-step compile takes
    minutes; caching compiled executables across processes makes every script
    after the first launch start in seconds.  The cache dir is keyed on the
    host CPU feature set (see _host_cache_tag) so CPU AOT executables never
    cross heterogeneous hosts.
    """
    if _os.environ.get("ICT_COMPILATION_CACHE", "1") != "1":
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            path = _os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                _os.path.join(
                    _os.path.expanduser("~"),
                    ".cache",
                    "image_caption_tpu",
                    "xla-" + _host_cache_tag(),
                ),
            )
            _os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never block import on cache setup
        pass


_enable_compilation_cache()

from image_caption_tpu.core.config import (  # noqa: F401
    default_vit_config,
    default_grid_config,
    get_optimized_config,
)
