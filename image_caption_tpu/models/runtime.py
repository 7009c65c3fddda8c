"""User-facing model runtime: params + module behind the reference's API.

The reference exposes stateful torch modules with ``model(images, captions, lens)``
and ``model.generate(images, start_token, end_token, max_len, method)``
(models/vit_transformer_model.py:216, :276) plus ``build_model(vocab_size, config)``
(:423-444, grid:325-338).  ``Captioner`` reproduces that surface over pure JAX:
it owns ``variables`` (params [+ batch_stats]) and jit-compiled apply functions.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from image_caption_tpu.decode import engine
from image_caption_tpu.models.captioner import GridCaptioningModel, ViTCaptioningModel


def build_module(vocab_size: int, config: Dict[str, Any]):
    """Construct the flax module from a reference-style config dict."""
    model_type = config.get("model_type", "vit_transformer")
    common = dict(
        vocab_size=vocab_size,
        d_model=config.get("d_model", 512),
        nhead=config.get("nhead", 8),
        num_decoder_layers=config.get("num_decoder_layers", 6),
        dim_feedforward=config.get("dim_feedforward", 2048),
        dropout=config.get("dropout", 0.1),
        max_len=config.get("max_len", 100),
    )
    if model_type == "vit_transformer":
        return ViTCaptioningModel(
            vit_hidden=config.get("vit_hidden", 768),
            vit_layers=config.get("vit_layers", 12),
            vit_heads=config.get("vit_heads", 12),
            vit_mlp=config.get("vit_mlp", 3072),
            **common,
        )
    if model_type == "grid_transformer":
        return GridCaptioningModel(
            num_encoder_layers=config.get("num_encoder_layers", 6),
            resnet_stages=tuple(config.get("resnet_stages", (3, 4, 23, 3))),
            **common,
        )
    raise ValueError(f"unknown model_type {model_type!r}")


class Captioner:
    """Reference-compatible model handle: ``forward`` / ``generate`` / ``encode``."""

    def __init__(self, module, variables, config: Optional[Dict[str, Any]] = None):
        self.module = module
        self.variables = variables
        self.config = dict(config or {})
        self._encode = jax.jit(
            lambda v, images: self.module.apply(v, images, method=self.module.encode)
        )
        self._forward = jax.jit(
            lambda v, images, captions, lengths: self.module.apply(v, images, captions, lengths)
        )

    # -- reference surface --------------------------------------------------

    def __call__(self, images, captions, caption_lengths=None):
        return self.forward(images, captions, caption_lengths)

    def forward(self, images, captions, caption_lengths=None):
        """Teacher-forced logits [B, L-1, vocab] (deterministic; training uses
        train/steps.py which threads dropout RNG and mutable batch stats)."""
        images = jnp.asarray(images)
        captions = jnp.asarray(captions)
        if caption_lengths is None:
            caption_lengths = jnp.full((captions.shape[0],), captions.shape[1], dtype=jnp.int32)
        return self._forward(self.variables, images, captions, jnp.asarray(caption_lengths))

    def encode(self, images):
        return self._encode(self.variables, jnp.asarray(images))

    def generate(
        self,
        images,
        start_token: int,
        end_token: int,
        max_len: int = 50,
        method: str = "greedy",
        beam_size: int = 5,
        rng: Optional[jax.Array] = None,
    ):
        """Greedy / beam / sample generation from raw (normalized) images."""
        memory = self.encode(images)
        stop_when_harvested = isinstance(self.module, GridCaptioningModel)
        return engine.generate(
            self.module,
            self.variables,
            memory,
            start_id=start_token,
            end_id=end_token,
            max_len=max_len,
            method=method,
            beam_size=beam_size,
            stop_when_harvested=stop_when_harvested,
            rng=rng,
        )

    # -- info ---------------------------------------------------------------

    def num_params(self) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.variables["params"]))


def build_model(
    vocab_size: int,
    config: Dict[str, Any],
    rng: Optional[jax.Array] = None,
    load_pretrained_backbone: bool = True,
) -> Captioner:
    """Reference ``build_model`` (vit:423, grid:325): config dict -> ready model.

    When ``load_pretrained_backbone`` and a torchvision checkpoint is reachable
    (``pretrained_vit`` / ``pretrained_cnn`` keys), backbone weights are ported
    through utils/port_torch.py; otherwise flax init is used.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(config.get("seed", 42))
    module = build_module(vocab_size, config)
    dummy_images = jnp.zeros((1, 224, 224, 3), dtype=jnp.float32)
    dummy_caps = jnp.zeros((1, 4), dtype=jnp.int32)
    dummy_lens = jnp.array([4], dtype=jnp.int32)
    variables = jax.jit(module.init)({"params": rng, "dropout": rng}, dummy_images, dummy_caps, dummy_lens)

    wants_pretrained = config.get(
        "pretrained_vit" if config.get("model_type", "vit_transformer") == "vit_transformer" else "pretrained_cnn",
        True,
    )
    if load_pretrained_backbone and wants_pretrained:
        try:
            from image_caption_tpu.utils.port_torch import load_pretrained_backbone_into

            variables = load_pretrained_backbone_into(module, variables)
        except Exception as e:  # no torch weights reachable (e.g. zero-egress env)
            print(f"note: pretrained backbone unavailable ({type(e).__name__}); using random init")
    return Captioner(module, variables, config)
