"""Behavioral quirks preserved from the reference (SURVEY §7 checklist)."""

import numpy as np

import jax
import jax.numpy as jnp

from image_caption_tpu.models.captioner import (
    GridCaptioningModel,
    ViTCaptioningModel,
    lengths_to_padding_mask,
)


def test_lengths_to_padding_mask():
    m = np.asarray(lengths_to_padding_mask(jnp.asarray([3, 5]), 5))
    np.testing.assert_array_equal(m, [[False, False, False, True, True], [False] * 5])


def test_vit_uses_unadjusted_lengths_grid_subtracts_one():
    # vit builds the padding mask from UNADJUSTED lengths (vit:242-243);
    # grid subtracts 1 for the dropped <end> (grid:196-203).
    assert ViTCaptioningModel.length_adjust == 0
    assert GridCaptioningModel.length_adjust == -1


def test_grid_stop_rule_selected_in_runtime():
    from image_caption_tpu.models.runtime import Captioner, build_module

    grid = build_module(23, {"model_type": "grid_transformer", "resnet_stages": (1, 1, 1, 1),
                             "d_model": 32, "nhead": 4, "num_decoder_layers": 1,
                             "num_encoder_layers": 1, "dim_feedforward": 64})
    assert isinstance(grid, GridCaptioningModel)
    vit = build_module(23, {"model_type": "vit_transformer", "vit_layers": 1, "vit_hidden": 32,
                            "vit_heads": 4, "vit_mlp": 64, "d_model": 32, "nhead": 4,
                            "num_decoder_layers": 1, "dim_feedforward": 64})
    assert isinstance(vit, ViTCaptioningModel)


def test_padded_vocab_head_is_mxu_aligned():
    from image_caption_tpu.models.decoder import TransformerDecoder

    dec = TransformerDecoder(vocab_size=109, d_model=32, nhead=4, num_layers=1, dim_feedforward=64)
    assert dec.padded_vocab == 128
    key = jax.random.PRNGKey(0)
    mem = jax.random.normal(key, (2, 5, 32))
    tgt = jax.random.randint(key, (2, 6), 0, 109)
    vars_ = dec.init({"params": key, "dropout": key}, tgt, mem)
    # public forward slices to vocab; padded step logits carry -1e30 beyond vocab
    full = dec.apply(vars_, tgt, mem)
    assert full.shape[-1] == 109
    cache = dec.apply(vars_, mem, 6, method=dec.init_cache)
    logits, _ = dec.apply(vars_, tgt[:, 0], cache, jnp.int32(0), method=dec.step)
    assert logits.shape[-1] == 128
    assert np.all(np.asarray(logits)[:, 109:] < -1e29)
