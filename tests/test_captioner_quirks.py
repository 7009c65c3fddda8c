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


def _decode_train_logits(model_cls, lengths, **overrides):
    """Forward tiny captions through ``decode_train`` with fixed params and
    synthetic memory, so vit/grid differ ONLY in their length handling."""
    kw = dict(vocab_size=13, d_model=16, nhead=2, num_decoder_layers=1,
              dim_feedforward=32, dropout=0.0, max_len=10)
    kw.update(overrides)
    model = model_cls(**kw)
    key = jax.random.PRNGKey(0)
    captions = jnp.asarray([[11, 3, 4, 5, 12, 0], [11, 3, 4, 5, 6, 12]], jnp.int32)
    memory = jax.random.normal(key, (2, 4, 16))
    # Init only the decoder by entering via decode_train (encoder params are
    # never touched on this path, so vit and grid share identical param trees).
    vars_ = model.init(
        {"params": key, "dropout": key}, captions, memory,
        jnp.asarray(lengths, jnp.int32), method=model_cls.decode_train,
    )
    out = model.apply(
        vars_, captions, memory, jnp.asarray(lengths, jnp.int32),
        method=model_cls.decode_train,
    )
    return np.asarray(out)


def test_vit_uses_unadjusted_lengths_grid_subtracts_one():
    """Behavioral check of the reference quirk (vit:242-243 vs grid:196-203):
    for the SAME captions/lengths, the vit model masks self-attn keys at
    positions >= len while grid masks >= len-1, so teacher-forced logits must
    diverge whenever a caption is shorter than the batch width — and agree
    again when grid is fed compensated lengths (+1)."""
    lengths = [5, 6]
    vit = _decode_train_logits(ViTCaptioningModel, lengths)
    grid = _decode_train_logits(GridCaptioningModel, lengths)
    # identical params (same init path/seed), same inputs: any difference is
    # the padding-mask quirk. Row 0 (len 5 < width 6) must differ...
    assert np.abs(vit[0] - grid[0]).max() > 1e-6
    # ...and compensating grid's adjustment restores exact agreement.
    grid_comp = _decode_train_logits(GridCaptioningModel, [l + 1 for l in lengths])
    np.testing.assert_allclose(vit, grid_comp, atol=1e-6)


def test_grid_stop_rule_selected_in_runtime():
    """The runtime must route grid models to the harvested-stop beam rule and
    vit models to the all-finished rule (behavioral divergence between the two
    rules is covered by test_decode.test_grid_stop_rule_changes_beam_output)."""
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
