"""DropPath / LayerDropout / RelativePositionalEncoding / prob-dropout MHA."""

import numpy as np

import jax
import jax.numpy as jnp

from image_caption_tpu.train.regularization import (
    AttentionWithProbDropout,
    DropPath,
    LayerDropout,
    RelativePositionalEncoding,
)


def test_droppath_identity_eval():
    m = DropPath(0.5)
    x = jnp.ones((4, 3))
    out = m.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_droppath_scales_kept_paths():
    m = DropPath(0.5)
    x = jnp.ones((512, 2))
    out = m.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)})
    out = np.asarray(out)
    # rows are either 0 or 1/keep = 2.0
    assert set(np.unique(out)).issubset({0.0, 2.0})
    assert 0.3 < (out[:, 0] == 0).mean() < 0.7


def test_layer_dropout():
    m = LayerDropout(1.0)  # always drop -> residual ignored
    x, r = jnp.ones((2, 3)), jnp.full((2, 3), 5.0)
    out = m.apply({}, x, r, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out2 = m.apply({}, x, r, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(x + r))


def test_relative_positional_encoding_shape():
    m = RelativePositionalEncoding(d_model=16, max_relative_position=4)
    vars_ = m.init(jax.random.PRNGKey(0), 6)
    out = m.apply(vars_, 6)
    assert out.shape == (6, 6, 16)
    # clipping: distance beyond max maps to the same embedding
    out10 = m.apply(vars_, 10)
    np.testing.assert_allclose(np.asarray(out10)[0, 5], np.asarray(out10)[0, 9])


def test_attention_prob_dropout_runs():
    m = AttentionWithProbDropout(d_model=32, nhead=4, dropout=0.5)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 32)).astype(np.float32))
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, x)
    out_eval = m.apply(vars_, x, deterministic=True)
    assert out_eval.shape == x.shape
    out_train = m.apply(vars_, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_train))
