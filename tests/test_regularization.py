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


def test_attention_prob_dropout_wired_into_layers():
    """Training-mode attention varies under the dropout rng (torch MHA drops
    softmax probabilities; reference trains every regime with dropout=0.1 inside
    nn.TransformerDecoderLayer, vit_transformer_model.py:123-134); deterministic
    mode is rng-independent and matches the no-dropout path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from image_caption_tpu.models.layers import CrossAttention, SelfAttention

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
    mem = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 32))

    sa = SelfAttention(d_model=32, nhead=4, dropout=0.5)
    v = sa.init({"params": jax.random.PRNGKey(2)}, x)
    det1 = sa.apply(v, x, deterministic=True)
    det2 = sa.apply(v, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(det1), np.asarray(det2))
    o1 = sa.apply(v, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(3)})
    o2 = sa.apply(v, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(4)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(det1), np.asarray(o1))

    ca = CrossAttention(d_model=32, nhead=4, dropout=0.5)
    vc = ca.init({"params": jax.random.PRNGKey(5)}, x, mem)
    c_det = ca.apply(vc, x, mem, deterministic=True)
    c1 = ca.apply(vc, x, mem, deterministic=False, rngs={"dropout": jax.random.PRNGKey(6)})
    c2 = ca.apply(vc, x, mem, deterministic=False, rngs={"dropout": jax.random.PRNGKey(7)})
    assert not np.allclose(np.asarray(c1), np.asarray(c2))
    assert not np.allclose(np.asarray(c_det), np.asarray(c1))


def test_attention_prob_dropout_torch_scaling():
    """Survivor probs are scaled by 1/(1-p): with everything else fixed the
    expected value over rngs approximates the deterministic output."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from image_caption_tpu.ops.attention import mha_reference

    q = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 2, 8))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 2, 8))
    base = np.asarray(mha_reference(q, k, v))
    outs = [
        np.asarray(mha_reference(q, k, v, dropout_rate=0.3, dropout_rng=jax.random.PRNGKey(100 + i)))
        for i in range(400)
    ]
    np.testing.assert_allclose(np.mean(outs, axis=0), base, atol=0.12)
