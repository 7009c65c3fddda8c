"""Pallas fused attention vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_caption_tpu.ops.attention import mha_reference
from image_caption_tpu.ops.flash_attention import flash_mha


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("t,s", [(7, 7), (51, 51), (4, 49)])
def test_flash_matches_reference(causal, t, s):
    if causal and t != s and s < t:
        pytest.skip("invalid causal config")
    b, h, d = 2, 4, 32
    q = _rand((b, t, h, d), 0)
    k = _rand((b, s, h, d), 1)
    v = _rand((b, s, h, d), 2)
    out = flash_mha(q, k, v, causal=causal)
    ref = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_padding_mask():
    b, t, s, h, d = 2, 5, 9, 2, 16
    q, k, v = _rand((b, t, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2)
    mask = np.zeros((b, s), dtype=bool)
    mask[0, 5:] = True
    mask[1, 2:] = True
    out = flash_mha(q, k, v, kv_padding_mask=jnp.asarray(mask))
    ref = mha_reference(q, k, v, kv_padding_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_gradients_match_reference():
    b, t, h, d = 2, 12, 2, 16
    q, k, v = _rand((b, t, h, d), 0), _rand((b, t, h, d), 1), _rand((b, t, h, d), 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_flash_bf16():
    b, t, h, d = 2, 16, 2, 32
    q = _rand((b, t, h, d), 0).astype(jnp.bfloat16)
    k = _rand((b, t, h, d), 1).astype(jnp.bfloat16)
    v = _rand((b, t, h, d), 2).astype(jnp.bfloat16)
    out = flash_mha(q, k, v, causal=True)
    ref = mha_reference(q, k, v, causal=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32), atol=3e-2
    )
