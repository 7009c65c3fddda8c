"""Flash-decoding kernel vs the XLA reference attention (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_caption_tpu.ops.attention import mha_reference
from image_caption_tpu.ops.decode_attention import (
    _decode_attention_pallas,
    _padded_pallas,
    _pick_tile_b,
)

B, L, H, DH = 16, 64, 8, 64  # L = cache length, BLK-padded like SelfAttention.init_cache


def _reference(q, k, v, index):
    mask = jnp.broadcast_to(jnp.arange(L)[None, :] > index, (B, L))
    return mha_reference(q, k, v, causal=False, kv_padding_mask=mask)


def _flat(x):
    return x.reshape(B, L, H * DH)


@pytest.mark.parametrize("index", [0, 5, 15, 16, 31, 51])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_decode_attention_matches_reference(index, dtype):
    key = jax.random.PRNGKey(index)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, 1, H, DH), dtype)
    k = jax.random.normal(kk, (B, L, H, DH), dtype)
    v = jax.random.normal(kv, (B, L, H, DH), dtype)
    want = np.asarray(_reference(q, k, v, jnp.int32(index)), np.float32)
    got = np.asarray(
        _decode_attention_pallas(q, _flat(k), _flat(v), jnp.int32(index), nheads=H, interpret=True),
        np.float32,
    )
    atol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3)


def _random_case(b, index, dtype=jnp.float32, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, 1, H, DH), dtype)
    k = jax.random.normal(kk, (b, L, H, DH), dtype)
    v = jax.random.normal(kv, (b, L, H, DH), dtype)
    mask = jnp.broadcast_to(jnp.arange(L)[None, :] > index, (b, L))
    want = mha_reference(q, k, v, causal=False, kv_padding_mask=mask)
    return q, k.reshape(b, L, H * DH), v.reshape(b, L, H * DH), np.asarray(want, np.float32)


@pytest.mark.parametrize("b", [136, 192, 200, 320])
def test_decode_attention_multi_tile_batches(b):
    """Batches > 128 that are not multiples of 128: every row must match.

    Regression for the round-2 tile bug: tile_b=min(b,128) made the last grid
    tile's HBM DMA read out of bounds (clamped), so rows past the last full
    128-tile attended to the wrong rows' K/V (rows 128-191 diverged at B=192).
    Reachable via batched beam decode (B*beam, e.g. 40x5=200).
    """
    index = 21
    q, kf, vf, want = _random_case(b, index, seed=b)
    got = np.asarray(
        _decode_attention_pallas(q, kf, vf, jnp.int32(index), nheads=H, interpret=True),
        np.float32,
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-3)
    tile = _pick_tile_b(b)
    assert b % tile == 0 and tile <= 128 and tile % 8 == 0


def test_pick_tile_b_always_divides():
    for b in range(8, 1025, 8):
        t = _pick_tile_b(b)
        assert b % t == 0 and 8 <= t <= 128 and t % 8 == 0


@pytest.mark.parametrize("b", [1, 3, 5, 7])
def test_decode_attention_sub8_batch_padding(b):
    """Sub-8 batches are padded to one 8-row tile inside _padded_pallas (the
    b=1 interactive-latency path) and must match the reference exactly."""
    index = 13
    q, kf, vf, want = _random_case(b, index, seed=100 + b)
    got = np.asarray(
        _padded_pallas(q, kf, vf, jnp.int32(index), nheads=H, interpret=True), np.float32
    )
    assert got.shape == (b, 1, H, DH)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-3)


def test_decode_attention_only_prefix_matters():
    """Keys/values beyond `index` must not affect the output (the whole point:
    those blocks are never even fetched on TPU)."""
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kn = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, 1, H, DH), jnp.float32)
    k = jax.random.normal(kk, (B, L, H, DH), jnp.float32)
    v = jax.random.normal(kv, (B, L, H, DH), jnp.float32)
    index = jnp.int32(20)
    a = _decode_attention_pallas(q, _flat(k), _flat(v), index, nheads=H, interpret=True)
    noise = jax.random.normal(kn, (B, L - 21, H, DH)) * 100
    k2 = k.at[:, 21:].set(noise)
    v2 = v.at[:, 21:].set(noise)
    b = _decode_attention_pallas(q, _flat(k2), _flat(v2), index, nheads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
