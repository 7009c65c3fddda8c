"""Loss functions vs analytic / torch-semantics values."""

import numpy as np
import pytest

import jax.numpy as jnp

from image_caption_tpu.train import losses as L


def _softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def test_cross_entropy_matches_numpy(rng):
    logits = rng.normal(size=(2, 5, 7)).astype(np.float32)
    targets = rng.integers(1, 7, size=(2, 5)).astype(np.int32)
    targets[0, 3:] = 0  # pad
    p = _softmax(logits)
    nll = -np.log(p[np.arange(2)[:, None], np.arange(5)[None, :], targets])
    mask = targets != 0
    expect = nll[mask].mean()
    got = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets), pad_id=0))
    assert abs(got - expect) < 1e-5


def test_label_smoothing_reference_semantics(rng):
    # Reference: fill smoothing/(V-2), scatter confidence, zero pad column,
    # -sum(q log p), mean over non-pad (optimizations.py:39-61).
    V, smoothing = 9, 0.1
    logits = rng.normal(size=(3, 4, V)).astype(np.float32)
    targets = rng.integers(1, V, size=(3, 4)).astype(np.int32)
    targets[1, 2:] = 0
    logp = np.log(_softmax(logits))
    q = np.full((3, 4, V), smoothing / (V - 2))
    for b in range(3):
        for t in range(4):
            q[b, t, targets[b, t]] = 1 - smoothing
    q[..., 0] = 0.0
    per_pos = -(q * logp).sum(-1)
    expect = per_pos[targets != 0].mean()
    got = float(L.label_smoothing_loss(jnp.asarray(logits), jnp.asarray(targets), pad_id=0, smoothing=smoothing))
    assert abs(got - expect) < 1e-5


def test_label_smoothing_zero_equals_ce(rng):
    logits = rng.normal(size=(2, 3, 8)).astype(np.float32)
    targets = rng.integers(1, 8, size=(2, 3)).astype(np.int32)
    ls = float(L.label_smoothing_loss(jnp.asarray(logits), jnp.asarray(targets), smoothing=0.0))
    ce = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(ls - ce) < 1e-5


def test_focal_gamma_zero_equals_ce(rng):
    logits = rng.normal(size=(2, 3, 8)).astype(np.float32)
    targets = rng.integers(1, 8, size=(2, 3)).astype(np.int32)
    fo = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(targets), gamma=0.0))
    ce = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(fo - ce) < 1e-5


def test_rdrop_kl_properties(rng):
    logits = rng.normal(size=(2, 3, 8)).astype(np.float32)
    targets = rng.integers(1, 8, size=(2, 3)).astype(np.int32)
    same = float(L.r_drop_kl(jnp.asarray(logits), jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(same) < 1e-6
    other = rng.normal(size=(2, 3, 8)).astype(np.float32)
    diff = float(L.r_drop_kl(jnp.asarray(logits), jnp.asarray(other), jnp.asarray(targets)))
    assert diff > 0
    # symmetric
    diff2 = float(L.r_drop_kl(jnp.asarray(other), jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(diff - diff2) < 1e-5
