"""Analytic FLOPs accounting vs XLA's own cost model.

The MFU numbers in PERF.md are only as honest as utils/flops.py; cross-check
the analytic per-sample forward FLOPs against ``compiled.cost_analysis()``
for the real modules (tiny image resolution is NOT used — the geometry terms
are resolution-dependent — but batch 1 keeps compile time sane)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_caption_tpu.utils import flops as F


def _xla_forward_flops(model_type):
    from image_caption_tpu.models.runtime import build_module

    config = dict(
        model_type=model_type, d_model=512, nhead=8, num_encoder_layers=6,
        num_decoder_layers=6, dim_feedforward=2048, dropout=0.1, max_len=52,
    )
    module = build_module(109, config)
    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda: module.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 4), jnp.int32), jnp.array([4], jnp.int32),
        )
    )
    variables = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), variables)

    def fwd(variables, images, captions, lengths):
        return module.apply(variables, images, captions, lengths)

    images = jnp.zeros((1, 224, 224, 3))
    captions = jnp.zeros((1, 52), jnp.int32)
    lengths = jnp.full((1,), 52, jnp.int32)
    compiled = jax.jit(fwd).lower(variables, images, captions, lengths).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca["flops"])


@pytest.mark.parametrize("model_type", ["grid_transformer", "vit_transformer"])
def test_forward_flops_match_xla_cost_model(model_type):
    analytic = F.forward_flops(model_type)
    xla = _xla_forward_flops(model_type)
    ratio = analytic / xla
    # analytic counts matmul/conv only; XLA adds elementwise/norm flops and
    # some fusions change accounting — agree within 25%
    assert 0.75 < ratio < 1.25, f"analytic {analytic/1e9:.1f}G vs XLA {xla/1e9:.1f}G"


def test_known_backbone_flops():
    # published MAC counts: ResNet-101 ~7.8 GMACs, ViT-B/16 ~17.6 GMACs
    assert F.resnet101_fwd_flops() / 2e9 == pytest.approx(7.8, rel=0.03)
    assert F.vit_b16_fwd_flops() / 2e9 == pytest.approx(17.6, rel=0.03)


def test_peak_table():
    assert F.device_peak_flops("TPU v5 lite") == 197e12
    assert F.device_peak_flops("TPU v6e") == 918e12
    assert F.device_peak_flops("warp9") is None
    assert F.mfu(1e9, 1000.0, "TPU v5 lite") == pytest.approx(1e12 / 197e12)
    assert F.mfu(1e9, 1000.0, "unknown") is None


def test_chain_scalar_runs_k_dependent_iterations():
    """The slope-timing machinery (utils/timing.py) must really execute k
    chained iterations with a dynamic trip count: a body that adds 1 per
    iteration yields exactly k, and device_time returns a non-negative float.
    (Wall-clock ordering assertions are NOT tested — they flake under
    concurrent host load on the single-core CI host.)"""
    import jax

    from image_caption_tpu.utils.timing import chain_scalar, device_time

    x = jnp.ones((64, 64), jnp.float32)

    def body(i, s, x):
        # depends on the matmul so it cannot be folded away, advances by 1
        return s + jnp.float32(1.0) + 0.0 * jnp.sum(x @ x)

    run = chain_scalar(body)
    for k in (1, 5, 17):
        assert float(run(jnp.float32(0.0), jnp.int32(k), x)) == k

    t = device_time(body, x, iters=(2, 10), reps=2)
    assert isinstance(t, float) and t >= 0.0
