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


def test_device_time_slope_scales_with_work():
    """device_time (utils/timing.py) must return per-iteration time that
    scales ~linearly with the work inside the body (the slope method's basic
    sanity; on CPU block semantics are normal, so this validates the
    dependency chaining + dynamic trip count machinery)."""
    from image_caption_tpu.utils.timing import device_time

    x = jnp.ones((256, 256), jnp.float32)

    def small(i, s, x):
        return s * 1e-9 + jnp.sum(x @ x) * 1e-20

    def big(i, s, x):
        y = x
        for _ in range(8):
            y = y @ x * (1.0 / 256.0)
        return s * 1e-9 + jnp.sum(y) * 1e-20

    t_small = device_time(small, x, iters=(2, 30), reps=2)
    t_big = device_time(big, x, iters=(2, 30), reps=2)
    assert t_small >= 0.0
    assert t_big > t_small  # 8x the matmuls must take measurably longer
