"""bf16 inference-weight pre-cast must be BIT-identical to the f32-master path.

The claim (utils/precision.py): flax casts f32 params to bf16 inside every
bf16-compute module, so pre-casting the same params once produces the exact
same bf16 values and therefore the exact same logits/tokens.  These tests
assert bitwise equality, not allclose — any divergence means a param was cast
that the model actually consumes in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_caption_tpu.decode import engine
from image_caption_tpu.models.runtime import build_module
from image_caption_tpu.utils.precision import bf16_inference_variables

VOCAB = 109


def _build(model_type):
    config = dict(
        model_type=model_type,
        d_model=64,
        nhead=4,
        num_encoder_layers=2,
        num_decoder_layers=2,
        dim_feedforward=128,
        dropout=0.1,
        max_len=16,
    )
    if model_type == "vit_transformer":
        config.update(vit_hidden=48, vit_layers=2, vit_heads=4, vit_mlp=96)
    else:
        config.update(resnet_stages=(1, 1, 1, 1))
    module = build_module(VOCAB, config)
    rng = jax.random.PRNGKey(0)
    variables = module.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 224, 224, 3)),
        jnp.zeros((1, 4), jnp.int32),
        jnp.array([4], jnp.int32),
    )
    return module, variables


@pytest.mark.parametrize("model_type", ["grid_transformer", "vit_transformer"])
def test_forward_logits_bitwise_identical(model_type):
    module, variables = _build(model_type)
    cast = bf16_inference_variables(variables)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))
    caps = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, VOCAB)
    lens = jnp.array([8, 5], jnp.int32)
    ref = module.apply(variables, imgs, caps, lens)
    out = module.apply(cast, imgs, caps, lens)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_greedy_tokens_and_stepwise_logits_identical():
    module, variables = _build("grid_transformer")
    cast = bf16_inference_variables(variables)
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (3, 224, 224, 3))
    memory = module.apply(variables, imgs, method=module.encode)
    memory_c = module.apply(cast, imgs, method=module.encode)
    np.testing.assert_array_equal(np.asarray(memory, np.float32), np.asarray(memory_c, np.float32))
    ref = engine.greedy_decode(module, variables, memory, start_id=107, end_id=-1, max_len=12)
    out = engine.greedy_decode(module, cast, memory_c, start_id=107, end_id=-1, max_len=12)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_f32_modules_keep_f32_and_bf16_targets_cast():
    module, variables = _build("grid_transformer")
    cast = bf16_inference_variables(variables)
    p = cast["params"]
    dec = p["decoder"]["layer_0"]
    assert dec["self_attn"]["qkv"]["kernel"].dtype == jnp.bfloat16
    assert dec["ffn"]["linear1"]["bias"].dtype == jnp.bfloat16
    assert dec["norm1"]["scale"].dtype == jnp.float32
    assert p["decoder"]["fc_out"]["kernel"].dtype == jnp.float32
    assert p["decoder"]["embedding"]["embedding"].dtype == jnp.float32
    # ResNet convs cast, BN stays f32; batch_stats collection untouched.
    cnn = p["encoder"]["cnn"]
    assert cnn["stem"]["conv"]["kernel"].dtype == jnp.bfloat16
    assert cnn["stem"]["bn"]["scale"].dtype == jnp.float32
    assert cast["batch_stats"]["encoder"]["cnn"]["stem"]["bn"]["mean"].dtype == jnp.float32
    # Input is not mutated.
    assert variables["params"]["decoder"]["layer_0"]["self_attn"]["qkv"]["kernel"].dtype == jnp.float32
