"""Bit-identical bf16 pre-cast of inference weights.

Every matmul/conv in the model computes in bfloat16: flax casts the f32
parameter to ``policy.compute_dtype`` at call time (``promote_dtype``), so the
HBM read of the f32 master copy is pure waste on the inference path — the
decode step re-reads all ~25M decoder params EVERY token (PERF.md "Attention
kernels": the 101 MB/step weight stream is the largest per-step traffic
class).  Pre-casting those parameters to bf16 once halves that stream and is
**bit-identical**: ``bf16(w_f32)`` is exactly the value flax produces inside
the layer, so logits, argmax ties, and decoded tokens cannot change
(asserted by tests/test_precision.py).

Only parameters that the model consumes in bf16 are cast.  Modules that
compute in f32 keep f32 params: LayerNorm / BatchNorm (models/layers.py::_ln,
models/resnet.py::ConvBN bn), the f32 vocab head ``fc_out``
(models/decoder.py:71-78 — decode-parity requirement), the embedding table,
and ViT's class_token/pos_embedding.

Use on inference/decode paths only; training keeps f32 masters for the
optimizer.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import traverse_util

# Matched by BARE MODULE NAME — this set is coupled to the module names in
# models/layers.py::_dense (see the note there), models/vit.py, models/encoders.py
# and models/resnet.py.  A future f32-computing module that reuses one of these
# names would be silently cast; the bitwise tests in tests/test_precision.py are
# the guard and must be extended with any new model type.
# COUPLING GUARD: matching is by BARE module name — a future f32-computing
# module that reuses one of these names would be silently cast and change
# numerics.  If you add/rename a module in models/, check this set; the
# bitwise-identity tests (tests/test_precision.py) only cover the two
# existing model types.
# Module names whose kernel/bias are consumed in compute_dtype (bf16):
# - transformer blocks: SelfAttention.qkv/out, CrossAttention.q_proj/kv_proj/out,
#   FeedForward.linear1/linear2 (models/layers.py::_dense)
# - ViT: mlp_0/mlp_3, conv_proj (models/vit.py:46-78)
# - encoders: projection (Dense for ViT, 1x1 Conv for grid, models/encoders.py)
# - ResNet: every ConvBN's "conv" (models/resnet.py:37-46)
_BF16_MODULES = frozenset(
    {
        "qkv",
        "out",
        "q_proj",
        "kv_proj",
        "linear1",
        "linear2",
        "mlp_0",
        "mlp_3",
        "conv_proj",
        "conv",
        "projection",
    }
)


def bf16_inference_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Cast bf16-consumed params to bf16; leave f32-consumed params untouched.

    Returns a new variables dict (input is not mutated); collections other
    than "params" (e.g. batch_stats) pass through unchanged — BatchNorm runs
    in f32.
    """
    params = variables.get("params")
    if params is None:
        return variables
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        if (
            len(path) >= 2
            and path[-2] in _BF16_MODULES
            and path[-1] in ("kernel", "bias")
            and leaf.dtype == jnp.float32
        ):
            leaf = leaf.astype(jnp.bfloat16)
        out[path] = leaf
    new_vars = dict(variables)
    new_vars["params"] = traverse_util.unflatten_dict(out)
    return new_vars
