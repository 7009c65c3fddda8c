"""Device mesh + sharding rules.

The reference is strictly single-device (SURVEY §2.9: no DDP/NCCL/MPI anywhere;
``device = cuda if available else cpu``, train_vit_transformer.py:290).  Here
parallelism is first-class and expressed the TPU way: one ``jax.sharding.Mesh``
over the slice, NamedSharding annotations on inputs/params, and XLA emits the
collectives (psum for DP grad reduction, all-gathers for TP) over ICI.

Axes:
- ``data``  — batch-dim data parallelism (the default; models are ~100M params,
  so DP is the right regime for v5e-8)
- ``model`` — optional tensor parallelism: attention qkv/out and FFN kernels are
  sharded on their feature dim via ``param_shardings`` pattern rules

``make_mesh((4, 2))`` -> Mesh(data=4, model=2).  With a 1-sized model axis the
rules degrade to pure DP.  Multi-host would extend the data axis across DCN via
``jax.distributed.initialize`` — the sharding annotations are unchanged.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any


def make_mesh(shape: Optional[Tuple[int, int]] = None, devices=None) -> Mesh:
    """Mesh with ('data', 'model') axes. Default: all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    d, m = shape
    assert d * m == n, f"mesh {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(d, m)
    return Mesh(dev_array, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jax.Array]:
    """Host batch -> device arrays with batch-dim sharding over the 'data' axis."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


# ---------------------------------------------------------------------------
# Tensor-parallel param sharding rules
# ---------------------------------------------------------------------------

# Pattern rules matched against '/'.joined param paths.  Column-parallel (output
# features sharded) for qkv/q/kv/linear1; row-parallel (input dim sharded) for
# out/linear2 so activations recombine with one psum XLA inserts automatically.
_TP_RULES = [
    (re.compile(r".*(qkv|q_proj|kv_proj)/kernel$"), P(None, "model")),
    (re.compile(r".*(qkv|q_proj|kv_proj)/bias$"), P("model")),
    (re.compile(r".*linear1/kernel$"), P(None, "model")),
    (re.compile(r".*linear1/bias$"), P("model")),
    (re.compile(r".*(out|linear2)/kernel$"), P("model", None)),
    (re.compile(r".*mlp_0/kernel$"), P(None, "model")),
    (re.compile(r".*mlp_0/bias$"), P("model")),
    (re.compile(r".*mlp_3/kernel$"), P("model", None)),
    (re.compile(r".*fc_out/kernel$"), P(None, "model")),
    (re.compile(r".*fc_out/bias$"), P("model")),
    (re.compile(r".*embedding/embedding$"), P(None, "model")),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(p.key if hasattr(p, "key") else str(p))
    return "/".join(parts)


def param_shardings(params: PyTree, mesh: Mesh) -> PyTree:
    """NamedSharding tree for params: TP rules where they match (and divide
    evenly), replicated otherwise."""
    model_size = mesh.shape.get("model", 1)

    def rule(path, leaf):
        if model_size > 1:
            ps = _path_str(path)
            for rx, spec in _TP_RULES:
                if rx.match(ps):
                    # only shard if the dim divides evenly
                    ok = True
                    for dim, axis in zip(leaf.shape, spec):
                        if axis == "model" and dim % model_size != 0:
                            ok = False
                    if ok:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
