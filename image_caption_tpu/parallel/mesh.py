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
rules degrade to pure DP.

Multi-host (DCN) story: call ``initialize_distributed()`` once per process
before any backend use, build the mesh over the GLOBAL device set (the default
``make_mesh()`` already does — ``jax.devices()`` is global after distributed
init, and ``mesh_utils.create_device_mesh`` keeps the 'model' axis on
intra-host ICI links), have each host load only its rows of the batch
(``process_batch_slice``), and assemble global arrays with
``shard_batch`` — it routes through
``jax.make_array_from_process_local_data`` when process_count > 1.  The
sharding annotations and train step are unchanged; XLA rides ICI inside a
host/slice and DCN across.  (SURVEY §2.9: the reference has no distributed
backend at all; this is the TPU-native equivalent named there.)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any

_distributed_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Multi-host entry point: wire this process into the global runtime.

    Call once per process, BEFORE any other JAX API touches the backend.
    Returns True if distributed mode was initialized.  With no arguments and
    no coordinator in the environment this is a no-op returning False — the
    single-process path stays zero-config (the degenerate case the tests
    exercise).  On TPU pods launched by a cluster scheduler,
    ``jax.distributed.initialize()`` auto-detects everything; otherwise pass
    ``coordinator_address='host:port'``, ``num_processes`` and ``process_id``.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    import os

    has_env = bool(
        os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    )
    if coordinator_address is None and num_processes is None and not has_env:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _distributed_initialized = True
    return True


def make_mesh(shape: Optional[Tuple[int, int]] = None, devices=None) -> Mesh:
    """Mesh with ('data', 'model') axes. Default: ALL (global) devices on 'data'.

    Uses ``mesh_utils.create_device_mesh`` when possible so the trailing
    ('model') axis lands on the best-connected (ICI-adjacent) device pairs;
    falls back to a plain reshape (identical on CPU/single-host).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    d, m = shape
    assert d * m == n, f"mesh {shape} != {n} devices"
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh((d, m), devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(d, m)
    return Mesh(dev_array, ("data", "model"))


def process_batch_slice(global_batch_size: int) -> slice:
    """The rows of the global batch THIS process should load.

    Per-host input pipeline contract: every host loads only its contiguous
    slice of the global batch and passes it to ``shard_batch``; global batch
    size must divide by process_count.
    """
    pc, pi = jax.process_count(), jax.process_index()
    assert global_batch_size % pc == 0, (
        f"global batch {global_batch_size} not divisible by {pc} processes"
    )
    per = global_batch_size // pc
    return slice(pi * per, (pi + 1) * per)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jax.Array]:
    """Host batch -> device arrays with batch-dim sharding over the 'data' axis.

    Single-process: a plain sharded device_put.  Multi-process: ``batch`` holds
    only this host's rows (see ``process_batch_slice``) and the global array is
    assembled via ``jax.make_array_from_process_local_data`` — no host ever
    materializes the full global batch.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in batch.items()
        }
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
