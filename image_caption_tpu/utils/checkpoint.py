"""Checkpoint save/restore.

Reference layout (train_vit_transformer.py:407-438): best-by-CIDEr
``best_model.pth`` + periodic ``checkpoint_epoch_N.pth``, each a dict
``{epoch, model_state_dict, optimizer_state_dict, loss, scores, config}`` with the
config embedded so inference can rebuild the model from the file alone
(scripts/inference.py:20-32).  We keep that contract over a pytree payload:
``{step, epoch, params, opt_state, ema_params, batch_stats, best_cider, scores,
config}`` serialized with flax msgpack (single file, atomic rename).  Training is
deterministically resumable: the step counter, schedules and per-epoch shuffle
seeds are all derived from saved state.

``restore_into`` deserializes against a target pytree template (dtype/shape
checked); ``load_checkpoint`` alone returns the raw nested-dict payload.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

PyTree = Any


def _to_numpy(tree: PyTree) -> PyTree:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """Atomic single-file save: msgpack for pytrees, JSON sidecar keys inline."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {k: _to_numpy(v) for k, v in payload.items() if _is_pytree_of_arrays(v)}
    meta = {k: v for k, v in payload.items() if k not in arrays}
    blob = serialization.msgpack_serialize({"arrays": arrays, "meta_json": json.dumps(meta)})
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _is_pytree_of_arrays(v: Any) -> bool:
    if v is None:
        return False
    leaves = jax.tree_util.tree_leaves(v)
    return bool(leaves) and all(hasattr(l, "shape") or isinstance(l, (int, float)) for l in leaves)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    payload = dict(raw["arrays"])
    payload.update(json.loads(raw["meta_json"]))
    return payload


def restore_into(template: PyTree, stored: PyTree) -> PyTree:
    """Shape/structure-checked restore of ``stored`` (nested dicts of np arrays)
    into the structure of ``template``.

    ``flax.serialization.from_state_dict`` checks structure but not array
    shapes, deferring mismatches to a confusing error at first apply; check
    shapes here so an incompatible checkpoint fails fast with the offending
    paths listed.
    """
    restored = serialization.from_state_dict(template, stored)
    mismatches = []

    def check(path, a, b):
        sa, sb = getattr(a, "shape", None), getattr(b, "shape", None)
        if sa is not None and sb is not None and tuple(sa) != tuple(sb):
            mismatches.append(f"{jax.tree_util.keystr(path)}: {tuple(sb)} -> {tuple(sa)}")
        return b

    jax.tree_util.tree_map_with_path(check, template, restored)
    if mismatches:
        raise ValueError(
            "checkpoint shape mismatch:\n  " + "\n  ".join(mismatches[:10])
            + ("" if len(mismatches) <= 10 else f"\n  ... and {len(mismatches) - 10} more")
        )
    # Return DEVICE arrays: leaving numpy leaves in restored variables makes
    # every subsequent jit call re-upload the full tree (≈350 MB for the
    # full-size models — through the tunnel, per batch; measured to turn an
    # 80-batch eval from ~60 s into >10 min).
    return jax.tree_util.tree_map(jnp.asarray, restored)
