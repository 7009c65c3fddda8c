"""Optimizers, EMA, gradient utilities, early stopping.

Reference equivalents:
- Adam β=(0.9,0.98) eps 1e-9 for base XE (train_vit_transformer.py:324-326),
  AdamW wd 0.01 for optimized/SCST (train_vit_transformer_optimized.py:405-411)
- clip-by-global-norm (GradientClipping, optimizations.py:399-412)
- encoder freeze/unfreeze with per-group LR factors: the reference rebuilds the
  optimizer with fresh state at the unfreeze epoch (train_vit_transformer.py:353-369)
  — we do the same via ``make_optimizer(param_labels=...)``; a 'frozen' label zeroes
  updates, other labels scale LR.
- ``EMA`` (optimizations.py:417-456): shadow = d*shadow + (1-d)*param as a pure
  pytree op.  Reference quirk preserved: the shadow registers only params trainable
  at construction; late-unfrozen params never enter EMA (mask fixed at creation).
- ``EarlyStopping`` (optimizations.py:461-494): max-mode patience, min_delta 0.001.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp
import optax
from flax import struct

PyTree = Any


def global_norm_clip(max_norm: float) -> optax.GradientTransformation:
    return optax.clip_by_global_norm(max_norm)


def make_optimizer(
    learning_rate: Union[float, Callable],
    kind: str = "adam",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    clip_norm: Optional[float] = None,
    param_labels: Optional[PyTree] = None,
    lr_factors: Optional[Dict[str, float]] = None,
    inject_lr: bool = False,
) -> optax.GradientTransformation:
    """Build the update rule.

    ``param_labels``: pytree of str labels matching params.  Label 'frozen' gets
    zero updates; other labels are scaled by ``lr_factors.get(label, 1.0)``
    (e.g. {'encoder': 0.1} reproduces encoder_lr x0.1 after unfreeze).

    ``inject_lr=True`` exposes a runtime-mutable ``learning_rate`` hyperparam in
    the opt state (``opt_state.hyperparams['learning_rate']``) — how the base
    scripts' epoch-level ReduceLROnPlateau scales LR without a rebuild.
    """

    def factory(learning_rate):
        txs = []
        if clip_norm is not None:
            txs.append(optax.clip_by_global_norm(clip_norm))
        if kind == "adam":
            txs.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        elif kind == "adamw":
            txs.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
            txs.append(optax.add_decayed_weights(weight_decay))
        else:
            raise ValueError(f"unknown optimizer kind {kind!r}")

        if param_labels is not None:
            labels = set(jax.tree_util.tree_leaves(param_labels))
            factors = dict(lr_factors or {})
            transforms = {}
            for lab in labels:
                if lab == "frozen":
                    transforms[lab] = optax.set_to_zero()
                else:
                    f = factors.get(lab, 1.0)
                    transforms[lab] = optax.scale(f) if f != 1.0 else optax.identity()
            txs.append(optax.multi_transform(transforms, param_labels))

        txs.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*txs)

    if inject_lr:
        return optax.inject_hyperparams(factory)(learning_rate=learning_rate)
    return factory(learning_rate)


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected learning_rate hyperparam (inject_lr=True optimizers)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def label_params_by_prefix(params: PyTree, prefix_labels: Dict[str, str], default: str = "main") -> PyTree:
    """Label each param leaf by slash-joined path prefix (longest match wins).

    e.g. ``{"encoder/vit": "frozen"}`` freezes only the ViT backbone — the
    reference's default freeze covers ``self.vit.parameters()`` but NOT the
    projection layer (vit:64); grid freezes only ``encoder/cnn`` (grid:79).
    """
    items = sorted(prefix_labels.items(), key=lambda kv: -len(kv[0]))

    def label_path(path, _leaf):
        parts = [p.key if hasattr(p, "key") else str(p) for p in path]
        joined = "/".join(parts)
        for prefix, label in items:
            if joined == prefix or joined.startswith(prefix + "/"):
                return label
        return default

    return jax.tree_util.tree_map_with_path(label_path, params)


# ---------------------------------------------------------------------------
# EMA
# ---------------------------------------------------------------------------


class EMAState(struct.PyTreeNode):
    shadow: PyTree  # EMA'd copies of masked params
    # Static, hashable: per-leaf tracked flags in tree_leaves order (a dict of
    # bools would be unhashable aux data and break jit caching).
    mask: tuple = struct.field(pytree_node=False)


class EMA:
    """Pytree EMA mirroring the reference ExponentialMovingAverage semantics."""

    def __init__(self, decay: float = 0.999):
        self.decay = decay

    def init(self, params: PyTree, trainable_mask: Optional[PyTree] = None) -> EMAState:
        if trainable_mask is None:
            mask = tuple(True for _ in jax.tree_util.tree_leaves(params))
        else:
            mask = tuple(bool(m) for m in jax.tree_util.tree_leaves(trainable_mask))
        # Shadow keeps the full tree (structure-stable); mask gates update/apply.
        # COPIES, not references: the train step donates the whole state, and
        # XLA rejects a tree that donates the same buffer twice (params+shadow).
        shadow = jax.tree_util.tree_map(jnp.array, params)
        return EMAState(shadow=shadow, mask=mask)

    def _zip_map(self, fn, state: EMAState, params: PyTree) -> PyTree:
        s_leaves, treedef = jax.tree_util.tree_flatten(state.shadow)
        p_leaves = jax.tree_util.tree_leaves(params)
        out = [fn(s, p, m) for s, p, m in zip(s_leaves, p_leaves, state.mask)]
        return jax.tree_util.tree_unflatten(treedef, out)

    def update(self, state: EMAState, params: PyTree) -> EMAState:
        d = self.decay
        shadow = self._zip_map(lambda s, p, m: d * s + (1.0 - d) * p if m else s, state, params)
        return EMAState(shadow=shadow, mask=state.mask)

    def apply_shadow(self, state: EMAState, params: PyTree) -> PyTree:
        """Params with tracked leaves replaced by their shadow (reference
        apply_shadow; 'restore' is just keeping the original params pytree)."""
        return self._zip_map(lambda s, p, m: s if m else p, state, params)


# ---------------------------------------------------------------------------
# Early stopping
# ---------------------------------------------------------------------------


class EarlyStopping:
    """Max-mode early stop: stop after ``patience`` epochs without min_delta gain."""

    def __init__(self, patience: int = 7, min_delta: float = 0.001):
        self.patience = patience
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.counter = 0
        self.should_stop = False

    def step(self, metric: float) -> bool:
        if self.best is None or metric > self.best + self.min_delta:
            self.best = metric
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop

    def state_dict(self):
        return {"best": self.best, "counter": self.counter, "should_stop": self.should_stop}

    def load_state_dict(self, s):
        self.best, self.counter, self.should_stop = s["best"], s["counter"], s["should_stop"]


# ---------------------------------------------------------------------------
# Model ensemble (optimizations.py:499-523 — defined-but-unused in reference)
# ---------------------------------------------------------------------------


class ModelEnsemble:
    """Weighted-logit ensemble over Captioner handles; generate delegates to the
    first model, like the reference."""

    def __init__(self, models, weights=None):
        self.models = list(models)
        n = len(self.models)
        self.weights = list(weights) if weights is not None else [1.0 / n] * n

    def forward(self, images, captions, lengths=None):
        out = None
        for w, m in zip(self.weights, self.models):
            logits = m.forward(images, captions, lengths)
            out = logits * w if out is None else out + logits * w
        return out

    def generate(self, *args, **kwargs):
        return self.models[0].generate(*args, **kwargs)
