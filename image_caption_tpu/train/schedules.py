"""Learning-rate schedules.

- ``warmup_cosine_schedule``: linear warmup then cosine decay to ``min_lr``,
  stepped PER OPTIMIZER STEP (reference WarmupCosineScheduler,
  utils/optimizations.py:108-131, stepped per batch in the optimized scripts).
- ``transformer_schedule``: Vaswani et al. d_model^-0.5 * min(s^-0.5, s*w^-1.5)
  (optimizations.py:134-150; defined-but-unused in the reference).
- ``ReduceLROnPlateau``: host-side epoch-level factor-on-plateau over a max-mode
  metric (val CIDEr), the base scripts' scheduler (train_vit_transformer.py:328-333,
  mode 'max', factor 0.5, patience 3).  It is stateful host logic, so it emits a
  scale factor consumed by the optimizer's scale-by-schedule stage.

All jax schedules are plain ``step -> lr`` callables compatible with
``optax.scale_by_learning_rate``-style usage.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def warmup_cosine_schedule(
    base_lr: float, warmup_steps: int, total_steps: int, min_lr: float = 1e-7
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        step = jnp.asarray(step, dtype=jnp.float32)
        warmup_factor = step / max(1, warmup_steps)
        warmup_lr = base_lr * warmup_factor
        progress = (step - warmup_steps) / max(1, total_steps - warmup_steps)
        cosine_factor = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        cosine_lr = min_lr + (base_lr - min_lr) * cosine_factor
        return jnp.where(step < warmup_steps, warmup_lr, cosine_lr)

    return schedule


def transformer_schedule(
    d_model: int, warmup_steps: int = 4000, factor: float = 1.0, base_lr: float = 1.0
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        s = jnp.maximum(jnp.asarray(step, dtype=jnp.float32), 1.0)
        scale = factor * (d_model ** -0.5) * jnp.minimum(s ** -0.5, s * (warmup_steps ** -1.5))
        return base_lr * scale

    return schedule


class ReduceLROnPlateau:
    """Max-mode plateau scheduler (torch semantics: factor 0.5, patience N).

    ``step(metric)`` returns the current LR multiplier; apply it by scaling the
    optimizer's learning rate (train/steps.py threads it through as ``lr_scale``).
    """

    def __init__(self, factor: float = 0.5, patience: int = 3, min_scale: float = 1e-8, threshold: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.min_scale = min_scale
        self.threshold = threshold
        self.best = -math.inf
        self.num_bad = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        # torch 'max'/'rel' improvement test: metric > best * (1 + threshold)
        dynamic_best = self.best * (1 + self.threshold) if self.best > 0 else self.best
        if metric > dynamic_best:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.num_bad = 0
        return self.scale

    def state_dict(self):
        return {"best": self.best, "num_bad": self.num_bad, "scale": self.scale}

    def load_state_dict(self, state):
        self.best = state["best"]
        self.num_bad = state["num_bad"]
        self.scale = state["scale"]
