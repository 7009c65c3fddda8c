"""Mixed-precision dtype policy.

TPU-first rule: parameters and optimizer state live in float32; matmul/conv compute
runs in bfloat16 (MXU-native); logits, softmax, loss and argmax are computed in
float32 so greedy decode is deterministic and reproducible across backends.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32  # logits / loss dtype

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)

    def cast_output(self, x):
        return x.astype(self.output_dtype)


def default_policy(bf16: bool = True) -> DTypePolicy:
    if bf16:
        return DTypePolicy()
    return DTypePolicy(compute_dtype=jnp.float32)


# Singleton used by model builders unless a config overrides it.
POLICY = default_policy()
