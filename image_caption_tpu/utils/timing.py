"""Honest device timing on the tunneled TPU backend.

THE GOTCHA (discovered round 3, root cause of round 2's physically impossible
PERF numbers): on this image's tunneled `axon` TPU backend,
``jax.block_until_ready`` returns WITHOUT waiting for device execution —
64 chained 8192^3 matmuls (70 TFLOPs) "completed" in 0.1 ms, implying
724,000 TFLOP/s on a 197 TFLOP/s chip.  Only fetching a VALUE to the host
(``float(x)``, ``np.asarray(x)``) actually synchronizes.  With value-fetch
sync the same matmul chain measures 169 TFLOP/s = 86% of v5e peak — sane.

The tunnel adds a ~35-40 ms fixed round trip per fetch, so single-shot
fetch timings are RTT-dominated.  ``device_time`` therefore measures the
SLOPE: run a jitted chain of k1 and k2 dependent iterations (the carry
forces sequential execution; the scalar output forces a real fetch) and
return ``(t(k2) - t(k1)) / (k2 - k1)`` — fixed dispatch + RTT cancel.

Usage::

    def body(i, carry):          # carry: scalar f32; must DEPEND on the work
        ...
        return new_scalar_carry
    per_iter_s = device_time(body, iters=(4, 24))
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def chain_scalar(body: Callable):
    """Jit a DYNAMIC-trip-count fori_loop over ``body(i, scalar, *args) -> scalar``.

    The trip count is a traced argument, so one compile (5-90 s through the
    tunnel) serves every k the slope measurement needs.  Pass params/inputs
    through ``*args`` — arrays CLOSED OVER by ``body`` become inline
    constants, and the tunnel's remote_compile rejects large programs
    (HTTP 413 at ~full-model params embedded as constants).
    """

    @jax.jit
    def run(seed: jnp.ndarray, k: jnp.ndarray, *args) -> jnp.ndarray:
        return jax.lax.fori_loop(0, k, lambda i, s: body(i, s, *args), seed)

    return run


def device_time(
    body: Callable,
    *args,
    iters: Tuple[int, int] = (4, 24),
    reps: int = 3,
    warmup: bool = True,
) -> float:
    """Seconds of true device time per iteration of ``body`` (slope method)."""
    k1, k2 = iters
    assert k2 > k1
    run = chain_scalar(body)
    seed = jnp.float32(0.0)
    if warmup:
        float(run(seed, jnp.int32(k1), *args))
    t1 = min(_timed_fetch(run, seed, k1, *args) for _ in range(reps))
    t2 = min(_timed_fetch(run, seed, k2, *args) for _ in range(reps))
    return max((t2 - t1) / (k2 - k1), 0.0)


def _timed_fetch(run, seed, k, *args) -> float:
    t0 = time.perf_counter()
    float(run(seed, jnp.int32(k), *args))
    return time.perf_counter() - t0


def fetch_time(x) -> float:
    """End-to-end wall time to fetch ``x``'s value (includes tunnel RTT)."""
    t0 = time.perf_counter()
    jax.device_get(x)
    return time.perf_counter() - t0
