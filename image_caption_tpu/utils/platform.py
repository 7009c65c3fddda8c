"""Backend/platform selection helpers.

This image's sitecustomize force-registers the axon TPU platform and overrides
the ``JAX_PLATFORMS`` env var, so selecting the CPU backend requires flipping
``jax.config`` before the backend is first used.  Centralised here so every
CPU path also drops the persistent compilation cache: XLA:CPU AOT replay
warns 'could lead to execution errors such as SIGILL' whenever the recorded
compile-machine features differ from the host (XLA bakes tuning pseudo-features
like +prefer-no-scatter into the record, so even same-host replay mismatches).
Only tunneled-TPU compiles — the cache's purpose — stay cached.
"""


def force_cpu(num_devices: int | None = None) -> None:
    """Select the CPU backend (and optionally a virtual multi-device mesh).

    Must be called before JAX initializes a backend.  Disables the persistent
    XLA compilation cache (CPU AOT replay is unsafe/noisy; see module doc).

    num_devices: if given, request an n-device virtual CPU platform via both
    ``jax_num_cpu_devices`` and ``XLA_FLAGS`` (whichever this jax honors).
    """
    import os

    if num_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={num_devices}"
            )

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", None)
    if num_devices is not None:
        try:
            jax.config.update("jax_num_cpu_devices", num_devices)
        except Exception:
            pass  # older jax: XLA_FLAGS alone handles it
