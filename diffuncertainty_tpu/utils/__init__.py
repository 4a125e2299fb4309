"""Shared utilities: profiling, seeding, compile-cache setup."""

import os

from .profiling import phase_timer, trace_to

__all__ = ["enable_compile_cache", "phase_timer", "trace_to"]


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point XLA's persistent compilation cache at a durable directory.

    TPU compiles of the fused samplers take 30-120 s (more through a remote
    tunnel); the persistent cache makes every job after the first start in
    seconds. Resolution order: explicit ``path`` > ``DU_COMPILE_CACHE`` env
    (empty string disables) > ``~/.cache/diffuncertainty_tpu/xla``. Must be
    called before the first compilation; safe to call more than once.
    """
    if path is None:
        path = os.environ.get(
            "DU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "diffuncertainty_tpu", "xla"),
        )
    if not path:
        return None
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
