"""Persistent XLA compile cache helper.

On the axon-tunneled TPU a cold XLA compile of the Monte Carlo hot loop is
1-5 minutes (remote compile); the persistent cache makes every later
process reuse it. One call, idempotent, safe before or after backend
initialization (the config keys are process-level, not backend-level).
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_compile_cache")


def enable_persistent_cache(path: str | None = None) -> bool:
    """Point jax at the repo-local persistent compile cache. Returns True if
    the config was applied (False on very old jax without the knobs)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path or _DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        return True
    except Exception:
        return False
