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
    the config was applied. Respects an existing user configuration: if a
    cache dir is already set (env var or explicit jax.config), nothing is
    overridden. Failure (e.g. renamed knobs in a future jax) is logged, not
    swallowed silently — a cold compile here is minutes."""
    import jax

    try:
        current = jax.config.jax_compilation_cache_dir
        if current:
            return True  # user already configured a cache; leave it alone
        jax.config.update("jax_compilation_cache_dir", path or _DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        return True
    except Exception as e:  # pragma: no cover - depends on jax version
        from .logging import get_logger

        get_logger("cache").warning(
            "persistent compile cache unavailable (%s); expect cold compiles",
            e,
        )
        return False
