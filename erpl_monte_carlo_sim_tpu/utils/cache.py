"""Persistent XLA compile cache helper.

On the axon-tunneled TPU a cold XLA compile of the Monte Carlo hot loop is
1-5 minutes (remote compile); the persistent cache makes every later
process reuse it. One call, idempotent, safe before or after backend
initialization (the config keys are process-level, not backend-level).
"""

from __future__ import annotations

import hashlib
import os

__all__ = ["enable_persistent_cache", "host_fingerprint"]

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_compile_cache")


def host_fingerprint() -> str:
    """8-hex-char digest of this host's CPU feature flags.

    XLA:CPU persists AOT-compiled executables keyed only by program +
    compiler version; an entry compiled on a host with wider SIMD features
    (amx/avx512) replayed on a narrower host is a latent SIGILL. CPU-platform
    cache dirs are therefore keyed by this fingerprint so each host
    population is disjoint. TPU executables are host-independent; the TPU
    cache stays unkeyed.

    Known cosmetic residue (measured r5): this jax/XLA build also logs
    ``cpu_aot_loader`` "machine features don't match" errors for entries
    written BY THE SAME HOST, because XLA embeds the pseudo-features
    ``+prefer-no-scatter/+prefer-no-gather`` in the AOT result and the
    loader can't find them in host CPUID. Verified by writing a fresh
    cache into an empty dir and reloading in a new process (6 such errors,
    zero real feature deltas). Those messages are noise — the entries load
    and warm runs are measurably faster; only a mismatch in REAL features
    (the amx/avx512 class this fingerprint keys on) is dangerous.
    """
    try:
        flags = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
        return hashlib.sha256(flags.encode()).hexdigest()[:8]
    except OSError:  # pragma: no cover - non-Linux
        return "unknown"


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
        base = path or _DEFAULT_DIR
        plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        if "cpu" in str(plats).split(","):
            # CPU AOT executables embed host SIMD features — key the dir by
            # host so another machine never replays them (see
            # host_fingerprint).
            base = f"{base}-{host_fingerprint()}"
        jax.config.update("jax_compilation_cache_dir", base)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        return True
    except Exception as e:  # pragma: no cover - depends on jax version
        from .logging import get_logger

        get_logger("cache").warning(
            "persistent compile cache unavailable (%s); expect cold compiles",
            e,
        )
        return False
