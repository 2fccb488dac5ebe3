"""Masked on-device statistics for Monte Carlo summaries.

Replaces the reference's in-driver Python loops over result dicts
(`/root/reference/rocket_simulation/monte_carlo.py:400-473`) with jitted
reductions over masked lanes: invalid lanes never poison a mean, and the
whole stats block is one device program (sharded batches reduce with XLA
collectives — see parallel/).

Percentiles use the same linear-interpolation definition as
``np.percentile(values, [5, 25, 50, 75, 95])`` (`monte_carlo.py:458`).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["masked_stats", "PERCENTILES"]

PERCENTILES = (5.0, 25.0, 50.0, 75.0, 95.0)


def masked_stats(values: jnp.ndarray, mask: jnp.ndarray) -> dict:
    """mean/std/min/max/percentiles over ``values[mask]``.

    Branch-free; works under jit for any static batch size. With zero valid
    lanes, returns NaNs (the reference raises — callers check ``n_valid``).
    Matches the reference's stats block (`monte_carlo.py:444-459`): std is
    the population std (np.std default), percentiles are linear-interpolated.
    """
    mask = mask & jnp.isfinite(values)
    n_valid = jnp.sum(mask)
    denom = jnp.maximum(n_valid, 1)

    zeroed = jnp.where(mask, values, 0.0)
    mean = jnp.sum(zeroed) / denom
    var = jnp.sum(jnp.where(mask, (values - mean) ** 2, 0.0)) / denom
    std = jnp.sqrt(var)

    big = jnp.asarray(jnp.inf, values.dtype)
    vmin = jnp.min(jnp.where(mask, values, big))
    vmax = jnp.max(jnp.where(mask, values, -big))

    # Percentiles: sort with invalid lanes pushed to +inf, index the valid
    # prefix with np.percentile's linear rule idx = q/100 * (n_valid - 1).
    sorted_vals = jnp.sort(jnp.where(mask, values, big))
    qs = jnp.asarray(PERCENTILES, values.dtype)
    idx = qs / 100.0 * jnp.maximum(n_valid - 1, 0).astype(values.dtype)
    lo = jnp.floor(idx).astype(jnp.int32)
    hi = jnp.ceil(idx).astype(jnp.int32)
    frac = idx - lo.astype(values.dtype)
    v_lo = sorted_vals[lo]
    v_hi = sorted_vals[hi]
    pct = v_lo + (v_hi - v_lo) * frac

    nan = jnp.asarray(jnp.nan, values.dtype)
    empty = n_valid == 0
    return {
        "mean": jnp.where(empty, nan, mean),
        "std": jnp.where(empty, nan, std),
        "min": jnp.where(empty, nan, vmin),
        "max": jnp.where(empty, nan, vmax),
        "percentiles": jnp.where(empty, nan, pct),
        "n": n_valid,
    }
