"""Physics-bounds outlier filter as a branch-free lane mask.

Functional parity with `/root/reference/rocket_simulation/monte_carlo.py:
337-398` (``_filter_physics_outliers``), re-designed as a vectorized mask +
reason bitmask: the reference iterates result dicts in Python and attaches
``outlier_reasons`` strings; here one jitted expression classifies every
lane, and reasons are decoded host-side only for reporting.

The filter is LOAD-BEARING: dispersed 6DOF lanes can genuinely diverge
during tumbling descent (the reference does too — SURVEY.md §6 measured
apogees up to 4e8 m), and statistics must be computed over the valid mask.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..engine.simulate import FlightSummary

__all__ = [
    "OutlierBounds",
    "outlier_mask",
    "decode_reasons",
    "REASON_NAMES",
]

import dataclasses


@dataclasses.dataclass(frozen=True)
class OutlierBounds:
    """Physical bounds for a suborbital sounding rocket
    (`monte_carlo.py:342-346,379-386`)."""

    max_apogee: float = 80000.0  # m
    min_apogee: float = 100.0  # m (must clear the tower)
    max_range: float = 200000.0  # m
    max_flight_time: float = 600.0  # s
    # Energy sanity: v_max = 1200 m/s -> h_max = v^2/(2 g) ~ 73.4 km, with a
    # 20% margin (`monte_carlo.py:383-386`).
    theoretical_max_velocity: float = 1200.0
    energy_margin: float = 1.2

    @property
    def energy_limit_altitude(self) -> float:
        return self.theoretical_max_velocity**2 / (2 * 9.81) * self.energy_margin


# Bit positions in the reason mask (host-side decode for reports).
REASON_NAMES = (
    "non-finite values",
    "apogee above max",
    "apogee below min",
    "range above max",
    "flight time above max",
    "apogee exceeds theoretical energy limit",
    "diverged during integration",
)


def outlier_mask(summary: FlightSummary, bounds: OutlierBounds = OutlierBounds()):
    """Classify every lane. Returns ``(valid_mask[n] bool, reasons[n] int32)``.

    A lane is valid iff reasons == 0. Reason bits follow REASON_NAMES.
    """
    apogee = summary.apogee_altitude
    rng = summary.range
    ft = summary.flight_time

    nonfinite = ~(jnp.isfinite(apogee) & jnp.isfinite(rng) & jnp.isfinite(ft))
    too_high = apogee > bounds.max_apogee
    too_low = apogee < bounds.min_apogee
    too_far = rng > bounds.max_range
    too_long = ft > bounds.max_flight_time
    energy = apogee > bounds.energy_limit_altitude
    diverged = summary.diverged

    reasons = (
        nonfinite.astype(jnp.int32) * 1
        + too_high.astype(jnp.int32) * 2
        + too_low.astype(jnp.int32) * 4
        + too_far.astype(jnp.int32) * 8
        + too_long.astype(jnp.int32) * 16
        + energy.astype(jnp.int32) * 32
        + diverged.astype(jnp.int32) * 64
    )
    return reasons == 0, reasons


def decode_reasons(reason_bits: int) -> list:
    """Host-side: reason bitmask -> list of reason strings (report parity)."""
    return [name for i, name in enumerate(REASON_NAMES) if reason_bits & (1 << i)]
