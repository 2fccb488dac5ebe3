"""Atmosphere model: golden parity + the reference's property tests.

The reference's test strategy asserted monotonic pressure/density decrease
and positivity at 15-50 km (`test_fixes.py:18-38`, `test_atmosphere_fix.py`);
we keep those as property tests, add layer-boundary continuity checks
(11/20/25/32 km — the reference had a known discontinuity bug there), and
pin golden values from executing the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.models import (
    AtmosphereParams,
    atmosphere_properties,
    gravity_at,
)

# ~5-min core-correctness tier (CLAUDE.md): goldens + engine basics.
pytestmark = pytest.mark.smoke


RTOL = 5e-7  # transcendental-limited on this XLA build


@pytest.fixture(scope="module")
def atm():
    return AtmosphereParams.create()


def test_golden_properties(atm, golden_units):
    g = golden_units["atmosphere"]
    for alt, props, grav in zip(g["altitudes"], g["properties"], g["gravity"]):
        mine = atmosphere_properties(atm, jnp.float64(alt))
        for key, ref in props.items():
            assert float(getattr(mine, key)) == pytest.approx(ref, rel=RTOL), (alt, key)
        assert float(gravity_at(atm, jnp.float64(alt))) == pytest.approx(grav, rel=RTOL)


def test_monotonic_decrease_and_positive(atm):
    """Positive everywhere; pressure/density monotone decreasing WITHIN each
    regime. The reference model is NOT globally monotone: its 25-32 km
    gradient layer anchors the power law at 216.65 K while evaluating T(h)
    from 20 km, producing a documented upward pressure jump at 25 km
    (`environment.py:71-81`; this is the discontinuity bug SURVEY.md §4 notes
    the reference's own stale test trips over). We pin the behavior
    faithfully and assert monotonicity per-regime."""
    segments = [(0.0, 24999.0), (32001.0, 50000.0)]
    for lo, hi in segments:
        alts = jnp.linspace(lo, hi, 200)
        props = atmosphere_properties(atm, alts)
        p = np.asarray(props.pressure)
        rho = np.asarray(props.density)
        T = np.asarray(props.temperature)
        assert (p > 0).all() and (rho > 0).all() and (T > 0).all()
        assert (np.diff(p) < 0).all(), f"pressure not monotone in [{lo},{hi}]"
        assert (np.diff(rho) < 0).all(), f"density not monotone in [{lo},{hi}]"
    # Quirk pinned: in 25-32 km the reference's power law has a POSITIVE
    # exponent (`environment.py:79-81`), so pressure INCREASES with altitude
    # there (verified against the executed reference, golden 25001->31999 m).
    alts = jnp.linspace(25001.0, 31999.0, 50)
    p = np.asarray(atmosphere_properties(atm, alts).pressure)
    assert (np.diff(p) > 0).all(), "expected the reference's rising 25-32 km regime"


def test_layer_boundary_continuity(atm):
    # Continuous at the 11 km and 20 km boundaries.
    for boundary, tol in [(11000.0, 1e-5), (20000.0, 1e-5)]:
        below = atmosphere_properties(atm, jnp.float64(boundary - 0.01))
        above = atmosphere_properties(atm, jnp.float64(boundary + 0.01))
        rel = abs(float(above.pressure) - float(below.pressure)) / float(below.pressure)
        assert rel < tol, f"pressure jump {rel:.2e} at {boundary} m"


def test_high_boundary_jumps_quirk_pinned(atm):
    """Pin the reference's pressure discontinuities so any future 'fix' is a
    deliberate, test-visible decision: +32% at 25 km (gradient layer anchored
    at 216.65 K while T(h) ramps from 20 km, `environment.py:71-81`) and the
    resulting -82% drop onto the hard-coded 868.02 Pa anchor at 32 km
    (`environment.py:89`)."""
    b25 = float(atmosphere_properties(atm, jnp.float64(24999.99)).pressure)
    a25 = float(atmosphere_properties(atm, jnp.float64(25000.01)).pressure)
    assert a25 / b25 == pytest.approx(1.321, abs=0.01)
    b32 = float(atmosphere_properties(atm, jnp.float64(31999.99)).pressure)
    a32 = float(atmosphere_properties(atm, jnp.float64(32000.01)).pressure)
    assert a32 / b32 == pytest.approx(868.02 / 4804.2, abs=0.01)


def test_density_scale_is_functional(atm):
    """The reference's advertised 5% density dispersion was a no-op
    (`monte_carlo.py:326-335` writes a field `environment.py:93` never
    reads). Ours must actually scale density — and ONLY density."""
    scaled = AtmosphereParams.create(density_scale=1.05)
    base = atmosphere_properties(atm, 5000.0)
    pert = atmosphere_properties(scaled, 5000.0)
    assert float(pert.density) == pytest.approx(float(base.density) * 1.05, rel=1e-12)
    assert float(pert.pressure) == pytest.approx(float(base.pressure), rel=1e-12)
    assert float(pert.temperature) == pytest.approx(float(base.temperature), rel=1e-12)


def test_extreme_altitudes_finite(atm):
    """Divergent Monte Carlo lanes feed wild altitudes into the atmosphere;
    every output must stay finite (the where-branches are all guarded)."""
    alts = jnp.array([-5000.0, 0.0, 1e5, 1e6, 1e7])
    props = atmosphere_properties(atm, alts)
    for leaf in props:
        assert np.isfinite(np.asarray(leaf)).all()


def test_vmap_batches_params():
    """Per-lane density_scale under vmap (the MC dispersion path)."""
    scales = jnp.array([0.9, 1.0, 1.1])
    batched = jax.vmap(lambda s: AtmosphereParams(density_scale=s))(scales)
    rho = jax.vmap(lambda a: atmosphere_properties(a, 1000.0).density)(batched)
    base = float(atmosphere_properties(AtmosphereParams.create(), 1000.0).density)
    np.testing.assert_allclose(np.asarray(rho), base * np.asarray(scales), rtol=1e-12)
