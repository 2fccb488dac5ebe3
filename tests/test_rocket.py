"""Rocket model: Barrowman CP, mass properties, aero coefficients vs goldens."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.models import (
    RocketParams,
    aero_coefficients,
    dynamic_cp,
    mass_properties,
    stability_margin,
)

# ~5-min core-correctness tier (CLAUDE.md): goldens + engine basics.
pytestmark = pytest.mark.smoke


RTOL = 5e-7


@pytest.fixture(scope="module")
def rocket():
    return RocketParams.create()


def test_barrowman_cp(rocket, golden_units):
    assert float(rocket.cp_location) == pytest.approx(
        golden_units["rocket"]["cp_location"], rel=1e-12
    )
    assert float(rocket.reference_area) == pytest.approx(
        golden_units["rocket"]["reference_area"], rel=1e-12
    )


def test_mass_properties_golden(rocket, golden_units):
    for frac, ref in golden_units["rocket"]["mass_props"].items():
        mp = mass_properties(rocket, jnp.float64(float(frac)))
        assert float(mp.mass) == pytest.approx(ref["mass"], rel=1e-12)
        assert float(mp.center_of_mass) == pytest.approx(ref["center_of_mass"], rel=1e-12)
        assert float(mp.Ixx) == pytest.approx(ref["Ixx"], rel=1e-12)
        assert float(mp.Iyy) == pytest.approx(ref["Iyy"], rel=1e-12)
        assert float(mp.Izz) == pytest.approx(ref["Izz"], rel=1e-12)


def test_stability_margin_golden(rocket, golden_units):
    for frac, ref in golden_units["rocket"]["stability_margin"].items():
        assert float(stability_margin(rocket, float(frac))) == pytest.approx(
            ref, rel=1e-12
        )


def test_dynamic_cp_golden(rocket, golden_units):
    for mach, ref in golden_units["rocket"]["dynamic_cp"]:
        assert float(dynamic_cp(rocket, mach)) == pytest.approx(ref, rel=1e-12)


def test_aero_coefficients_golden(rocket, golden_units):
    """Covers subsonic/transonic/supersonic Mach, pre/post-stall alpha,
    signed alpha/beta, and power-on/off — every branch of the reference's
    coefficient build-up (`rocket.py:138-218`)."""
    for case in golden_units["rocket"]["aero"]:
        mp = mass_properties(rocket, jnp.float64(case["frac"]))
        co = aero_coefficients(
            rocket, case["mach"], case["alpha"], case["beta"],
            center_of_mass=mp.center_of_mass, power_on=case["frac"] > 0,
        )
        for key, ref in case["coeffs"].items():
            assert float(getattr(co, key)) == pytest.approx(
                ref, rel=RTOL, abs=1e-9
            ), (case, key)


def test_power_off_drag_factor(rocket):
    on = aero_coefficients(rocket, 0.8, 0.01, power_on=True)
    off = aero_coefficients(rocket, 0.8, 0.01, power_on=False)
    assert float(off.cd) == pytest.approx(float(on.cd) * 1.2, rel=1e-12)


def test_stall_taper_to_zero_lift(rocket):
    # At alpha = 45 deg the stall factor hits zero.
    co = aero_coefficients(rocket, 0.3, jnp.radians(45.0))
    assert abs(float(co.cl)) < 1e-12
    assert abs(float(co.cn)) < 1e-12


def test_vmap_over_mass_multiplier(rocket):
    mults = jnp.array([0.98, 1.0, 1.02])
    batched = jax.vmap(
        lambda m: rocket.replace(dry_mass=rocket.dry_mass * m,
                                 propellant_mass=rocket.propellant_mass * m)
    )(mults)
    masses = jax.vmap(lambda r: mass_properties(r, 1.0).mass)(batched)
    np.testing.assert_allclose(
        np.asarray(masses), (113.4 + 63.5) * np.asarray(mults), rtol=1e-12
    )
