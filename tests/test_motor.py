"""Motor model: unified solid/liquid thrust law vs goldens + dispersion scaling."""

import jax.numpy as jnp
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.models import (
    liquid_motor,
    mass_flow_rate_at,
    propellant_remaining,
    solid_motor,
    thrust_at,
)

# ~5-min core-correctness tier (CLAUDE.md): goldens + engine basics.
pytestmark = pytest.mark.smoke


RTOL = 1e-9


@pytest.mark.parametrize("kind", ["solid", "liquid"])
def test_motor_golden(kind, golden_units):
    m = solid_motor() if kind == "solid" else liquid_motor()
    g = golden_units["motor"][kind]
    assert float(m.burn_time) == pytest.approx(g["burn_time"], rel=1e-12)
    assert float(m.nozzle_exit_area) == pytest.approx(g["nozzle_exit_area"], rel=1e-12)
    for t, p, ref in g["thrust"]:
        assert float(thrust_at(m, t, p)) == pytest.approx(ref, rel=RTOL, abs=1e-9), (t, p)
    for t, ref in g["mdot"]:
        assert float(mass_flow_rate_at(m, t)) == pytest.approx(ref, rel=1e-12, abs=0)
    for t, ref in g["prop_remaining"]:
        assert float(propellant_remaining(m, t)) == pytest.approx(ref, rel=1e-12, abs=0)


def test_solid_average_thrust(golden_units):
    m = solid_motor()
    g = golden_units["motor"]["solid"]
    assert float(m.curve_thrust_sl[5]) == pytest.approx(
        1.2 * g["average_thrust"], rel=1e-12
    )


def test_thrust_scale_matches_reference_perturbation():
    """The reference's perturbed motor scales the thrust curve AND nozzle
    exit area by one multiplier (`motor.py:104-108,123`), which factors out
    as thrust_scale * (base + correction). Verify the factorization."""
    mult = 1.037
    base = solid_motor()
    scaled = base.replace(thrust_scale=jnp.float64(mult))
    for t, p in [(0.35, 90000.0), (6.0, 50000.0), (14.5, 1000.0)]:
        ref = mult * float(thrust_at(base, t, p))
        assert float(thrust_at(scaled, t, p)) == pytest.approx(ref, rel=1e-12)


def test_thrust_gating_bounds():
    m = liquid_motor()
    bt = float(m.burn_time)
    assert float(thrust_at(m, -0.001, 101325.0)) == 0.0
    assert float(thrust_at(m, bt + 1e-6, 101325.0)) == 0.0
    # Inclusive at t = burn_time, like the reference's `time > burn_time` gate.
    assert float(thrust_at(m, bt, 101325.0)) > 0.0


def test_liquid_equals_vacuum_minus_ae_p():
    m = liquid_motor()
    for p in [101325.0, 50000.0, 0.0]:
        ref = float(m.thrust_vacuum) - float(m.nozzle_exit_area) * p
        assert float(thrust_at(m, 5.0, p)) == pytest.approx(ref, rel=1e-12)
