"""Differentiable flight path: consistency with the while_loop engine and
gradient correctness vs finite differences."""

import jax
import jax.numpy as jnp
import pytest

from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig, simulate_summary
from erpl_monte_carlo_sim_tpu.engine.diff import apogee_and_grad, simulate_apogee_diff
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

CFG = SimConfig(max_time=90.0)  # to apogee (~75 s) and a bit beyond


@pytest.fixture(scope="module")
def scene():
    return nominal_scene(liquid_motor())


@pytest.fixture(scope="module")
def ic():
    return InitialConditions.vertical_launch()


def test_diff_path_matches_while_loop(scene, ic):
    apo_wl = jax.jit(simulate_summary, static_argnums=2)(scene, ic, CFG).apogee_altitude
    apo_sc = jax.jit(simulate_apogee_diff, static_argnums=(2, 3, 4))(
        scene, ic, CFG, CFG.max_steps, 512
    )
    assert float(apo_sc) == pytest.approx(float(apo_wl), rel=1e-10)


@pytest.mark.slow
def test_apogee_gradient_vs_finite_difference(scene, ic):
    apo, grad = apogee_and_grad(scene, ic, CFG, wrt="motor.thrust_scale")
    assert float(apo) == pytest.approx(25194.3, rel=1e-3)
    # Central finite difference
    eps = 1e-3
    up = simulate_apogee_diff(
        scene.replace(motor=scene.motor.replace(thrust_scale=1.0 + eps)), ic, CFG
    )
    dn = simulate_apogee_diff(
        scene.replace(motor=scene.motor.replace(thrust_scale=1.0 - eps)), ic, CFG
    )
    fd = (float(up) - float(dn)) / (2 * eps)
    # Thrusting harder raises apogee by tens of km per unit scale
    assert fd > 1000.0
    assert float(grad) == pytest.approx(fd, rel=2e-2)


@pytest.mark.slow
def test_gradient_wrt_dry_mass_negative(scene, ic):
    _, grad = apogee_and_grad(scene, ic, CFG, wrt="rocket.dry_mass")
    assert float(grad) < 0.0  # heavier rocket flies lower


@pytest.mark.slow
def test_record_stride_consistency(scene, ic):
    """Strided trajectory recording: same physics, 1/N records."""
    from erpl_monte_carlo_sim_tpu.engine import simulate_flight

    cfg1 = SimConfig(max_time=20.0, record_stride=1)
    cfg8 = SimConfig(max_time=20.0, record_stride=8)
    s1, t1 = jax.jit(simulate_flight, static_argnums=2)(scene, ic, cfg1)
    s8, t8 = jax.jit(simulate_flight, static_argnums=2)(scene, ic, cfg8)
    assert float(s1.apogee_altitude) == pytest.approx(
        float(s8.apogee_altitude), rel=1e-12
    )
    assert t8.time.shape[0] - 1 == -(-cfg8.max_steps // 8)
    # strided samples line up with the dense record
    import numpy as np

    v1 = np.asarray(t1.valid)
    v8 = np.asarray(t8.valid)
    alt1 = np.asarray(t1.position[:, 2])[v1]
    alt8 = np.asarray(t8.position[:, 2])[v8]
    np.testing.assert_allclose(alt8[1:40], alt1[8::8][:39], rtol=1e-12)
