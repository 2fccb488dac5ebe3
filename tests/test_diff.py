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


def test_gradient_wrt_dry_mass_negative(scene, ic):
    _, grad = apogee_and_grad(scene, ic, CFG, wrt="rocket.dry_mass")
    assert float(grad) < 0.0  # heavier rocket flies lower
