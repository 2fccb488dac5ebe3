"""Automatic importance-tilt selection (mc.importance.auto_shift).

The design-point rule is pinned on an exactly-linear Gaussian model where
the optimum is known in closed form; the flight-coupled wrapper and the
CLI route are exercised end-to-end under the slow marker (they need a
reverse pass through the differentiable flight)."""

import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.mc import shift_from_gradients

GRADS = {"mass": -500.0, "motor_thrust": 800.0, "motor_flow": 120.0,
         "density": -50.0}
SIGMAS = {"mass": 0.02, "motor_thrust": 0.05, "motor_flow": 0.03,
          "density": 0.04}


def _lin_sigma(grads=GRADS, sigmas=SIGMAS):
    return float(np.sqrt(sum((grads[k] * sigmas[k]) ** 2 for k in grads)))


def test_design_point_reaches_threshold_at_full_frac():
    """At frac=1 the tilted mean of the LINEARIZED metric sits exactly on
    the threshold: value + sum_c r_c theta_c == threshold."""
    value, threshold = 1000.0, 1150.0
    shift, info = shift_from_gradients(value, GRADS, SIGMAS, threshold,
                                       frac=1.0, min_theta=0.0)
    moved = value + sum(GRADS[k] * SIGMAS[k] * shift[k] for k in shift)
    np.testing.assert_allclose(moved, threshold, rtol=1e-12)
    assert info["z_star"] == pytest.approx(
        (threshold - value) / _lin_sigma(), rel=1e-12
    )


def test_shift_signs_and_scaling():
    shift, _ = shift_from_gradients(1000.0, GRADS, SIGMAS, 1150.0,
                                    frac=0.75, min_theta=0.0)
    # upper tail: positive-response channels tilt positive, negative ones
    # negative (heavier rocket LOWERS apogee -> tilt mass down)
    assert shift["motor_thrust"] > 0 and shift["motor_flow"] > 0
    assert shift["mass"] < 0 and shift["density"] < 0
    # lower tail mirrors exactly
    lo, _ = shift_from_gradients(1000.0, GRADS, SIGMAS, 850.0,
                                 frac=0.75, min_theta=0.0)
    for k in shift:
        np.testing.assert_allclose(lo[k], -shift[k], rtol=1e-12)
    # frac scales linearly
    half, _ = shift_from_gradients(1000.0, GRADS, SIGMAS, 1150.0,
                                   frac=0.375, min_theta=0.0)
    for k in shift:
        np.testing.assert_allclose(half[k], 0.5 * shift[k], rtol=1e-12)


def test_min_theta_drops_weak_channels():
    grads = dict(GRADS, density=-5.0)  # |response| 0.2 vs thrust's 40
    shift, info = shift_from_gradients(1000.0, grads, SIGMAS, 1150.0,
                                       frac=0.75, min_theta=0.05)
    assert "density" not in shift and "motor_thrust" in shift
    # diagnostics still carry every responding channel
    assert set(info["response"]) == set(GRADS)


def test_zero_sigma_channels_untiltable():
    sig = dict(SIGMAS, motor_flow=0.0)  # solid motor: mdot follows thrust
    shift, info = shift_from_gradients(1000.0, GRADS, sig, 1150.0,
                                       min_theta=0.0)
    assert "motor_flow" not in shift and "motor_flow" not in info["response"]
    with pytest.raises(ValueError, match="zero linear response"):
        shift_from_gradients(1000.0, GRADS, {k: 0.0 for k in SIGMAS}, 1150.0)


@pytest.mark.slow
def test_auto_shift_end_to_end():
    """Flight-coupled: the tilt signs follow the real gradients and the
    CLI route produces a healthier tail estimate than its own nominal
    run would (n_eff_tail > plain expected hits)."""
    from erpl_monte_carlo_sim_tpu.cli.tail_probability import (
        tail_probability,
    )
    from erpl_monte_carlo_sim_tpu.engine import (
        InitialConditions,
        SimConfig,
    )
    from erpl_monte_carlo_sim_tpu.mc import auto_shift
    from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

    scene = nominal_scene(liquid_motor())
    cfg = SimConfig(max_time=8.0)
    ic = InitialConditions.vertical_launch()
    # nominal window apogee ~2.4 km; ask for a deep-ish tail
    shift, info = auto_shift(scene, ic, cfg, "apogee_altitude",
                             1.12 * 2400.0)
    assert info["metric_nominal"] > 1000.0
    assert shift["motor_thrust"] > 0 and shift["mass"] < 0
    out = tail_probability(
        "apogee_altitude", 1.06 * info["metric_nominal"], n=512, seed=3,
        shift="auto", scene=scene, sim_config=cfg,
    )
    assert out["method"] == "importance"
    assert out["auto_shift"]["shift"] == out["shift"]
    assert 0.0 <= out["probability"] <= 1.0
    assert out["n_eff_tail"] > 0


def test_non_finite_gradient_and_value_rejected():
    """NaN gradients must raise loudly — regression: NaN sailed through
    every comparison (NaN compares False), every channel was dropped, and
    the caller saw a misleading 'threshold too close to nominal' error."""
    bad = dict(GRADS, mass=float("nan"))
    with pytest.raises(ValueError, match="non-finite gradient"):
        shift_from_gradients(1000.0, bad, SIGMAS, 1200.0)
    with pytest.raises(ValueError, match="non-finite"):
        shift_from_gradients(float("nan"), GRADS, SIGMAS, 1200.0)
