"""First-order sensitivity / variance budget (cli/sensitivity.py).

Validates the one-reverse-pass channel gradients against central finite
differences of the SAME perturbation map (f64 under the test conftest), and
pins that the rail-start singularity fix (ops.math.safe_norm + sanitized
atan2 guards) keeps every channel gradient finite — reverse-mode through
the zero-velocity launch state used to NaN on the additive channels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.cli.sensitivity import (
    CHANNELS,
    _perturbed_scene,
    apogee_sensitivities,
    variance_budget,
)
from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig
from erpl_monte_carlo_sim_tpu.engine.diff import simulate_apogee_diff
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

CFG = SimConfig(max_time=8.0)


def _apogee_at(scene, ic, overrides):
    c = {k: jnp.asarray(1.0 if k.endswith("multiplier") else 0.0)
         for k in CHANNELS}
    c.update({k: jnp.asarray(v) for k, v in overrides.items()})
    s2, ic2 = _perturbed_scene(scene, ic, c)
    return float(simulate_apogee_diff(s2, ic2, CFG))


@pytest.mark.slow
def test_gradients_finite_and_match_fd():
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    apogee, grads = apogee_sensitivities(scene, ic, CFG)
    assert float(apogee) > 1000.0
    for k in CHANNELS:
        assert np.isfinite(float(grads[k])), f"NaN gradient for {k}"

    # central finite differences of the same map (f64: conftest enables x64)
    for k, nominal, eps in (
        ("mass_multiplier", 1.0, 1e-4),
        ("wind_u_offset", 0.0, 1e-2),
        ("pitch_offset", 0.0, 1e-4),
    ):
        hi = _apogee_at(scene, ic, {k: nominal + eps})
        lo = _apogee_at(scene, ic, {k: nominal - eps})
        fd = (hi - lo) / (2 * eps)
        ad = float(grads[k])
        assert np.isfinite(fd)
        np.testing.assert_allclose(ad, fd, rtol=2e-2, atol=0.5), k


@pytest.mark.slow
def test_variance_budget_structure():
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    out = variance_budget(scene, ic, CFG)
    assert set(out["channels"]) == set(CHANNELS)
    total = out["apogee_sigma_first_order_m"]
    assert np.isfinite(total) and total > 0
    contribs = [v["apogee_sigma_contribution_m"]
                for v in out["channels"].values()]
    # RSS identity
    np.testing.assert_allclose(total, np.sqrt(np.sum(np.square(contribs))),
                               rtol=1e-6)
    # liquid motor: flow multiplier acts independently (sigma > 0)
    assert out["channels"]["flow_multiplier"]["sigma"] > 0


def test_wind_sigma_respects_direction_range():
    from erpl_monte_carlo_sim_tpu.cli.sensitivity import _channel_sigmas
    from erpl_monte_carlo_sim_tpu.mc.dispersions import UncertaintyParams
    from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

    scene = nominal_scene(liquid_motor())
    # default full circle reduces to the isotropic formula sqrt(E[S^2]/2)
    iso = _channel_sigmas(scene, UncertaintyParams())["wind_u_offset"]
    np.testing.assert_allclose(iso, np.sqrt(25.0 / 3.0 / 2.0), rtol=1e-6)
    # near-constant direction: Var(u) -> Var(S) = (b-a)^2/12
    narrow = _channel_sigmas(
        scene, UncertaintyParams(wind_direction_range=(0.0, 1e-4))
    )["wind_u_offset"]
    np.testing.assert_allclose(narrow, np.sqrt(25.0 / 12.0), rtol=1e-3)


def test_diff_primal_matches_component_summary():
    """The differentiable path drives the SAME component core through a
    fixed-shape scan — primal metrics must equal the production summary
    path to float noise (one physics source, round-3 unification)."""
    from erpl_monte_carlo_sim_tpu.engine.batch import simulate_summary_batch
    from erpl_monte_carlo_sim_tpu.engine.diff import simulate_metrics_diff

    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    m = simulate_metrics_diff(scene, ic, CFG)
    ic1 = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (1,) + np.shape(x)).copy(), ic
    )
    want = simulate_summary_batch(scene, ic1, CFG)
    np.testing.assert_allclose(
        float(m["apogee_altitude"]), float(want.apogee_altitude[0]), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(m["range"]), float(want.range[0]), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        float(m["max_speed"]), float(want.max_speed[0]), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(m["landing_x"]), float(want.landing_position[0, 0]), rtol=1e-9,
        atol=1e-9,
    )


@pytest.mark.slow
def test_landing_metric_gradients_match_fd():
    """Full-flight gradients of range and (crossing-interpolated) flight
    time, validated against central finite differences computed on the
    CHEAP while-loop summary path — the two paths share the physics, so
    FD(summary) must match AD(diff scan). Uses the low-apogee scene
    (~476 m) so a landed flight stays short.

    eps is 5e-5 ON PURPOSE: the crossing interpolation makes the metrics
    smooth across TERMINATION-step requantization (verified on a 5e-6 grid:
    piecewise-linear at exactly the AD slope), but the parachute DEPLOY
    latch still fires on a whole step, so every ~2e-4 in thrust_scale the
    deploy step shifts and the metric jumps ~2e-3 m. A large-eps secant
    averages those event-quantization jumps in (measured: eps=1e-3 reads
    37.06 vs the true local slope 31.62); eps=5e-5 stays inside one deploy
    plateau and FD matches AD to <1e-3."""
    from erpl_monte_carlo_sim_tpu.engine.batch import simulate_summary_batch
    from erpl_monte_carlo_sim_tpu.engine.diff import metric_and_grad
    from erpl_monte_carlo_sim_tpu.models.rocket import RocketParams

    cfg = SimConfig(max_time=90.0)
    pm = 5.0
    base = nominal_scene(liquid_motor(propellant_mass=pm))
    base = base.replace(rocket=RocketParams.create(propellant_mass=pm))
    ic = InitialConditions.vertical_launch()
    eps = 5e-5
    thetas = np.array([1.0 - eps, 1.0 + eps])
    ic2 = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (2,) + np.shape(x)).copy(), ic
    )
    s2 = base.replace(
        motor=base.motor.replace(thrust_scale=jnp.asarray(thetas))
    )
    out = simulate_summary_batch(s2, ic2, cfg)
    pos = np.asarray(out.landing_position, np.float64)
    vel = np.asarray(out.final_velocity, np.float64)
    delta = (cfg.ground_altitude - pos[:, 2]) / vel[:, 2]
    land = pos[:, :2] + vel[:, :2] * delta[:, None]
    fd_vals = {
        "range": np.hypot(land[:, 0], land[:, 1]),
        "flight_time": np.asarray(out.flight_time, np.float64) + delta,
    }
    # sanity: both flights actually land well before the cutoff
    assert fd_vals["flight_time"].max() < cfg.max_time - 5.0

    for metric, rtol in (("range", 1e-2), ("flight_time", 1e-2)):
        v, g = metric_and_grad(
            base, ic, cfg, metric=metric, wrt="motor.thrust_scale"
        )
        fd = float(fd_vals[metric][1] - fd_vals[metric][0]) / (2 * eps)
        assert np.isfinite(float(g)), metric
        np.testing.assert_allclose(float(g), fd, rtol=rtol, err_msg=metric)


@pytest.mark.slow
def test_optimizer_initial_relative_step():
    """Line-search initial step magnitude is lr (or 2% of v0) — regression:
    the pre-r3 rule divided by |grad|, exploding near the optimum."""
    from erpl_monte_carlo_sim_tpu.cli.optimize_apogee import optimize

    hist = optimize("rocket.fin_span", steps=2, cfg=CFG, verbose=False)
    assert len(hist) == 2
    v0 = hist[0][0]
    dv = abs(hist[1][0] - v0)
    np.testing.assert_allclose(dv, 0.02 * abs(v0), rtol=1e-6)


@pytest.mark.slow
def test_optimizer_converges_fin_span():
    """The fin-span demo (VERDICT r3 item 6): the line search must reach a
    STATIONARY point of the windowed apogee objective — terminating by
    tolerance, not by budget — and its converged objective must beat every
    rejected trial it probed (the fixed-grid sign-ascent oscillated around
    any optimum narrower than its step)."""
    from erpl_monte_carlo_sim_tpu.cli.optimize_apogee import optimize

    hist = optimize("rocket.fin_span", steps=40, cfg=CFG, verbose=False)
    assert hist.info["converged"], hist.info
    assert hist.info["reason"] in ("grad_tol", "step_tol", "bound")
    best = hist.info["objective"]
    # rejected trials sit below accepted-f + the Armijo margin; the margin
    # (c1*|move|*|g|) bounds how far above the final objective any probe
    # can be
    assert all(best >= f - 1e-6 * max(1.0, abs(best)) for _, f, _ in hist)
    # stationarity scale: at the converged point the remaining one-step
    # improvement (|grad| * final step resolution) is < 0.1 m of apogee
    v0 = hist[0][0]
    assert abs(hist.info["grad"]) * 0.02 * abs(v0) * 0.01 < 0.1
