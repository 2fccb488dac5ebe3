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


def test_optimizer_fixed_relative_step():
    """Sign-ascent step magnitude is lr (or 2% of v0) — regression: the old
    rule divided by |grad|, exploding near the optimum."""
    from erpl_monte_carlo_sim_tpu.cli.optimize_apogee import optimize

    hist = optimize("rocket.fin_span", steps=2, cfg=CFG, verbose=False)
    assert len(hist) == 2
    v0 = hist[0][0]
    dv = abs(hist[1][0] - v0)
    np.testing.assert_allclose(dv, 0.02 * abs(v0), rtol=1e-6)
