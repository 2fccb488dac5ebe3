"""Importance sampling (mc/importance.py, sampling tilt, analyzer block).

Beyond-reference capability: rare-event tail probabilities via
exponential tilting of the Gaussian multiplier channels, self-normalized
back to the nominal distribution — P(metric > t) at probabilities plain
counting (the reference's only option) cannot reach.
"""

import jax
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig
from erpl_monte_carlo_sim_tpu.mc import (
    MonteCarloAnalyzer,
    UncertaintyParams,
    exceedance_from_analysis,
    log_weights,
    sample_dispersions,
    weighted_mean,
    weighted_tail,
)
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

SCENE = nominal_scene(liquid_motor())
IC = InitialConditions.vertical_launch()
CFG = SimConfig(max_time=6.0)
PARAMS = UncertaintyParams()


def test_weighted_tail_recovers_analytic_gaussian_tail():
    """theta=2 tilt, P(z > 3) under the nominal N(0,1): the IS estimate
    must hit the analytic 1.3499e-3 far more precisely than plain
    counting at the same n ever could."""
    from scipy.stats import norm

    rng = np.random.default_rng(0)
    theta = 2.0  # ~2/3 of the threshold z-score (see module docstring)
    z = theta + rng.standard_normal(50_000)  # draws under the proposal
    lw = -theta * z + 0.5 * theta * theta
    row = weighted_tail(z, np.ones(z.shape, bool), lw, [3.0])[0]
    truth = norm.sf(3.0)
    assert abs(row["probability"] - truth) < 4.0 * row["stderr"]
    # IS beats plain counting at the same n by a wide margin: plain
    # relative stderr is sqrt((1-p)/(p n)) ~ 12%; the tilted estimator's
    # is a few percent
    plain_rel = np.sqrt((1 - truth) / (truth * len(z)))
    assert row["stderr"] / truth < 0.5 * plain_rel
    assert row["n_eff_tail"] > 1000  # the tilt covers the event densely
    # nominal-mean recovery: E[z] = 0 under f
    m = weighted_mean(z, np.ones(z.shape, bool), lw)
    assert abs(m["mean"]) < 4.0 * m["stderr"]
    assert m["n_eff"] < len(z)  # tilting always costs effective samples


def test_sampling_tilt_shifts_only_named_channels():
    shift = (("motor_thrust", 1.0),)
    _, _, s = sample_dispersions(jax.random.PRNGKey(0), SCENE, IC, PARAMS,
                                 20_000, importance_shift=shift)
    sig = float(np.asarray(SCENE.motor.thrust_uncertainty))
    mt = np.asarray(s.motor_thrust_multiplier)
    assert abs(mt.mean() - (1.0 + 1.0 * sig)) < 5.0 * sig / np.sqrt(20_000)
    # untilted channels keep their nominal means
    assert abs(np.asarray(s.mass_multiplier).mean() - 1.0) < 0.005
    assert abs(np.asarray(s.density_multiplier).mean() - 1.0) < 0.005
    # likelihood ratio normalizes: E_g[w] = 1 per construction (theta=1:
    # Var(w) = e - 1, so the 20k-draw mean resolves to ~1%)
    lw = log_weights(s, PARAMS, SCENE.motor, shift)
    assert abs(np.exp(lw).mean() - 1.0) < 0.05
    # deterministic by key: the tilted draw reproduces exactly
    _, _, s2 = sample_dispersions(jax.random.PRNGKey(0), SCENE, IC, PARAMS,
                                  20_000, importance_shift=shift)
    np.testing.assert_array_equal(np.asarray(s.motor_thrust_multiplier),
                                  np.asarray(s2.motor_thrust_multiplier))


def test_analyzer_importance_run_matches_plain_estimate():
    """IS tail estimate vs plain counting on an overlapping regime (a
    ~2% apogee tail the plain run can still resolve): the two must agree
    within combined error bars, and the IS answer must come from far
    fewer lanes."""
    plain = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG)
    a_plain = plain.run_monte_carlo(IC, n_samples=4096, seed=0)
    apo = np.asarray(a_plain["summary"].apogee_altitude)
    vmask = np.asarray(a_plain["valid_mask"])
    t = float(np.percentile(apo[vmask], 98.0))
    p_plain = float((apo[vmask] > t).mean())

    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                            importance_shift={"motor_thrust": 2.0})
    a = mc.run_monte_carlo(IC, n_samples=512, seed=1)
    imp = a["importance"]
    assert imp["shift"] == {"motor_thrust": 2.0}
    assert len(imp["log_weights"]) == 512
    # headline (shifted-population) mean sits well above the weighted
    # nominal-distribution estimate
    assert a["apogee_altitude"]["mean"] > imp["apogee_altitude"]["mean"]
    # the weighted mean recovers the nominal apogee mean
    nominal_mean = float(apo[vmask].mean())
    blk = imp["apogee_altitude"]
    assert abs(blk["mean"] - nominal_mean) < 6.0 * max(blk["stderr"], 1.0)
    # tail probability via the auto-routed exceedance API
    row = exceedance_from_analysis(a, "apogee_altitude", [t])[0]
    assert row["method"] == "importance"
    err = abs(row["probability"] - p_plain)
    combined = np.sqrt(row["stderr"] ** 2 + p_plain * (1 - p_plain) / 4096)
    assert err < 5.0 * max(combined, 1e-4)
    assert row["n_eff_tail"] > 10  # the tilt pushes lanes into the tail


def test_analyzer_importance_slabbed_accumulates():
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                            importance_shift={"motor_thrust": 1.0})
    a = mc.run_monte_carlo(IC, n_samples=80, seed=2, lane_slab=32)
    assert len(a["importance"]["log_weights"]) == 80
    row = weighted_tail(a["metrics"]["apogee_altitude"], a["valid_mask"],
                        a["importance"]["log_weights"], [0.0])[0]
    assert row["probability"] == pytest.approx(1.0)


def test_importance_validation():
    with pytest.raises(ValueError):
        MonteCarloAnalyzer(scene=SCENE, sampler="sobol",
                           importance_shift={"mass": 1.0})
    with pytest.raises(ValueError):
        MonteCarloAnalyzer(scene=SCENE, antithetic=True,
                           importance_shift={"mass": 1.0})
    with pytest.raises(ValueError):
        MonteCarloAnalyzer(scene=SCENE, control_variates=True,
                           importance_shift={"mass": 1.0})
    with pytest.raises(ValueError):
        sample_dispersions(jax.random.PRNGKey(0), SCENE, IC, PARAMS, 8,
                           importance_shift=(("nope", 1.0),))
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                            importance_shift={"mass": 1.0},
                            stats_stream_threshold=16)
    with pytest.raises(ValueError):
        mc.run_monte_carlo(IC, n_samples=64, seed=0, lane_slab=32)


def test_tail_probability_cli(capsys):
    from erpl_monte_carlo_sim_tpu.cli.tail_probability import main

    out = main(["--threshold", "20000", "--n", "128", "--max-time", "6"])
    assert out["method"] == "exact" and "ci95" in out
    assert 0.0 <= out["probability"] <= 1.0
    shifted = main(["--threshold", "26000", "--n", "128", "--max-time", "6",
                    "--shift", "motor_thrust=1.5"])
    assert shifted["method"] == "importance"
    assert shifted["shift"] == {"motor_thrust": 1.5}
    assert "n_eff" in shifted
    # both printed valid JSON
    printed = capsys.readouterr().out
    assert printed.count('"method"') == 2


def test_report_carries_importance_block(tmp_path):
    import json

    from erpl_monte_carlo_sim_tpu.reporting import save_report

    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                            importance_shift={"motor_thrust": 1.0})
    a = mc.run_monte_carlo(IC, n_samples=96, seed=7)
    rep = save_report(a, str(tmp_path), analyzer=mc)
    assert "log_weights" not in rep["importance"]
    with open(tmp_path / "monte_carlo_report.json") as f:
        on_disk = json.load(f)
    assert on_disk["importance"]["shift"] == {"motor_thrust": 1.0}
    txt = (tmp_path / "monte_carlo_report.txt").read_text()
    assert "Importance-Sampled Nominal Estimates" in txt


def test_review_fixes_validation_and_vacuous_rows():
    from erpl_monte_carlo_sim_tpu.models import solid_motor

    # solid motor: flow multiplier is inert -> tilting it must be refused
    solid_scene = nominal_scene(solid_motor())
    with pytest.raises(ValueError, match="inert"):
        sample_dispersions(jax.random.PRNGKey(0), solid_scene, IC, PARAMS, 8,
                           importance_shift=(("motor_flow", 1.0),))
    # liquid motor: the same tilt is fine
    sample_dispersions(jax.random.PRNGKey(0), SCENE, IC, PARAMS, 8,
                       importance_shift=(("motor_flow", 1.0),))
    # zero-sigma channel fails BEFORE any simulation
    zp = UncertaintyParams(atmospheric_density_uncertainty=0.0)
    with pytest.raises(ValueError, match="zero sigma"):
        sample_dispersions(jax.random.PRNGKey(0), SCENE, IC, zp, 8,
                           importance_shift=(("density", 1.0),))
    # vacuous tail rows: no hits -> stderr NaN (not a confident 0 +- 0)
    rng = np.random.default_rng(0)
    z = rng.standard_normal(100)
    row = weighted_tail(z, np.ones(100, bool), np.zeros(100), [99.0])[0]
    assert row["probability"] == 0.0
    assert np.isnan(row["stderr"]) and row["n_eff_tail"] == 0.0
