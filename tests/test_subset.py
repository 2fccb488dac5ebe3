"""Subset simulation (mc/subset.py + MonteCarloAnalyzer.subset_tail) and
the deterministic u -> scene map it rides on
(mc.dispersions.sample_from_normals).

Beyond-reference capability: the reference's only tail statement is the
fixed percentiles of a fixed-n run (`monte_carlo.py:444-459`). Pins: the
estimator against closed-form Gaussian tails (shallow AND deep,
low- and high-dimensional), the exact-counting degenerate case, invalid-
lane semantics, determinism, and the marginal equivalence of the
normals parameterization with the prng sampling path."""

import numpy as np
import pytest
from scipy.stats import norm

from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig
from erpl_monte_carlo_sim_tpu.mc import (
    MonteCarloAnalyzer,
    UncertaintyParams,
    normal_dims,
    pool_subset_quantiles,
    pool_subset_runs,
    sample_from_normals,
    subset_quantile,
    subset_simulation,
)
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

SCENE = nominal_scene(liquid_motor())
IC = InitialConditions.vertical_launch()


# ------------------------------------------------------------- core


def test_subset_gaussian_tail_1e4():
    # P(u0 >= t) with t = z_{1e-4}: 4 seeds, each within ~1.5 cov of
    # truth in log space, pooled mean tighter
    t = norm.ppf(1 - 1e-4)
    logs = []
    for seed in range(4):
        r = subset_simulation(lambda u: u[:, 0], 5, threshold=t,
                              n_per_level=1024, seed=seed)
        assert not r["stalled"]
        assert 0.05 < r["cov"] < 0.6
        assert r["ci95"][0] < r["probability"] < r["ci95"][1]
        logs.append(r["log10_probability"])
        # log-error within a generous 3-cov band (cov ~0.28 => ~0.37 dex)
        assert abs(r["log10_probability"] + 4.0) < 0.45
    assert abs(np.mean(logs) + 4.0) < 0.25


def test_subset_deep_tail_high_dim():
    # 1e-7 tail of a ROTATED coordinate in d=64: pCN must not degrade
    # with dimension, and the result must match the 1-d answer
    d = 64
    rng = np.random.default_rng(42)
    w = rng.standard_normal(d)
    w /= np.linalg.norm(w)
    t = norm.ppf(1 - 1e-7)
    r = subset_simulation(lambda u: u @ w, d, threshold=t,
                          n_per_level=1024, seed=1)
    assert not r["stalled"]
    assert abs(r["log10_probability"] + 7.0) < 0.6
    # cost: ~one extra level per p0-decade, thousands not billions of sims
    assert r["n_sims"] < 12_000
    # healthy conditional sampler: acceptance nowhere collapsed
    accepts = [l["accept_rate"] for l in r["levels"]
               if l["accept_rate"] is not None]
    assert min(accepts) > 0.1


def test_subset_bulk_threshold_is_exact_counting():
    # threshold inside the bulk: no MCMC happens; the answer is exactly
    # the level-0 Monte Carlo count with the binomial cov
    t = norm.ppf(1 - 0.3)
    r = subset_simulation(lambda u: u[:, 0], 3, threshold=t,
                          n_per_level=2048, seed=7)
    assert r["n_sims"] == 2048 and r["n_levels"] == 1
    rng = np.random.default_rng(7)
    u = rng.standard_normal((2048, 3))
    p_count = float((u[:, 0] >= t).mean())
    assert r["probability"] == p_count
    assert r["cov"] == pytest.approx(
        np.sqrt((1 - p_count) / (p_count * 2048)))


def test_subset_invalid_lanes_never_exceed():
    # g = u0 where u1 <= 2, NaN (invalid flight) otherwise: the target is
    # the JOINT P(u0 >= t AND u1 <= 2) = Phi_c(t) * Phi(2)
    t = norm.ppf(1 - 1e-3)
    p_true = (1 - norm.cdf(t)) * norm.cdf(2.0)

    def g(u):
        return np.where(u[:, 1] <= 2.0, u[:, 0], np.nan)

    logs = []
    for seed in range(3):
        r = subset_simulation(g, 4, threshold=t, n_per_level=1024,
                              seed=seed)
        logs.append(r["log10_probability"])
        assert 0.9 < r["valid_fraction"] < 1.0  # ~Phi(2) = 0.977
    assert abs(np.mean(logs) - np.log10(p_true)) < 0.3


def test_subset_deterministic_and_validated():
    t = norm.ppf(1 - 1e-3)
    a = subset_simulation(lambda u: u[:, 0], 2, threshold=t,
                          n_per_level=512, seed=3)
    b = subset_simulation(lambda u: u[:, 0], 2, threshold=t,
                          n_per_level=512, seed=3)
    assert a == b
    c = subset_simulation(lambda u: u[:, 0], 2, threshold=t,
                          n_per_level=512, seed=4)
    assert c["probability"] != a["probability"]
    with pytest.raises(ValueError, match="p0"):
        subset_simulation(lambda u: u[:, 0], 2, threshold=t, p0=1.5)
    with pytest.raises(ValueError, match="divisible"):
        subset_simulation(lambda u: u[:, 0], 2, threshold=t,
                          n_per_level=1000, p0=0.3)
    with pytest.raises(ValueError, match="max_levels"):
        subset_simulation(lambda u: u[:, 0], 2, threshold=t,
                          max_levels=0)
    with pytest.raises(ValueError, match="fewer than 2"):
        subset_simulation(lambda u: u[:, 0], 2, threshold=t,
                          n_per_level=8, p0=0.125)


def test_subset_stall_reports_honestly():
    # a bounded metric that cannot reach the threshold: stalled=True and
    # probability 0 with infinite cov — "not observable", not a certificate
    r = subset_simulation(lambda u: np.tanh(u[:, 0]), 2, threshold=2.0,
                          n_per_level=512, seed=0, max_levels=6)
    assert r["stalled"] and r["probability"] == 0.0
    assert r["cov"] == np.inf and not np.isfinite(r["log10_probability"])


# ----------------------------------------------------------- quantiles


def test_subset_quantile_gaussian():
    """Inverse problem against the closed form: the upper-p quantile of
    a standard normal coordinate, shallow through deep, with the truth
    inside both the per-run CI and the 4-seed pooled t-interval."""
    for p_target, tol in [(1e-3, 0.15), (1e-5, 0.2), (1e-7, 0.25)]:
        truth = norm.ppf(1 - p_target)
        runs = [subset_quantile(lambda u: u[:, 0], 5, p_target=p_target,
                                n_per_level=1024, seed=s)
                for s in range(4)]
        for r in runs:
            assert not r["stalled"]
            assert r["ci95_threshold"][0] < r["threshold"] \
                < r["ci95_threshold"][1]
        pooled = pool_subset_quantiles(runs)
        assert abs(pooled["threshold"] - truth) < tol
        lo, hi = pooled["ci95_threshold"]
        assert lo <= truth + 0.05 and truth - 0.05 <= hi
        assert pooled["n_sims"] == sum(r["n_sims"] for r in runs)
    # cost scales with decades, not 1/p
    assert runs[0]["n_sims"] < 10_000


def test_subset_quantile_bulk_is_order_statistic():
    # p_target inside the bulk: no MCMC, the answer is exactly the
    # sample order statistic of the level-0 draw
    r = subset_quantile(lambda u: u[:, 0], 3, p_target=0.3,
                        n_per_level=2048, seed=7)
    assert r["n_levels"] == 1 and r["n_sims"] == 2048
    u = np.random.default_rng(7).standard_normal((2048, 3))
    expect = float(np.sort(u[:, 0])[::-1][int(np.ceil(0.3 * 2048)) - 1])
    assert r["threshold"] == expect
    assert r["ci95_threshold"][0] <= r["threshold"] \
        <= r["ci95_threshold"][1]


def test_subset_quantile_validation():
    with pytest.raises(ValueError, match="p_target"):
        subset_quantile(lambda u: u[:, 0], 2, p_target=0.0)
    with pytest.raises(ValueError, match="divisible"):
        subset_quantile(lambda u: u[:, 0], 2, p_target=1e-3,
                        n_per_level=1000, p0=0.3)
    a = subset_quantile(lambda u: u[:, 0], 2, p_target=1e-3,
                        n_per_level=512, seed=3)
    b = subset_quantile(lambda u: u[:, 0], 2, p_target=1e-3,
                        n_per_level=512, seed=3)
    assert a == b
    with pytest.raises(ValueError, match=">= 2 runs"):
        pool_subset_quantiles([a])
    with pytest.raises(ValueError, match="duplicate seeds"):
        pool_subset_quantiles([a, b])
    with pytest.raises(ValueError, match="disagree on p_target"):
        pool_subset_quantiles([a, dict(b, p_target=1e-4, seed=4)])


def test_subset_quantile_flights():
    """Window-regime apogee bound at a directly checkable depth: the
    subset quantile must agree with the direct sample quantile, and
    direction='below' must bound the lower tail in metric units."""
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=SimConfig(max_time=2.0),
                            persistent_cache=False)
    direct = mc.run_monte_carlo(IC, n_samples=4096, seed=1)
    vals = np.asarray(direct["summary"].apogee_altitude, np.float64)
    valid = np.asarray(direct["valid_mask"])
    v = vals[valid & np.isfinite(vals)]
    p_t = 8e-3
    res = mc.subset_quantile(IC, "apogee_altitude", p_t, n_per_level=512,
                             p0=0.25, seed=0, n_runs=2)
    assert res["n_runs"] == 2 and res["metric"] == "apogee_altitude"
    direct_q = float(np.quantile(v, 1 - p_t))
    # generous band: direct quantile has its own sampling error
    assert abs(res["threshold"] - direct_q) < 1.0
    lo, hi = res["ci95_threshold"]
    assert lo < res["threshold"] < hi
    fc = res["failure_channels"]
    assert fc is not None and fc["n_failure_samples"] > 0
    # lower tail: the 'below' bound sits under the median
    low = mc.subset_quantile(IC, "apogee_altitude", 0.05,
                             direction="below", n_per_level=512,
                             p0=0.25, seed=0)
    assert low["threshold"] < float(np.median(v))
    assert low["ci95_threshold"][0] <= low["threshold"] \
        <= low["ci95_threshold"][1]
    assert all(lv["threshold"] >= low["threshold"]
               for lv in low["levels"][:-1])


def test_tail_probability_cli_quantile(capsys):
    from erpl_monte_carlo_sim_tpu.cli.tail_probability import main

    out = main(["--max-time", "2", "--subset", "--p-target", "5e-3",
                "--n-per-level", "256", "--p0", "0.25"])
    assert out["method"] == "subset_quantile"
    assert np.isfinite(out["threshold"])
    assert out["ci95_threshold"][0] <= out["threshold"] \
        <= out["ci95_threshold"][1]
    assert '"threshold"' in capsys.readouterr().out
    with pytest.raises(ValueError, match="needs --subset"):
        main(["--max-time", "2", "--p-target", "1e-3"])
    with pytest.raises(ValueError, match="threshold is required"):
        main(["--max-time", "2", "--subset"])
    # quantile mode SOLVES for the threshold — supplying one is an error,
    # not a silent ignore (ADVICE r3)
    with pytest.raises(ValueError, match="exclusive"):
        main(["--max-time", "2", "--subset", "--p-target", "1e-3",
              "--threshold", "30000"])
    # argparse %-formats help strings: a literal '%' must stay escaped
    # (ADVICE r3: '95% CI' crashed --help)
    with pytest.raises(SystemExit):
        main(["--help"])


# ------------------------------------------------------------- pooling


def test_pool_subset_runs_gaussian():
    """Pooled K-seed estimate: between-seed t-interval contains the
    closed-form truth, the pooled cov beats the per-run one, and the
    calibration ratio (realized spread / reported cov) is reported —
    the quantity the Au & Beck level-independence approximation hides."""
    t = norm.ppf(1 - 1e-4)
    runs = [subset_simulation(lambda u: u[:, 0], 5, threshold=t,
                              n_per_level=1024, seed=s)
            for s in range(4)]
    pooled = pool_subset_runs(runs)
    assert pooled["n_runs"] == 4 and pooled["n_zero_runs"] == 0
    assert pooled["ci95"][0] <= 1e-4 <= pooled["ci95"][1]
    # arithmetic mean of the runs, geometric center of the interval
    assert pooled["probability"] == pytest.approx(
        np.mean([r["probability"] for r in runs]))
    assert pooled["probability_geomean"] == pytest.approx(
        np.exp(np.mean(np.log([r["probability"] for r in runs]))))
    # pooled cov is the seed-spread stderr: tighter than one run's spread
    assert pooled["cov_empirical"] < np.std(
        np.log([r["probability"] for r in runs]), ddof=1)
    assert np.isfinite(pooled["spread_ratio"]) and pooled["spread_ratio"] > 0
    assert pooled["n_sims"] == sum(r["n_sims"] for r in runs)
    assert pooled["seeds"] == [0, 1, 2, 3]
    assert len(pooled["runs"]) == 4


def test_pool_subset_runs_zero_and_validation():
    # all-zero runs: honest "not observable" — probability 0, [0, nan]
    dead = [subset_simulation(lambda u: np.tanh(u[:, 0]), 2, threshold=2.0,
                              n_per_level=256, seed=s, max_levels=3)
            for s in range(2)]
    pooled = pool_subset_runs(dead)
    assert pooled["probability"] == 0.0
    assert pooled["n_zero_runs"] == 2 and pooled["stalled_runs"] == 2
    assert pooled["cov"] == np.inf
    assert pooled["ci95"][0] == 0.0 and np.isnan(pooled["ci95"][1])
    # a single zero run among positives forces the lower bound to 0
    t = norm.ppf(1 - 1e-3)
    live = [subset_simulation(lambda u: u[:, 0], 2, threshold=t,
                              n_per_level=512, seed=s) for s in range(3)]
    mixed = pool_subset_runs(live + [dict(dead[0], threshold=t,
                                          n_per_level=512, seed=9)])
    assert mixed["n_zero_runs"] == 1 and mixed["ci95"][0] == 0.0
    assert mixed["probability"] == pytest.approx(
        np.mean([r["probability"] for r in live] + [0.0]))
    with pytest.raises(ValueError, match=">= 2 runs"):
        pool_subset_runs(live[:1])
    with pytest.raises(ValueError, match="disagree on threshold"):
        pool_subset_runs([live[0], dict(live[1], threshold=t + 1)])
    with pytest.raises(ValueError, match="duplicate seeds"):
        pool_subset_runs([live[0], dict(live[1], seed=live[0]["seed"])])


# ------------------------------------- u -> scene marginal equivalence


def test_sample_from_normals_marginals():
    """The deterministic map must push N(0, I) to the SAME dispersion
    distribution the prng path draws: Gaussian channels with the
    configured sigmas, uniform wind speed/direction over the configured
    range, turbulence through the identical AR(1) scan."""
    params = UncertaintyParams()
    n = 8192
    d = normal_dims(100)
    u = np.random.default_rng(5).standard_normal((n, d))
    scene_b, ic_b, sample = sample_from_normals(u, SCENE, IC,
                                                params=params)
    # Gaussian multipliers: mean 1, std = configured sigma (4-sigma
    # tolerance on the mean, 5% on the std at n=8192)
    for name, sigma in [
        ("mass_multiplier", params.mass_uncertainty),
        ("motor_thrust_multiplier",
         float(np.asarray(SCENE.motor.thrust_uncertainty))),
        ("density_multiplier", params.atmospheric_density_uncertainty),
    ]:
        v = np.asarray(getattr(sample, name), np.float64)
        assert abs(v.mean() - 1.0) < 4 * sigma / np.sqrt(n)
        assert abs(v.std() / sigma - 1.0) < 0.05
    # uniform channels cover their range with uniform moments
    ws = np.asarray(sample.wind_speed, np.float64)
    lo, hi = params.wind_speed_range
    assert lo <= ws.min() and ws.max() <= hi
    assert abs(ws.mean() - (lo + hi) / 2) < 4 * (hi - lo) / np.sqrt(12 * n)
    # exact u -> scene determinism (same u, same lanes)
    scene_c, ic_c, sample_c = sample_from_normals(u, SCENE, IC,
                                                  params=params)
    assert np.array_equal(np.asarray(scene_b.wind.wind),
                          np.asarray(scene_c.wind.wind))
    # turbulence: per-knot std across lanes matches the keyed prng path's
    # AR(1) process (same scan, different driver source)
    from erpl_monte_carlo_sim_tpu.mc import sample_dispersions
    import jax

    scene_p, _, _ = sample_dispersions(jax.random.PRNGKey(9), SCENE, IC,
                                       params, n)
    w_n = np.asarray(scene_b.wind.wind, np.float64)
    w_p = np.asarray(scene_p.wind.wind, np.float64)
    # compare turbulence spread about the per-lane mean flow: remove the
    # uniform (speed, direction) offset via the cross-lane mean per knot
    s_n = w_n.std(axis=0)
    s_p = w_p.std(axis=0)
    assert np.allclose(s_n, s_p, rtol=0.08, atol=0.05)


def test_sample_from_normals_validation():
    with pytest.raises(ValueError, match="columns"):
        sample_from_normals(np.zeros((4, 7)), SCENE, IC)
    with pytest.raises(ValueError, match="ensemble"):
        sample_from_normals(
            np.zeros((4, normal_dims(3))), SCENE, IC,
            base_wind=(np.array([0.0, 10.0, 20.0]),
                       np.zeros((2, 3, 3))),
        )
    with pytest.raises(ValueError, match="\\[n, d\\]"):
        sample_from_normals(np.zeros(7), SCENE, IC)


# ------------------------------------------------------------ flights


def test_subset_tail_flights_vs_direct():
    """Window-regime apogee tail at a directly countable level: subset
    simulation and plain counting must agree within their joint CI."""
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=SimConfig(max_time=2.0),
                            persistent_cache=False)
    direct = mc.run_monte_carlo(IC, n_samples=4096, seed=1)
    vals = np.asarray(direct["summary"].apogee_altitude, np.float64)
    valid = np.asarray(direct["valid_mask"])
    v = vals[valid & np.isfinite(vals)]
    T = float(np.quantile(v, 1 - 8e-3))
    p_direct = float((v > T).mean())

    res = mc.subset_tail(IC, "apogee_altitude", T, n_per_level=512,
                         p0=0.25, seed=0)
    assert not res["stalled"]
    assert 0 < res["probability"] <= res["probability_given_valid"]
    p = res["probability_given_valid"]
    # direct stderr (binomial) + subset cov, generous 3x combined band in
    # log space
    se_direct = np.sqrt(p_direct * (1 - p_direct) / v.size) / p_direct
    band = 3.0 * np.hypot(res["cov"], se_direct) / np.log(10)
    assert abs(np.log10(p) - np.log10(p_direct)) < band
    # per-level diagnostics present and sane
    assert res["levels"][0]["p"] == 0.25
    assert res["n_sims"] <= 512 * res["n_levels"]


def test_subset_population_mills_ratio():
    # conditional mean of the driving coordinate over the failure region:
    # E[u0 | u0 > t] = phi(t) / (1 - Phi(t)) (Mills ratio)
    t = norm.ppf(1 - 1e-3)
    r = subset_simulation(lambda u: u[:, 0], 6, threshold=t,
                          n_per_level=2048, seed=2,
                          return_population=True)
    fail = r["g_final"] >= t
    assert fail.sum() > 100
    cond_mean = r["u_final"][fail, 0].mean()
    mills = norm.pdf(t) / (1 - norm.cdf(t))
    assert abs(cond_mean - mills) < 0.25
    # non-driving coordinates stay ~standard normal in the failure region
    other = r["u_final"][fail, 1:]
    assert abs(other.mean()) < 0.2 and abs(other.std() - 1.0) < 0.15
    # population not returned by default
    r2 = subset_simulation(lambda u: u[:, 0], 6, threshold=t,
                           n_per_level=512, seed=2)
    assert "u_final" not in r2


def test_subset_tail_failure_channels():
    """The empirical design point must match the physics: window-apogee
    exceedances are driven by +thrust and -mass; the reference's dead
    thrust_recorded channel is the placebo."""
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=SimConfig(max_time=2.0),
                            persistent_cache=False)
    res = mc.subset_tail(IC, "apogee_altitude", 127.0, n_per_level=512,
                         p0=0.25, seed=1)
    fc = res["failure_channels"]
    assert fc is not None and fc["n_failure_samples"] > 20
    by_name = {c["name"]: c["mean"] for c in fc["channels"]}
    assert by_name["motor_thrust"] > 0.3
    assert by_name["mass"] < 0.0
    # placebo: the dead channel's conditional mean stays near 0, and the
    # live thrust channel clearly beats it
    assert abs(by_name["thrust_recorded"]) < 0.4
    assert by_name["motor_thrust"] > abs(by_name["thrust_recorded"]) + 0.2
    for comp in ("u", "v", "w"):
        assert 0.5 < fc["turbulence_ms"][comp] < 2.0


def test_subset_tail_pooled_runs():
    """n_runs > 1: pooled between-seed estimate, per-run thresholds in
    metric units, failure population merged across replicates, and the
    single-run path unchanged (runs[0] == a seed-0 run)."""
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=SimConfig(max_time=2.0),
                            persistent_cache=False)
    res = mc.subset_tail(IC, "apogee_altitude", 127.0, n_per_level=256,
                         p0=0.25, seed=0, n_runs=2)
    assert res["n_runs"] == 2 and res["seeds"] == [0, 1]
    assert res["n_sims"] == sum(r["n_sims"] for r in res["runs"])
    assert 0.0 < res["probability"] < 1.0
    assert res["metric"] == "apogee_altitude"
    for r in res["runs"]:
        assert r["threshold"] == 127.0
        assert all(lv["threshold"] <= 127.0 for lv in r["levels"])
    assert res["probability_given_valid"] >= res["probability"]
    fc = res["failure_channels"]
    assert fc is not None and fc["n_failure_samples"] > 0
    # the pooled run's first replicate IS the single-run result
    single = mc.subset_tail(IC, "apogee_altitude", 127.0, n_per_level=256,
                            p0=0.25, seed=0, n_runs=1)
    for key in ("probability", "cov", "n_sims", "levels"):
        assert single[key] == res["runs"][0][key]
    with pytest.raises(ValueError, match="n_runs"):
        mc.subset_tail(IC, "apogee_altitude", 127.0, n_runs=0)


def test_tail_probability_cli_subset(capsys):
    from erpl_monte_carlo_sim_tpu.cli.tail_probability import main

    out = main(["--threshold", "125", "--max-time", "2",
                "--subset", "--n-per-level", "256", "--p0", "0.25"])
    assert out["method"] == "subset"
    assert 0.0 <= out["probability"] <= 1.0
    assert out["n_sims"] <= 256 * out["n_levels"]
    assert '"method"' in capsys.readouterr().out
    with pytest.raises(ValueError, match="its own estimator"):
        main(["--threshold", "125", "--max-time", "2", "--subset",
              "--gpd"])
    # pooled replicates surface the between-seed error block
    out2 = main(["--threshold", "125", "--max-time", "2", "--subset",
                 "--n-per-level", "256", "--p0", "0.25", "--n-runs", "2"])
    assert out2["n_runs"] == 2 and "spread_ratio" in out2
    assert "levels" not in out2
    capsys.readouterr()


def test_subset_tail_validation():
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=SimConfig(max_time=2.0),
                            persistent_cache=False)
    with pytest.raises(ValueError, match="metric"):
        mc.subset_tail(IC, "landing_position", 100.0)
    with pytest.raises(ValueError, match="direction"):
        mc.subset_tail(IC, "range", 100.0, direction="sideways")
    mc.base_altitude_profile = np.array([0.0, 10.0, 20.0])
    mc.base_wind_profile = np.zeros((2, 3, 3))
    with pytest.raises(ValueError, match="ensemble"):
        mc.subset_tail(IC, "range", 100.0)
