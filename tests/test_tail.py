"""GPD peaks-over-threshold tail extrapolation (mc/tail.py).

No reference counterpart (the reference reports fixed percentiles,
`/root/reference/rocket_simulation/monte_carlo.py:444-459`); this is the
no-tilt route to P(metric > t) beyond counting reach, the third tool
next to Wilson counting (mc.stats.exceedance) and importance sampling
(mc.importance).
"""

import numpy as np
import pytest
from scipy.stats import genpareto, lognorm

from erpl_monte_carlo_sim_tpu.mc.tail import (
    TailReservoir,
    _gpd_sf,
    fit_gpd_pwm,
    gpd_tail,
    tail_from_analysis,
)

RNG = np.random.default_rng(42)


def test_pwm_recovers_gpd_parameters():
    """The PWM estimators must be consistent across the shape range the
    fit claims (|xi| < 0.5) — this is the estimator the extrapolation
    stands on."""
    for xi in (-0.3, 0.0, 0.2, 0.4):
        fits = np.array([
            fit_gpd_pwm(genpareto.rvs(xi, scale=2.0, size=4000,
                                      random_state=RNG))
            for _ in range(16)
        ])
        assert abs(fits[:, 0].mean() - xi) < 0.03, xi
        assert abs(fits[:, 1].mean() - 2.0) < 0.08, xi


def test_gpd_sf_matches_scipy():
    y = np.linspace(0.0, 8.0, 17)
    for xi in (-0.4, -1e-12, 0.0, 0.3):
        np.testing.assert_allclose(
            _gpd_sf(y, xi, 1.7), genpareto.sf(y, xi, scale=1.7),
            rtol=1e-9, atol=1e-300,
        )
    # bounded tail (xi < 0): zero beyond the endpoint, no NaN
    assert _gpd_sf(np.array([100.0]), -0.4, 1.0)[0] == 0.0


def test_reservoir_matches_full_sort():
    """Top-k/bottom-k across arbitrary slab splits == the full sample's
    order statistics, independent of slab boundaries."""
    x = RNG.normal(size=10_000)
    x[::97] = np.nan  # non-finite values must be ignored
    r1, r2 = TailReservoir(k=256), TailReservoir(k=256)
    r1.add(x)
    for part in np.array_split(x, 13):
        r2.add(part)
    fin = np.sort(x[np.isfinite(x)])
    for r in (r1, r2):
        assert r.n == fin.size
        np.testing.assert_array_equal(r.hi, fin[-256:])
        np.testing.assert_array_equal(r.lo, fin[:256])


def test_reservoir_merge_is_exact_and_never_double_counts():
    """merge() must equal one reservoir over the union — including the
    hazard case where a small part holds the same value in BOTH sides
    (add() on its arrays would double-count it)."""
    a_vals = RNG.normal(size=500)
    b_vals = RNG.normal(size=7)  # 7 < k: every value is in hi AND lo
    ra, rb, ru = TailReservoir(64), TailReservoir(64), TailReservoir(64)
    ra.add(a_vals)
    rb.add(b_vals)
    ru.add(np.concatenate([a_vals, b_vals]))
    ra.merge(rb)
    assert ra.n == ru.n
    np.testing.assert_array_equal(ra.hi, ru.hi)
    np.testing.assert_array_equal(ra.lo, ru.lo)


def test_extrapolation_hits_known_tail():
    """Lognormal truth at p = 1e-5 from n = 100k samples: 10x beyond
    counting reach (expected hits = 1); the point estimate must land
    within 2.5x of truth and the 95% CI must cover it."""
    n = 100_000
    x = RNG.lognormal(0.0, 1.0, n)
    t = float(lognorm.ppf(1.0 - 1e-5, 1.0))
    out = gpd_tail(np.sort(x)[-4096:], n, [t], n_tail=1000, n_boot=300)
    row = out["exceedance"][0]
    assert row["method"] == "gpd"
    assert 1e-5 / 2.5 < row["probability"] < 1e-5 * 2.5
    assert row["ci95"][0] <= 1e-5 <= row["ci95"][1]
    assert out["fit"]["pwm_regime_ok"]


def test_below_threshold_falls_back_to_counting():
    n = 50_000
    x = RNG.normal(size=n)
    v = np.sort(x)[-2048:]
    t = v[-700]  # below the fitted threshold u = v[-501]: counting regime
    out = gpd_tail(v, n, [t, v[0] - 1.0], n_tail=500)
    row = out["exceedance"][0]
    assert row["method"] == "count"
    assert row["probability"] == (x > t).sum() / n
    # below the retained window: no rank information — NaN with a note
    assert np.isnan(out["exceedance"][1]["probability"])
    assert "note" in out["exceedance"][1]


def test_degenerate_exceedances_raise():
    """Tied/constant tails (a saturating metric, e.g. flight_time clipped
    at max_time) must raise, not return NaN/garbage fits silently
    (regression: the raw PWM formulas give 0/0 or sigma <= 0 there)."""
    with pytest.raises(ValueError, match="degenerate|collapsed"):
        fit_gpd_pwm(np.zeros(50))  # all ties AT the threshold
    with pytest.raises(ValueError, match="degenerate|collapsed"):
        fit_gpd_pwm(np.full(50, 2.0))  # all ties above it
    y = np.zeros(50)
    y[-1] = 1.0  # all mass on the top order statistic: sigma = 0
    with pytest.raises(ValueError, match="degenerate|collapsed"):
        fit_gpd_pwm(y)
    # and through gpd_tail: a clipped metric (ties dominate the tail)
    v = np.concatenate([RNG.normal(size=100), np.full(600, 6.0)])
    with pytest.raises(ValueError, match="degenerate|collapsed"):
        gpd_tail(v, 50_000, [7.0], n_tail=500)


def test_n_boot_zero_skips_ci():
    """n_boot=0 is the cheap probe mode: point estimates identical to the
    bootstrapped call, no ci95 keys, no bootstrap work."""
    n = 50_000
    v = np.sort(RNG.normal(size=n))[-2048:]
    t = [v[-1] + 0.5]
    fast = gpd_tail(v, n, t, n_tail=500, n_boot=0)
    full = gpd_tail(v, n, t, n_tail=500, n_boot=50)
    assert fast["fit"] == full["fit"]
    assert (fast["exceedance"][0]["probability"]
            == full["exceedance"][0]["probability"])
    assert "ci95" not in fast["exceedance"][0]
    assert "ci95" in full["exceedance"][0]


def test_lower_tail():
    n = 50_000
    x = RNG.normal(size=n)
    t = float(np.sort(x)[19])  # 19 values strictly below
    out = gpd_tail(np.sort(x)[:2048], n, [t], side="lower", n_tail=500)
    row = out["exceedance"][0]
    assert row["method"] == "gpd" or row["method"] == "count"
    p = row["probability"]
    assert 5e-5 < p < 1.5e-3  # near the empirical 19/50000 = 3.8e-4


def test_tail_from_analysis_layouts():
    """Per-lane slabbed layout and streaming reservoirs must answer the
    same question; importance runs are refused."""
    vals = RNG.normal(25_000.0, 100.0, 8192)
    mask = np.ones(vals.size, bool)
    base = {"summary": None, "metrics": {"apogee_altitude": vals},
            "valid_mask": mask}
    t = 25_000.0 + 100.0 * 4.0  # ~3e-5: beyond counting at n=8k
    a = tail_from_analysis(base, "apogee_altitude", [t], n_tail=400,
                           n_boot=100)

    res = TailReservoir(k=1024)
    res.add(vals)
    streaming = {"summary": None, "metrics_is_sample": True,
                 "metrics": {"apogee_altitude": vals[:64]},
                 "tail_reservoirs": {"apogee_altitude": res},
                 "valid_mask": mask[:64]}
    b = tail_from_analysis(streaming, "apogee_altitude", [t], n_tail=400,
                           n_boot=100)
    # same extremes, same fit: identical point estimates
    assert a["exceedance"][0]["probability"] == b["exceedance"][0]["probability"]
    assert a["fit"]["shape_xi"] == b["fit"]["shape_xi"]

    with pytest.raises(ValueError, match="weighted_tail"):
        tail_from_analysis({**base, "importance": {"shift": {}}},
                           "apogee_altitude", [t])
    with pytest.raises(KeyError):
        tail_from_analysis(base, "nope", [t])


def test_analyzer_streaming_run_carries_reservoirs(tmp_path):
    """End-to-end: a streaming slabbed run must expose tail_reservoirs,
    they must ride both checkpoint layers, and tail_from_analysis must
    agree with plain counting at a reachable threshold."""
    from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig
    from erpl_monte_carlo_sim_tpu.mc import MonteCarloAnalyzer
    from erpl_monte_carlo_sim_tpu.mc.checkpoint import (
        load_summaries,
        save_summaries,
    )
    from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

    an = MonteCarloAnalyzer(scene=nominal_scene(liquid_motor()),
                            sim_config=SimConfig(max_time=3.0),
                            stats_stream_threshold=48,
                            metrics_sample_cap=40,
                            persistent_cache=False)
    a = an.run_monte_carlo(InitialConditions.vertical_launch(),
                           n_samples=160, lane_slab=32, seed=3)
    res = a["tail_reservoirs"]["apogee_altitude"]
    assert res.n == a["n_samples"]  # valid lanes only

    t = float(res.hi[-80])  # below u (n_tail=64): counting regime
    row = tail_from_analysis(a, "apogee_altitude", [t], n_tail=64,
                             n_boot=50)["exceedance"][0]
    assert row["method"] == "count"
    assert row["probability"] == 79 / res.n

    path = str(tmp_path / "ck.npz")
    save_summaries(path, a, seed=3)
    loaded = load_summaries(path)
    lres = loaded["tail_reservoirs"]["apogee_altitude"]
    np.testing.assert_array_equal(lres.hi, res.hi)
    assert lres.n == res.n
    lrow = tail_from_analysis(loaded, "apogee_altitude", [t], n_tail=64,
                              n_boot=50)["exceedance"][0]
    assert lrow["probability"] == row["probability"]
