"""Exceedance probabilities (mc/stats.py exceedance / exceedance_from_analysis).

Beyond-reference range-safety deliverable: P(metric > threshold) with a
Wilson 95% CI when per-lane data exists, and a sketch-based answer that
survives streaming runs after the per-lane data is gone (the reference's
stats block stops at fixed percentiles, `monte_carlo.py:444-459`).
"""

import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig
from erpl_monte_carlo_sim_tpu.mc import (
    MonteCarloAnalyzer,
    exceedance,
    exceedance_from_analysis,
)
from erpl_monte_carlo_sim_tpu.mc.stats import StreamingStats
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

SCENE = nominal_scene(liquid_motor())
IC = InitialConditions.vertical_launch()
CFG = SimConfig(max_time=6.0)


def test_exact_exceedance_matches_numpy_and_wilson_behaves():
    rng = np.random.default_rng(0)
    v = rng.normal(100.0, 10.0, 50_000)
    mask = rng.random(50_000) < 0.9
    rows = exceedance(v, mask, [80.0, 100.0, 120.0, 1e9])
    vv = v[mask]
    for row, t in zip(rows, [80.0, 100.0, 120.0, 1e9]):
        assert row["probability"] == pytest.approx((vv > t).mean())
        lo, hi = row["ci95"]
        assert 0.0 <= lo <= row["probability"] <= hi <= 1.0
    # p = 0 tail: the Wilson upper bound stays informative (~3.8/n), the
    # lower bound is exactly 0
    zero = rows[-1]
    assert zero["probability"] == 0.0
    assert zero["ci95"][0] == 0.0
    assert 0.0 < zero["ci95"][1] < 5.0 / zero["n"]
    # NaN lanes are dropped, not counted
    v2 = v.copy()
    v2[:1000] = np.nan
    r = exceedance(v2, np.ones_like(mask), [100.0])[0]
    assert r["n"] == 49_000


def test_sketch_cdf_tracks_exact():
    rng = np.random.default_rng(1)
    vals = rng.normal(0.0, 1.0, 300_000)
    s = StreamingStats(exact_threshold=10_000)
    for part in np.array_split(vals, 30):
        s.add(part)
    assert not s.is_exact
    xs = np.array([-2.0, -0.5, 0.0, 0.7, 1.5, 3.0])
    got = s.cdf(xs)  # vectorized: one centroid sort for all thresholds
    want = (vals[None, :] <= xs[:, None]).mean(axis=1)
    np.testing.assert_allclose(got, want, atol=2e-3)
    # beyond the observed extremes the exact min/max clamp the answer —
    # symmetrically on BOTH tails (review, round 3: the lower tail used to
    # report a falsely certain 0.0 between min and the first centroid)
    assert s.cdf(vals.max() + 1.0)[0] == 1.0
    assert s.cdf(vals.min() - 1.0)[0] == 0.0
    lo_gap = 0.5 * (s._min + np.sort(s._cent_v)[0])
    assert 0.0 < s.cdf(lo_gap)[0] < 1e-3
    hi_gap = 0.5 * (s._max + np.sort(s._cent_v)[-1])
    assert 1.0 - 1e-3 < s.cdf(hi_gap)[0] < 1.0
    # exact mode: cdf is the empirical CDF
    se = StreamingStats(exact_threshold=10_000)
    se.add(vals[:5000])
    np.testing.assert_allclose(se.cdf(xs),
                               (vals[:5000][None, :] <= xs[:, None]).mean(1))


def test_streaming_exact_buffer_keeps_wilson_schema():
    """A streaming run whose sketch still holds its exact buffer must
    answer with the full exact schema (ci95 + n_exceed), not a stripped
    'exact' row (review, round 3)."""
    rng = np.random.default_rng(2)
    vals = rng.normal(50.0, 5.0, 1000)
    s = StreamingStats(exact_threshold=10_000)
    s.add(vals)
    assert s.is_exact
    a = {"metrics_is_sample": True, "streams": {"apogee_altitude": s}}
    row = exceedance_from_analysis(a, "apogee_altitude", [50.0])[0]
    assert row["method"] == "exact"
    assert "ci95" in row and row["n_exceed"] == int((vals > 50.0).sum())


def test_unknown_metric_raises_keyerror_on_all_layouts():
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG)
    a = mc.run_monte_carlo(IC, n_samples=32, seed=11)
    with pytest.raises(KeyError):
        exceedance_from_analysis(a, "apogee_typo", [0.0])


def test_from_analysis_single_call_and_slabbed():
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG)
    a = mc.run_monte_carlo(IC, n_samples=96, seed=3)
    med = a["apogee_altitude"]["percentiles"][2]
    row = exceedance_from_analysis(a, "apogee_altitude", [med])[0]
    assert row["method"] == "exact"
    assert 0.3 < row["probability"] < 0.7
    # slabbed (non-streaming): metrics arrays carry every lane
    b = mc.run_monte_carlo(IC, n_samples=96, seed=3, lane_slab=32)
    row_b = exceedance_from_analysis(b, "apogee_altitude", [med])[0]
    assert row_b["method"] == "exact"
    assert row_b["n"] == b["n_samples"]
    # max_speed works via the metrics dict too
    ms = exceedance_from_analysis(b, "max_speed", [0.0])[0]
    assert ms["probability"] == 1.0


def test_from_analysis_streaming_run():
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                            stats_stream_threshold=64,
                            metrics_sample_cap=64)
    a = mc.run_monte_carlo(IC, n_samples=192, seed=4, lane_slab=64)
    assert a["metrics_is_sample"]
    med = a["apogee_altitude"]["percentiles"][2]
    row = exceedance_from_analysis(a, "apogee_altitude", [med])[0]
    assert row["method"] == "sketch"
    # recompute exactly from this run's own records (192 < the record cap)
    vals = np.asarray([r["apogee_altitude"] for r in a["results"]])
    want = (vals > med).mean()
    assert abs(row["probability"] - want) < 0.02
    # un-sketched metric: falls back to the capped prefix, flagged as such
    ms = exceedance_from_analysis(a, "max_speed", [0.0])[0]
    assert ms["method"] == "sample_prefix"
    with pytest.raises(KeyError):
        exceedance_from_analysis(a, "nope", [0.0])


def test_plot_exceedance(tmp_path):
    from erpl_monte_carlo_sim_tpu.reporting import plot_exceedance

    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG)
    a = mc.run_monte_carlo(IC, n_samples=96, seed=3)
    path = plot_exceedance(a, "apogee_altitude", str(tmp_path))
    assert path is not None
    import os
    assert os.path.getsize(path) > 10_000
    # importance-sampled runs route through the weighted estimator
    mi = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                            importance_shift={"motor_thrust": 1.5})
    ai = mi.run_monte_carlo(IC, n_samples=96, seed=4)
    path_i = plot_exceedance(ai, "apogee_altitude", str(tmp_path))
    assert path_i is not None and os.path.getsize(path_i) > 10_000


def test_plot_exceedance_gpd_overlay(tmp_path):
    """gpd=True must extend the curve past the sample maximum with the
    extrapolation band; importance runs must stay plain (the overlay is
    refused internally, never a crash)."""
    import os

    from erpl_monte_carlo_sim_tpu.reporting import plot_exceedance

    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG)
    a = mc.run_monte_carlo(IC, n_samples=256, seed=5)
    path = plot_exceedance(a, "apogee_altitude", str(tmp_path), gpd=True)
    assert path is not None and os.path.getsize(path) > 10_000

    mi = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                            importance_shift={"motor_thrust": 1.5})
    ai = mi.run_monte_carlo(IC, n_samples=96, seed=4)
    path_i = plot_exceedance(ai, "apogee_altitude", str(tmp_path), gpd=True)
    assert path_i is not None and os.path.getsize(path_i) > 10_000
