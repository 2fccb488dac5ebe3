"""Landing-dispersion footprint (mc/stats.py landing_footprint /
FootprintAccumulator, analyzer integration, reporting).

Beyond-reference deliverable: the reference reduces landing position to a
scalar range list (`monte_carlo.py:400-473`); here every MC run reports
mean impact point, covariance, 95/99% dispersion ellipses, and CEP — with
an O(1)-memory moment-merge path for slabbed runs whose exactness (and
gaussian-CEP accuracy) these tests pin.
"""

import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig
from erpl_monte_carlo_sim_tpu.mc import MonteCarloAnalyzer
from erpl_monte_carlo_sim_tpu.mc.stats import (
    FootprintAccumulator,
    landing_footprint,
)
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene


def _gauss_points(n=100_000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.multivariate_normal(
        [4200.0, -730.0], [[250.0 ** 2, 9000.0], [9000.0, 90.0 ** 2]], size=n
    )


def test_empirical_footprint_matches_closed_form():
    pts = _gauss_points()
    fp = landing_footprint(pts[:, 0], pts[:, 1])
    assert fp["n"] == len(pts)
    np.testing.assert_allclose(fp["mean_m"], pts.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(
        fp["cov_m2"], np.cov(pts.T, bias=True), rtol=1e-10
    )
    # ellipse semi-axes = sqrt(chi2_2dof * eigenvalues), major >= minor
    evals = np.linalg.eigvalsh(np.cov(pts.T, bias=True))
    np.testing.assert_allclose(
        fp["ellipse95"]["semi_major_m"], np.sqrt(5.991464547 * evals[1]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        fp["ellipse99"]["semi_minor_m"], np.sqrt(9.210340372 * evals[0]),
        rtol=1e-6,
    )
    assert fp["ellipse99"]["semi_major_m"] > fp["ellipse95"]["semi_major_m"]
    assert fp["cep_method"] == "empirical"
    np.testing.assert_allclose(
        fp["cep_m"],
        np.median(np.hypot(*(pts - pts.mean(axis=0)).T)), rtol=1e-12,
    )
    # orientation: strongly correlated major axis points near the
    # eigenvector direction
    v = np.linalg.eigh(np.cov(pts.T, bias=True))[1][:, 1]
    want = np.degrees(np.arctan2(v[1], v[0]))
    assert abs(((fp["orientation_deg"] - want) + 90) % 180 - 90) < 1e-6


def test_accumulator_merge_is_exact_and_order_free():
    """Chan-merged slab moments must reproduce the whole-batch mean/cov to
    float noise regardless of slab split, including the f32-hostile case
    (small dispersion at a large mean offset)."""
    pts = _gauss_points(n=30_000, seed=3)
    whole = landing_footprint(pts[:, 0], pts[:, 1])

    for slabs in (1, 3, 7):
        acc = FootprintAccumulator()
        for part in np.array_split(pts, slabs):
            x, y = part[:, 0], part[:, 1]
            mx, my = x.mean(), y.mean()
            acc.add(len(part), mx, my, ((x - mx) ** 2).sum(),
                    ((y - my) ** 2).sum(), ((x - mx) * (y - my)).sum())
        got = acc.footprint()
        assert got["n"] == whole["n"]
        np.testing.assert_allclose(got["mean_m"], whole["mean_m"], rtol=1e-12)
        np.testing.assert_allclose(got["cov_m2"], whole["cov_m2"], rtol=1e-9)
        assert got["cep_method"] == "gaussian"
        # gaussian-fit CEP vs empirical on gaussian data: sub-2% by
        # construction (the LDS median resolves to ~0.1%)
        assert abs(got["cep_m"] - whole["cep_m"]) / whole["cep_m"] < 0.02


def test_empty_and_degenerate():
    fp = landing_footprint(np.empty(0), np.empty(0))
    assert fp["n"] == 0 and np.isnan(fp["cep_m"])
    acc = FootprintAccumulator()
    assert acc.footprint()["n"] == 0
    # all lanes at one point: zero ellipse, zero CEP, no NaN/crash
    one = landing_footprint(np.full(8, 3.0), np.full(8, -2.0))
    assert one["ellipse95"]["semi_major_m"] == 0.0
    assert one["cep_m"] == 0.0


SCENE = nominal_scene(liquid_motor())
IC = InitialConditions.vertical_launch()
CFG = SimConfig(max_time=6.0)  # 1k-step window; lands are synthetic


def test_analyzer_single_call_footprint():
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG)
    a = mc.run_monte_carlo(IC, n_samples=64, seed=5)
    fp = a["landing_footprint"]
    assert fp["n"] == a["n_samples"]
    assert fp["cep_method"] == "empirical"
    lp = np.asarray(a["summary"].landing_position)[np.asarray(a["valid_mask"])]
    np.testing.assert_allclose(fp["mean_m"], lp[:, :2].mean(axis=0),
                               rtol=1e-6, atol=1e-9)


def test_analyzer_slabbed_footprint_matches_own_lanes():
    """Slabbed footprints come from the device moment kernel + Chan merge;
    they must equal an empirical footprint recomputed from the SAME run's
    materialized records to f32 readback noise. (A single-call run with the
    same seed draws DIFFERENT lanes — slab dispersions fold the key per
    slab — so cross-path comparison is statistical, not lane-for-lane.)"""
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG)
    slabbed = mc.run_monte_carlo(IC, n_samples=96, seed=2, lane_slab=32)
    f2 = slabbed["landing_footprint"]
    recs = slabbed["results"]  # all valid lanes (n < the 1000-record cap)
    assert len(recs) == f2["n"]
    pts = np.asarray([r["landing_position"][:2] for r in recs])
    ref = landing_footprint(pts[:, 0], pts[:, 1])
    np.testing.assert_allclose(f2["mean_m"], ref["mean_m"], rtol=1e-5)
    np.testing.assert_allclose(f2["cov_m2"], ref["cov_m2"], rtol=1e-3,
                               atol=1e-6)
    assert f2["cep_method"] == "gaussian"
    # capped landing-xy prefix rides along for the footprint plot scatter
    ls = np.asarray(slabbed["landing_samples"])
    assert ls.shape == (96, 2)
    np.testing.assert_allclose(
        ls[np.asarray(slabbed["valid_mask"])], pts, rtol=1e-6
    )


def test_footprint_report_and_plot(tmp_path):
    from erpl_monte_carlo_sim_tpu.reporting import (
        plot_landing_footprint,
        save_report,
    )

    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG)
    a = mc.run_monte_carlo(IC, n_samples=64, seed=5)
    out = str(tmp_path)
    report = save_report(a, out, analyzer=mc)
    assert report["landing_footprint"]["n"] == a["n_samples"]
    txt = (tmp_path / "monte_carlo_report.txt").read_text()
    assert "Landing Dispersion Footprint:" in txt
    assert "CEP:" in txt
    path = plot_landing_footprint(a, out)
    assert path is not None and (tmp_path / "landing_footprint.png").stat().st_size > 10_000
    # slabbed analyses (summary=None) still plot the ellipse-only map
    a2 = mc.run_monte_carlo(IC, n_samples=96, seed=2, lane_slab=32)
    assert plot_landing_footprint(a2, out) is not None
    # and an empty footprint declines gracefully
    assert plot_landing_footprint({"landing_footprint": {"n": 0}}, out) is None
