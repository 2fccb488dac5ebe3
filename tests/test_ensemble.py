"""Post-stratified forecast-ensemble statistics (mc/ensemble.py).

Beyond-reference feature (the reference holds exactly one forecast,
`monte_carlo.py:31-32`): with an ensemble base_wind, every member is a
stratum of exactly known probability 1/K. Pins: the slab-mergeable
accumulator against a straight numpy group-by, the post-stratified
mean/stderr closed forms (and that post-stratification tightens the
mixture mean when members differ), per-member exceedance with the
post-stratified mixture probability, analyzer integration in both
layouts, the report blocks, and bit-identical checkpoint resume.
"""

import os

import numpy as np
import pytest

import erpl_monte_carlo_sim_tpu.mc.analyzer as analyzer_mod
from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig
from erpl_monte_carlo_sim_tpu.mc import MonteCarloAnalyzer, member_exceedance
from erpl_monte_carlo_sim_tpu.mc.ensemble import METRICS, EnsembleAccumulator
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

IC = InitialConditions.vertical_launch()
CFG = SimConfig(max_time=2.0)


def _ensemble_analyzer(k=2, **kw):
    an = MonteCarloAnalyzer(scene=nominal_scene(liquid_motor()),
                            sim_config=CFG, persistent_cache=False, **kw)
    grid = np.linspace(0.0, 25000.0, 100)
    base = np.stack([np.full(100, 3.0), np.zeros(100), np.zeros(100)],
                    axis=1)
    members = [base * (1.0 - 2.0 * j) for j in range(k)]
    an.base_altitude_profile = grid
    an.base_wind_profile = np.stack(members, axis=0)
    return an


def _groupby_block(members, valid, metrics, k):
    """Straight numpy reference for EnsembleAccumulator.block()."""
    rows = []
    for j in range(k):
        row = {"n_drawn": int((members == j).sum()),
               "n_valid": int((valid & (members == j)).sum())}
        for name in METRICS:
            v = np.asarray(metrics[name], np.float64)
            sel = valid & (members == j) & np.isfinite(v)
            vv = v[sel]
            row[name] = {
                "n": int(vv.size),
                "mean": float(vv.mean()) if vv.size else float("nan"),
                "std": float(vv.std()) if vv.size else float("nan"),
            }
        rows.append(row)
    return rows


def test_accumulator_matches_groupby_across_slabs():
    rng = np.random.default_rng(0)
    k, n = 3, 4000
    members = rng.integers(0, k, size=n)
    valid = rng.uniform(size=n) > 0.2
    metrics = {
        name: rng.normal(100.0 * i + 10.0 * members, 3.0)
        for i, name in enumerate(METRICS)
    }
    metrics[METRICS[0]][:5] = np.nan  # non-finite lanes must be dropped
    acc = EnsembleAccumulator(k)
    for sl in np.array_split(np.arange(n), 7):
        acc.add(members[sl], valid[sl],
                {m: metrics[m][sl] for m in METRICS})
    blk = acc.block()
    ref = _groupby_block(members, valid, metrics, k)
    assert blk["n_members"] == k
    for j in range(k):
        got, want = blk["members"][j], ref[j]
        assert got["member"] == j
        assert got["n_drawn"] == want["n_drawn"]
        assert got["n_valid"] == want["n_valid"]
        for name in METRICS:
            assert got[name]["n"] == want[name]["n"]
            np.testing.assert_allclose(got[name]["mean"],
                                       want[name]["mean"], rtol=1e-12)
            np.testing.assert_allclose(got[name]["std"],
                                       want[name]["std"], rtol=1e-10)
    # post-stratified closed forms from the group-by rows
    for name in METRICS:
        means = np.array([r[name]["mean"] for r in ref])
        ns = np.array([r[name]["n"] for r in ref], np.float64)
        vars_ = np.array([r[name]["std"] ** 2 for r in ref])
        ps = blk["post_stratified"][name]
        np.testing.assert_allclose(ps["mean"], means.mean(), rtol=1e-12)
        np.testing.assert_allclose(
            ps["stderr"], np.sqrt((vars_ / ns).sum()) / k, rtol=1e-10
        )
    with pytest.raises(ValueError, match="members"):
        EnsembleAccumulator(1)


def test_post_stratified_tighter_when_members_differ():
    """Metric = f(member) + small noise: the plain mixture mean pays the
    member-allocation noise; the post-stratified mean does not."""
    rng = np.random.default_rng(1)
    k, n = 4, 2000
    members = rng.integers(0, k, size=n)
    vals = 100.0 * members + rng.normal(0.0, 1.0, size=n)
    acc = EnsembleAccumulator(k)
    acc.add(members, np.ones(n, bool), {m: vals for m in METRICS})
    ps = acc.block()["post_stratified"][METRICS[0]]
    plain_se = vals.std() / np.sqrt(n)  # ~ sqrt(var_between)/sqrt(n)
    # within-member sigma 1.0: post-strat stderr ~ 1/sqrt(n) * (tiny)
    assert ps["stderr"] < 0.2 * plain_se
    # the post-stratified mean reweights to exact 1/K member shares
    means = [vals[members == j].mean() for j in range(k)]
    np.testing.assert_allclose(ps["mean"], np.mean(means), rtol=1e-12)


def test_zero_valid_member_gives_nan_post_strat():
    acc = EnsembleAccumulator(2)
    members = np.zeros(50, np.int64)  # member 1 never drawn
    acc.add(members, np.ones(50, bool),
            {m: np.arange(50.0) for m in METRICS})
    blk = acc.block()
    assert blk["members"][1]["n_drawn"] == 0
    for name in METRICS:
        assert np.isnan(blk["post_stratified"][name]["mean"])
        assert np.isnan(blk["post_stratified"][name]["stderr"])
        assert np.isfinite(blk["members"][0][name]["mean"])


def test_member_exceedance_math():
    rng = np.random.default_rng(2)
    k, n = 2, 1000
    members = rng.integers(0, k, size=n)
    vals = np.where(members == 0, 0.0, 1.0) + rng.normal(0, 0.2, n)
    analysis = {
        "wind_members": members,
        "valid_mask": np.ones(n, bool),
        "metrics": {"range": vals},
        "ensemble": {"n_members": k},
    }
    (row,) = member_exceedance(analysis, "range", 0.5)
    ps = []
    for j in range(k):
        got = row["members"][j]
        sel = members == j
        p = float((vals[sel] > 0.5).mean())
        assert got["n"] == int(sel.sum())
        np.testing.assert_allclose(got["probability"], p, rtol=1e-12)
        assert got["ci95"][0] <= p <= got["ci95"][1]
        ps.append(p)
    np.testing.assert_allclose(row["post_stratified"]["probability"],
                               np.mean(ps), rtol=1e-12)
    # stderr: per-member Wilson-halfwidth-implied, closed form
    z = 1.959963984540054
    se = np.sqrt(sum(
        ((m["ci95"][1] - m["ci95"][0]) / (2 * z)) ** 2
        for m in row["members"]
    )) / k
    np.testing.assert_allclose(row["post_stratified"]["stderr"], se,
                               rtol=1e-12)
    # a member with zero exceedances must NOT contribute zero variance
    vals0 = np.where(members == 0, -1.0, 1.0)  # member 0: never exceeds
    (row0,) = member_exceedance(
        dict(analysis, metrics={"range": vals0}), "range", 0.5)
    assert row0["members"][0]["n_exceed"] == 0
    assert row0["post_stratified"]["stderr"] > 0.0
    # streaming (capped-prefix) runs must refuse, not silently answer
    with pytest.raises(ValueError, match="streaming"):
        member_exceedance(dict(analysis, metrics_is_sample=True),
                          "range", 0.5)
    with pytest.raises(ValueError, match="ensemble"):
        member_exceedance({"metrics": {"range": vals}}, "range", 0.5)


def test_analyzer_single_call_ensemble_block():
    an = _ensemble_analyzer(k=2)
    a = an.run_monte_carlo(IC, n_samples=48, seed=6)
    blk = a["ensemble"]
    members = np.asarray(a["wind_members"])
    np.testing.assert_array_equal(members, np.asarray(a["sample"].wind_member))
    valid = np.asarray(a["valid_mask"], bool)
    metrics = {m: np.asarray(getattr(a["summary"], m)) for m in METRICS}
    ref = _groupby_block(members, valid, metrics, 2)
    for j in range(2):
        assert blk["members"][j]["n_valid"] == ref[j]["n_valid"]
        for name in METRICS:
            np.testing.assert_allclose(
                blk["members"][j][name]["mean"], ref[j][name]["mean"],
                rtol=1e-10, err_msg=(j, name),
            )
    assert blk["members"][0]["n_drawn"] + blk["members"][1]["n_drawn"] == 48


def test_analyzer_slabbed_ensemble_block_and_report(tmp_path):
    an = _ensemble_analyzer(k=2)
    a = an.run_monte_carlo(IC, n_samples=48, seed=6, lane_slab=16)
    members = np.asarray(a["wind_members"])
    assert members.size == 48
    valid = np.asarray(a["valid_mask"], bool)
    blk = a["ensemble"]
    ref = _groupby_block(members, valid, a["metrics"], 2)
    for j in range(2):
        assert blk["members"][j]["n_valid"] == ref[j]["n_valid"]
        for name in METRICS:
            np.testing.assert_allclose(
                blk["members"][j][name]["mean"], ref[j][name]["mean"],
                rtol=1e-10, err_msg=(j, name),
            )
    # per-member exceedance composes with the retained per-lane layout
    thr = float(np.nanmedian(np.asarray(a["metrics"]["apogee_altitude"])))
    (row,) = member_exceedance(a, "apogee_altitude", thr)
    assert sum(m["n"] for m in row["members"]) == int(valid.sum())
    # report blocks: JSON copies the analysis block, TXT renders it
    from erpl_monte_carlo_sim_tpu.reporting import save_report

    report = save_report(a, str(tmp_path), analyzer=an)
    assert report["ensemble"] == blk
    txt = open(os.path.join(str(tmp_path), "monte_carlo_report.txt")).read()
    assert "Forecast Ensemble (2 members):" in txt
    assert "Post-stratified means:" in txt


def test_checkpoint_resume_preserves_ensemble(monkeypatch, tmp_path):
    """Killed-and-resumed ensemble run must reproduce the uninterrupted
    ensemble block and member prefix bit for bit."""
    ckpt = str(tmp_path / "ens.ckpt.npz")
    an = _ensemble_analyzer(k=2)
    full = an.run_monte_carlo(IC, n_samples=48, seed=6, lane_slab=16)

    real = analyzer_mod.sample_dispersions
    calls = {"n": 0}

    def wrapper(*args, **kw):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("simulated crash")
        return real(*args, **kw)

    monkeypatch.setattr(analyzer_mod, "sample_dispersions", wrapper)
    an2 = _ensemble_analyzer(k=2)
    with pytest.raises(RuntimeError, match="simulated crash"):
        an2.run_monte_carlo(IC, n_samples=48, seed=6, lane_slab=16,
                            checkpoint_path=ckpt, checkpoint_every=1)
    monkeypatch.undo()
    assert os.path.exists(ckpt)
    resumed = an2.run_monte_carlo(IC, n_samples=48, seed=6, lane_slab=16,
                                  checkpoint_path=ckpt, checkpoint_every=1)
    assert not os.path.exists(ckpt)  # removed on completion
    np.testing.assert_array_equal(resumed["wind_members"],
                                  full["wind_members"])
    assert resumed["ensemble"] == full["ensemble"]
    assert resumed["convergence"] == full["convergence"]


def test_member_exceedance_refuses_importance_runs():
    analysis = {
        "wind_members": np.zeros(10, np.int64),
        "valid_mask": np.ones(10, bool),
        "metrics": {"range": np.arange(10.0)},
        "ensemble": {"n_members": 2},
        "importance": {"shift": {"motor_thrust": 2.0}},
    }
    with pytest.raises(ValueError, match="importance"):
        member_exceedance(analysis, "range", 5.0)


def test_from_base_wind_gate():
    grid = np.zeros(10)
    single = np.zeros((10, 3))
    ens = np.zeros((3, 10, 3))
    assert EnsembleAccumulator.from_base_wind(None) is None
    assert EnsembleAccumulator.from_base_wind((grid, single)) is None
    assert EnsembleAccumulator.from_base_wind((grid, ens[:1])) is None
    acc = EnsembleAccumulator.from_base_wind((grid, ens))
    assert acc is not None and acc.k == 3


def test_save_load_summaries_roundtrip_ensemble(tmp_path):
    """save_summaries/load_summaries carry the ensemble block + member
    indices, so member_exceedance works on a reloaded checkpoint."""
    from erpl_monte_carlo_sim_tpu.mc.checkpoint import (
        load_summaries,
        save_summaries,
    )

    an = _ensemble_analyzer(k=2)
    for kwargs in ({}, {"lane_slab": 16}):  # both layouts
        a = an.run_monte_carlo(IC, n_samples=48, seed=6, **kwargs)
        path = str(tmp_path / f"ens{'slab' if kwargs else 'one'}.npz")
        save_summaries(path, a, seed=6)
        loaded = load_summaries(path)
        assert loaded["ensemble"] == a["ensemble"]
        np.testing.assert_array_equal(loaded["wind_members"],
                                      a["wind_members"])
        thr = float(np.median(np.asarray(a["wind_members"]) * 0.0 + 500.0))
        live = member_exceedance(a, "apogee_altitude", thr)
        if kwargs:  # slabbed layout loads with a metrics dict
            re = member_exceedance(loaded, "apogee_altitude", thr)
            assert re == live
