"""Sequential (run-to-precision) Monte Carlo (mc/sequential.py +
MonteCarloAnalyzer.run_to_precision).

Beyond-reference feature: the reference runs a FIXED n_samples per
invocation (`monte_carlo.py:52`) — choosing it is the user's problem.
Pins: criterion arithmetic on closed-form inputs; the EXACTNESS of early
stopping (stopping after k slabs == the run that asked for k*slab lanes,
bit for bit); decision behavior at the extremes; budget exhaustion; and
the adaptive launch-window route."""

import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig
from erpl_monte_carlo_sim_tpu.mc import (
    ExceedanceDecision,
    ExceedanceHalfwidth,
    MeanStderr,
    MonteCarloAnalyzer,
    parse_criterion,
)
from erpl_monte_carlo_sim_tpu.mc.stats import _wilson
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

SCENE = nominal_scene(liquid_motor())
IC = InitialConditions.vertical_launch()
CFG = SimConfig(max_time=2.0)


def _analyzer(**kw):
    return MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                              persistent_cache=False, **kw)


# ------------------------------------------------------------ criteria


def test_mean_stderr_closed_form():
    c = MeanStderr("range", target=0.5)
    assert not c.satisfied()  # n < 2
    vals = np.array([1.0, 2.0, 3.0, 4.0])
    c.update(vals[:2])
    c.update(vals[2:])
    se = np.sqrt(np.var(vals) / vals.size)  # population variance
    assert c.stderr() == pytest.approx(se)
    assert c.block()["mean"] == pytest.approx(2.5)
    assert c.satisfied() == (se <= 0.5)
    # non-finite values are ignored, not counted
    c2 = MeanStderr("range", target=0.5)
    c2.update(np.array([1.0, np.nan, 3.0]))
    assert c2.n == 2


def test_exceedance_decision_wilson_sides():
    # clearly below the limit -> go
    c = ExceedanceDecision("range", threshold=10.0, p_limit=0.1)
    assert c.decision() is None  # no data yet
    c.update(np.full(500, 5.0))  # zero exceedances
    assert c.decision() == "go" and c.satisfied()
    # clearly above -> no_go
    c = ExceedanceDecision("range", threshold=10.0, p_limit=0.1)
    c.update(np.full(500, 20.0))  # every lane exceeds
    assert c.decision() == "no_go"
    # straddling the limit -> undecided
    c = ExceedanceDecision("range", threshold=10.0, p_limit=0.1)
    c.update(np.array([20.0] * 2 + [5.0] * 18))  # p_hat = 0.1, n = 20
    lo, hi = _wilson(2, 20)
    assert lo <= 0.1 <= hi and c.decision() is None
    assert c.block()["ci95"] == [lo, hi]


def test_exceedance_halfwidth():
    c = ExceedanceHalfwidth("apogee_altitude", threshold=10.0, target=0.05)
    assert c.halfwidth() == np.inf
    c.update(np.array([20.0] * 50 + [5.0] * 50))
    lo, hi = _wilson(50, 100)
    assert c.halfwidth() == pytest.approx((hi - lo) / 2)
    assert not c.satisfied()
    c.update(np.array([20.0] * 1000 + [5.0] * 1000))
    assert c.satisfied()  # n = 2100: halfwidth ~ 0.021


def test_parse_criterion_specs_and_validation():
    assert isinstance(
        parse_criterion({"metric": "range", "mean_stderr": 1.0}),
        MeanStderr)
    assert isinstance(
        parse_criterion({"metric": "range", "exceed": 5.0,
                         "p_limit": 0.1}), ExceedanceDecision)
    assert isinstance(
        parse_criterion({"metric": "range", "exceed": 5.0,
                         "ci_halfwidth": 0.1}), ExceedanceHalfwidth)
    c = MeanStderr("range", 1.0)
    assert parse_criterion(c) is c
    with pytest.raises(ValueError, match="metric"):
        parse_criterion({"metric": "bogus", "mean_stderr": 1.0})
    with pytest.raises(ValueError, match="spec"):
        parse_criterion({"metric": "range", "mean_stderr": 1.0,
                         "exceed": 2.0})
    with pytest.raises(ValueError, match="> 0"):
        MeanStderr("range", 0.0)
    with pytest.raises(ValueError, match="p_limit"):
        ExceedanceDecision("range", 5.0, 1.5)
    with pytest.raises(TypeError):
        parse_criterion("not a dict")


# ------------------------------------------- analyzer integration


def test_early_stop_is_exact_truncation():
    """The headline invariant: stopping after k slabs returns the SAME
    analysis as run_monte_carlo(n_samples=k*slab, lane_slab=slab) —
    identical stats, identical lanes (the determinism contract is keyed
    per (key, slab_idx, slab), so the slab size must match)."""
    mc = _analyzer()
    a = mc.run_to_precision(
        IC, criteria=[{"metric": "apogee_altitude", "mean_stderr": 1e9}],
        max_samples=256, min_samples=64, lane_slab=32, seed=5,
    )
    seq = a["sequential"]
    assert seq["stopped_early"] and seq["satisfied"]
    assert seq["n_used"] == 64  # loose target, held to min_samples=2 slabs
    c = _analyzer().run_monte_carlo(IC, n_samples=64, lane_slab=32, seed=5)
    for k in ("apogee_altitude", "range", "flight_time"):
        assert a[k]["mean"] == c[k]["mean"], k
        assert a[k]["std"] == c[k]["std"], k
        assert a[k]["percentiles"] == c[k]["percentiles"], k
    assert a["n_samples"] == c["n_samples"]
    np.testing.assert_array_equal(a["metrics"]["range"],
                                  c["metrics"]["range"])


def test_budget_exhaustion_reports_unsatisfied():
    mc = _analyzer()
    a = mc.run_to_precision(
        IC, criteria=[{"metric": "apogee_altitude", "mean_stderr": 1e-12}],
        max_samples=64, lane_slab=32, seed=1,
    )
    seq = a["sequential"]
    assert not seq["stopped_early"] and not seq["satisfied"]
    assert seq["n_used"] == 64
    crit = seq["criteria"][0]
    assert crit["kind"] == "mean_stderr" and not crit["satisfied"]
    assert crit["n"] == a["n_samples"]  # criteria saw every valid lane


def test_min_samples_floor():
    mc = _analyzer()
    a = mc.run_to_precision(
        IC, criteria=[{"metric": "range", "mean_stderr": 1e9}],
        max_samples=128, min_samples=96, lane_slab=32, seed=2,
    )
    assert a["sequential"]["n_used"] == 96  # met after slab 1, held to 3


def test_decision_criterion_stops_at_obvious_go():
    """A threshold far above every apogee decides 'go' as soon as the
    Wilson upper bound can clear p_limit (k=0 needs n >= ~74 at
    p_limit=0.05 — the CI, not the point estimate, drives the stop)."""
    mc = _analyzer()
    a = mc.run_to_precision(
        IC,
        criteria=[{"metric": "apogee_altitude", "exceed": 1e7,
                   "p_limit": 0.05}],
        max_samples=512, lane_slab=64, seed=3,
    )
    seq = a["sequential"]
    assert seq["n_used"] == 128 and seq["stopped_early"]
    assert seq["criteria"][0]["decision"] == "go"
    assert seq["criteria"][0]["n_exceed"] == 0


def test_validation_errors():
    mc = _analyzer()
    with pytest.raises(ValueError, match="non-empty"):
        mc.run_to_precision(IC, criteria=[], max_samples=64)
    with pytest.raises(ValueError, match="min_samples"):
        mc.run_to_precision(
            IC, criteria=[{"metric": "range", "mean_stderr": 1.0}],
            max_samples=64, min_samples=128,
        )
    imp = _analyzer(importance_shift={"motor_thrust": 1.0})
    with pytest.raises(ValueError, match="importance"):
        imp.run_to_precision(
            IC, criteria=[{"metric": "range", "mean_stderr": 1.0}],
            max_samples=64,
        )


def test_adaptive_launch_window():
    """Adaptive sweep: an obvious-go candidate stops at one slab; rows
    carry n_used/decided; validation rejects a limitless adaptive call."""
    from erpl_monte_carlo_sim_tpu.cli.launch_window import (
        launch_window_sweep,
    )

    sweep = launch_window_sweep(
        [2.0], [0.0], n=32, seed=4, max_time=2.0,
        range_limit=1e7,  # unreachable in a 2 s window -> obvious go
        p_limit=0.05, adaptive_max_n=256,
    )
    row = sweep["candidates"][0]
    assert row["go"] is True and row["decided"] is True
    # k=0 at p_limit=0.05 needs ~74 valid lanes before the Wilson upper
    # bound clears: 3 slabs of 32, well short of the 256 budget
    assert row["n_used"] == 96
    assert sweep["adaptive_max_n"] == 256
    with pytest.raises(ValueError, match="limit"):
        launch_window_sweep([2.0], [0.0], n=32, adaptive_max_n=64,
                            max_time=2.0)
    with pytest.raises(ValueError, match=">= n"):
        launch_window_sweep([2.0], [0.0], n=32, adaptive_max_n=16,
                            max_time=2.0, range_limit=100.0)


def test_sequential_block_in_report(tmp_path):
    """run_to_precision analyses carry their stopping record into the
    JSON + TXT reports like every other beyond-reference block."""
    import json
    import os

    from erpl_monte_carlo_sim_tpu.reporting import save_report

    mc = _analyzer()
    a = mc.run_to_precision(
        IC, criteria=[{"metric": "apogee_altitude", "exceed": 1e7,
                       "p_limit": 0.05},
                      {"metric": "range", "mean_stderr": 1e9}],
        max_samples=256, lane_slab=64, seed=7,
    )
    out = str(tmp_path)
    report = save_report(a, out, analyzer=mc)
    assert report["sequential"]["n_used"] == a["sequential"]["n_used"]
    with open(os.path.join(out, "monte_carlo_report.json")) as f:
        j = json.load(f)
    assert j["sequential"]["criteria"][0]["kind"] == "exceedance_decision"
    txt = open(os.path.join(out, "monte_carlo_report.txt")).read()
    assert "Sequential Stopping" in txt
    assert "mean stderr" in txt and "undecided" not in txt


def test_quantile_halfwidth_criterion():
    """QuantileHalfwidth: unresolvable at tiny n (deep-tail ranks outside
    the sample -> inf halfwidth, never a false stop), then converges, and
    the realized half-width tracks the binomial closed form on U(0,1)."""
    from erpl_monte_carlo_sim_tpu.mc import QuantileHalfwidth

    rng = np.random.default_rng(23)

    # deep tail, tiny n: p99.9 needs ~>3000 lanes to even bracket
    c = QuantileHalfwidth("range", percentile=99.9, target=0.01)
    c.update(rng.uniform(size=100))
    assert c.halfwidth() == np.inf and not c.satisfied()
    blk = c.block()
    assert blk["kind"] == "quantile_halfwidth" and blk["n"] == 100
    assert not blk["satisfied"]

    # median of U(0,1): halfwidth ~ 1.96*sqrt(0.25/n); target reachable
    # at n=65536 (~0.0038) but not at n=4096 (~0.0153)
    c = QuantileHalfwidth("range", percentile=50.0, target=0.006)
    c.update(rng.uniform(size=4096))
    assert not c.satisfied()
    hw_small = c.halfwidth()
    for _ in range(15):
        c.update(rng.uniform(size=4096))
    assert c.halfwidth() < hw_small
    assert c.satisfied(), c.block()
    blk = c.block()
    assert blk["ci95"][0] <= blk["estimate"] <= blk["ci95"][1]
    assert abs(blk["estimate"] - 0.5) < 0.01

    # validation
    with pytest.raises(ValueError, match="percentile"):
        QuantileHalfwidth("range", percentile=100.0, target=0.1)
    with pytest.raises(ValueError, match="ci_halfwidth"):
        QuantileHalfwidth("range", percentile=50.0, target=0.0)


def test_parse_quantile_spec():
    from erpl_monte_carlo_sim_tpu.mc import QuantileHalfwidth

    c = parse_criterion(
        {"metric": "apogee_altitude", "percentile": 95.0,
         "ci_halfwidth": 25.0}
    )
    assert isinstance(c, QuantileHalfwidth)
    assert c.percentile == 95.0 and c.target == 25.0
    # percentile without ci_halfwidth is not a criterion
    with pytest.raises(ValueError, match="criterion spec"):
        parse_criterion({"metric": "range", "percentile": 95.0})


def test_run_to_precision_quantile_criterion():
    """End-to-end: stop on a loose p95 half-width (decided after the first
    slab), and the stats block carries bracketing percentile CIs."""
    analysis = _analyzer().run_to_precision(
        IC,
        criteria=[{"metric": "apogee_altitude", "percentile": 95.0,
                   "ci_halfwidth": 200.0}],
        max_samples=4096, lane_slab=512, seed=3,
    )
    seq = analysis["sequential"]
    blk = seq["criteria"][0]
    assert blk["kind"] == "quantile_halfwidth"
    assert seq["satisfied"] and blk["halfwidth"] <= 200.0
    assert seq["n_used"] < 4096  # loose target: stopped early
    # the analysis stats block carries the CIs, bracketing the percentiles
    st = analysis["apogee_altitude"]
    for p, (lo, hi) in zip(st["percentiles"], st["percentile_ci"]):
        assert lo <= p <= hi


def test_qmc_mean_stderr_closed_form():
    from erpl_monte_carlo_sim_tpu.mc import QmcMeanStderr

    c = QmcMeanStderr("apogee_altitude", target=0.5, min_replicates=3)
    assert c.stderr() == np.inf and not c.satisfied()
    # three slabs of known means: stderr = std(means, ddof=1)/sqrt(3)
    c.update(np.array([1.0, 3.0]))          # mean 2.0
    c.update(np.array([4.0, 4.0, np.nan]))  # mean 4.0 (NaN dropped)
    assert c.stderr() == np.inf  # below min_replicates: cannot stop
    c.update(np.array([6.0]))               # mean 6.0
    se = np.std([2.0, 4.0, 6.0], ddof=1) / np.sqrt(3)
    assert c.stderr() == pytest.approx(se)
    # pooled mean is lane-weighted (== mean over all valid lanes)
    assert c.mean() == pytest.approx(np.mean([1, 3, 4, 4, 6]))
    blk = c.block()
    assert blk["kind"] == "qmc_mean_stderr" and blk["n"] == 5
    assert blk["n_replicates"] == 3
    # an all-invalid slab contributes no replicate
    c.update(np.array([np.nan]))
    assert c.block()["n_replicates"] == 3
    with pytest.raises(ValueError, match="qmc_mean_stderr"):
        QmcMeanStderr("range", target=0.0)
    with pytest.raises(ValueError, match="min_replicates"):
        QmcMeanStderr("range", target=1.0, min_replicates=1)
    c2 = parse_criterion({"metric": "range", "qmc_mean_stderr": 2.5})
    assert isinstance(c2, QmcMeanStderr) and c2.target == 2.5


def test_qmc_criterion_requires_sobol():
    with pytest.raises(ValueError, match="sobol"):
        _analyzer().run_to_precision(
            IC,
            criteria=[{"metric": "apogee_altitude",
                       "qmc_mean_stderr": 1.0}],
            max_samples=2048, lane_slab=512,
        )


def test_qmc_criterion_stops_earlier_than_iid():
    """The point of the RQMC rule: under sobol the replicate-spread
    stderr reflects the real (much smaller) QMC error, so the run stops
    on far fewer lanes than the i.i.d. formula demands — and the pooled
    means agree with the budget-exhausted i.i.d. run's to well within
    the i.i.d. error (same keyed draws)."""
    target = None
    # calibrate the target from one sobol run's replicate spread at 4
    # slabs so the test is robust to the regime's absolute scale
    probe = _analyzer(sampler="sobol").run_to_precision(
        IC,
        criteria=[{"metric": "apogee_altitude", "qmc_mean_stderr": 1e-9}],
        max_samples=2048, lane_slab=512, seed=3,
    )
    blk = probe["sequential"]["criteria"][0]
    assert blk["n_replicates"] == 4  # exhausted: never satisfied
    target = 3.0 * blk["stderr"]

    qmc = _analyzer(sampler="sobol").run_to_precision(
        IC,
        criteria=[{"metric": "apogee_altitude",
                   "qmc_mean_stderr": target}],
        max_samples=65536, lane_slab=512, seed=3,
    )
    iid = _analyzer(sampler="sobol").run_to_precision(
        IC,
        criteria=[{"metric": "apogee_altitude", "mean_stderr": target}],
        max_samples=65536, lane_slab=512, seed=3,
    )
    q, i = qmc["sequential"], iid["sequential"]
    assert q["satisfied"]
    assert q["n_used"] < i["n_used"] or not i["satisfied"]
    # same keyed slabs: the shorter run's mean is a prefix-pool of the
    # longer's; they agree within a few i.i.d. stderrs
    iid_se = iid["apogee_altitude"]["std"] / np.sqrt(q["n_used"])
    assert abs(qmc["apogee_altitude"]["mean"]
               - iid["apogee_altitude"]["mean"]) < 4 * iid_se
