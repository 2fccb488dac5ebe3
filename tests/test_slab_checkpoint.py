"""Mid-run checkpoint/resume for slabbed runs (mc/slab_checkpoint.py).

A killed slabbed run must resume from its checkpoint file and produce
BIT-IDENTICAL results to an uninterrupted run: slab k's dispersions
depend only on (key, k, slab) and every accumulator is a deterministic
host-side merge. No reference counterpart (SURVEY.md §5.4's resume story
is 'every trajectory is a JSON file'); this exists because the rebuild
runs 5-6 orders of magnitude more lanes per call.
"""

import os

import numpy as np
import pytest

import erpl_monte_carlo_sim_tpu.mc.analyzer as analyzer_mod
from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig
from erpl_monte_carlo_sim_tpu.mc import MonteCarloAnalyzer
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

SCENE = nominal_scene(liquid_motor())
IC = InitialConditions.vertical_launch()
CFG = SimConfig(max_time=3.0)
N, SLAB = 96, 32

STATS = ("apogee_altitude", "range", "flight_time")


def _analyzer(**kw):
    return MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                              persistent_cache=False, **kw)


def _kill_after(monkeypatch, n_slabs):
    """Make the slab loop die after n_slabs slabs (simulates a killed
    process mid-run) by counting sample_dispersions calls."""
    real = analyzer_mod.sample_dispersions
    calls = {"n": 0}

    def wrapper(*a, **kw):
        if calls["n"] >= n_slabs:
            raise RuntimeError("simulated crash")
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(analyzer_mod, "sample_dispersions", wrapper)


def _assert_identical(a, b):
    for k in STATS:
        assert a[k] == b[k], k  # dict of floats: bitwise equality
        np.testing.assert_array_equal(a["metrics"][k], b["metrics"][k])
    np.testing.assert_array_equal(a["valid_mask"], b["valid_mask"])
    np.testing.assert_array_equal(a["reasons"], b["reasons"])
    np.testing.assert_array_equal(a["landing_samples"], b["landing_samples"])
    assert a["n_samples"] == b["n_samples"]
    assert a["landing_footprint"] == b["landing_footprint"]
    assert a["parameter_ranges_observed"] == b["parameter_ranges_observed"]
    assert a["results"] == b["results"]
    assert a["outliers"] == b["outliers"]


def test_resume_is_bit_identical(monkeypatch, tmp_path):
    ref = _analyzer().run_monte_carlo(IC, n_samples=N, lane_slab=SLAB,
                                      seed=7)

    ckpt = str(tmp_path / "run.ckpt.npz")
    _kill_after(monkeypatch, 2)
    with pytest.raises(RuntimeError, match="simulated crash"):
        _analyzer().run_monte_carlo(IC, n_samples=N, lane_slab=SLAB, seed=7,
                                    checkpoint_path=ckpt, checkpoint_every=1)
    assert os.path.exists(ckpt)  # the crash left a resumable state

    monkeypatch.undo()
    got = _analyzer().run_monte_carlo(IC, n_samples=N, lane_slab=SLAB,
                                      seed=7, checkpoint_path=ckpt,
                                      checkpoint_every=1)
    _assert_identical(ref, got)
    assert not os.path.exists(ckpt)  # removed on successful completion


def test_resume_streaming_and_cv(monkeypatch, tmp_path):
    """Streaming mode (quantile sketches) + control variates: every
    accumulator class must round-trip through the checkpoint."""
    n_cv = 192  # >= 4x the ~46 controls so finalize_cv fits beta honestly
    kw = dict(stats_stream_threshold=48, metrics_sample_cap=40,
              control_variates=True, cv_wind_modes=2)
    ref = _analyzer(**kw).run_monte_carlo(IC, n_samples=n_cv, lane_slab=SLAB,
                                          seed=9)
    assert ref["metrics_is_sample"]  # streaming actually engaged
    assert "beta" in ref["control_variates"]["apogee_altitude"]

    ckpt = str(tmp_path / "run.ckpt.npz")
    _kill_after(monkeypatch, 2)
    with pytest.raises(RuntimeError, match="simulated crash"):
        _analyzer(**kw).run_monte_carlo(IC, n_samples=n_cv, lane_slab=SLAB,
                                        seed=9, checkpoint_path=ckpt,
                                        checkpoint_every=1)
    monkeypatch.undo()
    got = _analyzer(**kw).run_monte_carlo(IC, n_samples=n_cv, lane_slab=SLAB,
                                          seed=9, checkpoint_path=ckpt,
                                          checkpoint_every=1)
    for k in STATS:
        assert got[k] == ref[k], k  # sketch percentiles bit-equal too
        np.testing.assert_array_equal(got["metrics"][k], ref["metrics"][k])
    cv_ref, cv_got = ref["control_variates"], got["control_variates"]
    assert cv_got["n"] == cv_ref["n"] == n_cv
    for k in STATS:
        np.testing.assert_allclose(cv_got[k]["mean"], cv_ref[k]["mean"],
                                   rtol=0, atol=0)
        assert cv_got[k]["beta"] == cv_ref[k]["beta"]


def test_wrong_run_refuses_to_resume(monkeypatch, tmp_path):
    ckpt = str(tmp_path / "run.ckpt.npz")
    _kill_after(monkeypatch, 1)
    with pytest.raises(RuntimeError, match="simulated crash"):
        _analyzer().run_monte_carlo(IC, n_samples=N, lane_slab=SLAB, seed=7,
                                    checkpoint_path=ckpt, checkpoint_every=1)
    monkeypatch.undo()
    with pytest.raises(ValueError, match="different run"):
        _analyzer().run_monte_carlo(IC, n_samples=N, lane_slab=SLAB,
                                    seed=8,  # different run key
                                    checkpoint_path=ckpt)


def test_validation():
    with pytest.raises(ValueError, match="slabbed runs"):
        # fits one device call: no slab boundaries to checkpoint at
        _analyzer().run_monte_carlo(IC, n_samples=16, lane_slab=SLAB,
                                    checkpoint_path="x.npz")
    with pytest.raises(ValueError, match="checkpoint_every"):
        _analyzer().run_monte_carlo(IC, n_samples=N, lane_slab=SLAB,
                                    checkpoint_path="x.npz",
                                    checkpoint_every=0)
