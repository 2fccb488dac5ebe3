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

    # nested, not-yet-existing directory: save_slab_state must create it
    # (a capstone run that crashes on its FIRST checkpoint write would
    # lose the crash protection it was asked for)
    ckpt = str(tmp_path / "nested" / "dir" / "run.ckpt.npz")
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


def test_stream_pack_preserves_part_boundaries():
    """The exact->sketch crossing compresses each retained slab part
    SEPARATELY, so the checkpoint must preserve part boundaries: a
    restore that concatenated the exact parts into one array would build
    different centroids than the uninterrupted run after the crossing
    (regression: round-3 review)."""
    from erpl_monte_carlo_sim_tpu.mc.slab_checkpoint import (_pack_stream,
                                                             _unpack_stream)
    from erpl_monte_carlo_sim_tpu.mc.stats import StreamingStats

    rng = np.random.default_rng(0)
    parts = [rng.normal(size=40) for _ in range(4)]

    ref = StreamingStats(max_centroids=8, exact_threshold=100)
    live = StreamingStats(max_centroids=8, exact_threshold=100)
    for p in parts[:2]:  # n = 80 <= 100: both still exact
        ref.add(p)
        live.add(p)
    packed = {}
    _pack_stream(live, packed, "s.")
    assert "s.exact" in packed  # premise: checkpointed BEFORE crossing
    restored = _unpack_stream(packed, "s.", 100)
    restored.max_centroids = 8
    for p in parts[2:]:  # third add crosses (120 > 100) and compresses
        ref.add(p)
        restored.add(p)
    assert not ref.is_exact and not restored.is_exact
    assert restored.percentiles() == ref.percentiles()  # bit-equal
    np.testing.assert_array_equal(restored._cent_v, ref._cent_v)
    np.testing.assert_array_equal(restored._cent_w, ref._cent_w)


def test_resume_across_exact_to_sketch_crossing(monkeypatch, tmp_path):
    """Integration twin of the part-boundary test: the crash lands while
    streaming stats are still in their exact stage, the resumed run
    crosses to the sketch later — results must equal the uninterrupted
    run bit-for-bit."""
    kw = dict(stats_stream_threshold=100, metrics_sample_cap=40)
    n = 192
    ref = _analyzer(**kw).run_monte_carlo(IC, n_samples=n, lane_slab=SLAB,
                                          seed=13)
    assert ref["metrics_is_sample"]  # streaming engaged, crossing happened

    ckpt = str(tmp_path / "run.ckpt.npz")
    _kill_after(monkeypatch, 2)  # dies with <= 64 valid lanes: pre-crossing
    with pytest.raises(RuntimeError, match="simulated crash"):
        _analyzer(**kw).run_monte_carlo(IC, n_samples=n, lane_slab=SLAB,
                                        seed=13, checkpoint_path=ckpt,
                                        checkpoint_every=1)
    with np.load(ckpt) as z:
        assert "stream.apogee_altitude.exact" in z  # premise holds
    monkeypatch.undo()
    got = _analyzer(**kw).run_monte_carlo(IC, n_samples=n, lane_slab=SLAB,
                                          seed=13, checkpoint_path=ckpt,
                                          checkpoint_every=1)
    for k in STATS:
        assert got[k] == ref[k], k  # sketch percentiles bit-equal
        np.testing.assert_array_equal(got["metrics"][k], ref["metrics"][k])


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
