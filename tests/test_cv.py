"""Regression control variates (mc/cv.py + analyzer integration).

Beyond-reference capability: the reference's per-sample parameter dicts
vanish into a process pool (`monte_carlo.py:156-335`); here the jointly
visible dispersion draws become control variates with exactly known
means, giving variance-reduced headline means with honest standard
errors — on plain prng sampling, composably with the slabbed path.
"""

import jax
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig
from erpl_monte_carlo_sim_tpu.mc import (
    MonteCarloAnalyzer,
    UncertaintyParams,
    sample_dispersions,
)
from erpl_monte_carlo_sim_tpu.mc.cv import (
    TARGETS,
    CVMoments,
    _controls,
    control_names,
    finalize_cv,
)
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

SCENE = nominal_scene(liquid_motor())
IC = InitialConditions.vertical_launch()
CFG = SimConfig(max_time=6.0)  # 1k-step ascent window
PARAMS = UncertaintyParams()


def _draw(n, seed=0):
    key = jax.random.PRNGKey(seed)
    _, _, sample = sample_dispersions(key, SCENE, IC, PARAMS, n)
    return np.asarray(_controls(sample, PARAMS, SCENE.motor))


def test_control_matrix_matches_names_and_is_centered():
    names = control_names(PARAMS, SCENE.motor)
    z = _draw(20_000)
    assert z.shape == (20_000, len(names))
    # exact-zero expectations: sample means shrink as 1/sqrt(n); each
    # first-order column has variance <= ~1 so |mean| < 5/sqrt(n)
    first_order = [i for i, nm in enumerate(names)
                   if not nm.endswith("^2") and "2dir" not in nm]
    assert np.abs(z[:, first_order].mean(axis=0)).max() < 5.0 / np.sqrt(20_000)
    # standardized gaussian/uniform channels have unit variance
    for i, nm in enumerate(names):
        if nm.split("_")[0] in ("pos", "vel", "att", "omg", "mass", "density") \
                and not nm.endswith("^2"):
            assert abs(z[:, i].std() - 1.0) < 0.05, nm
    # liquid motor: independent flow multiplier is an active channel
    assert "motor_flow" in names


def _moments_np(z, t):
    """Centered moments in the cv_slab_moments layout, computed in numpy."""
    n = len(z)
    mz, mt = z.mean(axis=0), t.mean(axis=0)
    zc, tc = z - mz, t - mt
    return n, mz, mt, zc.T @ zc, zc.T @ tc, tc.T @ tc


def _linear_targets(z, rng, noise=0.05):
    """Synthetic metric: exact linear response + small noise, all valid."""
    d = z.shape[1]
    w = rng.standard_normal(d)
    y = 100.0 + z @ w + noise * rng.standard_normal(len(z))
    t = np.zeros((len(z), len(TARGETS)))
    t[:, 0] = y
    t[:, 1] = 2.0 * y  # range: perfectly correlated twin
    t[:, 2] = 50.0     # flight_time: constant (zero-variance target)
    t[:, 3] = t[:, 4] = y
    t[:, -1] = 1.0     # all lanes valid
    return t, 100.0


def test_linear_metric_is_almost_fully_explained():
    rng = np.random.default_rng(0)
    z = _draw(8192)
    t, truth = _linear_targets(z, rng)
    acc = CVMoments()
    acc.add(_moments_np(z, t))
    names = control_names(PARAMS, SCENE.motor)
    out = finalize_cv(acc, names)
    blk = out["apogee_altitude"]
    # the linear part is removed exactly: residual stderr ~ noise/sqrt(n)
    assert blk["variance_reduction"] > 50.0
    assert blk["stderr"] < 3.0 * 0.05 / np.sqrt(8192)
    assert abs(blk["mean"] - truth) < 5.0 * blk["stderr"]
    # plain estimate is much farther away on average; its stderr says so
    assert blk["plain_stderr"] > 10.0 * blk["stderr"]
    # constant target: zero variance before and after, mean exact
    assert out["flight_time"]["mean"] == pytest.approx(50.0)


def test_slab_merge_matches_single_shot():
    rng = np.random.default_rng(1)
    z = _draw(6000)
    t, _ = _linear_targets(z, rng)
    whole = CVMoments()
    whole.add(_moments_np(z, t))
    names = control_names(PARAMS, SCENE.motor)
    ref = finalize_cv(whole, names)
    for slabs in (2, 5):
        acc = CVMoments()
        for zi, ti in zip(np.array_split(z, slabs),
                          np.array_split(t, slabs)):
            acc.add(_moments_np(zi, ti))
        got = finalize_cv(acc, names)
        assert got["n"] == ref["n"] == 6000
        for m in ("apogee_altitude", "range"):
            np.testing.assert_allclose(got[m]["mean"], ref[m]["mean"],
                                       rtol=1e-9)
            np.testing.assert_allclose(got[m]["stderr"], ref[m]["stderr"],
                                       rtol=1e-7)


def test_key_sweep_rms_and_bias():
    """Across independent keys the adjusted estimator is unbiased and its
    RMS error matches its own reported stderr (the synthetic truth is
    known exactly)."""
    rng = np.random.default_rng(2)
    names = control_names(PARAMS, SCENE.motor)
    w = rng.standard_normal(len(names))
    errs, plain_errs, stderrs = [], [], []
    for seed in range(6):
        z = _draw(2048, seed=seed)
        noise_rng = np.random.default_rng(100 + seed)
        y = 100.0 + z @ w + 0.05 * noise_rng.standard_normal(len(z))
        t = np.zeros((len(z), len(TARGETS)))
        t[:, 0] = y
        t[:, -1] = 1.0
        acc = CVMoments()
        acc.add(_moments_np(z, t))
        blk = finalize_cv(acc, names)["apogee_altitude"]
        errs.append(blk["mean"] - 100.0)
        plain_errs.append(blk["plain_mean"] - 100.0)
        stderrs.append(blk["stderr"])
    errs = np.asarray(errs)
    assert np.sqrt((errs ** 2).mean()) < 5.0 * np.mean(stderrs)
    assert np.sqrt((errs ** 2).mean()) < 0.2 * np.sqrt(
        (np.asarray(plain_errs) ** 2).mean()
    )


def test_ratio_form_with_filtered_lanes():
    """Validity correlated with a control must not bias the adjusted mean:
    the ratio estimator adjusts numerator and denominator over ALL lanes."""
    rng = np.random.default_rng(3)
    names = control_names(PARAMS, SCENE.motor)
    i_mass = names.index("mass")
    means = []
    for seed in range(6):
        z = _draw(4096, seed=10 + seed)
        y = 200.0 + 3.0 * z[:, i_mass] + 0.1 * rng.standard_normal(len(z))
        valid = z[:, i_mass] < 1.0  # drop the high-mass tail (~16%)
        t = np.zeros((len(z), len(TARGETS)))
        t[:, 0] = np.where(valid, y, 0.0)
        t[:, -1] = valid.astype(float)
        acc = CVMoments()
        acc.add(_moments_np(z, t))
        blk = finalize_cv(acc, names)["apogee_altitude"]
        means.append(blk["mean"])
        # truth: E[y | z_mass < 1] = 200 + 3 E[z|z<1] (truncated normal)
        truth = 200.0 - 3.0 * np.exp(-0.5) / np.sqrt(2 * np.pi) / \
            0.8413447460685429
        assert abs(blk["mean"] - truth) < 6.0 * max(blk["stderr"], 1e-3)
    assert np.std(means) < 0.05  # adjusted means are stable across keys


def test_insufficient_samples_falls_back_to_plain():
    rng = np.random.default_rng(4)
    z = _draw(32)
    t, _ = _linear_targets(z, rng)
    acc = CVMoments()
    acc.add(_moments_np(z, t))
    out = finalize_cv(acc, control_names(PARAMS, SCENE.motor))
    assert out.get("insufficient_samples") is True
    assert out["apogee_altitude"]["variance_reduction"] == 1.0


def test_analyzer_single_call_cv_block():
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                            control_variates=True)
    a = mc.run_monte_carlo(IC, n_samples=256, seed=1)
    blk = a["control_variates"]
    assert blk["n"] == 256  # moments see every lane, valid or not
    apo = blk["apogee_altitude"]
    # flight response is near-linear in the scalar channels at the 1k-step
    # window (the QMC study's regime) — CV must pay substantially
    assert apo["variance_reduction"] > 3.0
    assert apo["stderr"] < apo["plain_stderr"]
    # adjustment moves the mean by O(stderr), not O(sigma)
    assert abs(apo["mean"] - apo["plain_mean"]) < 6.0 * apo["plain_stderr"]
    # plain ratio mean agrees with the headline stats block over the same
    # jointly-finite lanes
    np.testing.assert_allclose(apo["plain_mean"],
                               a["apogee_altitude"]["mean"], rtol=1e-6)
    # beta readout exists and the thrust channel dominates apogee (the
    # default params have zero position sigma, so no pos_* channel exists)
    assert "pos_x" not in apo["beta"]
    assert abs(apo["beta"]["motor_thrust"]) > abs(apo["beta"]["vel_x"])


def test_analyzer_slabbed_cv_accumulates_all_lanes():
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                            control_variates=True)
    a = mc.run_monte_carlo(IC, n_samples=80, seed=2, lane_slab=32)
    blk = a["control_variates"]
    assert blk["n"] == 80  # ragged final slab contributes 16, not 32
    # plain ratio mean equals the mean over this run's own valid records
    recs = a["results"]
    vals = np.asarray([r["apogee_altitude"] for r in recs])
    np.testing.assert_allclose(blk["apogee_altitude"]["plain_mean"],
                               vals.mean(), rtol=1e-5)


def test_collective_cv_moments_match_single_device():
    """Pod-scale twin: the shard_map psum moments must equal the jitted
    single-device kernel on the same lanes (virtual 8-device mesh)."""
    import jax.numpy as jnp

    from erpl_monte_carlo_sim_tpu.engine.batch import simulate_summary_batch
    from erpl_monte_carlo_sim_tpu.mc import outlier_mask
    from erpl_monte_carlo_sim_tpu.mc.cv import cv_slab_moments
    from erpl_monte_carlo_sim_tpu.parallel import (
        collective_cv_moments,
        make_mesh,
    )

    sb, ib, sample = sample_dispersions(
        jax.random.PRNGKey(7), SCENE, IC, PARAMS, 64
    )
    summary = simulate_summary_batch(sb, ib, CFG)
    valid, _ = outlier_mask(summary)
    ref = cv_slab_moments(sample, summary, valid, jnp.ones(64, bool),
                          PARAMS, SCENE.motor)
    mesh = make_mesh(n_devices=8)
    got = collective_cv_moments(sample, summary, valid, None, PARAMS,
                                SCENE.motor, mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-10, atol=1e-12)
    # with turbulence-mode controls riding along
    wc = _wind_ctrl(sb, sample, k=3)
    ref_w = cv_slab_moments(sample, summary, valid, jnp.ones(64, bool),
                            PARAMS, SCENE.motor, wc)
    got_w = collective_cv_moments(sample, summary, valid, None, PARAMS,
                                  SCENE.motor, mesh, wc)
    for r, g in zip(ref_w, got_w):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-10, atol=1e-12)
    # and the merged block finalizes cleanly
    acc = CVMoments()
    acc.add(got)
    out = finalize_cv(acc, control_names(PARAMS, SCENE.motor))
    assert out["n"] == 64


def _wind_ctrl(scene_b, sample, k=6, base=None):
    from erpl_monte_carlo_sim_tpu.mc.cv import wind_mode_projector

    alt = scene_b.wind.altitudes
    return {
        "wind": scene_b.wind.wind, "ws": sample.wind_speed,
        "wd": sample.wind_direction,
        "proj": wind_mode_projector(SCENE.wind_model, np.asarray(alt), k),
        "alt": alt, "model": SCENE.wind_model, "base": base,
    }


def test_wind_mode_scores_are_standard_normal():
    """The turbulence-mode controls must be exactly standard normal: this
    pins BOTH the mean-profile subtraction (power-law shear reconstruction)
    and the transfer-matrix mirror of models.wind._ar1_scan."""
    from erpl_monte_carlo_sim_tpu.mc.cv import _wind_scores

    n = 8192
    sb, _, sample = sample_dispersions(jax.random.PRNGKey(3), SCENE, IC,
                                       PARAMS, n)
    s = np.asarray(_wind_scores(_wind_ctrl(sb, sample), np.float64))
    assert s.shape == (n, 18)
    assert np.abs(s.mean(axis=0)).max() < 5.0 / np.sqrt(n)
    np.testing.assert_allclose(s.std(axis=0), 1.0, atol=0.06)
    # modes are independent: off-diagonal correlations are O(1/sqrt(n))
    c = np.corrcoef(s.T)
    assert np.abs(c - np.eye(18)).max() < 0.06


def test_wind_mode_scores_forecast_case():
    from erpl_monte_carlo_sim_tpu.mc.cv import _wind_scores

    n = 4096
    grid = np.linspace(0.0, 25000.0, 100)
    base = np.stack([3.0 + grid / 5000.0, np.full_like(grid, -1.0),
                     np.zeros_like(grid)], axis=1)
    sb, _, sample = sample_dispersions(
        jax.random.PRNGKey(4), SCENE, IC, PARAMS, n, base_wind=(grid, base)
    )
    s = np.asarray(_wind_scores(
        _wind_ctrl(sb, sample, base=np.asarray(base)), np.float64
    ))
    assert np.abs(s.mean(axis=0)).max() < 5.0 / np.sqrt(n)
    np.testing.assert_allclose(s.std(axis=0), 1.0, atol=0.08)


def test_analyzer_cv_wind_modes():
    with pytest.raises(ValueError):
        MonteCarloAnalyzer(scene=SCENE, sim_config=CFG, cv_wind_modes=4)
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                            control_variates=True, cv_wind_modes=4)
    a = mc.run_monte_carlo(IC, n_samples=256, seed=3, lane_slab=128)
    blk = a["control_variates"]
    assert blk["n"] == 256
    assert "turb_u_m0" in blk["kept_controls"]
    assert "turb_w_m3^2" in blk["kept_controls"]
    apo = blk["apogee_altitude"]
    assert np.isfinite(apo["mean"]) and np.isfinite(apo["stderr"])
    assert apo["stderr"] <= apo["plain_stderr"] * 1.05


def test_report_carries_cv_block(tmp_path):
    from erpl_monte_carlo_sim_tpu.reporting import save_report

    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                            control_variates=True)
    a = mc.run_monte_carlo(IC, n_samples=256, seed=9)
    rep = save_report(a, str(tmp_path), analyzer=mc)
    assert rep["control_variates"]["apogee_altitude"]["stderr"] > 0
    import json
    with open(tmp_path / "monte_carlo_report.json") as f:
        on_disk = json.load(f)
    assert "control_variates" in on_disk
    txt = (tmp_path / "monte_carlo_report.txt").read_text()
    assert "Control-Variate Adjusted Means" in txt


def test_cv_wind_modes_clamped_to_grid_keeps_labels_consistent():
    """cv_wind_modes larger than the wind grid: the projector clamps, and
    the finalize names must clamp identically — every kept control must be
    a real column (review, round 3: labels past the boundary silently
    mislabeled the beta readout)."""
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                            control_variates=True, cv_wind_modes=24,
                            wind_grid_points=10)
    a = mc.run_monte_carlo(IC, n_samples=128, seed=5)
    blk = a["control_variates"]
    names = blk["controls"]
    # 10-knot grid: modes clamp to 10 -> no m10+ labels anywhere
    assert "turb_u_m9" in names and "turb_u_m9^2" in names
    assert not any("m10" in nm or "m23" in nm for nm in names)
    # every column is labeled: names length == moment dimension
    from erpl_monte_carlo_sim_tpu.mc.cv import CVMoments  # noqa: F401
    assert len(names) == len(blk["apogee_altitude"].get("beta", names)) or \
        blk.get("insufficient_samples")


def test_cv_composes_with_streaming_stats():
    """CV moments accumulate over EVERY lane even when the stats layer
    streams (metrics arrays capped): the two accumulators are independent."""
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                            control_variates=True,
                            stats_stream_threshold=64,
                            metrics_sample_cap=64)
    a = mc.run_monte_carlo(IC, n_samples=192, seed=6, lane_slab=64)
    assert a["metrics_is_sample"]
    blk = a["control_variates"]
    assert blk["n"] == 192
    apo = blk["apogee_altitude"]
    # streamed headline mean and the CV plain ratio mean see the same lanes
    np.testing.assert_allclose(apo["plain_mean"],
                               a["apogee_altitude"]["mean"], rtol=1e-6)


def test_cv_solid_motor_drops_inert_flow_channel():
    from erpl_monte_carlo_sim_tpu.models import solid_motor

    solid = nominal_scene(solid_motor())
    names = control_names(PARAMS, solid.motor)
    assert "motor_flow" not in names  # drawn but inert for solids
    mc = MonteCarloAnalyzer(scene=solid, sim_config=CFG,
                            control_variates=True)
    a = mc.run_monte_carlo(IC, n_samples=128, seed=8)
    blk = a["control_variates"]
    assert blk["n"] == 128
    assert "motor_flow" not in blk["controls"]
    assert np.isfinite(blk["apogee_altitude"]["plain_mean"])

def _spd_leaves(scene_b, j=5, base=None):
    """The EXACT wind-speed control leaves the analyzer builds (same
    shared builder, mc.cv.wind_speed_ctrl_leaves), for direct kernel-level
    tests — a local copy here could drift from production scales."""
    import jax.numpy as jnp

    from erpl_monte_carlo_sim_tpu.mc.cv import wind_speed_ctrl_leaves

    return wind_speed_ctrl_leaves(
        PARAMS, SCENE.wind_model, scene_b.wind.altitudes, j, base=base,
        dtype=jnp.float64,
    )


def test_wind_speed_control_means_exact():
    """The Rice/quadrature means must match the sampled wind tables: this
    pins the mean-profile reconstruction (power-law x uniform direction for
    synthesized profiles, base + uniform offset for forecasts) AND the
    AR(1) per-knot sigma against models.wind._ar1_scan, for both the speed
    and energy controls."""
    n = 32768
    grid = np.linspace(0.0, 25000.0, 100)
    base = np.stack([3.0 + grid / 5000.0, np.full_like(grid, -1.0),
                     np.zeros_like(grid)], axis=1)
    for base_wind in (None, (grid, base)):
        sb, _, _ = sample_dispersions(jax.random.PRNGKey(11), SCENE, IC,
                                      PARAMS, n, base_wind=base_wind)
        spd_ctrl, idx = _spd_leaves(
            sb, j=5, base=None if base_wind is None else base
        )
        w = np.asarray(sb.wind.wind, np.float64)
        spd = np.hypot(w[:, idx, 0], w[:, idx, 1])
        for pred, emp in ((np.asarray(spd_ctrl["spd_mean"]), spd),
                          (np.asarray(spd_ctrl["spd_en_mean"]), spd ** 2)):
            z = (emp.mean(0) - pred) / (emp.std(0) / np.sqrt(n))
            assert np.abs(z).max() < 5.0, (base_wind is None, z)


def test_wind_speed_columns_centered_and_scaled():
    from erpl_monte_carlo_sim_tpu.mc.cv import _wind_speed_controls

    n = 32768
    sb, _, sample = sample_dispersions(jax.random.PRNGKey(12), SCENE, IC,
                                       PARAMS, n)
    spd_ctrl, idx = _spd_leaves(sb, j=5)
    spd_ctrl["wind"] = sb.wind.wind
    cols = np.asarray(_wind_speed_controls(spd_ctrl, np.float64))
    assert cols.shape == (n, 2 * len(idx))
    # exact-zero means (sample noise only) on O(1) columns
    se = cols.std(axis=0) / np.sqrt(n)
    assert np.abs(cols.mean(axis=0) / se).max() < 5.0
    assert cols.std(axis=0).min() > 0.2 and cols.std(axis=0).max() < 5.0


def test_analyzer_cv_wind_speed():
    with pytest.raises(ValueError, match="control_variates"):
        MonteCarloAnalyzer(scene=SCENE, sim_config=CFG, cv_wind_speed=4)
    with pytest.raises(ValueError, match=">= 0"):
        MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                           control_variates=True, cv_wind_speed=-1)
    mc = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                            control_variates=True, cv_wind_modes=2,
                            cv_wind_speed=4)
    a = mc.run_monte_carlo(IC, n_samples=256, seed=3, lane_slab=128)
    blk = a["control_variates"]
    assert blk["n"] == 256
    names = blk["controls"]
    spd_names = [nm for nm in names if nm.startswith("wspd@")]
    assert len(spd_names) == 8  # 4 knots x (speed, energy)
    assert "wspd@0m" in names and "wspd@25000m^2" in names
    # names align with columns: every kept control is a real label and the
    # beta readout covers all kept columns
    apo = blk["apogee_altitude"]
    assert set(apo["beta"]) == set(blk["kept_controls"])
    assert np.isfinite(apo["mean"]) and np.isfinite(apo["stderr"])
    assert apo["stderr"] <= apo["plain_stderr"] * 1.05


def test_wspd_labels_never_collide():
    """Knots on a fine grid can round to the same integer meter; duplicate
    labels would silently merge beta entries in finalize_cv's per-metric
    dict (found by review, round 3) — names must stay unique at any
    spacing."""
    from erpl_monte_carlo_sim_tpu.mc.cv import control_names

    for alts in ((0.0, 12500.0, 25000.0),       # coarse: integer labels
                 (0.0, 0.3, 0.6, 1.2),           # sub-meter: cm labels
                 (0.0, 0.001, 0.002)):           # sub-cm: index-qualified
        names = control_names(PARAMS, SCENE.motor, 0, alts)
        spd = [nm for nm in names if nm.startswith("wspd")]
        assert len(spd) == 2 * len(alts)
        assert len(set(spd)) == len(spd), spd


def test_collective_cv_moments_with_wind_speed():
    """The pod-scale twin replicates the knot-mean leaves and shards the
    wind tables; moments must equal the single-device kernel exactly."""
    import jax.numpy as jnp

    from erpl_monte_carlo_sim_tpu.engine.batch import simulate_summary_batch
    from erpl_monte_carlo_sim_tpu.mc import outlier_mask
    from erpl_monte_carlo_sim_tpu.mc.cv import cv_slab_moments
    from erpl_monte_carlo_sim_tpu.parallel import (
        collective_cv_moments,
        make_mesh,
    )

    sb, ib, sample = sample_dispersions(
        jax.random.PRNGKey(8), SCENE, IC, PARAMS, 64
    )
    summary = simulate_summary_batch(sb, ib, CFG)
    valid, _ = outlier_mask(summary)
    wc = _wind_ctrl(sb, sample, k=2)
    spd_ctrl, _ = _spd_leaves(sb, j=3)
    wc.update(spd_ctrl)
    ref = cv_slab_moments(sample, summary, valid, jnp.ones(64, bool),
                          PARAMS, SCENE.motor, wc)
    got = collective_cv_moments(sample, summary, valid, None, PARAMS,
                                SCENE.motor, make_mesh(n_devices=8), wc)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-10, atol=1e-12)
