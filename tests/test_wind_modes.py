"""Mode-compressed per-lane wind tables (models.wind.WindModes).

The compression (VERDICT r4 item 1) carries each lane's wind as mode
scores against a shared orthonormal basis — exact at full rank, an opt-in
documented approximation at the recommended K=24. These tests pin:

  * full-rank exactness (basis spans R^N -> projection is identity),
  * exact capture of the MEAN structure (power-law shear amplitude,
    constant forecast offsets, forecast profile columns) at ANY K — the
    augmented columns exist precisely so truncation only ever touches
    turbulence,
  * engine-query equivalence: simulate_summary_batch on a WindModes scene
    matches the WindField scene lane-for-lane at full rank,
  * truncation drift at K=24 bounded (the wind_table_bf16-style pin),
  * analyzer integration (wind_table_modes knob) and validation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.engine import (
    InitialConditions,
    SimConfig,
    simulate_summary_batch,
)
from erpl_monte_carlo_sim_tpu.engine.batch import prepare_batch, _make_wind_fn
from erpl_monte_carlo_sim_tpu.mc import (
    MonteCarloAnalyzer,
    UncertaintyParams,
    sample_dispersions,
)
from erpl_monte_carlo_sim_tpu.models import (
    WindField,
    WindModes,
    compress_wind,
    liquid_motor,
    nominal_scene,
    solid_motor,
    wind_mode_basis,
)

N_KNOTS = 40  # coarser grid than the 100-knot default: same code, faster


def _batch(n=16, base_wind=None, seed=0):
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    return scene, *sample_dispersions(
        jax.random.PRNGKey(seed), scene, ic, UncertaintyParams(), n,
        base_wind=base_wind, wind_grid_points=N_KNOTS,
    )[:2]


def _query_diff(scene_b, ic_b, basis, alts):
    """Max |wind| difference between the table and mode wind_fn closures
    at the given query altitudes."""
    _, grid, wT, _ = prepare_batch(scene_b, ic_b)
    table_fn = _make_wind_fn(grid, wT)
    comp = scene_b.replace(wind=compress_wind(scene_b.wind, basis))
    _, grid2, wT2, _ = prepare_batch(comp, ic_b)
    mode_fn = _make_wind_fn(grid2, wT2)
    worst = 0.0
    for a in alts:
        alt = jnp.full(scene_b.wind.wind.shape[0], a, jnp.float64)
        for t, m in zip(table_fn(alt), mode_fn(alt)):
            worst = max(worst, float(jnp.abs(t - m).max()))
    return worst


def test_basis_orthonormal_and_full_rank_square():
    scene = nominal_scene(solid_motor())
    grid = np.linspace(0.0, 25000.0, N_KNOTS)
    q = wind_mode_basis(scene.wind_model, grid, k=N_KNOTS)
    assert q.shape == (N_KNOTS, N_KNOTS)  # aux columns merge, rank capped
    np.testing.assert_allclose(q.T @ q, np.eye(N_KNOTS), atol=1e-10)


def test_full_rank_projection_identity():
    scene, scene_b, ic_b = _batch(n=16)
    grid = np.asarray(scene_b.wind.altitudes)
    q = wind_mode_basis(scene.wind_model, grid, k=N_KNOTS)
    modes = compress_wind(scene_b.wind, q)
    recon = jnp.einsum("nm,bmc->bnc", modes.basis, modes.scores)
    scale = float(jnp.abs(scene_b.wind.wind).max())
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(scene_b.wind.wind),
        atol=1e-9 * max(scale, 1.0),
    )


def test_full_rank_engine_query_exact():
    scene, scene_b, ic_b = _batch(n=16)
    grid = np.asarray(scene_b.wind.altitudes)
    q = wind_mode_basis(scene.wind_model, grid, k=N_KNOTS)
    worst = _query_diff(scene_b, ic_b, q,
                        alts=[0.0, 137.0, 4200.0, 11000.0, 24999.0, 30000.0])
    assert worst < 1e-8  # x64 under conftest; pure linear algebra


def test_mean_structure_exact_at_tiny_k():
    """turbulence_intensity=0 -> every lane is pure power-law mean; the
    augmented basis columns must capture it EXACTLY even at k=1."""
    scene = nominal_scene(liquid_motor())
    scene = scene.replace(
        wind_model=scene.wind_model.replace(turbulence_intensity=0.0)
    )
    ic = InitialConditions.vertical_launch()
    scene_b, ic_b, _ = sample_dispersions(
        jax.random.PRNGKey(1), scene, ic, UncertaintyParams(), 8,
        wind_grid_points=N_KNOTS,
    )
    grid = np.asarray(scene_b.wind.altitudes)
    q = wind_mode_basis(scene.wind_model, grid, k=1)
    worst = _query_diff(scene_b, ic_b, q, alts=[0.0, 1000.0, 12000.0])
    assert worst < 1e-8


def test_forecast_mean_exact_with_extra_columns():
    """Forecast base + constant offsets: with the forecast's profiles as
    extra basis columns and turbulence off, tiny-k compression is exact."""
    scene = nominal_scene(liquid_motor())
    scene = scene.replace(
        wind_model=scene.wind_model.replace(turbulence_intensity=0.0)
    )
    ic = InitialConditions.vertical_launch()
    grid = np.linspace(0.0, 25000.0, N_KNOTS)
    rng = np.random.default_rng(7)
    forecast = np.stack([
        5.0 * np.sin(grid / 4000.0) + 2.0,
        rng.normal(size=N_KNOTS).cumsum() * 0.3,
        np.zeros(N_KNOTS),
    ], axis=1)
    base_wind = (grid, forecast)
    scene_b, ic_b, _ = sample_dispersions(
        jax.random.PRNGKey(2), scene, ic, UncertaintyParams(), 8,
        base_wind=base_wind, wind_grid_points=N_KNOTS,
    )
    q = wind_mode_basis(scene.wind_model, grid, k=1, extra_profiles=forecast)
    worst = _query_diff(scene_b, ic_b, q, alts=[0.0, 3000.0, 20000.0])
    assert worst < 1e-8
    # without the forecast columns the same config is NOT captured —
    # the aux columns are load-bearing, not decorative
    q_bare = wind_mode_basis(scene.wind_model, grid, k=1)
    assert _query_diff(scene_b, ic_b, q_bare,
                       alts=[0.0, 3000.0, 20000.0]) > 0.1


def test_truncation_k24_wind_error_bounded():
    """K=24 on the default 100-knot grid: per-query wind error stays under
    ~0.5 m/s (vs sigma=2 m/s turbulence) — the documented approximation."""
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    scene_b, ic_b, _ = sample_dispersions(
        jax.random.PRNGKey(3), scene, ic, UncertaintyParams(), 64,
        wind_grid_points=100,
    )
    grid = np.asarray(scene_b.wind.altitudes)
    q = wind_mode_basis(scene.wind_model, grid, k=24)
    worst = _query_diff(scene_b, ic_b, q,
                        alts=[100.0, 1000.0, 5000.0, 15000.0])
    assert worst < 0.75, worst


def test_full_rank_summary_batch_equivalent():
    """End-to-end: simulate_summary_batch on the compressed scene matches
    the table scene lane-for-lane at full rank (ascent window — descent
    tumbling is chaotic and would amplify f32 noise, not compression
    error)."""
    scene, scene_b, ic_b = _batch(n=8)
    cfg = SimConfig(max_time=30.0)
    ref = simulate_summary_batch(scene_b, ic_b, cfg)
    grid = np.asarray(scene_b.wind.altitudes)
    q = wind_mode_basis(scene.wind_model, grid, k=N_KNOTS)
    comp_scene = scene_b.replace(wind=compress_wind(scene_b.wind, q))
    got = simulate_summary_batch(comp_scene, ic_b, cfg)
    np.testing.assert_allclose(
        np.asarray(got.max_speed), np.asarray(ref.max_speed), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.rail.rail_exit_speed),
        np.asarray(ref.rail.rail_exit_speed), rtol=1e-9,
    )


def test_wind_table_bf16_composes_with_modes():
    """Fast flags + modes together. energy_consistent_aero: the default
    parity physics faithfully DIVERGES on wind-dispersed lanes (the
    reference's documented boost-phase instability) — stability here is
    about the compression composing with the fast flags, so run the
    stabilized opt-in."""
    scene, scene_b, ic_b = _batch(n=8)
    grid = np.asarray(scene_b.wind.altitudes)
    q = wind_mode_basis(scene.wind_model, grid, k=16)
    comp_scene = scene_b.replace(wind=compress_wind(scene_b.wind, q))
    cfg = SimConfig(max_time=30.0, wind_table_bf16=True,
                    wind_eval_per_step=True, energy_consistent_aero=True)
    s = simulate_summary_batch(comp_scene, ic_b, cfg)
    assert np.isfinite(np.asarray(s.max_speed)).all()


def test_analyzer_wind_table_modes_drift():
    """Analyzer knob: same seed with and without wind_table_modes=24 —
    population statistics drift stays inside the documented band (same
    style of pin as wind_table_bf16's)."""
    scene = nominal_scene(liquid_motor())
    kw = dict(
        scene=scene, uncertainty_params=UncertaintyParams(),
        # stabilized physics: the default parity config diverges on
        # wind-dispersed lanes by design, which would compare noise
        sim_config=SimConfig(max_time=40.0, energy_consistent_aero=True),
        persistent_cache=False,
    )
    ic = InitialConditions.vertical_launch()
    a_ref = MonteCarloAnalyzer(**kw).run_monte_carlo(ic, 256, seed=11)
    a_cmp = MonteCarloAnalyzer(**kw, wind_table_modes=24).run_monte_carlo(
        ic, 256, seed=11
    )
    r = np.asarray(a_ref["summary"].max_speed, np.float64)
    c = np.asarray(a_cmp["summary"].max_speed, np.float64)
    assert np.isfinite(r).all() and np.isfinite(c).all()
    assert abs(c.mean() / r.mean() - 1) < 2e-3
    assert abs(c.std() - r.std()) < 0.05 * r.std() + 0.5


def test_analyzer_validation():
    scene = nominal_scene(liquid_motor())
    with pytest.raises(ValueError, match="wind_table_modes"):
        MonteCarloAnalyzer(scene=scene, wind_table_modes=0,
                           persistent_cache=False)
    mc = MonteCarloAnalyzer(scene=scene, wind_table_modes=8,
                            persistent_cache=False)
    with pytest.raises(ValueError, match="chunk_steps"):
        mc.run_monte_carlo(InitialConditions.vertical_launch(), 8,
                           chunk_steps=100)


def test_compress_wind_rejects_shared_table():
    wf = WindField.zero()
    with pytest.raises(ValueError, match="per-lane"):
        compress_wind(wf, np.eye(2))


def test_two_level_covers_mode_compression():
    """wind_table_modes alone is a valid fast path for two_level_lanes
    (r5): the correction's FAST leg runs compressed via fast_transform, so
    the measured bias covers the truncation — a modes-enabled run's
    corrected means are unbiased with respect to the REALIZED-table
    physics, not just the integrator/dt flags."""
    scene = nominal_scene(liquid_motor())
    mc = MonteCarloAnalyzer(
        scene=scene, uncertainty_params=UncertaintyParams(),
        sim_config=SimConfig(max_time=20.0, energy_consistent_aero=True),
        wind_table_modes=8, two_level_lanes=64, persistent_cache=False,
    )
    a = mc.run_monte_carlo(InitialConditions.vertical_launch(), 64, seed=2)
    tl = a["two_level"]
    assert tl["n_coupled"] > 0
    b = tl["apogee_altitude"]
    assert np.isfinite(b["bias"]) and np.isfinite(b["corrected_mean"])
    # a hard K=8 truncation produces genuinely nonzero per-lane deltas —
    # zero would mean the fast leg silently ran uncompressed
    assert b["abs_max_delta"] > 0.0


def test_ensemble_members_as_extra_columns():
    """A forecast ENSEMBLE contributes one basis column per member
    component, so with turbulence off tiny-k compression is exact for
    EVERY member a lane might draw — the analyzer passes
    base_wind[1] ([Km,N,3]) straight through as extra_profiles."""
    scene = nominal_scene(liquid_motor())
    scene = scene.replace(
        wind_model=scene.wind_model.replace(turbulence_intensity=0.0)
    )
    ic = InitialConditions.vertical_launch()
    grid = np.linspace(0.0, 25000.0, N_KNOTS)
    rng = np.random.default_rng(13)
    members = np.stack([
        np.stack([3.0 + np.cos(grid / 3000.0 + i),
                  rng.normal(size=N_KNOTS).cumsum() * 0.2,
                  np.zeros(N_KNOTS)], axis=1)
        for i in range(2)
    ])
    base_wind = (grid, members)
    scene_b, ic_b, _ = sample_dispersions(
        jax.random.PRNGKey(5), scene, ic, UncertaintyParams(), 16,
        base_wind=base_wind, wind_grid_points=N_KNOTS,
    )
    q = wind_mode_basis(scene.wind_model, grid, k=1, extra_profiles=members)
    worst = _query_diff(scene_b, ic_b, q, alts=[0.0, 6000.0, 22000.0])
    assert worst < 1e-8


def test_modes_compose_with_sobol_sampler():
    """wind_table_modes operates on REALIZED tables, so it composes with
    sampler='sobol' + sobol_wind_modes (which shape the realization): the
    analyzer run stays finite and tracks its uncompressed twin."""
    scene = nominal_scene(liquid_motor())
    kw = dict(
        scene=scene, uncertainty_params=UncertaintyParams(),
        sim_config=SimConfig(max_time=30.0, energy_consistent_aero=True),
        sampler="sobol", sobol_wind_modes=8, persistent_cache=False,
    )
    ic = InitialConditions.vertical_launch()
    a_ref = MonteCarloAnalyzer(**kw).run_monte_carlo(ic, 128, seed=4)
    a_cmp = MonteCarloAnalyzer(**kw, wind_table_modes=24).run_monte_carlo(
        ic, 128, seed=4
    )
    r = np.asarray(a_ref["summary"].max_speed, np.float64)
    c = np.asarray(a_cmp["summary"].max_speed, np.float64)
    assert np.isfinite(c).all()
    assert abs(c.mean() / r.mean() - 1) < 2e-3
