"""Dimension-ordered turbulence QMC (mc.sample_dispersions sobol_wind_modes).

The AR(1) turbulence is linear in its standard-normal driver
(``turb = A z``, models/wind.py::ar1_transfer_matrix), so rotating the
driver by the right-singular vectors of A and drawing the leading
coordinates from scrambled Sobol keeps the process distribution EXACT while
stratifying the directions that carry the most turbulence variance. These
tests pin exactness (covariance vs A A^T), marginal parity with the prng
sampler, determinism-by-key, and the guard rails.
"""

import jax
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.engine import InitialConditions
from erpl_monte_carlo_sim_tpu.mc import UncertaintyParams, sample_dispersions
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene
from erpl_monte_carlo_sim_tpu.models.wind import ar1_transfer_matrix

SCENE = nominal_scene(liquid_motor())
IC = InitialConditions.vertical_launch()


def test_turbulence_covariance_exact_vs_transfer_matrix():
    """Pure-turbulence lanes (zero forecast, zero offsets): the empirical
    covariance of the hybrid Sobol+prng driver must match A A^T — the QMC
    rotation must not distort the process."""
    grid = np.linspace(0.0, 4000.0, 16)
    calm = UncertaintyParams(wind_speed_range=(0.0, 0.0),
                             wind_direction_range=(0.0, 0.0))
    n = 8192
    scene_b, _, _ = sample_dispersions(
        jax.random.PRNGKey(1), SCENE, IC, params=calm, n=n,
        base_wind=(grid, np.zeros((16, 3))),
        sampler="sobol", sobol_wind_modes=6,
    )
    w = np.asarray(scene_b.wind.wind)  # [n, 16, 3] pure turbulence
    A = ar1_transfer_matrix(SCENE.wind_model, grid)
    want = A @ A.T
    for c, scale in ((0, 1.0), (1, 1.0), (2, 0.09)):
        got = np.cov(w[:, :, c].T, bias=True)
        # MC covariance noise ~ sigma^2/sqrt(n); compare in units of the
        # largest variance
        err = np.abs(got - scale * want).max() / want.max() / scale
        assert err < 0.12, (c, err)


def test_marginal_std_matches_prng_sampler():
    n = 4096
    sb, _, _ = sample_dispersions(
        jax.random.PRNGKey(3), SCENE, IC, n=n, sampler="sobol",
        sobol_wind_modes=8, wind_grid_points=24, wind_grid_top=6000.0,
    )
    sp, _, _ = sample_dispersions(
        jax.random.PRNGKey(3), SCENE, IC, n=n, sampler="prng",
        wind_grid_points=24, wind_grid_top=6000.0,
    )
    wq = np.asarray(sb.wind.wind)
    wp = np.asarray(sp.wind.wind)
    for c in range(3):
        sq = wq[:, :, c].std(axis=0)
        s_p = wp[:, :, c].std(axis=0)
        rel = np.abs(sq - s_p) / np.maximum(s_p, 1e-9)
        assert rel.max() < 0.12, (c, rel.max())


def test_deterministic_by_key_and_distinct_lanes():
    kw = dict(n=256, sampler="sobol", sobol_wind_modes=4,
              wind_grid_points=16, wind_grid_top=4000.0)
    a, _, _ = sample_dispersions(jax.random.PRNGKey(7), SCENE, IC, **kw)
    b, _, _ = sample_dispersions(jax.random.PRNGKey(7), SCENE, IC, **kw)
    np.testing.assert_array_equal(
        np.asarray(a.wind.wind), np.asarray(b.wind.wind)
    )
    c, _, _ = sample_dispersions(jax.random.PRNGKey(8), SCENE, IC, **kw)
    assert not np.array_equal(np.asarray(a.wind.wind), np.asarray(c.wind.wind))
    w = np.asarray(a.wind.wind)
    assert np.std(w[:, 0, 0]) > 0.05  # lanes really differ


def test_modes_clamped_to_grid_and_guards():
    # K > knots: clamp, don't crash (extra Sobol columns are drawn+dropped
    # for determinism)
    a, _, _ = sample_dispersions(
        jax.random.PRNGKey(1), SCENE, IC, n=64, sampler="sobol",
        sobol_wind_modes=32, wind_grid_points=8, wind_grid_top=2000.0,
    )
    assert np.isfinite(np.asarray(a.wind.wind)).all()
    with pytest.raises(ValueError, match="sobol"):
        sample_dispersions(
            jax.random.PRNGKey(1), SCENE, IC, n=64, sampler="prng",
            sobol_wind_modes=8,
        )


@pytest.mark.slow
def test_analyzer_passes_wind_modes_through():
    from erpl_monte_carlo_sim_tpu.engine import SimConfig
    from erpl_monte_carlo_sim_tpu.mc import MonteCarloAnalyzer

    mc = MonteCarloAnalyzer(
        scene=SCENE, sim_config=SimConfig(max_time=1.0),
        sampler="sobol", sobol_wind_modes=4,
        wind_grid_points=16, wind_grid_top=4000.0,
    )
    a = mc.run_monte_carlo(IC, n_samples=64)
    assert a["n_samples"] + a["n_outliers"] == 64
    # by-key lane re-simulation must regenerate the SAME turbulence-QMC lanes
    s, _ = mc.resimulate_trajectories([0, 1], SimConfig(max_time=1.0))
    assert np.asarray(s.apogee_altitude).shape[0] == 2
