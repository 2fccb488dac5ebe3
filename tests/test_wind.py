"""Wind model: query semantics, CSV loading, AR(1) turbulence statistics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.models import (
    WindField,
    WindModelParams,
    generate_stochastic_profile,
    load_wind_profile_from_csv,
    perturb_wind_profile,
    power_law_profile,
    wind_at_altitude,
)

SAMPLE_CSV = "/root/reference/rocket_simulation/sample_wind.csv"


def test_zero_field_is_zero_everywhere():
    f = WindField.zero()
    for h in [-10.0, 0.0, 500.0, 30000.0]:
        np.testing.assert_array_equal(np.asarray(wind_at_altitude(f, h)), 0.0)


def test_query_matches_np_interp_per_component():
    rng = np.random.default_rng(3)
    alts = np.linspace(0, 25000, 100)
    wind = rng.normal(size=(100, 3))
    f = WindField.from_arrays(alts, wind)
    for h in [-50.0, 0.0, 137.0, 12500.5, 25000.0, 30000.0]:
        mine = np.asarray(wind_at_altitude(f, jnp.float64(h)))
        ref = np.array([np.interp(h, alts, wind[:, c]) for c in range(3)])
        np.testing.assert_allclose(mine, ref, rtol=1e-9, atol=1e-9)


@pytest.mark.skipif(not os.path.exists(SAMPLE_CSV), reason="sample CSV absent")
def test_csv_loader():
    alts, wind = load_wind_profile_from_csv(SAMPLE_CSV)
    assert alts.shape == (6,) and wind.shape == (6, 3)
    assert alts[0] == 0.0 and alts[-1] == 25000.0
    np.testing.assert_allclose(wind[0], [2.0, 0.0, 0.0])
    np.testing.assert_allclose(wind[-1], [15.0, 3.0, 0.0])


def test_power_law():
    p = WindModelParams()
    v = float(power_law_profile(p, 1000.0, 5.0))
    assert v == pytest.approx(5.0 * (1000.0 / 10.0) ** 0.14, rel=1e-12)


def test_stochastic_profile_reproducible_and_distinct():
    p = WindModelParams()
    alts = jnp.linspace(0.0, 25000.0, 100)
    k1, k2 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    a = generate_stochastic_profile(p, k1, alts, 5.0, 0.3)
    b = generate_stochastic_profile(p, k1, alts, 5.0, 0.3)
    c = generate_stochastic_profile(p, k2, alts, 5.0, 0.3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_stochastic_profile_statistics():
    """Turbulence sigma ~2 m/s at the surface decaying exp(-h/2000), vertical
    x0.3, mean = power-law shear along the chosen direction
    (`environment.py:125-200`)."""
    p = WindModelParams()
    alts = jnp.linspace(0.0, 25000.0, 100)
    direction = 0.7
    keys = jax.random.split(jax.random.PRNGKey(42), 2000)
    profiles = jax.vmap(
        lambda k: generate_stochastic_profile(p, k, alts, 5.0, direction)
    )(keys)
    prof = np.asarray(profiles)  # [2000, 100, 3]

    mean_speed = power_law_profile(p, alts, 5.0)
    expected_u = np.asarray(mean_speed) * np.cos(direction)
    expected_v = np.asarray(mean_speed) * np.sin(direction)
    # Surface point: sigma=2, so SE of mean over 2000 draws ~0.045
    np.testing.assert_allclose(prof[:, 0, 0].mean(), expected_u[0], atol=0.2)
    np.testing.assert_allclose(prof[:, 0, 1].mean(), expected_v[0], atol=0.2)
    assert prof[:, 0, 0].std() == pytest.approx(2.0, abs=0.25)
    assert prof[:, 0, 2].std() == pytest.approx(0.6, abs=0.1)  # vertical x0.3
    # High altitude: turbulence decays to ~0, mean wind remains.
    np.testing.assert_allclose(prof[:, -1, 0].mean(), expected_u[-1], atol=0.05)
    assert prof[:, -1, 0].std() < 0.02


def test_perturb_preserves_forecast_mean():
    p = WindModelParams()
    alts, wind = load_wind_profile_from_csv(SAMPLE_CSV)
    keys = jax.random.split(jax.random.PRNGKey(7), 1000)
    pert = jax.vmap(lambda k: perturb_wind_profile(p, k, alts, wind))(keys)
    pert = np.asarray(pert)
    # Mean over draws approaches the forecast (SE <= 2/sqrt(1000) ~ 0.063)
    np.testing.assert_allclose(pert.mean(axis=0), wind, atol=0.3)
    # Turbulence amplitude decays with altitude
    assert pert[:, 0, 0].std() > pert[:, -1, 0].std() * 5
