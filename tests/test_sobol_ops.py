"""On-device Sobol generator (ops/sobol.py).

Pins: (a) the unscrambled sequence is bit-exact against scipy's Joe-Kuo
stream (same public direction-number table — bakes verified), (b) hash-based
Owen scrambling keeps every coordinate marginally uniform and keeps the
low-discrepancy stratification, (c) determinism-by-key and block
independence for randomized-QMC error bars, (d) the float32 path stays
strictly inside (0,1) so ndtri is finite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.ops import sobol as S

# ~5-min core-correctness tier (CLAUDE.md): goldens + engine basics.
pytestmark = pytest.mark.smoke


def test_unscrambled_matches_scipy():
    from scipy.stats import qmc

    v = jnp.asarray(S.direction_numbers(16))
    mine = np.asarray(S._sobol_bits(128, v)).astype(np.float64) * 2.0 ** -32
    ref = qmc.Sobol(d=16, scramble=False, bits=32).random(128)
    np.testing.assert_array_equal(mine, ref)


def test_direction_table_bounds():
    assert S.max_dims() >= 640
    with pytest.raises(ValueError, match="baked table"):
        S.direction_numbers(S.max_dims() + 1)


def test_scramble_is_bijective_per_seed():
    """The Laine-Karras rounds must permute uint32 (no collisions), or
    scrambled points would not be uniform."""
    x = jnp.arange(1 << 16, dtype=jnp.uint32) * jnp.uint32(65521)
    seeds = jnp.full((1,), 0xDEADBEEF, jnp.uint32)
    y = np.asarray(S._owen_scramble(x[:, None], seeds)[:, 0])
    assert len(np.unique(y)) == len(y)


def test_uniform_marginals_and_stratification():
    u = np.asarray(S.sobol_uniform(jax.random.PRNGKey(0), 4096, 19,
                                   dtype=jnp.float32))
    assert u.shape == (4096, 19)
    assert u.min() > 0.0 and u.max() < 1.0
    # QMC stratification: column means far tighter than MC's 1/sqrt(n)~0.005
    assert np.abs(u.mean(axis=0) - 0.5).max() < 5e-4
    # marginal uniformity: 16-bin histogram of each column is flat
    for c in (0, 7, 18):
        h, _ = np.histogram(u[:, c], bins=16, range=(0.0, 1.0))
        assert np.abs(h - 256).max() <= 24, (c, h)


def test_determinism_and_key_sensitivity():
    k = jax.random.PRNGKey(42)
    a = np.asarray(S.sobol_uniform(k, 256, 5, dtype=jnp.float32))
    b = np.asarray(S.sobol_uniform(k, 256, 5, dtype=jnp.float32))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(S.sobol_uniform(jax.random.PRNGKey(43), 256, 5,
                                   dtype=jnp.float32))
    assert not np.array_equal(a, c)


def test_scramble_blocks_are_distinct_replicates():
    u = np.asarray(S.sobol_uniform(jax.random.PRNGKey(1), 1024, 3,
                                   scrambles=4, dtype=jnp.float64))
    blocks = u.reshape(4, 256, 3)
    for i in range(1, 4):
        assert not np.allclose(blocks[0], blocks[i])
        # each block is itself a stratified point set
        assert np.abs(blocks[i].mean(axis=0) - 0.5).max() < 4e-3
    with pytest.raises(ValueError, match="multiple"):
        S.sobol_uniform(jax.random.PRNGKey(1), 10, 3, scrambles=4)


def test_normal_transform_moments():
    z = np.asarray(S.sobol_normal(jax.random.PRNGKey(2), 8192, 8,
                                  dtype=jnp.float64))
    assert np.isfinite(z).all()
    assert np.abs(z.mean(axis=0)).max() < 5e-3
    np.testing.assert_allclose(z.std(axis=0), 1.0, atol=5e-3)


def test_float32_path_finite_normals():
    z = np.asarray(S.sobol_normal(jax.random.PRNGKey(3), 4096, 4,
                                  dtype=jnp.float32))
    assert z.dtype == np.float32
    assert np.isfinite(z).all()
    assert np.abs(z).max() < 6.0  # 24-bit bins cap the tail at ~5.4 sigma


def test_traces_inside_outer_jit():
    """The whole draw must be traceable (the point of the device path)."""
    @jax.jit
    def f(k):
        return S.sobol_uniform(k, 64, 7, dtype=jnp.float32).sum()

    assert np.isfinite(float(f(jax.random.PRNGKey(0))))


def test_scramble_preserves_net_strata():
    """Nested-uniform scrambling must preserve the (0,m,2)-net property:
    1024 scrambled points of dims (0,1) still land exactly one per 32x32
    stratum (the property the cheaper LK-hash approximation does not
    guarantee)."""
    u = np.asarray(S.sobol_uniform(jax.random.PRNGKey(9), 1024, 2,
                                   dtype=jnp.float64))
    h, _, _ = np.histogram2d(u[:, 0], u[:, 1], bins=32,
                             range=[[0, 1], [0, 1]])
    assert (h == 1).all()


def test_float32_unit_strictly_inside_01():
    """Regression: the f32 conversion must be strictly inside (0,1) for
    EVERY uint32, including the all-ones top bin — with 24-bit bins,
    k+0.5 ties-to-even at k=2^24-1 and lands on exactly 1.0 -> ndtri=+inf
    (at 2^-24/coordinate that poisons a quarter of 262k x 19 f32 slabs)."""
    from jax.scipy.special import ndtri

    x = jnp.asarray([0, 1, (1 << 23) - 1, 1 << 23, 0xFFFFFE00, 0xFFFFFFFF],
                    dtype=jnp.uint32)
    u = S._to_unit(x, jnp.float32)
    assert float(u.min()) > 0.0
    assert float(u.max()) < 1.0
    assert np.isfinite(np.asarray(ndtri(u))).all()
