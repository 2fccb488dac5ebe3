"""Pallas-safe math polyfills: accuracy vs NumPy across their full domains."""

import jax.numpy as jnp
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.ops.math import (
    arcsin,
    arctan,
    arctan2,
    bcast_where,
    pallas_math,
    powf,
)


def test_atan_polyfill_accuracy():
    x = np.concatenate([
        np.linspace(-50, 50, 2001),
        np.array([0.0, 1e-8, -1e-8, 0.41421356, 2.41421356, 1e6, -1e6]),
    ])
    with pallas_math():
        mine = np.asarray(arctan(jnp.array(x)))
    np.testing.assert_allclose(mine, np.arctan(x), atol=3e-7)


def test_atan2_polyfill_quadrants_and_axes():
    ys = np.array([1.0, -1.0, 1.0, -1.0, 0.0, 0.0, 1.0, -1.0, 0.0])
    xs = np.array([1.0, 1.0, -1.0, -1.0, 1.0, -1.0, 0.0, 0.0, 0.0])
    with pallas_math():
        mine = np.asarray(arctan2(jnp.array(ys), jnp.array(xs)))
    np.testing.assert_allclose(mine, np.arctan2(ys, xs), atol=3e-7)
    # dense sweep over angles and magnitudes
    theta = np.linspace(-np.pi + 1e-6, np.pi - 1e-6, 721)
    for r in [1e-3, 1.0, 1e4]:
        y, x = r * np.sin(theta), r * np.cos(theta)
        with pallas_math():
            mine = np.asarray(arctan2(jnp.array(y), jnp.array(x)))
        np.testing.assert_allclose(mine, theta, atol=5e-7)


def test_asin_polyfill_accuracy():
    x = np.linspace(-1.0, 1.0, 2001)
    with pallas_math():
        mine = np.asarray(arcsin(jnp.array(x)))
    np.testing.assert_allclose(mine, np.arcsin(x), atol=1e-6)


def test_powf_matches_native_pow():
    x = np.array([1e-3, 0.5, 1.0, 2.0, 288.15, 1e5])
    for y in [0.14, 1.0, 5.2558797]:
        with pallas_math():
            mine = np.asarray(powf(jnp.array(x), y))
        np.testing.assert_allclose(mine, x**y, rtol=1e-6)


def test_outside_pallas_mode_uses_native():
    # Without the context, results are bit-identical to jnp natives.
    x = jnp.array([0.3, -0.7, 2.5])
    np.testing.assert_array_equal(np.asarray(arctan(x)), np.asarray(jnp.arctan(x)))


def test_bcast_where_shapes_and_bools():
    mask = jnp.array([True, False])
    a = jnp.ones((2, 3))
    b = jnp.zeros((2, 3))
    out = np.asarray(bcast_where(mask, a, b))
    np.testing.assert_array_equal(out, [[1, 1, 1], [0, 0, 0]])
    # bool operands take the logic-op path
    ab = jnp.array([True, True])
    bb = jnp.array([False, False])
    np.testing.assert_array_equal(
        np.asarray(bcast_where(mask, ab, bb)), [True, False]
    )
