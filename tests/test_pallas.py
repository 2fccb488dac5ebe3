"""Pallas whole-flight kernel: interpret-mode equivalence with the XLA path.

The compiled kernel is validated on real TPU hardware separately (it matches
the XLA path to ~1e-6; Mosaic compiles take ~13 min, far too slow for CI).
Interpret mode runs the identical kernel trace through the evaluator, which
pins the tracing-level correctness: pytree plumbing, mask encodings,
pallas-safe math wrappers, boundary reshapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.engine import (
    InitialConditions,
    SimConfig,
    simulate_summary,
    simulate_summary_pallas,
)
from erpl_monte_carlo_sim_tpu.mc import UncertaintyParams, sample_dispersions, scene_in_axes
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene


@pytest.mark.slow
def test_interpret_matches_xla_path():
    cfg = SimConfig(max_time=6.0)
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch(dtype=jnp.float32)
    scene32 = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        scene,
    )
    calm = UncertaintyParams(wind_speed_range=(0.0, 1.0))
    scene_b, ic_b, _ = sample_dispersions(
        jax.random.PRNGKey(0), scene32, ic, params=calm, n=8, dtype=jnp.float32
    )
    axes = scene_in_axes(scene32, scene_b)

    ref = jax.jit(
        jax.vmap(simulate_summary, in_axes=(axes, 0, None)), static_argnums=2
    )(scene_b, ic_b, cfg)
    got = simulate_summary_pallas(scene_b, ic_b, scene32, cfg, tile=8, interpret=True)

    np.testing.assert_allclose(
        np.asarray(got.apogee_altitude), np.asarray(ref.apogee_altitude), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.flight_time), np.asarray(ref.flight_time), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.rail.rail_exit_speed),
        np.asarray(ref.rail.rail_exit_speed), rtol=2e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(got.parachute_deployed), np.asarray(ref.parachute_deployed)
    )


@pytest.mark.slow
def test_component_kernel_interpret_matches_xla():
    """Component-form kernel (flat [P]-lane state, no vector arrays):
    interpret-mode equivalence on dispersed lanes."""
    from erpl_monte_carlo_sim_tpu.experimental.pallas_component import (
        simulate_summary_component,
    )

    cfg = SimConfig(max_time=8.0)
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch(dtype=jnp.float32)
    scene32 = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        scene,
    )
    calm = UncertaintyParams(wind_speed_range=(0.0, 1.0))
    scene_b, ic_b, _ = sample_dispersions(
        jax.random.PRNGKey(0), scene32, ic, params=calm, n=8, dtype=jnp.float32
    )
    axes = scene_in_axes(scene32, scene_b)
    ref = jax.jit(
        jax.vmap(simulate_summary, in_axes=(axes, 0, None)), static_argnums=2
    )(scene_b, ic_b, cfg)
    got = simulate_summary_component(
        scene_b, ic_b, scene32, cfg, tile=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got["apogee_altitude"]), np.asarray(ref.apogee_altitude),
        rtol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got["flight_time"]), np.asarray(ref.flight_time), rtol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got["n_steps"]), np.asarray(ref.n_steps)
    )
