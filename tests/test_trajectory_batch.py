"""Component-core trajectory recording (engine.batch.simulate_flight_batch).

Round-3 unification: trajectory recording moved onto the SAME component core
that runs Monte Carlo summaries, so exported histories integrate exactly the
physics the MC measured — including the tiered-dt opt-ins the stacked-vector
recorder refuses. These tests pin:

  * lane-for-lane equivalence with ``vmap(simulate_flight)`` (summary AND
    trajectory leaves) at parity settings,
  * summary identity with ``simulate_summary_batch`` under tiered configs
    (same masked steps: float-noise agreement, not an accuracy bound),
  * tiered-step heterogeneity actually present in recorded full flights,
  * record_stride subsampling consistency.

Reference behavior matched: one engine records while it integrates
(`/root/reference/rocket_simulation/simulator.py:208-293,462-584`).
"""

import jax
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.engine import (
    InitialConditions,
    SimConfig,
    simulate_flight,
    simulate_flight_batch,
    simulate_summary_batch,
)
from erpl_monte_carlo_sim_tpu.mc import sample_dispersions, scene_in_axes
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene


@pytest.fixture(scope="module")
def dispersed_batch():
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    scene_b, ic_b, _ = sample_dispersions(jax.random.PRNGKey(7), scene, ic, n=4)
    return scene, scene_b, ic_b


def test_flight_batch_matches_vmap_parity(dispersed_batch):
    scene, scene_b, ic_b = dispersed_batch
    axes = scene_in_axes(scene, scene_b)
    cfg = SimConfig(max_time=6.0)
    ref_sum, ref_traj = jax.jit(
        jax.vmap(simulate_flight, in_axes=(axes, 0, None)), static_argnums=2
    )(scene_b, ic_b, cfg)
    got_sum, got_traj = simulate_flight_batch(scene_b, ic_b, cfg)

    ref_l = jax.tree_util.tree_flatten_with_path(ref_sum)[0]
    got_l = jax.tree.leaves(got_sum)
    assert len(ref_l) == len(got_l)
    for (path, a), b in zip(ref_l, got_l):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, (path, a.shape, b.shape)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(
                b, a, rtol=5e-7, atol=1e-6,
                err_msg=f"summary {jax.tree_util.keystr(path)}",
            )
        else:
            np.testing.assert_array_equal(b, a)

    for k in ("time", "position", "velocity", "quaternion",
              "angular_velocity", "propellant_fraction"):
        a = np.asarray(getattr(ref_traj, k))
        b = np.asarray(getattr(got_traj, k))
        assert a.shape == b.shape, (k, a.shape, b.shape)
        np.testing.assert_allclose(b, a, rtol=5e-7, atol=1e-6, err_msg=k)
    np.testing.assert_array_equal(
        np.asarray(got_traj.valid), np.asarray(ref_traj.valid)
    )
    assert set(got_traj.derived) == set(ref_traj.derived)
    for k in ref_traj.derived:
        a = np.asarray(ref_traj.derived[k])
        b = np.asarray(got_traj.derived[k])
        assert a.shape == b.shape, (k, a.shape, b.shape)
        np.testing.assert_allclose(
            b, a, rtol=1e-6, atol=1e-6, err_msg=f"derived {k}"
        )


@pytest.mark.slow
def test_flight_batch_tiered_full_flight(dispersed_batch):
    """Full flights to landing under the tiered flags: the recorder's
    summary must be IDENTICAL to the summary path's (same engine, same
    masked steps), and the recorded time axis must actually show the coarse
    steps (the whole point of recording tiered physics)."""
    _, scene_b, ic_b = dispersed_batch
    cfg = SimConfig(energy_consistent_aero=True, descent_dt_scale=8,
                    ascent_q_threshold=8000.0, record_stride=4)
    want = simulate_summary_batch(scene_b, ic_b, cfg)
    got, traj = simulate_flight_batch(scene_b, ic_b, cfg)
    for name in ("apogee_altitude", "apogee_time", "range", "flight_time",
                 "max_speed"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=1e-12, err_msg=name,
        )
    np.testing.assert_array_equal(
        np.asarray(got.parachute_deployed), np.asarray(want.parachute_deployed)
    )
    # per-lane time steps vary: descent runs at 8x dt
    t = np.asarray(traj.time)
    v = np.asarray(traj.valid)
    for lane in range(t.shape[0]):
        dts = np.diff(t[lane][v[lane]])
        dts = dts[dts > 0]
        assert dts.max() / dts.min() > 4.0, f"lane {lane}: no tiering recorded"
    # recorded altitude peaks where the summary says the apogee is
    alt = np.asarray(traj.position)[..., 2]
    rec_max = np.where(v, alt, -np.inf).max(axis=1)
    np.testing.assert_allclose(
        rec_max, np.asarray(got.apogee_altitude), rtol=1e-3
    )


@pytest.mark.slow
def test_record_stride_subsamples(dispersed_batch):
    """stride-S records are exactly the stride-1 records at steps 0, S, 2S…
    (recording is observational: physics unchanged)."""
    _, scene_b, ic_b = dispersed_batch
    cfg1 = SimConfig(max_time=4.0, record_derived=False)
    cfg4 = SimConfig(max_time=4.0, record_derived=False, record_stride=4)
    _, t1 = simulate_flight_batch(scene_b, ic_b, cfg1)
    _, t4 = simulate_flight_batch(scene_b, ic_b, cfg4)
    n4 = np.asarray(t4.time).shape[1]
    idx = np.concatenate([[0], np.arange(4, 4 * n4, 4)])[:n4]
    for k in ("time", "position", "velocity"):
        a = np.asarray(getattr(t1, k))[:, idx]
        b = np.asarray(getattr(t4, k))
        np.testing.assert_allclose(b, a, rtol=1e-12, atol=0, err_msg=k)


def test_record_channels_euler_subset_and_validation():
    """record_channels: any euler_* request keeps all three components
    (batch.py restacks them as one array — a proper subset used to
    KeyError); SimConfig rejects unknown integrator strings."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from erpl_monte_carlo_sim_tpu.engine import (
        InitialConditions,
        SimConfig,
        simulate_flight_batch,
    )
    from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    ic1 = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape), ic)
    cfg = SimConfig(max_time=2.0, record_derived=True,
                    record_channels=("euler_roll", "mach"))
    _, traj = simulate_flight_batch(scene, ic1, cfg)
    assert "euler_angles" in traj.derived and "mach" in traj.derived
    assert traj.derived["euler_angles"].shape[-1] == 3
    assert np.isfinite(np.asarray(traj.derived["mach"])).all()
    with pytest.raises(ValueError, match="integrator"):
        SimConfig(integrator="RK2")
