"""Batched whole-flight summaries on the flat component representation.

Drop-in equivalent of ``jit(vmap(simulate_summary))`` for the Monte Carlo
hot path, ~2.5x faster on TPU: the vmapped stacked-vector path compiles to
~560 fusions whose boundaries spill [B,3]/[B,4] intermediates that TPU pads
minor-dim 3 -> 128 (XLA cost model: 14.6 KB HBM per lane-step; HBM-bandwidth
bound). This path runs ``engine.component.flight_components`` (the same
physics the Pallas kernel executes) directly under ``jit`` with every
loop-carried value a flat [B] array and the per-lane wind table stored
lanes-minor [3, N, B] so B rides the 128-wide lane tiles with zero padding.

Replaces the same reference code as ``simulate_summary``
(`/root/reference/rocket_simulation/simulator.py:42-125,208-264`); results
match the vmapped path lane-for-lane (see tests/test_batch.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.scene import Scene
from ..ops.quaternion import quaternion_to_euler
from .component import flight_components, wind_tent_lanes_minor
from .config import SimConfig
from .rail import RailInfo
from .simulate import FlightSummary
from .state import InitialConditions

__all__ = ["simulate_summary_batch", "prepare_batch"]


def prepare_batch(scene_b: Scene, ic_b: InitialConditions):
    """Split a batched scene into (scene-without-wind, grid[N], wind[3,N,B]
    or [3,N,1], ics 12-tuple) — the component path's input layout. The
    [B,N,3] -> [3,N,B] transpose is a one-time cost outside the step loop.
    A SHARED [N,3] table stays [3,N,1]: the tent-basis product broadcasts
    the lane axis, so the (logically tiny) shared table is never
    materialized per-lane (~315 MB HBM at B=262k for 1.2 KB of data)."""
    wind = scene_b.wind
    scene_nw = scene_b.replace(wind=None)
    grid = jnp.asarray(wind.altitudes)
    warr = jnp.asarray(wind.wind)
    if warr.ndim == 2:  # shared [N,3] table -> lane axis broadcasts
        wT = warr.T[:, :, None]
    else:  # [B,N,3] per-lane
        wT = jnp.transpose(warr, (2, 1, 0))
    ics = tuple(
        jnp.asarray(arr[:, c])
        for arr in (ic_b.position, ic_b.velocity, ic_b.attitude,
                    ic_b.angular_velocity)
        for c in range(3)
    )
    return scene_nw, grid, wT, ics


@functools.partial(jax.jit, static_argnums=3)
def _run_components(scene_nw, grid, wT, cfg, ics):
    def wind_fn(alt):
        u, v, w = wT[0], wT[1], wT[2]
        if u.dtype != alt.dtype:
            # bf16-stored table (SimConfig.wind_table_bf16): the upcast
            # fuses into the tent multiply — no f32 copy materializes.
            u = u.astype(alt.dtype)
            v = v.astype(alt.dtype)
            w = w.astype(alt.dtype)
        return wind_tent_lanes_minor(alt, grid, u, v, w)

    return flight_components(scene_nw, cfg, wind_fn, ics)


def simulate_summary_batch(
    scene_b: Scene, ic_b: InitialConditions, cfg: SimConfig = SimConfig()
) -> FlightSummary:
    """[B]-batched flight summaries via the component-form core.

    Accepts the same batched (scene, ics) as ``vmap(simulate_summary)``
    (shared scene leaves stay unbatched; broadcasting handles both), and
    returns an identical ``FlightSummary`` pytree.
    """
    scene_nw, grid, wT, ics = prepare_batch(scene_b, ic_b)
    if cfg.wind_table_bf16:
        wT = wT.astype(jnp.bfloat16)
    res = _run_components(scene_nw, grid, wT, cfg, ics)

    def stack3(x, y, z):
        return jnp.stack([res[x], res[y], res[z]], axis=-1)

    quat = jnp.stack([res["quat_w"], res["quat_x"], res["quat_y"],
                      res["quat_z"]], axis=-1)
    rail = RailInfo(
        rail_exit_time=res["rail_exit_time"],
        rail_exit_position=stack3("rail_px", "rail_py", "rail_pz"),
        rail_exit_velocity=stack3("rail_vx", "rail_vy", "rail_vz"),
        rail_exit_speed=res["rail_exit_speed"],
        rail_exit_euler=quaternion_to_euler(quat),
        rail_exit_angle_of_attack=res["rail_exit_angle_of_attack"],
        rail_exit_sideslip=res["rail_exit_sideslip"],
        wind_at_exit=stack3("rail_wu", "rail_wv", "rail_ww"),
    )
    return FlightSummary(
        apogee_altitude=res["apogee_altitude"],
        apogee_time=res["apogee_time"],
        range=res["range"],
        flight_time=res["flight_time"],
        landing_position=stack3("final_px", "final_py", "final_pz"),
        final_velocity=stack3("final_vx", "final_vy", "final_vz"),
        max_speed=res["max_speed"],
        parachute_deployed=res["parachute_deployed"].astype(bool),
        diverged=res["diverged"].astype(bool),
        n_steps=res["n_steps"],
        rail=rail,
    )
