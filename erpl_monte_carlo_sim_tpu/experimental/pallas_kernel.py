"""Pallas TPU kernel: the ENTIRE Monte Carlo flight loop on-chip.

Why this exists (measured on a v5e chip, see bench history):

  * The XLA while_loop path re-reads every loop input from HBM each
    iteration. The per-lane wind table ([B, 100, 3]) is touched by all four
    RK4 stages plus the event update, so at B=131k each 5 ms step moves
    ~800 MB — a ~2.5 ms/step bandwidth floor.
  * At small B the cost is launch-bound instead: ~0.37 ms/iteration of
    fusion overhead, which puts a single 41k-step flight at ~15 s.

This kernel runs the WHOLE flight — rail phase, RK4 main loop, masked
events — inside one `pallas_call`. The grid tiles the lane axis; each
program DMAs its lanes' scene slice (including the wind table) into VMEM
ONCE, integrates to termination entirely from VMEM, and writes back the
per-lane summary. HBM traffic per lane drops from
O(steps x table) to O(table), and there is zero per-step dispatch.

The physics is NOT duplicated: the kernel body calls the same pure
`advance` / `init_carry` / `initial_state` / rail-step functions as the XLA
paths (they are shape-polymorphic jnp code, and every table lookup is the
gather-free tent form, so everything lowers under Mosaic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.scene import Scene
from ..ops.math import bcast_where
from ..engine.config import SimConfig
from ..engine.integrator import advance, init_carry
from ..engine.rail import RailInfo, simulate_rail_masked
from ..engine.simulate import FlightSummary, _summary_from_carry
from ..engine.state import InitialConditions, initial_state

__all__ = ["simulate_summary_pallas"]


def _kernel(cfg: SimConfig, scene_treedef, ic_treedef, in_squeeze,
            out_squeeze, n_scene_leaves, *refs):
    """Kernel body: refs = scene leaves + ic leaves + output leaves."""
    from ..ops.math import pallas_math

    with pallas_math():
        _kernel_body(cfg, scene_treedef, ic_treedef, in_squeeze,
                     out_squeeze, n_scene_leaves, *refs)


def _kernel_body(cfg: SimConfig, scene_treedef, ic_treedef, in_squeeze,
                 out_squeeze, n_scene_leaves, *refs):
    # ---- reconstruct pytrees from VMEM refs. Every logically-0/1-D input
    # was lifted to 2-D at the pallas boundary (Mosaic wants 2-D layouts);
    # in_squeeze says how many trailing/all dims to squeeze back.
    n_ic = len(jax.tree.leaves(InitialConditions.create()))

    def read(k):
        v = refs[k][...]
        if in_squeeze[k] == 2:   # scalar lifted to (1, 1)
            return v[0, 0]
        if in_squeeze[k] == 1:   # shared [K] lifted to (1, K)
            return v[0]
        if in_squeeze[k] == 3:   # batched [B] as (grid, 1, tile) rows
            return v[0, 0]
        return v

    scene_vals = [read(k) for k in range(n_scene_leaves)]
    scene = jax.tree.unflatten(scene_treedef, scene_vals)
    ic_vals = [read(n_scene_leaves + k) for k in range(n_ic)]
    ic = jax.tree.unflatten(ic_treedef, ic_vals)
    out_refs = refs[n_scene_leaves + n_ic:]

    # ---- integrate
    state0 = initial_state(ic)
    state_exit, rail_time, rail_info = simulate_rail_masked(scene, cfg, state0)
    carry0 = init_carry(state_exit, rail_time)

    # Mosaic cannot carry i1 vectors through scf.while — encode the event
    # flags as int32 across the loop boundary and decode inside.
    def enc(c):
        return jax.tree.map(
            lambda x: x.astype(jnp.int32) if x.dtype == jnp.bool_ else x, c
        )

    def dec(ci):
        return jax.tree.map(
            lambda xi, xb: (xi != 0) if xb.dtype == jnp.bool_ else xi,
            ci, carry0,
        )

    def cond(ci):
        c = dec(ci)
        t = c.rail_time + c.step.astype(c.rail_time.dtype) * cfg.dt
        return jnp.any(
            ~c.events.done & (t < cfg.max_time) & (c.step < cfg.max_steps)
        )

    def body(ci):
        c = dec(ci)
        t = c.rail_time + c.step.astype(c.rail_time.dtype) * cfg.dt
        run = ~c.events.done & (t < cfg.max_time) & (c.step < cfg.max_steps)
        new = advance(scene, cfg, c)
        return enc(jax.tree.map(lambda a, b: bcast_where(run, a, b), new, c))

    carry = dec(jax.lax.while_loop(cond, body, enc(carry0)))
    summary = _summary_from_carry(carry, rail_info)

    # ---- write outputs (bool -> int32 for clean VMEM stores; 1-D lanes
    # lifted back to (tile, 1))
    out_vals = jax.tree.leaves(summary)
    for k, (ref, val) in enumerate(zip(out_refs, out_vals)):
        if val.dtype == jnp.bool_:
            val = val.astype(jnp.int32)
        if out_squeeze[k]:
            val = val[None, None, :]
        ref[...] = val


def simulate_summary_pallas(
    scene_b: Scene,
    ic_b: InitialConditions,
    base_scene: Scene,
    cfg: SimConfig = SimConfig(),
    tile: int = 128,
    interpret: bool = False,
    vmem_limit_bytes: int = 100 * 1024 * 1024,
) -> FlightSummary:
    """Run a dispersed batch fully on-chip. ``scene_b`` has batched leaves
    (leading axis B, a multiple of ``tile``); ``base_scene`` identifies which
    leaves are shared. Returns the same FlightSummary as the XLA path."""
    ic_leaves = jax.tree.leaves(ic_b)
    B = ic_leaves[0].shape[0]
    if B % tile != 0:
        raise ValueError(f"batch {B} must be a multiple of tile {tile}")
    grid = (B // tile,)

    scene_leaves = jax.tree.leaves(scene_b)
    base_leaves = jax.tree.leaves(base_scene)
    scene_treedef = jax.tree.structure(scene_b)
    ic_treedef = jax.tree.structure(ic_b)

    in_specs = []
    inputs = []
    in_squeeze = []

    def add_input(leaf, batched):
        """Lift 0/1-D arrays to lane-on-last-axis 2-D layouts Mosaic accepts:
        scalar -> (1,1); shared [K] -> (1,K); batched [B] -> (grid, tile)
        rows; >=2-D keeps its shape with the lane axis tiled by the grid."""
        leaf = jnp.asarray(leaf)
        if leaf.ndim == 0:
            inputs.append(leaf.reshape(1, 1))
            in_squeeze.append(2)
            in_specs.append(pl.BlockSpec(
                (1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM))
        elif leaf.ndim == 1 and batched:
            # (grid, 1, tile): the constrained last-two dims (1, tile) equal
            # the array dims; the leading grid dim indexes freely.
            inputs.append(leaf.reshape(grid[0], 1, tile))
            in_squeeze.append(3)
            in_specs.append(pl.BlockSpec(
                (1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM))
        elif leaf.ndim == 1:
            inputs.append(leaf.reshape(1, leaf.shape[0]))
            in_squeeze.append(1)
            in_specs.append(pl.BlockSpec(
                (1, leaf.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM))
        elif batched:
            inputs.append(leaf)
            in_squeeze.append(0)
            in_specs.append(pl.BlockSpec(
                (tile,) + leaf.shape[1:],
                lambda i, nd=leaf.ndim: (i,) + (0,) * (nd - 1),
                memory_space=pltpu.VMEM))
        else:
            inputs.append(leaf)
            in_squeeze.append(0)
            in_specs.append(pl.BlockSpec(
                leaf.shape, lambda i, nd=leaf.ndim: (0,) * nd,
                memory_space=pltpu.VMEM))

    for base, leaf in zip(base_leaves, scene_leaves):
        add_input(leaf, jnp.ndim(leaf) > jnp.ndim(base))
    for leaf in ic_leaves:
        add_input(leaf, True)

    # Output layout: one ref per FlightSummary leaf; 1-D lanes as
    # (grid, tile) rows, >=2-D tiled on the lane axis.
    example = _summary_structure(tile, ic_leaves[0].dtype)
    out_leaves, out_tree = jax.tree.flatten(example)
    out_squeeze = [l.ndim == 1 for l in out_leaves]
    out_shape = [
        jax.ShapeDtypeStruct(
            (grid[0], 1, tile) if sq else (B,) + l.shape[1:], l.dtype
        )
        for l, sq in zip(out_leaves, out_squeeze)
    ]
    out_specs = [
        pl.BlockSpec(
            (1, 1, tile) if sq else (tile,) + l.shape[1:],
            (lambda i: (i, 0, 0)) if sq else
            (lambda i, nd=l.ndim: (i,) + (0,) * (nd - 1)),
            memory_space=pltpu.VMEM,
        )
        for l, sq in zip(out_leaves, out_squeeze)
    ]

    kernel = functools.partial(
        _kernel, cfg, scene_treedef, ic_treedef, tuple(in_squeeze),
        tuple(out_squeeze), len(scene_leaves),
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes
        ),
    )(*inputs)

    outs = [
        o.reshape(B) if sq else o for o, sq in zip(outs, out_squeeze)
    ]
    summary = jax.tree.unflatten(out_tree, outs)
    # restore bools
    return summary.replace(
        parachute_deployed=summary.parachute_deployed.astype(bool),
        diverged=summary.diverged.astype(bool),
    )


def _summary_structure(tile: int, dtype) -> FlightSummary:
    """Shape/dtype template of the per-tile summary outputs."""
    f = jnp.zeros((tile,), dtype)
    v3 = jnp.zeros((tile, 3), dtype)
    i = jnp.zeros((tile,), jnp.int32)
    rail = RailInfo(
        rail_exit_time=f, rail_exit_position=v3, rail_exit_velocity=v3,
        rail_exit_speed=f, rail_exit_euler=v3,
        rail_exit_angle_of_attack=f, rail_exit_sideslip=f, wind_at_exit=v3,
    )
    return FlightSummary(
        apogee_altitude=f, apogee_time=f, range=f, flight_time=f,
        landing_position=v3, final_velocity=v3, max_speed=f,
        parachute_deployed=i, diverged=i, n_steps=i, rail=rail,
    )
