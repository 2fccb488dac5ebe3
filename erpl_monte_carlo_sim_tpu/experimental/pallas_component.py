"""Component-form Pallas TPU kernel: the whole flight, no vector arrays.

The composite kernel (`pallas_kernel.py`) reuses the stacked-vector physics
([P,3] / [P,3,3] arrays) and is correct, but Mosaic lays every 3-wide array
out in (8,128) vregs and relayouts between them — measured 400x slower than
the XLA path. This kernel keeps EVERY quantity as a flat [P]-lane f32/int32
vector (full vreg utilization); the physics itself lives in
``engine.component`` (shared verbatim with the XLA batch path,
``engine.batch``) — this module is only the ``pallas_call`` plumbing:
BlockSpecs, ref reads/writes, and the [P,N] lanes-major wind closure.

Reference formulas mirrored by the shared core:
`/root/reference/rocket_simulation/utils.py:100-121,175-205`,
`simulator.py:295-460`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.scene import Scene
from ..ops.math import pallas_math
from ..engine.component import flight_components, wind_tent_lanes_major
from ..engine.config import SimConfig
from ..engine.state import InitialConditions

__all__ = ["simulate_summary_component"]


def _kernel(cfg: SimConfig, scene_treedef, in_squeeze, n_scene, *refs):
    with pallas_math():
        _kernel_body(cfg, scene_treedef, in_squeeze, n_scene, *refs)


def _kernel_body(cfg: SimConfig, scene_treedef, in_squeeze, n_scene, *refs):
    def read(k):
        v = refs[k][...]
        if in_squeeze[k] == 2:
            return v[0, 0]
        if in_squeeze[k] == 1:
            return v[0]
        if in_squeeze[k] == 3:
            return v[0, 0]
        return v

    scene_vals = [read(k) for k in range(n_scene)]
    scene = jax.tree.unflatten(scene_treedef, scene_vals)
    idx = n_scene
    grid = refs[idx][...]          # [1, N] altitude grid
    wu = refs[idx + 1][...]        # [P, N]
    wv = refs[idx + 2][...]
    ww = refs[idx + 3][...]
    # ICs, all [P] rows as (1,1,P) -> squeeze
    ics = tuple(refs[idx + 4 + k][0, 0] for k in range(12))
    out = refs[idx + 16:]

    wind_fn = functools.partial(wind_tent_lanes_major,
                                grid=grid, wu=wu, wv=wv, ww=ww)
    res = flight_components(scene, cfg, lambda alt: wind_fn(alt), ics)
    for ref, key in zip(out, _OUT_KEYS):
        ref[...] = res[key][None, None, :]


# public output name -> flight_components dict key
_OUT_FIELDS = (
    ("apogee_altitude", "apogee_altitude"),
    ("apogee_time", "apogee_time"),
    ("range", "range"),
    ("flight_time", "flight_time"),
    ("final_altitude", "final_pz"),
    ("final_vz", "final_vz"),
    ("max_speed", "max_speed"),
    ("parachute_deployed", "parachute_deployed"),
    ("diverged", "diverged"),
    ("n_steps", "n_steps"),
    ("rail_exit_time", "rail_exit_time"),
    ("rail_exit_speed", "rail_exit_speed"),
    ("rail_exit_angle_of_attack", "rail_exit_angle_of_attack"),
    ("rail_exit_sideslip", "rail_exit_sideslip"),
    ("rail_exit_altitude", "rail_pz"),
)
_OUT_NAMES = tuple(n for n, _ in _OUT_FIELDS)
_OUT_KEYS = tuple(k for _, k in _OUT_FIELDS)
_OUT_INT = {"parachute_deployed", "diverged", "n_steps"}


def simulate_summary_component(
    scene_b: Scene,
    ic_b: InitialConditions,
    base_scene: Scene,
    cfg: SimConfig = SimConfig(),
    tile: int = 1024,
    interpret: bool = False,
    vmem_limit_bytes: int = 100 * 1024 * 1024,
) -> dict:
    """Component-form whole-flight kernel. Returns a dict of [B] arrays
    (subset of FlightSummary — the Monte Carlo metrics + rail diagnostics)."""
    ic_leaves = jax.tree.leaves(ic_b)
    B = ic_leaves[0].shape[0]
    if B % tile != 0:
        raise ValueError(f"batch {B} must be a multiple of tile {tile}")
    grid_dims = (B // tile,)
    G = grid_dims[0]

    # scene: strip the wind field (passed separately, split by component)
    wind = scene_b.wind
    scene_nw = scene_b.replace(wind=None)
    base_nw = base_scene.replace(wind=None)
    scene_leaves = jax.tree.leaves(scene_nw)
    base_leaves = jax.tree.leaves(base_nw)
    scene_treedef = jax.tree.structure(scene_nw)

    in_specs = []
    inputs = []
    in_squeeze = []

    def add(leaf, batched):
        leaf = jnp.asarray(leaf)
        if leaf.ndim == 0:
            inputs.append(leaf.reshape(1, 1))
            in_squeeze.append(2)
            in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        elif leaf.ndim == 1 and batched:
            inputs.append(leaf.reshape(G, 1, tile))
            in_squeeze.append(3)
            in_specs.append(pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
        elif leaf.ndim == 1:
            inputs.append(leaf.reshape(1, leaf.shape[0]))
            in_squeeze.append(1)
            in_specs.append(pl.BlockSpec((1, leaf.shape[0]),
                                         lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        else:
            raise ValueError("unexpected scene leaf ndim")

    for base, leaf in zip(base_leaves, scene_leaves):
        add(leaf, jnp.ndim(leaf) > jnp.ndim(base))
    n_scene = len(inputs)

    # wind: altitude grid [1,N] + u/v/w [B,N] (or broadcast from shared)
    walt = jnp.asarray(wind.altitudes).reshape(1, -1)
    N = walt.shape[1]
    warr = jnp.asarray(wind.wind)
    if warr.ndim == 2:  # shared [N,3] -> broadcast per-lane
        warr = jnp.broadcast_to(warr, (B, N, 3))
    inputs.append(walt)
    in_specs.append(pl.BlockSpec((1, N), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    for c in range(3):
        inputs.append(warr[..., c])
        in_specs.append(pl.BlockSpec((tile, N),
                                     lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))

    # ICs as 12 [B] rows
    for arr in (ic_b.position, ic_b.velocity, ic_b.attitude,
                ic_b.angular_velocity):
        for c in range(3):
            inputs.append(jnp.asarray(arr[:, c]).reshape(G, 1, tile))
            in_specs.append(pl.BlockSpec((1, 1, tile),
                                         lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))

    dtype = jnp.asarray(ic_leaves[0]).dtype
    out_shape = [
        jax.ShapeDtypeStruct((G, 1, tile),
                             jnp.int32 if n in _OUT_INT else dtype)
        for n in _OUT_NAMES
    ]
    out_specs = [
        pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in _OUT_NAMES
    ]

    kernel = functools.partial(
        _kernel, cfg, scene_treedef, tuple(in_squeeze), n_scene
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid_dims,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes
        ),
    )(*inputs)

    result = {}
    for name, o in zip(_OUT_NAMES, outs):
        v = o.reshape(B)
        if name in ("parachute_deployed", "diverged"):
            v = v.astype(bool)
        result[name] = v
    return result
