"""Differentiable flight path: gradients through the full 6DOF integration.

The production hot paths use ``lax.while_loop`` (batch-level early exit),
which is not reverse-mode differentiable. This module drives the SAME
component-form core (``engine.component._flight_setup`` — one physics
source, no third copy of the rail phase or dynamics) through fixed-shape
checkpointed ``lax.scan``s so ``jax.grad`` flows end-to-end: sensitivities
of apogee, range, landing point, and flight time to thrust/mass/drag/wind,
gradient-based design sweeps, and the ``find_max_apogee`` use case as an
optimization instead of a file scan (capability the reference cannot offer;
its engine is NumPy, SURVEY.md §7 step 7).

Every step is rematerialized (``jax.checkpoint``) so a 60k-step reverse pass
fits in memory: residuals are recomputed per step instead of stored.
Primal values equal the production summary path to float noise (identical
masked steps; pinned in tests/test_sensitivity.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.scene import Scene
from ..models.wind import wind_at_altitude
from .component import _flight_setup
from .config import SimConfig
from .state import InitialConditions

__all__ = [
    "simulate_metrics_diff",
    "simulate_apogee_diff",
    "metric_and_grad",
    "apogee_and_grad",
    "DIFF_METRICS",
]

# Differentiable scalar metrics exposed by simulate_metrics_diff.
DIFF_METRICS = (
    "apogee_altitude",
    "range",
    "flight_time",
    "landing_x",
    "landing_y",
    "max_speed",
)


def simulate_metrics_diff(
    scene: Scene,
    ic: InitialConditions,
    cfg: SimConfig = SimConfig(),
    n_steps: int | None = None,
    rail_steps: int = 512,
) -> dict:
    """All headline metrics via one fully differentiable fixed-shape
    integration of the component core.

    Same physics as ``simulate_summary_batch`` (masked events, parachute
    latch, termination freezes the state). The landing metrics are the
    DIFFERENTIABLE ground-crossing estimates: the event machinery freezes
    state at a whole step (so step-count changes make the raw terminal
    state's derivative miss the crossing-time variation — measured 15% off
    vs finite differences on d(range)/d(thrust)), so the crossing is
    linearly interpolated: ``delta = (ground_alt - z_end)/vz_end``,
    ``flight_time = t_end + delta``, ``landing_xy = xy_end + vxy_end *
    delta``. Primal differences vs the summary path are sub-dt (< |v| * 5
    ms); lanes that never land keep the frozen values. ``apogee_altitude``
    and ``max_speed`` are the running extrema, bit-identical to the summary
    path.
    """
    if n_steps is None:
        n_steps = cfg.max_steps
    wind = scene.wind
    scene_nw = scene.replace(wind=None)

    def wind_fn(alt):
        w = wind_at_altitude(wind, alt)
        return w[..., 0], w[..., 1], w[..., 2]

    att = jnp.asarray(ic.attitude)
    ics = (
        ic.position[..., 0], ic.position[..., 1], ic.position[..., 2],
        ic.velocity[..., 0], ic.velocity[..., 1], ic.velocity[..., 2],
        att[..., 0], att[..., 1], att[..., 2],
        ic.angular_velocity[..., 0], ic.angular_velocity[..., 1],
        ic.angular_velocity[..., 2],
    )
    carry0, aux = _flight_setup(
        scene_nw, cfg, wind_fn, ics, rail_scan_steps=rail_steps
    )
    carry, _ = jax.lax.scan(
        jax.checkpoint(lambda c, _: (aux["main_body"](c), None)),
        carry0, None, length=n_steps,
    )
    st, ev = carry
    res = aux["summarize"](st, ev)

    # Quadratic backtrack to the ground crossing. Linear backtracking leaves
    # O(dt^2) seams where the termination step index jumps with the
    # parameter; those seams bias finite differences of range by ~15% at
    # dt=5 ms (measured), so the gradient of the linear estimate disagrees
    # with the secant slope. One dynamics evaluation at the frozen terminal
    # state + one Newton step on the quadratic altitude model pushes the
    # seams to O(dt^3).
    from .component import dynamics_c

    deriv, _ = dynamics_c(scene_nw, cfg, wind_fn, aux["t_of"](ev), st,
                          ev["para"])
    ax_, ay_, az_ = deriv[3], deriv[4], deriv[5]
    fpx, fpy, fpz = res["final_px"], res["final_py"], res["final_pz"]
    fvx, fvy, fvz = res["final_vx"], res["final_vy"], res["final_vz"]
    landed = (fpz <= cfg.ground_altitude) & (fvz < 0.0)
    safe_vz = jnp.where(landed, fvz, -1.0)
    d0 = (cfg.ground_altitude - fpz) / safe_vz
    z_d0 = fpz + fvz * d0 + 0.5 * az_ * d0 * d0
    slope = jnp.where(landed, fvz + az_ * d0, -1.0)
    slope = jnp.where(jnp.abs(slope) > 1e-6, slope, -1.0)
    d1 = d0 - (z_d0 - cfg.ground_altitude) / slope
    delta = jnp.where(landed, d1, 0.0)
    land_x = fpx + fvx * delta + 0.5 * ax_ * delta * delta
    land_y = fpy + fvy * delta + 0.5 * ay_ * delta * delta
    rng_sq = land_x * land_x + land_y * land_y
    ok = rng_sq > 0.0
    rng = jnp.where(ok, jnp.sqrt(jnp.where(ok, rng_sq, 1.0)), 0.0)
    return {
        "apogee_altitude": res["apogee_altitude"],
        "range": rng,
        "flight_time": res["flight_time"] + delta,
        "landing_x": land_x,
        "landing_y": land_y,
        "max_speed": res["max_speed"],
    }


def simulate_apogee_diff(
    scene: Scene,
    ic: InitialConditions,
    cfg: SimConfig = SimConfig(),
    n_steps: int | None = None,
    rail_steps: int = 512,
) -> jnp.ndarray:
    """Apogee altitude via the differentiable path (running max; the
    gradient flows through the step at which the max is attained)."""
    return simulate_metrics_diff(scene, ic, cfg, n_steps, rail_steps)[
        "apogee_altitude"
    ]


# Rocket fields that refresh_derived() itself computes: writing one of
# these must NOT trigger a refresh, or the write would be overwritten from
# the primaries and its gradient silently zeroed.
_DERIVED_ROCKET_FIELDS = frozenset(
    {"cp_location", "reference_area", "reference_diameter"}
)


def _scene_accessors(wrt: str):
    parts = wrt.split(".")
    is_derived = (
        parts[0] == "rocket"
        and len(parts) == 2
        and parts[1] in _DERIVED_ROCKET_FIELDS
    )

    def read(s):
        v = s
        for p in parts:
            v = getattr(v, p)
        return jnp.asarray(v, jnp.result_type(float))

    def write(s, v):
        from ..models.rocket import refresh_derived

        objs = [s]
        for p in parts[:-1]:
            objs.append(getattr(objs[-1], p))
        child = objs[-1].replace(**{parts[-1]: v})
        for obj, p in zip(reversed(objs[:-1]), reversed(parts[:-1])):
            child = obj.replace(**{p: child})
        if is_derived:
            # Writing a derived field directly (e.g. a what-if CP shift)
            # must stick — refreshing would recompute it from the
            # primaries, turning the write into a no-op with grad == 0.
            return child
        # refresh the derived geometry (reference area/diameter, Barrowman
        # CP) IN-TRACE so geometry gradients carry the CP-travel /
        # stability-margin channel — create() computes these once in
        # Python, which would freeze them across design writes. No-op for
        # non-geometry wrt (recomputed from untouched primaries).
        return child.replace(rocket=refresh_derived(child.rocket))

    return read, write


def metric_and_grad(scene: Scene, ic: InitialConditions,
                    cfg: SimConfig = SimConfig(),
                    metric: str = "apogee_altitude",
                    wrt: str = "motor.thrust_scale", **kw):
    """One metric and d(metric)/d(scene.<wrt>) in one reverse pass.

    ``metric`` is one of ``DIFF_METRICS``; ``wrt`` is a dotted path into the
    scene pytree, e.g. "motor.thrust_scale", "rocket.dry_mass",
    "rocket.fin_span".
    """
    if metric not in DIFF_METRICS:
        raise ValueError(f"metric must be one of {DIFF_METRICS}, got {metric!r}")
    read, write = _scene_accessors(wrt)

    def f(v):
        return simulate_metrics_diff(write(scene, v), ic, cfg, **kw)[metric]

    value, grad = jax.value_and_grad(f)(read(scene))
    return value, grad


def apogee_and_grad(scene: Scene, ic: InitialConditions,
                    cfg: SimConfig = SimConfig(), wrt: str = "motor.thrust_scale",
                    **kw):
    """Apogee and d(apogee)/d(scene.<wrt>) in one reverse pass."""
    return metric_and_grad(scene, ic, cfg, metric="apogee_altitude", wrt=wrt,
                           **kw)


def sign_ascent(evaluate, v0: float, steps: int, lr: float | None = None):
    """Shared fixed-magnitude sign-of-gradient ascent loop.

    ``evaluate(value) -> (history_entry, grad)``; the loop appends each
    entry, stops on ``grad == 0``, and moves ``value`` by a FIXED step of
    ``lr`` (default 2% of ``|v0|``) in the gradient's direction. A
    normalized step lr/|g| would explode as the optimum is approached
    (grad -> 0) and stall for steep objectives — this rule was fixed once
    already; both optimizers (``cli.optimize_apogee`` nominal path,
    ``mc.optimize_robust``) ride THIS loop so it cannot regress in one
    and not the other. Returns the history list.
    """
    step = lr if lr is not None else 0.02 * max(abs(float(v0)), 1e-12)
    value = float(v0)
    history = []
    for _ in range(int(steps)):
        entry, grad = evaluate(value)
        history.append(entry)
        if grad == 0.0:
            break
        value = value + step * (1.0 if grad > 0 else -1.0)
    return history
