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


import functools


@functools.lru_cache(maxsize=64)
def _metric_grad_fn(metric: str, wrt: str, cfg: SimConfig, kw_items: tuple):
    """Jitted value-and-grad for one (metric, wrt, cfg) triple, cached so
    repeated calls (every line-search evaluation) re-EXECUTE one compiled
    program instead of re-tracing the n_steps scan + its transpose — the
    round-3 optimizer paid a full retrace per evaluation."""
    read, write = _scene_accessors(wrt)
    del read

    def f(v, scene, ic):
        return simulate_metrics_diff(
            write(scene, v), ic, cfg, **dict(kw_items)
        )[metric]

    return jax.jit(jax.value_and_grad(f))


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
    read, _ = _scene_accessors(wrt)
    fn = _metric_grad_fn(metric, wrt, cfg, tuple(sorted(kw.items())))
    value, grad = fn(read(scene), scene, ic)
    return value, grad


def apogee_and_grad(scene: Scene, ic: InitialConditions,
                    cfg: SimConfig = SimConfig(), wrt: str = "motor.thrust_scale",
                    **kw):
    """Apogee and d(apogee)/d(scene.<wrt>) in one reverse pass."""
    return metric_and_grad(scene, ic, cfg, metric="apogee_altitude", wrt=wrt,
                           **kw)


class AscentHistory(list):
    """The per-evaluation history list, plus an ``info`` dict:
    ``{"converged", "reason", "value", "objective", "grad", "n_evals"}``.
    A list subclass so every pre-round-4 consumer (prints, len, indexing)
    keeps working while new callers can test ``hist.info["converged"]``."""

    def __init__(self, *a):
        super().__init__(*a)
        self.info = {"converged": False, "reason": "max_evals",
                     "value": float("nan"), "objective": float("nan"),
                     "grad": float("nan"), "n_evals": 0}


def line_search_ascent(evaluate, v0: float, steps: int,
                       lr: float | None = None, *,
                       bounds: tuple | None = None,
                       grad_tol: float = 0.0,
                       step_tol: float | None = None,
                       grow: float = 2.0, shrink: float = 0.5,
                       c1: float = 1e-4):
    """Backtracking-line-search gradient ascent on one scalar parameter.

    ``evaluate(value) -> (history_entry, objective, grad)``. Each proposed
    move of ``step`` in the gradient's direction must pass the Armijo
    sufficient-increase test ``f_new >= f + c1*|move|*|g|``; accepted steps
    grow by ``grow`` (capped at 32x the initial step), rejected ones shrink
    by ``shrink`` — so the loop takes large steps across flat approaches
    and contracts geometrically around the optimum instead of walking a
    fixed grid (the round-3 ``sign_ascent`` oscillated around any optimum
    narrower than its fixed 2%%-of-|v0| step). A non-finite trial
    objective rejects like a failed Armijo test.

    Termination (``hist.info["reason"]``): ``grad_tol`` (|grad| at an
    accepted point <= ``grad_tol``), ``step_tol`` (the step contracted
    below ``step_tol``, default 1%% of the initial step — the optimum is
    bracketed to that resolution), ``bound`` (at a ``bounds`` edge with
    the gradient pointing outward), or ``max_evals`` (``steps`` evaluation
    budget exhausted; ``converged`` False). CRN note: ``evaluate`` must be
    deterministic in ``value`` (both shipped objectives are — the nominal
    flight, and the SAA dispersed batch with fixed seed), otherwise the
    Armijo comparison chases sampling noise.

    Both optimizers (``cli.optimize_apogee`` nominal path,
    ``mc.optimize_robust``) ride THIS loop so a step-rule fix cannot land
    in one and not the other. Returns an ``AscentHistory`` (a list of the
    per-evaluation entries, plus ``.info``).

    Replaces-at-scale: the use case `find_max_apogee.py:1-16` gestures at
    (scan saved samples for the best) — here it is a convergent ascent.
    """
    history = AscentHistory()
    budget = int(steps)
    if budget <= 0:
        return history
    lo, hi = bounds if bounds is not None else (-float("inf"), float("inf"))
    if lo > hi:
        raise ValueError(f"bounds lo > hi: {bounds}")

    def clip(x):
        return min(max(x, lo), hi)

    init_step = lr if lr is not None else 0.02 * max(abs(float(v0)), 1e-12)
    if init_step <= 0:
        raise ValueError("lr must be positive")
    tol = step_tol if step_tol is not None else 0.01 * init_step
    step = init_step
    max_step = 32.0 * init_step

    v = clip(float(v0))
    entry, f, g = evaluate(v)
    history.append(entry)
    f, g = float(f), float(g)
    n_evals = 1
    import math

    if not (math.isfinite(f) and math.isfinite(g)):
        # non-finite START: there is nothing to bracket — backtracking
        # would shrink the step below tol and falsely report step_tol
        # convergence around a point never evaluated finite (r4 review)
        history.info.update(converged=False, reason="nonfinite_start",
                            value=v, objective=f, grad=g, n_evals=1)
        return history
    reason, converged = "max_evals", False
    while n_evals < budget:
        if abs(g) <= grad_tol:
            reason, converged = "grad_tol", True
            break
        d = 1.0 if g > 0 else -1.0
        v_try = clip(v + d * step)
        if v_try == v:
            # clipped back onto the current bound: gradient points outward
            reason, converged = "bound", True
            break
        entry, f_try, g_try = evaluate(v_try)
        history.append(entry)
        f_try, g_try = float(f_try), float(g_try)
        n_evals += 1
        # NaN-safe: a diverged trial fails this comparison and backtracks
        if f_try >= f + c1 * abs(v_try - v) * abs(g):
            v, f, g = v_try, f_try, g_try
            step = min(step * grow, max_step)
        else:
            step *= shrink
            if step < tol:
                reason, converged = "step_tol", True
                break
    else:
        if abs(g) <= grad_tol:
            reason, converged = "grad_tol", True
    history.info.update(converged=converged, reason=reason, value=v,
                        objective=f, grad=g, n_evals=n_evals)
    return history
