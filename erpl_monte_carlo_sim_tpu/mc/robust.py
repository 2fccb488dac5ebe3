"""Design optimization under dispersion (robust optimization).

The reference's design question is answered per-sample after the fact
(`find_max_apogee.py` scans saved JSONs for the best draw); this module
answers it *before* flying: gradient-ascend a DESIGN parameter against
the dispersed population's statistics. It composes two things the
reference cannot: the differentiable component core
(`engine.diff.simulate_metrics_diff` — one checkpointed reverse pass per
flight) and the batched dispersion sampler (`mc.dispersions` — one
`Scene` with a lane axis), so

    objective(v) = mean_lanes[metric(v)] - risk_lambda * std_lanes[metric(v)]

and its gradient come from ONE `jax.value_and_grad` over the whole
dispersed batch (`vmap` is implicit in the shape-polymorphic physics).
This is sample-average approximation (SAA): the lanes are FIXED by
``seed`` across optimizer iterations — common random numbers make the
objective a deterministic smooth function of ``v``, so plain gradient
ascent converges without stochastic-approximation schedules.

The design parameter must be a SHARED (non-dispersed) scene leaf — fin
geometry, parachute areas, rail length, ...; dispersed channels (e.g.
``motor.thrust_scale``, per-lane after sampling) are rejected loudly:
overwriting a per-lane draw with one scalar would silently delete the
dispersion being optimized against.

NaN caveat: lanes that diverge mid-flight poison the REVERSE pass even
when masked out of the primal mean (a zero cotangent times a NaN primal
is NaN), so the objective requires every lane finite and raises
otherwise — use windowed configs or ``energy_consistent_aero`` for full
flights (the same guidance as every full-flight study; see
tests/test_robust.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..engine.diff import (
    DIFF_METRICS,
    _scene_accessors,
    line_search_ascent,
    simulate_metrics_diff,
)
from .dispersions import UncertaintyParams, sample_dispersions

__all__ = ["dispersed_objective_and_grad", "optimize_robust"]


def _batched(scene, ic, *, n_lanes, seed, params, base_wind):
    key = jax.random.PRNGKey(seed)
    scene_b, ic_b, _ = sample_dispersions(
        key, scene, ic, params, n_lanes, base_wind=base_wind
    )
    return scene_b, ic_b


def dispersed_objective_and_grad(
    scene,
    ic,
    cfg,
    *,
    wrt: str,
    metric: str = "apogee_altitude",
    n_lanes: int = 256,
    seed: int = 0,
    params: UncertaintyParams = UncertaintyParams(),
    risk_lambda: float = 0.0,
    base_wind: tuple | None = None,
    value=None,
    n_steps: int | None = None,
) -> tuple:
    """(objective, d objective / d scene.<wrt>, diagnostics) at ``value``.

    ``objective = mean(metric) - risk_lambda * std(metric)`` over
    ``n_lanes`` dispersed lanes (population std, matching the stats
    blocks). ``value=None`` evaluates at the scene's current value.
    Diagnostics carry ``{"mean", "std", "value"}`` as floats.
    """
    if metric not in DIFF_METRICS:
        raise ValueError(
            f"metric must be one of {DIFF_METRICS}, got {metric!r}"
        )
    read, write = _scene_accessors(wrt)
    scene_b, ic_b = _batched(scene, ic, n_lanes=n_lanes, seed=seed,
                             params=params, base_wind=base_wind)
    nominal_leaf = read(scene)
    if read(scene_b).ndim != jnp.ndim(nominal_leaf):
        raise ValueError(
            f"scene.{wrt} is a DISPERSED (per-lane) leaf in the sampled "
            "batch; a scalar design write would overwrite the draws. "
            "Optimize a shared design leaf instead (fin/parachute "
            "geometry, rail length, dry structural dimensions)"
        )
    v0 = jnp.asarray(value if value is not None else nominal_leaf,
                     jnp.result_type(float))

    def objective(v):
        # write() refreshes the derived geometry (reference area,
        # Barrowman CP) in-trace, so geometry gradients carry the
        # stability-margin channel, not just the sim-time lift/drag terms
        m = simulate_metrics_diff(write(scene_b, v), ic_b, cfg,
                                  n_steps=n_steps)[metric]
        mean = jnp.mean(m)
        if risk_lambda == 0.0:
            return mean, (mean, jnp.zeros_like(mean))
        std = jnp.sqrt(jnp.mean((m - mean) ** 2))
        return mean - risk_lambda * std, (mean, std)

    (obj, (mean, std)), grad = jax.value_and_grad(objective, has_aux=True)(
        v0
    )
    if not bool(jnp.isfinite(obj)) or not bool(jnp.all(jnp.isfinite(grad))):
        raise FloatingPointError(
            "non-finite dispersed objective/gradient: a lane diverged "
            "(reverse passes cannot mask NaN lanes). Use a windowed "
            "config or SimConfig(energy_consistent_aero=True) for "
            "full flights"
        )
    diag = {"mean": float(mean), "std": float(std), "value": float(v0)}
    return obj, grad, diag


def optimize_robust(
    scene,
    ic,
    cfg,
    *,
    wrt: str,
    metric: str = "apogee_altitude",
    n_lanes: int = 256,
    seed: int = 0,
    params: UncertaintyParams = UncertaintyParams(),
    risk_lambda: float = 0.0,
    base_wind: tuple | None = None,
    steps: int = 24,
    lr: float | None = None,
    bounds: tuple | None = None,
    verbose: bool = False,
) -> list:
    """Gradient-ascend the dispersed objective w.r.t. ``scene.<wrt>``.

    Same step rule as ``cli.optimize_apogee`` — both ride
    ``engine.diff.line_search_ascent`` (Armijo backtracking, optional
    ``bounds``, step-contraction convergence; ``steps`` is the evaluation
    budget). SAA with CRN: the ``seed`` lanes are fixed for the whole
    trajectory, so the objective is deterministic in ``value`` and the
    Armijo comparisons are noise-free. Returns the history
    ``[(value, objective, grad, mean, std), ...]`` — one entry per
    EVALUATION including rejected trials (an ``AscentHistory``; check
    ``hist.info`` for the converged point).
    """
    read, _ = _scene_accessors(wrt)

    def evaluate(value):
        obj, grad, diag = dispersed_objective_and_grad(
            scene, ic, cfg, wrt=wrt, metric=metric, n_lanes=n_lanes,
            seed=seed, params=params, risk_lambda=risk_lambda,
            base_wind=base_wind, value=value,
        )
        obj, grad = float(obj), float(grad)
        if verbose:
            print(f"  {wrt}={value:.6g}  objective={obj:.4f}  "
                  f"mean={diag['mean']:.4f}  std={diag['std']:.4f}  "
                  f"grad={grad:.4g}", flush=True)
        return (value, obj, grad, diag["mean"], diag["std"]), obj, grad

    return line_search_ascent(evaluate, float(jnp.asarray(read(scene))),
                              steps, lr, bounds=bounds)
