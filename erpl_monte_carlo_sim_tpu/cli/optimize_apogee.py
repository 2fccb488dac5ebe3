"""Gradient-based apogee optimization over scene parameters.

The reference's ``find_max_apogee.py`` scans saved JSON files for the best
sample. Because this engine is differentiable end-to-end
(``engine.diff.simulate_apogee_diff``), the same question — what maximizes
apogee? — can be answered as an optimization: gradient ascent on any dotted
scene parameter (launch pitch via ICs, fin geometry, thrust scale, ...),
each iteration one forward+reverse pass through the full 6DOF flight.

Usage:
  python -m erpl_monte_carlo_sim_tpu.cli.optimize_apogee \
      [param] [steps] [lr]          # default: rocket.fin_span, 10 steps
  python -m erpl_monte_carlo_sim_tpu.cli.optimize_apogee \
      [param] [steps] [lr] --robust [n_lanes] [--lam X] [--max-time T] \
      [--metric m]

``--robust`` optimizes the DISPERSED objective instead of the nominal
flight: mean apogee over n_lanes Monte Carlo lanes (default 256), minus
``--lam`` times its std for risk-averse designs — ``mc.optimize_robust``
(one reverse pass through the whole dispersed batch per step; the
nominal optimum and the under-dispersion optimum genuinely differ, see
NOTES.md).
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from ..engine import InitialConditions, SimConfig
from ..engine.diff import _scene_accessors, line_search_ascent, metric_and_grad
from ..models import liquid_motor, nominal_scene

__all__ = ["optimize", "main"]


def optimize(param: str = "rocket.fin_span", steps: int = 24, lr: float = None,
             cfg: SimConfig = None, verbose: bool = True,
             metric: str = "apogee_altitude",
             bounds: tuple | None = None):
    """Gradient-ascend ``metric`` w.r.t. ``param`` on the nominal flight.

    Rides ``engine.diff.line_search_ascent`` (the backtracking stepper
    shared with ``mc.optimize_robust``): Armijo-tested steps, optional
    ``bounds``, convergent instead of grid-walking. ``steps`` is the
    evaluation budget. Returns the ``(value, metric, grad)`` history
    (an ``AscentHistory``; see ``hist.info`` for convergence state).
    """
    cfg = cfg or SimConfig(max_time=120.0)
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    read, write = _scene_accessors(param)
    k = 0

    def evaluate(value):
        nonlocal k
        m, grad = metric_and_grad(
            write(scene, jnp.asarray(value)), ic, cfg,
            metric=metric, wrt=param,
        )
        m, grad = float(m), float(grad)
        if verbose:
            print(f"eval {k}: {param}={value:.6g}  {metric}={m:.1f}  "
                  f"d({metric})/d({param})={grad:.3g}")
        k += 1
        return (value, m, grad), m, grad

    hist = line_search_ascent(evaluate, float(read(scene)), steps, lr,
                              bounds=bounds)
    if verbose and hist:
        print(f"{hist.info['reason']}: {param}={hist.info['value']:.6g} "
              f"{metric}={hist.info['objective']:.1f} "
              f"(converged={hist.info['converged']}, "
              f"{hist.info['n_evals']} evals)")
    return hist


def main(argv=None) -> list:
    ap = argparse.ArgumentParser(
        description="Gradient ascent on a flight metric over a dotted "
        "scene parameter (nominal flight, or --robust for the dispersed "
        "mean - lam*std objective)"
    )
    ap.add_argument("param", nargs="?", default="rocket.fin_span")
    ap.add_argument("steps", nargs="?", type=int, default=24,
                    help="evaluation budget for the line search")
    ap.add_argument("lr", nargs="?", type=float, default=None,
                    help="initial step magnitude (default 2%% of start "
                         "value; the line search adapts it)")
    ap.add_argument("--bounds", nargs=2, type=float, default=None,
                    metavar=("LO", "HI"),
                    help="clamp the parameter to [LO, HI]")
    ap.add_argument("--robust", nargs="?", type=int, const=256, default=0,
                    metavar="N_LANES",
                    help="optimize the dispersed objective over N lanes")
    ap.add_argument("--lam", type=float, default=0.0,
                    help="risk aversion: objective = mean - lam*std")
    ap.add_argument("--max-time", type=float, default=120.0)
    ap.add_argument("--metric", default="apogee_altitude")
    args = ap.parse_args(argv)
    if args.robust:
        from ..mc.robust import optimize_robust

        return optimize_robust(
            nominal_scene(liquid_motor()),
            InitialConditions.vertical_launch(),
            SimConfig(max_time=args.max_time),
            wrt=args.param, metric=args.metric, n_lanes=args.robust,
            risk_lambda=args.lam, steps=args.steps, lr=args.lr,
            bounds=tuple(args.bounds) if args.bounds else None,
            verbose=True,
        )
    return optimize(args.param, args.steps, args.lr,
                    cfg=SimConfig(max_time=args.max_time),
                    metric=args.metric,
                    bounds=tuple(args.bounds) if args.bounds else None)


if __name__ == "__main__":
    main()
