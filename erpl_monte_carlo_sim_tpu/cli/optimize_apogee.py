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

import sys

import jax
import jax.numpy as jnp

from ..engine import InitialConditions, SimConfig
from ..engine.diff import apogee_and_grad
from ..models import liquid_motor, nominal_scene

__all__ = ["optimize", "main"]


def optimize(param: str = "rocket.fin_span", steps: int = 10, lr: float = None,
             cfg: SimConfig = None, verbose: bool = True):
    """Gradient-ascend apogee w.r.t. ``param``. Returns (value, apogee) history."""
    cfg = cfg or SimConfig(max_time=120.0)
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()

    # Normalized step: lr is a relative change per step when not given.
    parts = param.split(".")
    v = scene
    for p in parts:
        v = getattr(v, p)
    v0 = float(jnp.asarray(v))

    history = []
    value = v0
    for k in range(steps):
        def write(s, val):
            objs = [s]
            for p in parts[:-1]:
                objs.append(getattr(objs[-1], p))
            child = objs[-1].replace(**{parts[-1]: val})
            for obj, p in zip(reversed(objs[:-1]), reversed(parts[:-1])):
                child = obj.replace(**{p: child})
            # no refresh here: apogee_and_grad's own accessor write
            # re-writes the value and refreshes derived geometry in-trace
            return child

        apogee, grad = apogee_and_grad(
            write(scene, jnp.asarray(value)), ic, cfg, wrt=param
        )
        apogee, grad = float(apogee), float(grad)
        history.append((value, apogee, grad))
        if verbose:
            print(f"step {k}: {param}={value:.6g}  apogee={apogee:.1f} m  "
                  f"d(apogee)/d({param})={grad:.3g}")
        # Sign-of-gradient ascent with a FIXED step magnitude (lr, or 2%
        # of the starting value). The old form divided by |grad| and then
        # multiplied by sign(grad), so the step exploded as the optimum was
        # approached (grad -> 0) and stalled for steep objectives.
        step = lr if lr is not None else 0.02 * abs(v0)
        if grad == 0.0:
            break
        value = value + step * (1.0 if grad > 0 else -1.0)
    return history


def main(argv=None) -> list:
    argv = list(sys.argv[1:] if argv is None else argv)
    robust_lanes = 0
    lam = 0.0
    if "--robust" in argv:
        i = argv.index("--robust")
        argv.pop(i)
        robust_lanes = 256
        if i < len(argv) and not argv[i].startswith("-"):
            robust_lanes = int(argv.pop(i))
    if "--lam" in argv:
        i = argv.index("--lam")
        argv.pop(i)
        lam = float(argv.pop(i))
    max_time = 120.0
    if "--max-time" in argv:
        i = argv.index("--max-time")
        argv.pop(i)
        max_time = float(argv.pop(i))
    metric = "apogee_altitude"
    if "--metric" in argv:
        i = argv.index("--metric")
        argv.pop(i)
        metric = argv.pop(i)
    param = argv[0] if len(argv) > 0 else "rocket.fin_span"
    steps = int(argv[1]) if len(argv) > 1 else 10
    lr = float(argv[2]) if len(argv) > 2 else None
    if robust_lanes:
        from ..mc.robust import optimize_robust

        return optimize_robust(
            nominal_scene(liquid_motor()),
            InitialConditions.vertical_launch(),
            SimConfig(max_time=max_time),
            wrt=param, metric=metric, n_lanes=robust_lanes,
            risk_lambda=lam, steps=steps, lr=lr, verbose=True,
        )
    return optimize(param, steps, lr, cfg=SimConfig(max_time=max_time))


if __name__ == "__main__":
    main()
