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
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from ..engine import InitialConditions, SimConfig
from ..engine.diff import apogee_and_grad
from ..models import liquid_motor, nominal_scene

__all__ = ["optimize"]


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


if __name__ == "__main__":
    param = sys.argv[1] if len(sys.argv) > 1 else "rocket.fin_span"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    lr = float(sys.argv[3]) if len(sys.argv) > 3 else None
    optimize(param, steps, lr)
