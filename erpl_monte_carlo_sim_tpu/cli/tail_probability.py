"""Range-safety tail probability CLI: P(metric > threshold).

The reference's only route to a tail probability is counting hits over
its per-sim JSON exports — hopeless below ~10/n. This CLI answers the
question directly with either plain Monte Carlo (Wilson 95% CI) or
importance sampling (``--shift channel=sigmas``: exponentially tilted
draws, self-normalized back to the nominal distribution — see
``mc/importance.py``), and prints one JSON object.

Usage:
  python -m erpl_monte_carlo_sim_tpu.cli.tail_probability \\
      --metric apogee_altitude --threshold 26000 \\
      [--n 4096] [--seed 0] [--solid] [--max-time 0] \\
      [--shift motor_thrust=2.0] [--shift mass=1.0]

``--max-time 0`` (default) runs full flights; pass e.g. ``6`` for the
ascent-window configs used in the studies.
"""

from __future__ import annotations

import argparse
import json

from ..engine import InitialConditions, SimConfig
from ..mc import MonteCarloAnalyzer, exceedance_from_analysis
from ..models import liquid_motor, nominal_scene, solid_motor

__all__ = ["tail_probability", "main"]


def tail_probability(metric: str, threshold: float, n: int = 4096,
                     seed: int = 0, solid: bool = False,
                     max_time: float = 0.0, shift: dict | None = None,
                     scene=None, sim_config=None) -> dict:
    """Estimate P(metric > threshold | valid) and return the result row
    plus run metadata. ``shift`` non-empty selects importance sampling."""
    if scene is None:
        scene = nominal_scene(solid_motor() if solid else liquid_motor())
    if sim_config is None:
        sim_config = SimConfig(max_time=max_time) if max_time > 0 \
            else SimConfig()
    mc = MonteCarloAnalyzer(scene=scene, sim_config=sim_config,
                            importance_shift=shift or None)
    a = mc.run_monte_carlo(InitialConditions.vertical_launch(), n_samples=n,
                           seed=seed)
    row = exceedance_from_analysis(a, metric, [threshold])[0]
    out = {
        "metric": metric,
        "n_lanes": n,
        "n_valid": a["n_samples"],
        "shift": dict(shift or {}),
        **row,
    }
    if shift:
        blk = a["importance"].get(metric)
        if isinstance(blk, dict) and "n_eff" in blk:
            # denominator health for the self-normalized estimator
            out["n_eff"] = blk["n_eff"]
    return out


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--metric", default="apogee_altitude")
    p.add_argument("--threshold", type=float, required=True)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--solid", action="store_true")
    p.add_argument("--max-time", type=float, default=0.0)
    p.add_argument("--shift", action="append", default=[],
                   metavar="CHANNEL=SIGMAS",
                   help="importance tilt, repeatable (e.g. motor_thrust=2)")
    args = p.parse_args(argv)
    shift = {}
    for s in args.shift:
        name, _, val = s.partition("=")
        shift[name] = float(val)
    out = tail_probability(args.metric, args.threshold, n=args.n,
                           seed=args.seed, solid=args.solid,
                           max_time=args.max_time, shift=shift)
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
