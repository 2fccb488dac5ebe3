"""Importance-sampling tail study: measured accuracy of
P(apogee > threshold) vs plain counting on real flights.

Protocol: window regime (1k-step bench config). Truth = pooled plain
counting over TRUTH_SLABS x TRUTH_SLAB lanes at a threshold chosen as a
target quantile of that pool (so the plain-truth tail count is large
enough to trust). Estimators at n lanes over KEYS independent keys:

  * plain counting (the reference's only option),
  * importance sampling with a motor-thrust tilt (theta ~ 2/3 of the
    threshold z-score, the module-docstring rule).

Report RMS relative error over keys, mean reported stderr (calibration),
and effective sample sizes.

Run: PYTHONPATH=.:/root/.axon_site python scripts/importance_study.py
"""
import json
import time

import numpy as np

from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig
from erpl_monte_carlo_sim_tpu.mc import (
    MonteCarloAnalyzer,
    exceedance_from_analysis,
)
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene
from erpl_monte_carlo_sim_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

SCENE = nominal_scene(liquid_motor())
IC = InitialConditions.vertical_launch()
CFG = SimConfig(max_time=6.0)
TRUTH_SLABS = 4
TRUTH_SLAB = 16_384
KEYS = list(range(200, 208))
N_EST = 1024
QUANTILE = 99.8  # tail around p ~ 2e-3
THETA = 2.0


def main():
    t0 = time.time()
    plain = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG)
    pool = []
    for s in range(TRUTH_SLABS):
        a = plain.run_monte_carlo(IC, n_samples=TRUTH_SLAB, seed=2000 + s)
        apo = np.asarray(a["summary"].apogee_altitude)
        pool.append(apo[np.asarray(a["valid_mask"])])
        print(f"# truth slab {s}: {len(pool[-1])} valid", flush=True)
    pool = np.concatenate(pool)
    thr = float(np.percentile(pool, QUANTILE))
    p_truth = float((pool > thr).mean())
    n_pool = len(pool)
    print(f"# threshold {thr:.1f} m, truth p = {p_truth:.3e} "
          f"({int(p_truth * n_pool)} of {n_pool}; truth rel stderr "
          f"{np.sqrt((1 - p_truth) / (p_truth * n_pool)):.2%})", flush=True)

    mc_is = MonteCarloAnalyzer(scene=SCENE, sim_config=CFG,
                               importance_shift={"motor_thrust": THETA})
    rows = {}
    for label, mc in (("plain", plain), ("importance", mc_is)):
        errs, stderrs, n_effs = [], [], []
        for key in KEYS:
            a = mc.run_monte_carlo(IC, n_samples=N_EST, seed=key)
            row = exceedance_from_analysis(a, "apogee_altitude", [thr])[0]
            errs.append(row["probability"] - p_truth)
            p = row["probability"]
            if "stderr" in row:
                stderrs.append(row["stderr"])
            else:  # plain rows carry a Wilson CI, not a stderr
                stderrs.append(np.sqrt(max(p, 1e-12) * (1 - p) / row["n"]))
            n_effs.append(row["n_eff_tail"] if "n_eff_tail" in row
                          else p * row.get("n", N_EST))
        rows[label] = {
            "n": N_EST,
            "rms_rel_err": float(np.sqrt(np.mean(np.square(errs))) / p_truth),
            "mean_stderr_rel": float(np.mean(stderrs) / p_truth),
            "mean_n_eff_tail": float(np.mean(n_effs)),
        }
        print(json.dumps({"estimator": label, **rows[label]}), flush=True)

    print(json.dumps({
        "threshold_m": thr, "p_truth": p_truth, "theta": THETA,
        "keys": len(KEYS), "wall_s": round(time.time() - t0, 1),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
