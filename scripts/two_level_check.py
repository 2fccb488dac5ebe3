"""Coupled two-level check: population-level bias of the tiered timestep.

The tiered-dt fast flags (descent_dt_scale / ascent_q_threshold) are
accuracy-pinned per lane (tests/test_descent.py: nominal apogee delta
0.000 m, dispersed max 0.37 m against a 915 m sigma). This script
upgrades that to a POPULATION statement with the multilevel idea: run the
SAME dispersed lanes (same keys — coupled by construction) under the
tiered and parity configs and estimate

    bias = E[f_parity - f_tiered]

directly. Because the lanes are coupled, the difference's variance is
tiny and a few thousand lanes resolve the bias to millimeters — far
below what an uncoupled comparison could see under the 900 m-scale
dispersion.

When it matters: the mean's sampling stderr crosses the measured bias
around n ~ (sigma/bias)^2 lanes; below that, tiered means are
statistically indistinguishable from parity at ~4x less step work. For
runs beyond that scale (e.g. the 100M capstone), add the measured bias
as a correction or run the two-level estimator (tiered at full n +
coupled correction on a small n).

Run: PYTHONPATH=.:/root/.axon_site python scripts/two_level_check.py
"""
import json
import time

import jax
import numpy as np

from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig
from erpl_monte_carlo_sim_tpu.engine.batch import simulate_summary_batch
from erpl_monte_carlo_sim_tpu.mc import outlier_mask, sample_dispersions
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene
from erpl_monte_carlo_sim_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

SCENE = nominal_scene(liquid_motor())
IC = InitialConditions.vertical_launch()
BASE = dict(energy_consistent_aero=True)
TIERED = SimConfig(**BASE, descent_dt_scale=16, ascent_q_threshold=8000.0)
PARITY = SimConfig(**BASE)
N = 4096
METRICS = ("apogee_altitude", "range", "flight_time")


def main():
    t0 = time.time()
    sb, ib, _ = sample_dispersions(jax.random.PRNGKey(42), SCENE, IC, n=N)
    out = {}
    times = {}
    for label, cfg in (("tiered", TIERED), ("parity", PARITY)):
        t1 = time.time()
        r = simulate_summary_batch(sb, ib, cfg)
        m, _ = outlier_mask(r)
        vals = {k: np.asarray(getattr(r, k)) for k in METRICS}
        # force sync for honest timing (block_until_ready is a no-op on
        # the tunneled TPU)
        np.asarray(vals["apogee_altitude"][:1])
        times[label] = time.time() - t1
        out[label] = (vals, np.asarray(m))
        print(f"# {label}: {int(out[label][1].sum())}/{N} valid, "
              f"{times[label]:.1f} s", flush=True)

    both = out["tiered"][1] & out["parity"][1]
    rows = {}
    for k in METRICS:
        d = out["parity"][0][k][both] - out["tiered"][0][k][both]
        sigma = float(out["parity"][0][k][both].std())
        bias = float(d.mean())
        stderr = float(d.std(ddof=1) / np.sqrt(len(d)))
        rows[k] = {
            "bias": bias, "bias_stderr": stderr,
            "abs_max_delta": float(np.abs(d).max()),
            "population_sigma": sigma,
            # lanes at which the mean's sampling stderr equals the bias
            "n_where_bias_matters": (
                float((sigma / abs(bias)) ** 2) if bias != 0 else float("inf")
            ),
        }
        print(json.dumps({"metric": k, **rows[k]}), flush=True)

    print(json.dumps({
        "n_coupled": int(both.sum()),
        "mismatched_validity": int((out["tiered"][1] != out["parity"][1]).sum()),
        "wall_s_tiered": round(times["tiered"], 1),
        "wall_s_parity": round(times["parity"], 1),
        "wall_s_total": round(time.time() - t0, 1),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
