"""Compiled-Pallas regression smoke (real TPU, not CI).

Runs both whole-flight Pallas kernels at small batch on the real chip and
records ms/step + max-abs-delta vs the component-form XLA path into
PALLAS_r{N}.json. Mosaic compiles take ~13 min each cold; the persistent
compile cache makes re-runs cheap.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_smoke.py [round]
"""

import json
import sys
import time

import numpy as np


def main(round_tag: str = "r02") -> dict:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from erpl_monte_carlo_sim_tpu.engine import (
        InitialConditions, SimConfig, simulate_summary_batch,
    )
    from erpl_monte_carlo_sim_tpu.experimental.pallas_component import (
        simulate_summary_component,
    )
    from erpl_monte_carlo_sim_tpu.experimental.pallas_kernel import (
        simulate_summary_pallas,
    )
    from erpl_monte_carlo_sim_tpu.mc import sample_dispersions
    from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene

    B, tile = 1024, 512
    cfg = SimConfig(max_time=3.0)  # ~425 main-loop steps
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    scene_b, ic_b, _ = sample_dispersions(jax.random.PRNGKey(0), scene, ic, n=B)

    ref = simulate_summary_batch(scene_b, ic_b, cfg)
    ref_apo = np.asarray(ref.apogee_altitude)
    steps = int(np.asarray(ref.n_steps).max())

    out = {"batch": B, "tile": tile, "steps": steps,
           "device": str(jax.devices()[0])}

    def get_apo(res):
        return np.asarray(res["apogee_altitude"] if isinstance(res, dict)
                          else res.apogee_altitude)

    def bench(name, fn):
        t0 = time.time()
        apo = get_apo(fn())
        compile_and_run = time.time() - t0
        t0 = time.time()
        apo = get_apo(fn())
        warm = time.time() - t0
        out[name] = {
            "first_call_s": round(compile_and_run, 1),
            "warm_s": round(warm, 3),
            "ms_per_step": round(1e3 * warm / steps, 3),
            "max_abs_delta_vs_xla_m": float(np.abs(apo - ref_apo).max()),
        }
        print(name, json.dumps(out[name]), flush=True)

    bench("component_kernel", lambda: simulate_summary_component(
        scene_b, ic_b, scene, cfg, tile=tile))
    bench("composite_kernel", lambda: simulate_summary_pallas(
        scene_b, ic_b, scene, cfg, tile=128))

    path = f"/root/repo/PALLAS_{round_tag}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "r02")
