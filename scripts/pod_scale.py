"""Pod-scale Monte Carlo: N dispersed lanes sharded over a device mesh.

BASELINE.json config 5 (10M dispersions over a v5e mesh). The lane axis is
the only parallelism in this domain (SURVEY.md §2): lanes shard across the
mesh with zero communication until the statistics reduction, which runs as
shard_map psum/all_gather collectives over ICI.

Scales with whatever devices exist: one real chip today, a v5e-8 later, or
a virtual CPU mesh for validation:

  JAX_PLATFORMS=cpu python scripts/pod_scale.py 4096 --devices 8
  PYTHONPATH=.:/root/.axon_site python scripts/pod_scale.py 10000000

Lanes are processed in per-call slabs (bounded device time + memory); each
slab's dispersions come from its own fold of the run key, so the result is
independent of slab size.
"""

import json
import sys
import time

import numpy as np


def main(total_lanes: int, n_devices: int | None = None,
         slab: int = 262_144, steps_cfg: float = 6.0, seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp

    if n_devices is not None:
        # Must happen before ANY backend query (device_count initializes the
        # backend, after which these knobs are immutable).
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", n_devices)
        except Exception:
            pass

    from erpl_monte_carlo_sim_tpu.engine import (
        InitialConditions, SimConfig, simulate_summary,
    )
    from erpl_monte_carlo_sim_tpu.mc import (
        outlier_mask, sample_dispersions, scene_in_axes,
    )
    from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene
    from erpl_monte_carlo_sim_tpu.parallel import (
        collective_stats, make_mesh, run_sharded_summaries,
    )

    mesh = make_mesh(n_devices=n_devices)
    n_dev = mesh.devices.size
    slab = max(n_dev, (slab // n_dev) * n_dev)
    cfg = SimConfig(max_time=steps_cfg)
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()

    key = jax.random.PRNGKey(seed)
    done_lanes = 0
    # accumulate global moments on host (exact), percentiles per-slab
    s0 = s1 = s2 = 0.0
    t_start = time.time()
    slab_idx = 0
    while done_lanes < total_lanes:
        n = min(slab, total_lanes - done_lanes)
        n = max(n_dev, (n // n_dev) * n_dev)
        scene_b, ic_b, _ = sample_dispersions(
            jax.random.fold_in(key, slab_idx), scene, ic, n=n
        )
        axes = scene_in_axes(scene, scene_b)
        summary = run_sharded_summaries(scene_b, ic_b, axes, cfg, mesh, n)
        valid, _ = outlier_mask(summary)
        # always-finite metric for the demo reduction
        st = collective_stats(
            summary.rail.rail_exit_speed, jnp.ones(n, bool), mesh
        )
        apo = np.asarray(summary.apogee_altitude)
        m = np.isfinite(apo)
        s0 += float(m.sum())
        s1 += float(apo[m].sum())
        s2 += float((apo[m] ** 2).sum())
        done_lanes += n
        slab_idx += 1
        print(f"  slab {slab_idx}: {done_lanes}/{total_lanes} lanes "
              f"(rail-exit mean {float(st['mean']):.2f} m/s across "
              f"{n_dev} devices)", flush=True)
    wall = time.time() - t_start
    mean = s1 / max(s0, 1)
    result = {
        "lanes": done_lanes,
        "devices": n_dev,
        "wall_s": round(wall, 1),
        "traj_per_s": round(done_lanes / wall, 1),
        "apogee_mean_at_cutoff": round(mean, 1),
        "apogee_std_at_cutoff": round(
            (max(s2 / max(s0, 1) - mean**2, 0.0)) ** 0.5, 1
        ),
    }
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    total = int(args[0]) if args else 1_048_576
    n_dev = None
    if "--devices" in sys.argv:
        n_dev = int(sys.argv[sys.argv.index("--devices") + 1])
    main(total, n_dev)
