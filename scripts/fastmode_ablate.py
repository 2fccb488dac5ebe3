"""Fast-mode throughput ablation (VERDICT r3 item 3).

Context (r3): parity mode sits at 99.4% of the HBM roofline; fast mode
(wind_eval_per_step + wind_table_bf16) reaches ~272k traj/s at B=262144 =
~27% of peak under the r2 byte model. The compiled-HLO fusion dump
(this round) shows the real per-step traffic at fusion boundaries:

  ~960 MB/step total at the top level of the main while body, of which
  the bf16 [3,100,B] wind-table read (fusion.169) is 161 MB — the other
  ~800 MB/step is inter-fusion [B] f32 spill traffic across ~60 fusions
  (select_n/clip-heavy event logic, cos/sin strands, sqrt guards).

Levers measured here, pay-or-retire:
  vmem32/64/96  — xla_tpu_scoped_vmem_limit_kib: bigger scoped VMEM lets
                  the fusion planner build larger fusions (fewer [B]
                  round-trips).
  flags         — probe list of public XLA TPU flags (unknown names fail
                  the remote compile loudly and are reported as skipped).
  unroll2/4     — SimConfig.unroll: K masked sub-steps per while
                  iteration (identical results; fewer loop-carry
                  materializations per step).
  sharedtable   — [3,100,1] broadcast wind table: attribution run that
                  removes per-lane table bytes entirely (NOT a valid MC
                  config — bounds how much of the step is table read).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fastmode_ablate.py [variant ...]
Writes one JSON line per variant to stdout.
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig  # noqa: E402
from erpl_monte_carlo_sim_tpu.engine.batch import (  # noqa: E402
    _run_components,
    prepare_batch,
)
from erpl_monte_carlo_sim_tpu.mc import sample_dispersions  # noqa: E402
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene  # noqa: E402

import os

B = int(os.environ.get("ABLATE_B", 262144))
FAST = dict(max_time=6.0, wind_eval_per_step=True, wind_table_bf16=True)

PROBE_FLAGS = [
    {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    {"xla_tpu_memory_limit_slack_factor": "0.95"},
    {"xla_tpu_enable_aggressive_loop_fusion": "true"},
    {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"},
    {"xla_tpu_vector_load_fusion_mode": "2"},
    {"xla_tpu_enable_vmem_to_vmem_dmas": "true"},
    {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"},
    {"xla_tpu_rwb_fusion": "true"},
    {"xla_tpu_enable_dot_strength_reduction": "false"},
]


def setup(cfg, shared_table=False, modes=None):
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    scene_b, ic_b, _ = sample_dispersions(
        jax.random.PRNGKey(0), scene, ic, n=B)
    if modes:
        # r5: mode-compressed per-lane tables (models.wind.WindModes) —
        # the table-byte lever named by the r4 conclusion.
        from erpl_monte_carlo_sim_tpu.models import (compress_wind,
                                                     wind_mode_basis)

        q = wind_mode_basis(scene.wind_model,
                            np.asarray(scene_b.wind.altitudes), modes)
        scene_b = scene_b.replace(wind=compress_wind(scene_b.wind, q))
    scene_nw, grid, wT, ics = prepare_batch(scene_b, ic_b)
    if cfg.wind_table_bf16:
        from erpl_monte_carlo_sim_tpu.engine.batch import _bf16_tables

        wT = _bf16_tables(wT)
    if shared_table:
        wT = wT[:, :, :1]  # broadcastable shared table (attribution only)
    return scene_nw, grid, wT, ics


def run_variant(name, cfg, compiler_options=None, shared_table=False,
                modes=None):
    scene_nw, grid, wT, ics = setup(cfg, shared_table, modes)
    t_c0 = time.time()
    try:
        lowered = _run_components.lower(scene_nw, grid, wT, cfg, ics)
        comp = lowered.compile(compiler_options=compiler_options)
    except Exception as e:
        print(json.dumps({"variant": name, "error": str(e)[:300]}),
              flush=True)
        return None
    compile_s = time.time() - t_c0
    # warm + 3 timed reps; readback is the sync (block_until_ready is a
    # no-op on axon)
    r = comp(scene_nw, grid, wT, ics)
    steps = int(np.asarray(r["n_steps"]).max())
    times = []
    for _ in range(3):
        t0 = time.time()
        r = comp(scene_nw, grid, wT, ics)
        np.asarray(r["apogee_altitude"])
        times.append(time.time() - t0)
    t = min(times)
    out = {
        "variant": name,
        "traj_per_s": round(B / t, 1),
        "wall_s": round(t, 4),
        "steps": steps,
        "compile_s": round(compile_s, 1),
        "apogee_mean": round(
            float(np.nanmean(np.asarray(r["apogee_altitude"], np.float64))),
            2),
        "options": compiler_options,
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    which = set(sys.argv[1:])

    def want(v):
        return not which or v in which

    if want("baseline"):
        run_variant("baseline", SimConfig(**FAST))
    if want("vmem"):
        for kib in (32768, 65536, 98304):
            run_variant(f"vmem{kib // 1024}", SimConfig(**FAST),
                        {"xla_tpu_scoped_vmem_limit_kib": str(kib)})
    if want("flags"):
        for f in PROBE_FLAGS:
            nm = "flag:" + ";".join(f"{k}={v}" for k, v in f.items())
            run_variant(nm, SimConfig(**FAST), f)
    if want("unroll"):
        for u in (2, 4):
            run_variant(f"unroll{u}", SimConfig(unroll=u, **FAST))
    if want("sharedtable"):
        run_variant("sharedtable", SimConfig(**FAST), shared_table=True)
    if want("rk2"):
        run_variant("rk2", SimConfig(integrator="rk2", **FAST))
    if want("rk2-eps"):
        run_variant("rk2_evalperstep_f32",
                    SimConfig(max_time=6.0, integrator="rk2",
                              wind_eval_per_step=True))
    if want("rk2-bf16"):
        run_variant("rk2_bf16_perstage",
                    SimConfig(max_time=6.0, integrator="rk2",
                              wind_table_bf16=True))
    if want("rk2-parity-wind"):
        # rk2 with parity wind semantics (isolates the integrator's gain)
        run_variant("rk2_paritywind",
                    SimConfig(max_time=6.0, integrator="rk2"))
    if want("parity"):
        run_variant("parity", SimConfig(max_time=6.0))
    if want("modes"):
        # r5: mode-compressed tables on top of the r4 champion (rk2+fast);
        # M = K + 2 aux columns, so table bytes scale ~(K+2)/100.
        for k in (12, 24, 48):
            run_variant(f"rk2_modes{k}",
                        SimConfig(integrator="rk2", **FAST), modes=k)
    if want("modes-rk4"):
        run_variant("rk4_modes24", SimConfig(**FAST), modes=24)
    if want("modes-f32"):
        # f32 scores: does bf16 still matter once bytes shrink 4x?
        run_variant("rk2_modes24_f32scores",
                    SimConfig(max_time=6.0, integrator="rk2",
                              wind_eval_per_step=True), modes=24)
    if want("modes-full"):
        # full-rank scores (M=100): isolates layout/matmul overhead from
        # the byte savings (same bytes as the table path, same math path
        # as modes)
        run_variant("rk2_modes_fullrank",
                    SimConfig(integrator="rk2", **FAST), modes=100)


if __name__ == "__main__":
    main()
