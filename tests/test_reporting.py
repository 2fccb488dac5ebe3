"""Reporting chain: results-dict schema, report files, plots, post-hoc CLIs."""

import json
import os

import jax
import numpy as np
import pytest

from erpl_monte_carlo_sim_tpu.engine import InitialConditions, SimConfig, simulate_flight
from erpl_monte_carlo_sim_tpu.mc import MonteCarloAnalyzer, UncertaintyParams
from erpl_monte_carlo_sim_tpu.models import liquid_motor, nominal_scene
from erpl_monte_carlo_sim_tpu.reporting import (
    create_output_directory,
    plot_results,
    plot_single_simulation,
    plot_thrust_twr,
    plot_trajectory_cloud,
    plot_trajectory_cloud_3d,
    save_report,
    save_simulation_results,
    to_results_dict,
)

# ~5-min core-correctness tier (CLAUDE.md): goldens + engine basics.
pytestmark = pytest.mark.smoke


CFG = SimConfig(max_time=30.0)

# The reference's result-dict contract (`simulator.py:554-583` + rail +
# metadata keys). analyze_outlier.py reads these.
RESULT_KEYS = [
    "time", "position", "velocity", "quaternion", "angular_velocity",
    "propellant_fraction", "mass", "moments_of_inertia", "altitude", "speed",
    "euler_angles", "center_of_mass", "thrust", "drag", "cd", "cl", "cm",
    "cp_location_dynamic", "cp_location", "thrust_curve_time",
    "thrust_curve_thrust", "stability_margin", "angle_of_attack",
    "sideslip_angle", "apogee_time", "apogee_altitude", "range",
    "flight_time", "rail_exit_time", "rail_exit_speed", "rail_exit_euler",
    "rail_exit_angle_of_attack", "rail_exit_sideslip", "wind_at_exit",
    "rocket_parameters", "motor_parameters", "simulation_assumptions",
    "trajectory",
]


@pytest.fixture(scope="module")
def single_results():
    scene = nominal_scene(liquid_motor())
    ic = InitialConditions.vertical_launch()
    summary, traj = jax.jit(simulate_flight, static_argnums=2)(scene, ic, CFG)
    return to_results_dict(scene, summary, traj, CFG, initial_conditions=ic)


def test_results_dict_schema(single_results):
    for key in RESULT_KEYS:
        assert key in single_results, key
    r = single_results
    T = len(r["time"])
    assert r["position"].shape == (3, T)  # reference layout: [3, T]
    assert r["quaternion"].shape == (4, T)
    assert r["moments_of_inertia"].shape == (3, T)
    assert r["euler_angles"].shape == (3, T)
    assert r["mass"].shape == (T,)
    # histories consistent with state
    np.testing.assert_allclose(r["altitude"], r["position"][2, :], rtol=1e-12)
    np.testing.assert_allclose(
        r["speed"], np.linalg.norm(r["velocity"], axis=0), rtol=1e-9
    )
    assert r["initial_conditions"]["position"] == [0.0, 0.0, 10.0]


@pytest.fixture(scope="module")
def mc_run(tmp_path_factory):
    scene = nominal_scene(liquid_motor())
    # calm dispersions so lanes stay valid and plots have content
    calm = UncertaintyParams(wind_speed_range=(0.0, 0.5),
                             initial_attitude=(0.001, 0.001, 0.001))
    mc = MonteCarloAnalyzer(scene=scene, sim_config=CFG, uncertainty_params=calm)
    ic = InitialConditions.vertical_launch()
    analysis = mc.run_monte_carlo(ic, n_samples=16)
    out = create_output_directory(base=str(tmp_path_factory.mktemp("outputs")))
    return mc, analysis, out


def test_report_files(mc_run):
    mc, analysis, out = mc_run
    save_report(analysis, out, analyzer=mc)

    with open(os.path.join(out, "monte_carlo_report.json")) as f:
        report = json.load(f)
    # Reference report schema (`monte_carlo.py:484-501`)
    for key in ["timestamp", "simulation_summary", "apogee_altitude_stats",
                "range_stats", "flight_time_stats", "uncertainty_parameters",
                "parameter_ranges_observed", "rocket_parameters",
                "motor_parameters", "atmosphere_parameters",
                "wind_model_parameters", "performance"]:
        assert key in report, key
    ss = report["simulation_summary"]
    assert ss["total_simulations"] == analysis["n_samples"]
    assert 0 <= ss["success_rate"] <= 100
    assert len(report["apogee_altitude_stats"]["percentiles"]) == 5

    txt = open(os.path.join(out, "monte_carlo_report.txt")).read()
    assert "Monte Carlo Analysis Report" in txt
    assert "Apogee Altitude Statistics:" in txt
    assert "95% Confidence Interval" in txt
    # the additive percentile-CI line appears only with >= 2 valid lanes
    # (this fixture's 30 s window leaves ~1); the line itself is pinned by
    # test_txt_percentile_ci_line below
    assert "Performance Statistics:" in txt


def test_per_sim_exports_and_clis(mc_run, capsys):
    mc, analysis, out = mc_run
    n = save_simulation_results(mc, analysis, out, max_sims=4)
    assert n >= 1
    sims_dir = os.path.join(out, "simulation_results")
    files = sorted(os.listdir(sims_dir))
    assert files[0].startswith("sim_") and files[0].endswith(".json")

    with open(os.path.join(sims_dir, files[0])) as f:
        sim = json.load(f)
    for key in ["apogee_altitude", "time", "quaternion", "stability_margin",
                "parameters", "simulation_id"]:
        assert key in sim, key

    # Post-hoc CLIs consume the exports (L6 parity)
    from erpl_monte_carlo_sim_tpu.cli.find_max_apogee import main as find_max
    sim_id, max_apo = find_max(sims_dir)
    assert sim_id >= 0 and max_apo > 100.0

    from erpl_monte_carlo_sim_tpu.cli.analyze_outlier import main as analyze
    info = analyze(sims_dir, sim_id)
    assert info["apogee"] == pytest.approx(max_apo)
    assert info["max_quat_norm_drift"] < 1e-6  # renorm keeps it tight


def test_plots(mc_run, single_results):
    mc, analysis, out = mc_run
    p1 = plot_results(analysis, out)
    p2 = plot_trajectory_cloud(mc, analysis, out, max_trajectories=4)
    p3 = plot_trajectory_cloud_3d(mc, analysis, out, max_trajectories=4)
    p4 = plot_single_simulation(single_results, out)
    p5 = plot_thrust_twr(single_results, out)
    for p in [p1, p2, p3, p4, p5]:
        assert p is not None and os.path.exists(p) and os.path.getsize(p) > 10000


def test_report_structure_matches_committed_reference_artifact(mc_run):
    """Compare our monte_carlo_report.json structure against an actual
    committed reference report (`outputs/monte_carlo_20250726_150303`)."""
    import json as _json

    ref_path = ("/root/reference/rocket_simulation/outputs/"
                "monte_carlo_20250726_150303/monte_carlo_report.json")
    if not os.path.exists(ref_path):
        pytest.skip("reference artifact absent")
    with open(ref_path) as f:
        ref = _json.load(f)

    mc, analysis, out = mc_run
    report = save_report(analysis, out, analyzer=mc)

    # Top-level blocks
    for key in ref.keys():
        assert key in report, f"missing top-level report block: {key}"
    # Stats sub-structure
    for block in ["apogee_altitude_stats", "range_stats", "flight_time_stats"]:
        for stat in ref[block]:
            assert stat in report[block], (block, stat)
        assert len(report[block]["percentiles"]) == len(ref[block]["percentiles"])
    # Simulation summary + uncertainty blocks
    for k in ref["simulation_summary"]:
        assert k in report["simulation_summary"], k
    for k in ref["uncertainty_parameters"]:
        assert k in report["uncertainty_parameters"], k
    for k in ref["parameter_ranges_observed"]:
        assert k in report["parameter_ranges_observed"], k
    # Scene metadata blocks exist with names
    assert report["rocket_parameters"]["name"] == "Sounding Rocket"
    assert "name" in report["motor_parameters"]


def test_find_max_apogee_handles_null_and_empty(tmp_path):
    """Null apogees must not abort the scan; an empty/invalid directory must
    report no result instead of sim_-1."""
    import json as _json

    from erpl_monte_carlo_sim_tpu.cli.find_max_apogee import main as fma

    d = tmp_path / "sims"
    d.mkdir()
    (d / "sim_0.json").write_text(_json.dumps({"apogee_altitude": None}))
    (d / "sim_1.json").write_text(
        _json.dumps({"apogee_altitude": 1234.5, "simulation_id": 1})
    )
    sim, apo = fma(str(d))
    assert sim == 1 and apo == 1234.5
    empty = tmp_path / "none"
    empty.mkdir()
    assert fma(str(empty)) == (None, None)


def test_txt_percentile_ci_line(tmp_path):
    """The additive percentile-CI report line: written when the stats
    block carries finite CIs, silently absent when they are NaN (n < 2
    valid lanes — false precision would be worse than no line)."""
    from erpl_monte_carlo_sim_tpu.reporting.report import _write_txt_report

    stats = {
        "mean": 5000.0, "std": 100.0, "min": 4700.0, "max": 5300.0,
        "percentiles": [4800.0, 4900.0, 5000.0, 5100.0, 5200.0],
        "percentile_ci": [[4780.0, 4820.0], [4880.0, 4920.0],
                          [4985.0, 5015.0], [5080.0, 5120.0],
                          [5175.0, 5225.0]],
    }
    report = {
        "timestamp": "t",
        "simulation_summary": {"total_simulations": 100,
                               "failed_simulations": 0,
                               "outlier_simulations": 0,
                               "success_rate": 100.0},
        "apogee_altitude_stats": stats,
        "range_stats": stats,
        "flight_time_stats": stats,
    }
    _write_txt_report(report, str(tmp_path))
    txt = open(os.path.join(str(tmp_path), "monte_carlo_report.txt")).read()
    assert "Percentile sampling CIs (95%): p5 [4780.0, 4820.0], " \
           "p50 [4985.0, 5015.0], p95 [5175.0, 5225.0] m" in txt

    nan = float("nan")
    stats_nan = dict(stats, percentile_ci=[[nan, nan]] * 5)
    report_nan = dict(report, apogee_altitude_stats=stats_nan,
                      range_stats=stats_nan, flight_time_stats=stats_nan)
    out2 = os.path.join(str(tmp_path), "nan")
    os.makedirs(out2)
    _write_txt_report(report_nan, out2)
    txt2 = open(os.path.join(out2, "monte_carlo_report.txt")).read()
    assert "Percentile sampling CIs" not in txt2
    # legacy stats blocks without the key (old checkpoints) still render
    stats_old = {k: v for k, v in stats.items() if k != "percentile_ci"}
    report_old = dict(report, apogee_altitude_stats=stats_old,
                      range_stats=stats_old, flight_time_stats=stats_old)
    out3 = os.path.join(str(tmp_path), "old")
    os.makedirs(out3)
    _write_txt_report(report_old, out3)
    assert "95% Confidence Interval" in open(
        os.path.join(out3, "monte_carlo_report.txt")).read()
