"""Reference-schema results dict for a single flight.

The reference's result-dict contract is defined at
`/root/reference/rocket_simulation/simulator.py:554-583` (state histories +
derived histories + headline metrics), extended with rail diagnostics
(`simulator.py:276`) and scene metadata (`simulator.py:279-292`). The
post-hoc CLIs (`analyze_outlier.py:18-49`) read exactly these keys, so this
module is the compatibility boundary: everything a reference user's tooling
expects comes out of ``to_results_dict``.

Array layout parity: the reference stores state histories as ``[3, T]`` /
``[4, T]`` (solution.y slices); we record time-major ``[T, 3]`` on device
and transpose here, on the host, once.
"""

from __future__ import annotations

import numpy as np

from ..engine.config import SimConfig
from ..engine.simulate import FlightSummary, Trajectory
from ..models.scene import Scene
from ..utils.serialize import object_to_serializable_dict

__all__ = ["to_results_dict"]


def to_results_dict(
    scene: Scene,
    summary: FlightSummary,
    trajectory: Trajectory,
    cfg: SimConfig = SimConfig(),
    initial_conditions=None,
    lane: int | None = None,
) -> dict:
    """Build the reference-schema results dict from one simulated flight.

    ``lane``: if the inputs are batched ([B, ...] leaves), select this lane.
    """
    def pick(x):
        x = np.asarray(x)
        return x[lane] if lane is not None else x

    valid = pick(trajectory.valid).astype(bool)
    n = int(valid.sum())  # includes the rail-exit sample at index 0

    def hist(x):
        return pick(x)[:n]

    time = hist(trajectory.time)
    position = hist(trajectory.position)  # [T, 3]
    velocity = hist(trajectory.velocity)
    quaternion = hist(trajectory.quaternion)
    omega = hist(trajectory.angular_velocity)
    prop = hist(trajectory.propellant_fraction)
    d = {k: hist(v) for k, v in trajectory.derived.items()}

    results = {
        "time": time,
        "position": position.T,
        "velocity": velocity.T,
        "quaternion": quaternion.T,
        "angular_velocity": omega.T,
        "propellant_fraction": prop,
        "mass": d["mass"],
        "moments_of_inertia": np.stack([d["Ixx"], d["Iyy"], d["Izz"]]),
        "altitude": d["altitude"],
        "speed": d["speed"],
        "euler_angles": d["euler_angles"].T,
        "center_of_mass": d["center_of_mass"],
        "thrust": d["thrust"],
        "drag": d["drag"],
        "cd": d["cd"],
        "cl": d["cl"],
        "cm": d["cm"],
        "cp_location_dynamic": d["cp_location_dynamic"],
        "cp_location": float(np.asarray(scene.rocket.cp_location)),
        "thrust_curve_time": np.asarray(scene.motor.curve_time),
        "thrust_curve_thrust": np.asarray(scene.motor.curve_thrust_sl),
        "stability_margin": d["stability_margin"],
        "angle_of_attack": d["angle_of_attack"],
        "sideslip_angle": d["sideslip_angle"],
        "apogee_time": float(pick(summary.apogee_time)),
        "apogee_altitude": float(pick(summary.apogee_altitude)),
        "range": float(pick(summary.range)),
        "flight_time": float(pick(summary.flight_time)),
        # Rail diagnostics (`simulator.py:102-124,276`)
        "rail_exit_time": float(pick(summary.rail.rail_exit_time)),
        "rail_exit_position": pick(summary.rail.rail_exit_position),
        "rail_exit_velocity": pick(summary.rail.rail_exit_velocity),
        "rail_exit_speed": float(pick(summary.rail.rail_exit_speed)),
        "rail_exit_euler": pick(summary.rail.rail_exit_euler),
        "rail_exit_angle_of_attack": float(pick(summary.rail.rail_exit_angle_of_attack)),
        "rail_exit_sideslip": float(pick(summary.rail.rail_exit_sideslip)),
        "wind_at_exit": pick(summary.rail.wind_at_exit),
        # Scene metadata (`simulator.py:279-292`). Pass an UNBATCHED scene
        # (use mc.select_lane for a lane of a dispersed batch).
        "rocket_parameters": object_to_serializable_dict(scene.rocket),
        "motor_parameters": object_to_serializable_dict(scene.motor),
        "simulation_assumptions": {
            "max_time": cfg.max_time,
            "dt_initial": cfg.dt,
            # rtol/atol are vestigial in the reference (its solve_ivp was
            # replaced by fixed-step RK4, `simulator.py:21-22,196-209`) but
            # part of the result schema; kept for key parity.
            "rtol": 1e-4,
            "atol": 1e-7,
            "rail_length": cfg.rail_length,
        },
    }
    if initial_conditions is not None:
        ic = initial_conditions
        results["initial_conditions"] = {
            "position": np.asarray(pick(ic.position)).tolist(),
            "velocity": np.asarray(pick(ic.velocity)).tolist(),
            "attitude": np.asarray(pick(ic.attitude)).tolist(),
            "angular_velocity": np.asarray(pick(ic.angular_velocity)).tolist(),
        }
    wind = np.asarray(scene.wind.wind)
    if np.abs(wind).max() > 0:
        results["wind_profile"] = wind
        results["altitude_profile"] = np.asarray(scene.wind.altitudes)
    # MC trajectory sub-dict (`monte_carlo.py:298-302`)
    results["trajectory"] = {
        "time": time,
        "altitude": d["altitude"],
        "position": position,
    }
    return results
