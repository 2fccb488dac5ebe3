"""First-order metric sensitivities / variance budgets via reverse passes.

The reference answers "which dispersion drives apogee spread?" only
empirically — run the Monte Carlo, eyeball `parameter_ranges_observed` and
the scatter plots (`monte_carlo.py:400-473`). Because this engine is
differentiable end-to-end (``engine.diff``), the same question has a
first-order analytic answer: ONE reverse pass through the full 6DOF flight
yields d(apogee)/d(channel) for every dispersion channel simultaneously,
and pairing each gradient with its dispersion sigma gives the per-channel
apogee-sigma contribution (a linearized variance budget):

    sigma_apogee^2  ~=  sum_i (d apogee / d c_i)^2 * sigma_i^2

The perturbation semantics per channel mirror ``mc.sample_dispersions``
exactly (mass scales dry+prop together; the motor re-syncs burn time;
mdot follows thrust for solids but draws its own multiplier for liquids;
density multiplies the working ``density_scale``) so the linearization is
of the SAME map the Monte Carlo samples.

This linearization is one of THREE sensitivity views the package offers,
in increasing order of cost and generality: (1) this CLI's default mode —
gradients x sigmas, one reverse pass, local and first-order only; (2) the
control-variate shares (``mc.cv`` — the measured linear-response fraction
of an actual Monte Carlo run); (3) ``--sobol`` — full variance-based
Sobol' indices (``mc.sobol_indices``), which also capture interactions
and the AR(1) wind-turbulence group that the other two cannot see, at
(k_groups + 2) x n simulations.

Usage:
  python -m erpl_monte_carlo_sim_tpu.cli.sensitivity [max_time] [--solid]
  python -m erpl_monte_carlo_sim_tpu.cli.sensitivity [max_time] [--solid] \
      --sobol [n_lanes]
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

from ..engine import InitialConditions, SimConfig
from ..engine.diff import DIFF_METRICS, simulate_metrics_diff
from ..mc.dispersions import UncertaintyParams
from ..models.scene import Scene

__all__ = ["metric_sensitivities", "apogee_sensitivities", "variance_budget"]


# The differentiated channels, in report order. Each is a scalar "offset
# from nominal": multipliers sit at 1.0, additive offsets at 0.0.
CHANNELS = (
    "mass_multiplier",
    "thrust_multiplier",
    "flow_multiplier",
    "density_multiplier",
    "pitch_offset",
    "wind_u_offset",
)


def _perturbed_scene(scene: Scene, ic: InitialConditions, c: dict):
    """Apply one scalar per channel with ``mc.sample_dispersions`` semantics
    (`dispersions.py:173-197`, `monte_carlo.py:225-260`)."""
    rocket = scene.rocket.replace(
        dry_mass=scene.rocket.dry_mass * c["mass_multiplier"],
        propellant_mass=scene.rocket.propellant_mass * c["mass_multiplier"],
    )
    # mdot_follows_thrust is a STATIC field (struct.field(pytree_node=False))
    mdot_mult = (
        c["thrust_multiplier"] if scene.motor.mdot_follows_thrust
        else c["flow_multiplier"]
    )
    new_prop = scene.rocket.propellant_mass * c["mass_multiplier"]
    new_mdot = scene.motor.mass_flow_rate * mdot_mult
    motor = scene.motor.replace(
        thrust_scale=scene.motor.thrust_scale * c["thrust_multiplier"],
        mass_flow_rate=new_mdot,
        propellant_mass=new_prop,
        burn_time=new_prop / new_mdot,
    )
    atmosphere = scene.atmosphere.replace(
        density_scale=scene.atmosphere.density_scale * c["density_multiplier"]
    )
    offset = jnp.stack(
        [c["wind_u_offset"], jnp.zeros_like(c["wind_u_offset"]),
         jnp.zeros_like(c["wind_u_offset"])]
    )
    wind = scene.wind.replace(wind=scene.wind.wind + offset)
    att = jnp.asarray(ic.attitude) + jnp.stack(
        [jnp.zeros_like(c["pitch_offset"]), c["pitch_offset"],
         jnp.zeros_like(c["pitch_offset"])]
    )
    ic2 = ic.replace(attitude=att)
    scene2 = Scene(rocket=rocket, motor=motor, atmosphere=atmosphere,
                   wind=wind, wind_model=scene.wind_model)
    return scene2, ic2


def metric_sensitivities(
    scene: Scene, ic: InitialConditions, cfg: SimConfig = None,
    metric: str = "apogee_altitude", **kw
) -> tuple:
    """(metric value, {channel: d(metric)/d(channel)}) in ONE reverse pass —
    every dispersion channel's gradient comes out of the same backward sweep.
    ``metric`` is any of ``engine.diff.DIFF_METRICS``."""
    cfg = cfg or SimConfig(max_time=120.0)
    if metric not in DIFF_METRICS:
        raise ValueError(f"metric must be one of {DIFF_METRICS}, got {metric!r}")

    def f(c):
        s2, ic2 = _perturbed_scene(scene, ic, c)
        return simulate_metrics_diff(s2, ic2, cfg, **kw)[metric]

    nominal = {
        k: jnp.asarray(1.0 if k.endswith("multiplier") else 0.0)
        for k in CHANNELS
    }
    value, grads = jax.value_and_grad(f)(nominal)
    return value, grads


def apogee_sensitivities(
    scene: Scene, ic: InitialConditions, cfg: SimConfig = None, **kw
) -> tuple:
    """(apogee, {channel: d(apogee)/d(channel)}) in one reverse pass."""
    return metric_sensitivities(scene, ic, cfg, metric="apogee_altitude", **kw)


def _channel_sigmas(scene: Scene, params: UncertaintyParams) -> dict:
    """Per-channel dispersion sigmas as the Monte Carlo actually draws them
    (`dispersions.py:145-171`). The wind u-offset sigma is the standard
    deviation of the x component of a uniform-speed, uniform-direction
    offset u = S cos(theta), computed for the ACTUAL direction range (not
    the isotropic special case): Var(u) = E[S^2]E[cos^2 t] - (E[S]E[cos t])^2
    with E[S]=(a+b)/2, E[S^2]=(a^2+ab+b^2)/3, E[cos t]=(sin d1 - sin d0)/W,
    E[cos^2 t]=1/2 + (sin 2d1 - sin 2d0)/(4W). For the default full-circle
    range this reduces to sqrt(E[S^2]/2)."""
    import math

    a, b = params.wind_speed_range
    d0, d1 = params.wind_direction_range
    W = max(d1 - d0, 1e-12)
    e_s = 0.5 * (a + b)
    e_s2 = (a * a + a * b + b * b) / 3.0
    e_c = (math.sin(d1) - math.sin(d0)) / W
    e_c2 = 0.5 + (math.sin(2 * d1) - math.sin(2 * d0)) / (4.0 * W)
    wind_u_sigma = float(math.sqrt(max(e_s2 * e_c2 - (e_s * e_c) ** 2, 0.0)))
    return {
        "mass_multiplier": float(params.mass_uncertainty),
        # the acting thrust sigma is the motor's own (reference quirk:
        # the analyzer's 0.03 is recorded but unused, `motor.py:95-125`)
        "thrust_multiplier": float(scene.motor.thrust_uncertainty),
        "flow_multiplier": (
            0.0 if bool(scene.motor.mdot_follows_thrust)
            else float(scene.motor.mass_flow_uncertainty)
        ),
        "density_multiplier": float(params.atmospheric_density_uncertainty),
        "pitch_offset": float(params.initial_attitude[1]),
        "wind_u_offset": wind_u_sigma,
    }


def variance_budget(
    scene: Scene, ic: InitialConditions, cfg: SimConfig = None,
    params: UncertaintyParams = UncertaintyParams(),
    metric: str = "apogee_altitude", **kw
) -> dict:
    """Linearized variance budget of one metric over the dispersion channels.

    Returns {"apogee": m, "channels": {name: {gradient, sigma,
    apogee_sigma_contribution}}, "apogee_sigma_first_order": m} (the legacy
    apogee-named keys are kept for the default metric; other metrics use
    metric-named keys). First-order only: wind TURBULENCE (the AR(1)
    profile) and IC offsets other than pitch are omitted; compare against
    the Monte Carlo sigma to see how much of the spread is linear response
    vs. nonlinear/turbulent.
    """
    value, grads = metric_sensitivities(scene, ic, cfg, metric=metric, **kw)
    sigmas = _channel_sigmas(scene, params)
    # key names: legacy apogee-suffixed keys for the default metric (the
    # pre-round-3 public schema), generic names otherwise
    legacy = metric == "apogee_altitude"
    k_contrib = "apogee_sigma_contribution_m" if legacy else "sigma_contribution"
    channels = {}
    total_var = 0.0
    for name in CHANNELS:
        g = float(grads[name])
        s = sigmas[name]
        contrib = abs(g) * s
        total_var += contrib * contrib
        channels[name] = {"gradient": g, "sigma": s, k_contrib: contrib}
    out = {
        "metric": metric,
        "channels": channels,
    }
    if legacy:
        out["apogee_m"] = float(value)
        out["apogee_sigma_first_order_m"] = float(jnp.sqrt(total_var))
    else:
        out["value"] = float(value)
        out["sigma_first_order"] = float(jnp.sqrt(total_var))
    return out


def main(argv=None) -> dict:
    argv = sys.argv[1:] if argv is None else argv
    from ..models import liquid_motor, nominal_scene, solid_motor

    max_time = float(argv[0]) if argv and not argv[0].startswith("-") else 120.0
    motor = solid_motor() if "--solid" in argv else liquid_motor()
    scene = nominal_scene(motor)
    ic = InitialConditions.vertical_launch()
    cfg = SimConfig(max_time=max_time)
    if "--sobol" in argv:
        from ..mc.sobol_indices import sobol_indices

        i = argv.index("--sobol")
        n = (int(argv[i + 1]) if i + 1 < len(argv)
             and not argv[i + 1].startswith("-") else 1024)
        out = sobol_indices(scene, ic, cfg, n=n, n_boot=200)
    else:
        metrics = ("apogee_altitude", "range", "flight_time")
        out = {
            m: variance_budget(scene, ic, cfg, metric=m) for m in metrics
        }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
