"""Differentiable flight path: gradients through the full 6DOF integration.

The production hot paths use ``lax.while_loop`` (batch-level early exit),
which is not reverse-mode differentiable. This module provides a fixed-shape
``lax.scan`` formulation of the SAME physics — rail phase included — so
``jax.grad`` flows end-to-end: apogee sensitivity to thrust/mass/drag/wind,
gradient-based design sweeps, and the ``find_max_apogee`` use case as an
optimization instead of a file scan (capability the reference cannot offer;
its engine is NumPy, SURVEY.md §7 step 7).

Every step is rematerialized (``jax.checkpoint``) so a 60k-step reverse pass
fits in memory: residuals are recomputed per step instead of stored.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.atmosphere import atmosphere_properties, gravity_at
from ..models.motor import propellant_remaining, thrust_at
from ..models.rocket import aero_coefficients, mass_properties
from ..models.scene import Scene
from ..models.wind import wind_at_altitude
from ..ops.frames import mach_number
from ..ops.quaternion import quaternion_to_rotation_matrix
from .config import SimConfig
from .integrator import advance, init_carry
from .state import FlightState, InitialConditions, initial_state

__all__ = ["simulate_apogee_diff", "apogee_and_grad"]


def _rail_scan(scene: Scene, cfg: SimConfig, state0: FlightState, n_steps: int):
    """Rail phase as a fixed-length masked scan (differentiable twin of
    `rail.simulate_rail`; identical per-step math, `simulator.py:63-96`)."""
    quat = state0.quaternion
    R = quaternion_to_rotation_matrix(quat)
    direction = R[..., :, 0]
    dt = cfg.rail_dt
    speed0 = jnp.sum(state0.velocity * direction, axis=-1)
    zero = jnp.zeros_like(speed0)

    def step(carry, _):
        pos, speed, dist, t, frac, done = carry
        on_rail = ~done & (dist < cfg.rail_length) & (t < scene.motor.burn_time)

        mp = mass_properties(scene.rocket, frac)
        atm = atmosphere_properties(scene.atmosphere, pos[..., 2])
        wind = wind_at_altitude(scene.wind, pos[..., 2])
        rel_vel = direction * speed[..., None] - wind
        rel_speed = jnp.sum(rel_vel * direction, axis=-1)
        mach = mach_number(rel_vel, atm.temperature)
        coeffs = aero_coefficients(
            scene.rocket, mach, 0.0, 0.0,
            center_of_mass=mp.center_of_mass, power_on=True,
        )
        drag = 0.5 * atm.density * rel_speed**2 * coeffs.cd * scene.rocket.reference_area
        thrust = thrust_at(scene.motor, t, atm.pressure)
        g = gravity_at(scene.atmosphere, pos[..., 2])
        accel = (thrust - mp.mass * g - drag) / mp.mass

        new_speed = speed + accel * dt
        new_pos = pos + direction * (new_speed * dt)[..., None]
        new_dist = dist + new_speed * dt
        new_t = t + dt
        new_frac = propellant_remaining(scene.motor, new_t)

        sel = lambda a, b: jnp.where(on_rail, a, b)
        pos = jnp.where(on_rail[..., None], new_pos, pos)
        carry = (
            pos, sel(new_speed, speed), sel(new_dist, dist), sel(new_t, t),
            sel(new_frac, frac), done | ~on_rail,
        )
        return carry, None

    carry0 = (state0.position, speed0, zero, zero,
              state0.propellant_fraction, jnp.zeros_like(speed0, bool))
    (pos, speed, dist, t, frac, _), _ = jax.lax.scan(
        jax.checkpoint(step), carry0, None, length=n_steps
    )
    state = FlightState(
        position=pos,
        velocity=direction * speed[..., None],
        quaternion=quat,
        angular_velocity=state0.angular_velocity,
        propellant_fraction=frac,
    )
    return state, t


def simulate_apogee_diff(
    scene: Scene,
    ic: InitialConditions,
    cfg: SimConfig = SimConfig(),
    n_steps: int | None = None,
    rail_steps: int = 512,
) -> jnp.ndarray:
    """Apogee altitude via a fully differentiable fixed-shape integration.

    Same physics as ``simulate_summary`` (masked events, parachute latch,
    termination freezes the state); returns the running-max altitude, whose
    gradient flows through the step at which the max is attained.
    """
    if n_steps is None:
        n_steps = cfg.max_steps
    state0 = initial_state(ic)
    state_exit, rail_time = _rail_scan(scene, cfg, state0, rail_steps)
    carry0 = init_carry(state_exit, rail_time)

    def step(carry, _):
        t = carry.rail_time + carry.step.astype(carry.rail_time.dtype) * cfg.dt
        run = ~carry.events.done & (t < cfg.max_time)
        new_carry = advance(scene, cfg, carry)
        carry = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(run, run.shape + (1,) * (jnp.ndim(new) - jnp.ndim(run))),
                new, old,
            ),
            new_carry, carry,
        )
        return carry, None

    carry, _ = jax.lax.scan(jax.checkpoint(step), carry0, None, length=n_steps)
    return carry.events.max_altitude


def apogee_and_grad(scene: Scene, ic: InitialConditions,
                    cfg: SimConfig = SimConfig(), wrt: str = "motor.thrust_scale",
                    **kw):
    """Apogee and d(apogee)/d(scene.<wrt>) in one reverse pass.

    ``wrt`` is a dotted path into the scene pytree, e.g. "motor.thrust_scale",
    "rocket.dry_mass", "rocket.fin_span".
    """
    parts = wrt.split(".")

    def read(s):
        v = s
        for p in parts:
            v = getattr(v, p)
        return jnp.asarray(v, jnp.result_type(float))

    def write(s, v):
        objs = [s]
        for p in parts[:-1]:
            objs.append(getattr(objs[-1], p))
        child = objs[-1].replace(**{parts[-1]: v})
        for obj, p in zip(reversed(objs[:-1]), reversed(parts[:-1])):
            child = obj.replace(**{p: child})
        return child

    def f(v):
        return simulate_apogee_diff(write(scene, v), ic, cfg, **kw)

    v0 = read(scene)
    apogee, grad = jax.value_and_grad(f)(v0)
    return apogee, grad
