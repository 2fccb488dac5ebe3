"""Aerodynamic angles, frame transforms, and flow quantities (vmap-safe).

Functional parity with `/root/reference/rocket_simulation/utils.py:147-205`,
written as branch-free jnp so they fuse into the jitted dynamics step.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math import arctan2

GAMMA_AIR = 1.4
R_AIR = 287.053  # J/(kg K)

__all__ = [
    "mach_number",
    "angle_of_attack",
    "sideslip_angle",
    "wind_to_body_matrix",
    "GAMMA_AIR",
    "R_AIR",
]


def mach_number(velocity: jnp.ndarray, temperature) -> jnp.ndarray:
    """Mach number from a velocity vector and static temperature.

    Parity: `utils.py:152-157` (gamma=1.4, R=287.053).
    ``velocity`` has shape ``(..., 3)``.
    """
    speed_of_sound = jnp.sqrt(GAMMA_AIR * R_AIR * temperature)
    return jnp.linalg.norm(velocity, axis=-1) / speed_of_sound


def angle_of_attack(velocity_body: jnp.ndarray) -> jnp.ndarray:
    """Signed angle of attack atan2(w, u); 0 when both u,w are ~0.

    Parity: `utils.py:160-164` — returns 0 only when |u|<1e-6 AND |w|<1e-6
    (note atan2(0, -eps) = pi, so the guard matters).
    """
    u = velocity_body[..., 0]
    w = velocity_body[..., 2]
    degenerate = (jnp.abs(u) < 1e-6) & (jnp.abs(w) < 1e-6)
    return jnp.where(degenerate, 0.0, arctan2(w, u))


def sideslip_angle(velocity_body: jnp.ndarray) -> jnp.ndarray:
    """Signed sideslip atan2(v, sqrt(u^2+w^2)); 0 when the xz speed is ~0.

    Parity: `utils.py:167-172`.
    """
    u = velocity_body[..., 0]
    v = velocity_body[..., 1]
    w = velocity_body[..., 2]
    v_xz = jnp.sqrt(u * u + w * w)
    return jnp.where(v_xz < 1e-6, 0.0, arctan2(v, v_xz))


def wind_to_body_matrix(alpha, beta) -> jnp.ndarray:
    """Rotation matrix from wind axes (x along relative wind) to body axes.

    Parity: `utils.py:175-205`. Positive alpha = nose-up, positive beta =
    nose-right. Returns shape ``(..., 3, 3)``.
    """
    alpha = jnp.asarray(alpha)
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    cb, sb = jnp.cos(beta), jnp.sin(beta)
    zero = jnp.zeros_like(ca * cb)
    row0 = jnp.stack([ca * cb, -sb * jnp.ones_like(ca), sa * cb], axis=-1)
    row1 = jnp.stack([ca * sb, cb * jnp.ones_like(ca), sa * sb], axis=-1)
    row2 = jnp.stack([-sa * jnp.ones_like(cb), zero, ca * jnp.ones_like(cb)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
