"""Math kernel: quaternions, frames, interpolation (pure jnp, vmap-safe)."""

from .frames import (
    GAMMA_AIR,
    R_AIR,
    angle_of_attack,
    mach_number,
    sideslip_angle,
    wind_to_body_matrix,
)
from .interp import interpolate_1d, interpolate_vec
from .quaternion import (
    angular_velocity_to_quaternion_rate,
    euler_to_quaternion,
    normalize_quaternion,
    quaternion_multiply,
    quaternion_to_euler,
    quaternion_to_rotation_matrix,
    rotate_by_matrix,
    rotate_by_matrix_t,
)

__all__ = [
    "GAMMA_AIR", "R_AIR", "angle_of_attack", "mach_number", "sideslip_angle",
    "wind_to_body_matrix", "interpolate_1d", "interpolate_vec",
    "angular_velocity_to_quaternion_rate", "euler_to_quaternion",
    "normalize_quaternion", "quaternion_multiply", "quaternion_to_euler",
    "quaternion_to_rotation_matrix", "rotate_by_matrix", "rotate_by_matrix_t",
]
