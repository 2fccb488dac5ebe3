"""JSON serialization helpers.

Parity with `/root/reference/rocket_simulation/utils.py:208-223`, extended to
handle jax.Array leaves and pytree dataclasses (our scene objects) so report
files keep the same schema as the reference's ``object_to_serializable_dict``
dumps of its attribute-bag classes.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

__all__ = ["to_serializable", "object_to_serializable_dict"]


def to_serializable(obj: Any) -> Any:
    """Recursively convert numpy/jax/dataclass values to JSON-safe types."""
    if isinstance(obj, jax.Array):
        obj = np.asarray(obj)
    if isinstance(obj, np.ndarray):
        if obj.ndim == 0:
            return obj.item()
        return obj.tolist()
    if isinstance(obj, (np.floating, np.integer, np.bool_)):
        return obj.item()
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {
            f.name: to_serializable(getattr(obj, f.name))
            for f in dataclasses.fields(obj)
        }
    if isinstance(obj, dict):
        return {k: to_serializable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [to_serializable(v) for v in obj]
    if hasattr(obj, "_asdict"):  # NamedTuple
        return {k: to_serializable(v) for k, v in obj._asdict().items()}
    return obj


def object_to_serializable_dict(obj: Any) -> dict:
    """Serialize an object's public state (dataclass fields or __dict__)."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return to_serializable(obj)
    return {k: to_serializable(v) for k, v in vars(obj).items()}
