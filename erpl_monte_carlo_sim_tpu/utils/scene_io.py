"""Scene configuration serialization (JSON round-trip).

The reference has no config system — every parameter is a hard-coded
attribute bag mutated ad hoc (SURVEY.md §5.6). Here a Scene is a frozen
pytree, so configuration IS data: this module round-trips a scene through
JSON for experiment configs, report reproducibility, and versioning.
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from ..models.atmosphere import AtmosphereParams
from ..models.motor import MotorParams
from ..models.rocket import RocketParams
from ..models.scene import Scene
from ..models.wind import WindField, WindModelParams
from .serialize import to_serializable

__all__ = ["scene_to_dict", "scene_from_dict", "save_scene", "load_scene"]


def scene_to_dict(scene: Scene) -> dict:
    return {
        "rocket": to_serializable(scene.rocket),
        "motor": to_serializable(scene.motor),
        "atmosphere": to_serializable(scene.atmosphere),
        "wind": to_serializable(scene.wind),
        "wind_model": to_serializable(scene.wind_model),
    }


def _build(cls, data: dict):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for name, value in data.items():
        if name not in fields:
            continue
        f = fields[name]
        if not f.metadata.get("pytree_node", True):
            kwargs[name] = value  # static field: plain python value
        elif isinstance(value, list):
            kwargs[name] = jnp.asarray(np.asarray(value))
        else:
            kwargs[name] = value
    return cls(**kwargs)


def scene_from_dict(data: dict) -> Scene:
    return Scene(
        rocket=_build(RocketParams, data["rocket"]),
        motor=_build(MotorParams, data["motor"]),
        atmosphere=_build(AtmosphereParams, data["atmosphere"]),
        wind=_build(WindField, data["wind"]),
        wind_model=_build(WindModelParams, data["wind_model"]),
    )


def save_scene(scene: Scene, path: str) -> None:
    with open(path, "w") as f:
        json.dump(scene_to_dict(scene), f, indent=1)


def load_scene(path: str) -> Scene:
    with open(path) as f:
        return scene_from_dict(json.load(f))
