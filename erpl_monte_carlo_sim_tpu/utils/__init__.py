"""Serialization and misc utilities."""

from .serialize import object_to_serializable_dict, to_serializable

__all__ = ["to_serializable", "object_to_serializable_dict"]
