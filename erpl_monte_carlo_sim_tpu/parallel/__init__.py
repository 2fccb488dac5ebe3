"""Scale-out layer: device meshes, sharded MC execution, collective stats."""

from .mesh import (BATCH_AXIS, init_distributed, make_global_batch, make_mesh,
                   pad_to_devices, replicate, shard_batch)
from .sharded import (collective_cv_moments, collective_envelope,
                      collective_footprint, collective_footprint_moments,
                      collective_stats, collective_tail_carry,
                      collective_tail_extremes, collective_tail_reservoir,
                      run_sharded_summaries, tail_reservoir_from_carry)

__all__ = [
    "BATCH_AXIS", "make_mesh", "pad_to_devices", "replicate", "shard_batch",
    "collective_stats", "collective_footprint",
    "collective_footprint_moments", "collective_cv_moments",
    "collective_tail_extremes", "collective_tail_reservoir",
    "collective_tail_carry", "tail_reservoir_from_carry",
    "run_sharded_summaries",
    "collective_envelope",
    "init_distributed",
    "make_global_batch",
]
