"""Multi-device (mesh) execution: sharded SIS/SMC + distributed resampling.

The reference's only 'distributed' machinery is a two-process ZeroMQ pipeline
(SURVEY.md §2.7); here everything is XLA collectives over a
``jax.sharding.Mesh``.
"""

from .mesh import (
    PARTICLE_AXIS,
    particle_mesh,
    particle_sharding,
    replicated_sharding,
)
from .resampling import (
    global_ess,
    global_log_mean_exp,
    local_systematic_ancestors,
    ring_systematic_resample,
    sharded_systematic_ancestors,
)
from .distributed import initialize_multihost, is_multihost, virtual_devices
from .sis import sis_sharded
from .smc import ShardedSMCResult, smc_sharded

__all__ = [
    "initialize_multihost",
    "is_multihost",
    "virtual_devices",
    "PARTICLE_AXIS",
    "particle_mesh",
    "particle_sharding",
    "replicated_sharding",
    "sis_sharded",
    "smc_sharded",
    "ShardedSMCResult",
    "global_ess",
    "global_log_mean_exp",
    "ring_systematic_resample",
    "sharded_systematic_ancestors",
    "local_systematic_ancestors",
]
