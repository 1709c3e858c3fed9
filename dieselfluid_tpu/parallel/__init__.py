"""Multi-chip distribution: device meshes, particle sharding, halo exchange."""

from dieselfluid_tpu.parallel.sharding import (  # noqa: F401
    particle_mesh,
    shard_state,
    sharded_train_step,
)
