"""Multi-chip parallelism: meshes, sharded training, ring collectives."""

from pointcloud_tpu.parallel.distributed import (
    global_mesh,
    initialize,
    process_local_batch_slice,
)
from pointcloud_tpu.parallel.mesh import data_mesh, replicate, shard_batch
from pointcloud_tpu.parallel.ring import ring_chamfer

__all__ = [
    "data_mesh",
    "replicate",
    "shard_batch",
    "ring_chamfer",
    "initialize",
    "global_mesh",
    "process_local_batch_slice",
]
