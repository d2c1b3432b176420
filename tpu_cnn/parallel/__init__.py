from tpu_cnn.parallel.mesh import (
    MeshEngine,
    make_mesh,
    shard_batch,
    sharded_forward,
    sharded_detect,
)

__all__ = [
    "MeshEngine",
    "make_mesh",
    "shard_batch",
    "sharded_forward",
    "sharded_detect",
]
