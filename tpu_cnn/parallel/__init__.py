from tpu_cnn.parallel.mesh import (
    make_mesh,
    shard_batch,
    sharded_forward,
    sharded_detect,
)

__all__ = ["make_mesh", "shard_batch", "sharded_forward", "sharded_detect"]
