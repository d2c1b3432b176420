from tpu_cnn.parallel.mesh import (
    MeshEngine,
    make_mesh,
    shard_batch,
    sharded_forward,
    sharded_detect,
)
from tpu_cnn.parallel.pipeline import (
    make_pipeline_mesh,
    pipelined_forward,
    split_stages,
)
from tpu_cnn.parallel.pipeline_train import (
    make_pipeline_train_step,
    pipelined_float_logits,
)
from tpu_cnn.parallel.spatial import (
    check_spatial_split,
    make_spatial_mesh,
    spatial_forward,
)
from tpu_cnn.parallel.spatial_train import (
    make_spatial_train_step,
    spatial_float_logits,
)
from tpu_cnn.parallel.multihost import (
    MultiHostEngine,
    allgather_to_host,
    global_batches,
    global_image_batch,
    init_multihost,
    is_primary,
    local_rows,
)

__all__ = [
    "MeshEngine",
    "make_mesh",
    "shard_batch",
    "sharded_forward",
    "sharded_detect",
    "make_pipeline_mesh",
    "pipelined_forward",
    "split_stages",
    "make_pipeline_train_step",
    "pipelined_float_logits",
    "check_spatial_split",
    "make_spatial_mesh",
    "spatial_forward",
    "make_spatial_train_step",
    "spatial_float_logits",
    "MultiHostEngine",
    "allgather_to_host",
    "global_batches",
    "global_image_batch",
    "local_rows",
    "init_multihost",
    "is_primary",
]
