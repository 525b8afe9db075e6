from deepcharuco_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    sharded_train_step,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "sharded_train_step"]
