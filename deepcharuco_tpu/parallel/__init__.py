from deepcharuco_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_frames,
    replicate,
    sharded_train_step,
    sharded_synth_train_program,
    synth_scan_program,
    sharded_inference,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "shard_frames",
    "replicate",
    "sharded_train_step",
    "sharded_synth_train_program",
    "synth_scan_program",
    "sharded_inference",
]
