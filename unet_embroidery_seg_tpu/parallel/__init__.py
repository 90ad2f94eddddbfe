from unet_embroidery_seg_tpu.parallel.mesh import (
    batch_sharding,
    global_batch_from_local,
    init_multihost,
    make_mesh,
    replicate,
    shard_batch_arrays,
)

__all__ = [
    "batch_sharding",
    "global_batch_from_local",
    "init_multihost",
    "make_mesh",
    "replicate",
    "shard_batch_arrays",
]
