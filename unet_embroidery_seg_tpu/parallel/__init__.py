from unet_embroidery_seg_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch_arrays,
)

__all__ = ["batch_sharding", "make_mesh", "replicate", "shard_batch_arrays"]
