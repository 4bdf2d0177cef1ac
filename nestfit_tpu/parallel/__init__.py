from nestfit_tpu.parallel.mesh import (
    make_mesh,
    pad_to_multiple,
    pixel_sharding,
    replicated,
    shard_pixel_batch,
)
