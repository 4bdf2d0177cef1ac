from nestfit_tpu.parallel.mesh import (
    make_mesh,
    pad_to_multiple,
    pixel_sharding,
    replicated,
    shard_pixel_batch,
)
from nestfit_tpu.parallel.distributed import (
    host_chunk_name,
    host_pixel_shard,
    host_pixel_stripe,
    initialize_distributed,
)
