from pistoseg_tpu.parallel.mesh import (  # noqa: F401
    build_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    pad_to_multiple,
)
