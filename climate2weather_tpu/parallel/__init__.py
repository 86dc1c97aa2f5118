from climate2weather_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicated,
    batch_sharding,
    window_sharding,
    shard_batch,
)
