from graph_wavenet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_state,
    support_sharding,
)
