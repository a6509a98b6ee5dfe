from graph_wavenet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_state,
    support_sharding,
)
from graph_wavenet_tpu.parallel.pipeline import (  # noqa: F401
    make_pipeline_mesh,
    make_pipeline_train_step,
    pipeline_apply,
)
