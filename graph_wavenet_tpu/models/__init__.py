from graph_wavenet_tpu.models.gwnet import (  # noqa: F401
    apply_gwnet,
    init_gwnet,
)
from graph_wavenet_tpu.models.gwnet_diff_g import (  # noqa: F401
    apply_gwnet_diff_g,
    init_gwnet_diff_g,
    svd_nodevecs_batched,
)
