from graph_wavenet_tpu.data.device_loader import (  # noqa: F401
    DeviceArrayLoader,
    DeviceWindowLoader,
)
from graph_wavenet_tpu.data.loader import (  # noqa: F401
    DataLoader,
    DataLoaderSyn,
    loader_cls,
    sharded_iterator,
)
from graph_wavenet_tpu.data.prefetch import prefetch_to_device  # noqa: F401
from graph_wavenet_tpu.data.scaler import StandardScaler  # noqa: F401
from graph_wavenet_tpu.data.windows import (  # noqa: F401
    reverse_sliding_window,
    sliding_windows,
)
