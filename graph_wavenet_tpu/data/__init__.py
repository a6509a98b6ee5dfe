from graph_wavenet_tpu.data.loader import (  # noqa: F401
    DataLoader,
    DataLoaderSyn,
    sharded_iterator,
)
from graph_wavenet_tpu.data.scaler import StandardScaler  # noqa: F401
from graph_wavenet_tpu.data.windows import (  # noqa: F401
    reverse_sliding_window,
    sliding_windows,
)
