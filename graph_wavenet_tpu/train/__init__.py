from graph_wavenet_tpu.train.engine import (  # noqa: F401
    Engine,
    TrainState,
    cluster_mean_projector,
    make_optimizer,
)
from graph_wavenet_tpu.train.runner import RunResult, Runner  # noqa: F401
from graph_wavenet_tpu.train import metrics  # noqa: F401
