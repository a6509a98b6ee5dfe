"""graph_wavenet_tpu — a TPU-native spatio-temporal graph forecasting framework.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of
Graph WaveNet (reference: sklin93/Graph-WaveNet):

- ``models``   — Graph WaveNet model family (shared-graph ``gwnet``, per-sample
  graph ``gwnet_diff_g``) as pure functional param-pytree modules.
- ``ops``      — TPU compute path: gated dilated causal temporal convolutions,
  multi-support graph diffusion convolution, adaptive adjacency, batch norm.
  XLA reference implementations plus fused Pallas kernels in ``ops.pallas``.
- ``graphs``   — graph math library: adjacency normalizers (the ``adjtype``
  dispatch), spectral tools (GFT), graph synthesis (SBM, small-world), the
  ``Graph`` container.
- ``data``     — host-side data pipeline: batchers, standard scaler, traffic
  ETL, synthetic multi-modality (fMRI/EEG-like) generator, CRASH-style loader.
- ``train``    — jitted training engine (masked-MAE + Adam with gradient
  clipping), epoch runner, checkpointing, masked metrics.
- ``parallel`` — device-mesh utilities: data parallelism, node-dimension
  tensor parallelism for large graphs, time-halo sequence sharding.

Array convention: activations are ``(batch, time, node, channel)`` (channels
last), the idiomatic JAX/TPU layout; the reference uses torch's
``(batch, channel, node, time)``.
"""

__version__ = "0.1.0"

from graph_wavenet_tpu.config import (  # noqa: F401
    DataConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)

from graph_wavenet_tpu.ops.block_sparse import (  # noqa: F401
    BlockSparseSupport,
    PallasBlockSparseSupport,
    as_pallas,
)
from graph_wavenet_tpu.ops.sparse import SparseSupport  # noqa: F401
