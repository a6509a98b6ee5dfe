"""Configuration system.

The reference scatters its configuration across argparse flags
(`/root/reference/train.py:18-44`) and hardcoded constants (SBM parameters at
`/root/reference/Utils/util.py:228-239`, channel multipliers at
`/root/reference/engine.py:24,30`, clip at `engine.py:36`). Here everything is
a typed dataclass; CLI entry points parse into these.

Notable reference default inconsistencies resolved here (documented in
SURVEY.md §5): ``seq_length`` 48 (train.py) vs 12 (test.py) — we keep them as
per-experiment settings with METR-LA presets using 12.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Any


@dataclass(frozen=True)
class ModelConfig:
    """Graph WaveNet architecture configuration.

    Mirrors the knobs of the reference constructor
    (`/root/reference/model.py:82-86` and `engine.py:21-31`): the engine
    overrides skip/end channels to ``nhid*8`` / ``nhid*16``.
    """

    num_nodes: int = 207
    in_dim: int = 2
    out_dim: int = 12            # forecast horizon (= seq_length in the engine)
    residual_channels: int = 32
    dilation_channels: int = 32
    skip_channels: int = 256
    end_channels: int = 512
    kernel_size: int = 2
    blocks: int = 4
    layers: int = 2
    dropout: float = 0.3
    gcn_bool: bool = True
    addaptadj: bool = True
    adapt_rank: int = 10         # rank of the adaptive adjacency embeddings
    diffusion_order: int = 2     # K-hop order of the diffusion conv
    n_supports: int = 2          # number of fixed supports (doubletransition = 2)
    # diff-G variant: dilation of the first layer in each block
    # (1 for gwnet, 4 for gwnet_diff_G — `/root/reference/model.py:132,273`)
    start_dilation: int = 1
    # diff-G quirk compat: the reference draws fresh random node embeddings on
    # every forward so the adaptive adjacency never trains
    # (`/root/reference/model.py:324-329`). False = trainable embeddings (fix).
    fresh_nodevec: bool = False
    # numerics
    dtype: str = "float32"       # activation dtype ("float32" | "bfloat16")
    param_dtype: str = "float32"
    # NB: round-1 shipped experimental fused Pallas kernels for the gated
    # TCN + dense diffusion GCN behind a `use_pallas` flag. They lost
    # 3-30x to XLA at every flagship shape and were removed in round 2
    # (postmortem in BENCH_NOTES.md "Pallas kernel status"); the Pallas
    # surface is the block-sparse kernel family (`ops/pallas/
    # block_diffusion.py`), which wins where sparsity exists. Old
    # checkpoint sidecars carrying the flag load fine (`from_dict`
    # filters unknown keys).
    # diffusion dataflow: "fused" (per-hop chain, accumulated projection),
    # "stacked" (all hops of a support in one wide matmul over precomputed
    # powers), "concat" (reference-shaped single projection matmul) — see
    # ops/diffusion.py. "auto" picks by dtype (measured, BENCH_NOTES.md):
    # bf16 -> concat (one internal-fp32-accum matmul beats materializing the
    # fp32 accumulation chain), fp32 -> fused (concat's 7C-channel fp32
    # concat buffer costs more than the chain).
    gcn_mode: str = "auto"
    # rematerialization: recompute each WaveNet layer in the backward pass
    # instead of keeping its activations — trades ~1x extra forward FLOPs
    # for O(layers) less HBM, the standard jax.checkpoint move for large-N
    # or long-K configs.
    remat: bool = False

    def __post_init__(self):
        if self.gcn_mode not in ("auto", "fused", "stacked", "concat"):
            raise ValueError(
                f"gcn_mode must be one of auto/fused/stacked/concat, "
                f"got {self.gcn_mode!r}")
        if self.dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"dtype must be float32 or bfloat16, got {self.dtype!r}")

    @property
    def resolved_gcn_mode(self) -> str:
        if self.gcn_mode != "auto":
            return self.gcn_mode
        return "concat" if self.dtype == "bfloat16" else "fused"

    @property
    def supports_len(self) -> int:
        n = self.n_supports
        if self.gcn_bool and self.addaptadj:
            n += 1
        return n

    @property
    def receptive_field(self) -> int:
        """True receptive field computed from actual dilations.

        The reference's bookkeeping understates this for diff-G because it
        ignores the 4x starting dilation (`/root/reference/model.py:270-295`);
        we compute it from the dilations actually used (SURVEY.md §7.4 item 8).
        """
        rf = 1
        for _ in range(self.blocks):
            d = self.start_dilation
            for _ in range(self.layers):
                rf += d * (self.kernel_size - 1)
                d *= 2
        return rf

    @property
    def compat_receptive_field(self) -> int:
        """The reference's stored receptive field (used for padding parity).

        `/root/reference/model.py:107,131,153-155`: starts at 1 and adds
        ``additional_scope = kernel_size-1`` doubling per layer, independent of
        the actual starting dilation.
        """
        rf = 1
        for _ in range(self.blocks):
            scope = self.kernel_size - 1
            for _ in range(self.layers):
                rf += scope
                scope *= 2
        return rf

    def dilations(self) -> list[int]:
        """Per-layer dilation schedule, e.g. [1,2,1,2,1,2,1,2] for defaults."""
        out = []
        for _ in range(self.blocks):
            d = self.start_dilation
            for _ in range(self.layers):
                out.append(d)
                d *= 2
        return out


@dataclass(frozen=True)
class TrainConfig:
    """Optimization configuration (`/root/reference/train.py:34-38`,
    `engine.py:33-36`)."""

    batch_size: int = 64
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    grad_clip: float = 5.0
    epochs: int = 100
    print_every: int = 50
    seed: int = 0
    save_dir: str = "garage"
    expid: int = 1
    keep_checkpoints: int = 0    # 0 = keep all (reference keeps every epoch)
    # Per-epoch learning-rate decay factor; 1.0 = constant (the reference
    # ships a commented-out 0.1-per-10-epochs schedule, train.py:146-149).
    lr_decay: float = 1.0
    lr_decay_every: int = 10
    min_lr: float = 2e-6
    # PRNG implementation for the training step's dropout keys. "rbg" uses
    # the TPU's hardware random-bit generator — threefry mask generation
    # costs ~40% of the measured train step on v5e; rbg removes it.
    # "threefry2x32" gives the jax-default stream (slower, splittable).
    rng_impl: str = "rbg"
    # Device-feed prefetch depth: batches are assembled and device_put on a
    # background thread this many steps ahead, overlapping host work and H2D
    # transfer with the previous step's compute (the reference feeds
    # serially, train.py:243-251). 0 disables (default: through a tunneled
    # device transport concurrent transfers serialize and regress — prefer
    # device-resident loaders, ``data.device_loader``).
    prefetch: int = 0
    # Write epoch checkpoints on a background thread so the next epoch's
    # compute overlaps serialization + disk IO (the reference's torch.save
    # blocks the loop, train.py:295).
    async_checkpoint: bool = True
    # Gradient accumulation: micro-batches per optimizer step (grads
    # averaged before one clip+Adam update) — ~n-fold lower activation
    # memory for large-N configs. 1 disables.
    grad_accum: int = 1
    # Early stopping: end training after this many epochs without a new
    # best validation loss (best-model selection is unchanged). 0 disables
    # (the reference always runs all epochs, train.py:233).
    early_stop_patience: int = 0
    # Failure detection: raise DeviceWedgedError (after writing
    # save_dir/emergency.json diagnostics) if one epoch exceeds this many
    # seconds — wedged remote device transports otherwise hang forever.
    # 0 disables. Pairs with resume_from= for recovery.
    epoch_timeout_s: float = 0.0
    # Fused multi-step training: run this many optimizer steps per dispatch
    # (lax.scan over on-device batch gathers) when the train loader is
    # device-resident. Amortizes per-dispatch overhead; 1 disables.
    scan_steps: int = 1


    def __post_init__(self):
        if self.grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got "
                             f"{self.grad_accum}")
        if self.grad_accum > 1 and self.batch_size % self.grad_accum:
            raise ValueError(
                f"batch_size {self.batch_size} must divide by "
                f"grad_accum {self.grad_accum}")
        if self.scan_steps < 1:
            raise ValueError(f"scan_steps must be >= 1, got "
                             f"{self.scan_steps}")


@dataclass(frozen=True)
class DataConfig:
    """Dataset selection and synthesis configuration.

    Synthetic SBM constants mirror `/root/reference/Utils/util.py:228-239`.
    """

    dataset: str = "metr-la"     # "metr-la" | "pems-bay" | "syn" | "crash"
    data_dir: str = "data/METR-LA"
    adj_path: str = "data/sensor_graph/adj_mx.pkl"
    adjtype: str = "doubletransition"
    seq_length: int = 12
    # synthetic task
    num_nodes: int = 80
    n_communities: int = 5
    prob_intra: float = 0.8
    prob_inter: float = 0.2
    n_train: int = 80
    n_valid: int = 20
    n_test: int = 4
    num_timestep: int = 1000
    sigma_spatial: float = 0.1
    sigma_temporal: float = 0.1
    rho_spatial: float = 0.0
    rho_temporal: float = 0.0
    same_g: bool = False
    pooltype: str = "avg"


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh / sharding configuration (no reference equivalent — the
    reference is single-device, SURVEY.md §2.8)."""

    data_axis: int = -1          # -1 = all devices on the data axis
    model_axis: int = 1          # node-dim tensor parallelism degree
    time_axis: int = 1           # time-halo sequence parallelism degree
    shard_nodes: bool = False    # shard the node dim of supports/activations
    shard_time: bool = False     # shard the time dim (long sequences)


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def to_json(cfg: Any) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2)


def from_dict(cls, d: dict):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in names})
