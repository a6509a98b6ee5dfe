"""Device mesh construction and sharding rules.

The reference is single-process single-GPU (SURVEY.md §2.8) — this layer is
new, designed for TPU slices:

- axis ``data``  — batch-dim data parallelism (always profitable);
- axis ``model`` — node-dim tensor parallelism for graphs too large for one
  chip (supports and node-indexed activations sharded over N; the diffusion
  einsum's contraction over sharded N makes GSPMD insert the
  reduce-scatter/all-gather over ICI);
- axis ``time``  — sequence parallelism for long sequences (CRASH-scale
  K≈3k): the dilated-conv halo is exchanged between neighbor shards (see
  ``parallel.halo`` for the explicit shard_map version; under plain GSPMD the
  compiler infers equivalent collective-permutes).

Everything speaks ``jax.sharding.NamedSharding``; the jitted train step needs
no code changes — GSPMD partitions it according to the input shardings
produced here.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_wavenet_tpu.config import MeshConfig

DATA, MODEL, TIME = "data", "model", "time"


def make_mesh(cfg: MeshConfig | None = None,
              devices=None) -> Mesh:
    """Build a (data, model, time) mesh over the available devices; the data
    axis absorbs whatever the model/time axes don't use."""
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mt = cfg.model_axis * cfg.time_axis
    assert n % mt == 0, (
        f"{n} devices not divisible by model*time = {mt}")
    data = n // mt if cfg.data_axis == -1 else cfg.data_axis
    assert data * mt == n, (
        f"mesh {data}x{cfg.model_axis}x{cfg.time_axis} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, cfg.model_axis,
                                            cfg.time_axis)
    return Mesh(dev_array, (DATA, MODEL, TIME))


def batch_sharding(mesh: Mesh, cfg: MeshConfig | None = None
                   ) -> NamedSharding:
    """Sharding for (B, T, N, F) batches: batch over data, optionally time
    over time and node over model."""
    cfg = cfg or MeshConfig()
    return NamedSharding(mesh, P(
        DATA,
        TIME if cfg.shard_time else None,
        MODEL if cfg.shard_nodes else None,
        None))


def support_sharding(mesh: Mesh, cfg: MeshConfig | None = None,
                     batched: bool = False) -> NamedSharding:
    """Sharding for (N, N) / (B, N, N) supports: row-shard the node dim when
    node TP is on (the diffusion contraction then reduce-scatters over ICI).
    """
    cfg = cfg or MeshConfig()
    node = MODEL if cfg.shard_nodes else None
    if batched:
        return NamedSharding(mesh, P(DATA, node, None))
    return NamedSharding(mesh, P(node, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, cfg: MeshConfig, *arrays):
    """device_put a batch tuple with the batch sharding."""
    s = batch_sharding(mesh, cfg)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def shard_state(mesh: Mesh, state):
    """Replicate a TrainState pytree across the mesh (params are small —
    node-sharded params only pay off at very large N; supports are what
    matter and they are sharded separately)."""
    return jax.device_put(state, replicated(mesh))
