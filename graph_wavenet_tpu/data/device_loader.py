"""Device-resident data loaders: keep the dataset in HBM, gather batches
on device.

The reference copies every batch host->GPU inside the step loop
(`/root/reference/train.py:244-247`). Measured through this environment's
tunneled device transport that feed costs ~78 ms/step against a 9 ms train
step (BENCH_NOTES.md). All of the reference's datasets fit in HBM — METR-LA's
raw standardized series is 56 MB (the *materialized* windows are ~950 MB, a
~12x stride-1 duplication) — so the TPU-native feed is: transfer the data
ONCE, then per step send only a batch of int32 anchor indices and gather the
windows on device with a jitted take. Per-step host->device traffic drops
from ~5 MB to ~256 bytes.

Two classes, both drop-in replacements for the host batchers (same
``shuffle``/``get_iterator``/``num_real``/``num_batch`` surface, so the
Runner consumes them unchanged):

- :class:`DeviceWindowLoader` — raw series resident; windows gathered on
  device per batch (device analog of ``native_loader.WindowDataLoader``).
- :class:`DeviceArrayLoader` — prebuilt sample arrays resident; batches
  sliced on device by permuted index (device analog of ``loader.DataLoader``,
  for datasets whose windows are already materialized, e.g. synthetic).

Shuffling happens on the host over the (tiny) anchor/index arrays with the
same seeded Generator discipline as the host loaders; padding keeps the
pad-with-last-sample parity semantics (`util.py:25-30`).

Multi-chip: pass ``sharding`` (a ``NamedSharding`` for the batch arrays,
e.g. ``parallel.mesh.batch_sharding``) — the resident data is replicated
across the mesh and each gather emits batches laid out per the sharding, so
the pjit train step consumes them with zero resharding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gather_windows(series, starts, window: int):
    """(T, N, C) series, (B,) start rows -> (B, window, N, C) on device."""
    idx = starts[:, None] + jnp.arange(window)[None, :]    # (B, W)
    return jnp.take(series, idx, axis=0)                   # (B, W, N, C)


def _take(arr, idx):
    return jnp.take(arr, idx, axis=0)


_gather_windows_dev = jax.jit(_gather_windows, static_argnums=(2,))
_take_batch = jax.jit(_take)


@functools.lru_cache(maxsize=None)
def _sharded_window_gather(sharding):
    return jax.jit(_gather_windows, static_argnums=(2,),
                   out_shardings=sharding)


@functools.lru_cache(maxsize=None)
def _sharded_take(sharding):
    return jax.jit(_take, out_shardings=sharding)


def _replicate(arr, sharding):
    """Replicate a host array across the mesh of ``sharding``."""
    from jax.sharding import NamedSharding, PartitionSpec
    return jax.device_put(
        arr, NamedSharding(sharding.mesh, PartitionSpec()))


class DeviceWindowLoader:
    """Windows-on-demand batcher with the series resident on device.

    ``series_x``: standardized features (T, N, C); ``y_series``: target
    series in raw units (reference keeps targets unscaled, `util.py:
    208-211`), defaults to ``series_x``. ``anchors`` = index of the last
    observed step per sample (reference convention,
    `generate_training_data.py:42-44`).
    """

    def __init__(self, series_x: np.ndarray, window: int, horizon: int,
                 batch_size: int, y_start: int = 1,
                 anchors: np.ndarray | None = None,
                 y_series: np.ndarray | None = None,
                 rng: np.random.Generator | None = None,
                 sharding=None):
        from graph_wavenet_tpu.data.native_loader import WindowDataLoader

        self.window = window
        self.horizon = horizon
        self.batch_size = batch_size
        self.y_start = y_start
        self.rng = rng if rng is not None else np.random.default_rng()
        put = ((lambda a: _replicate(a, sharding)) if sharding is not None
               else jax.device_put)
        self._gather = (_sharded_window_gather(sharding)
                        if sharding is not None else _gather_windows_dev)
        self._dev_x = put(np.ascontiguousarray(series_x, dtype=np.float32))
        self._dev_y = (self._dev_x if y_series is None else put(
            np.ascontiguousarray(y_series, dtype=np.float32)))
        self.y_len = horizon - y_start + 1   # reference y_offsets length
        if anchors is None:
            anchors = WindowDataLoader.valid_anchors(
                series_x.shape[0], window, horizon, y_start)
        from graph_wavenet_tpu.data.loader import pad_with_last

        anchors = np.asarray(anchors, dtype=np.int32)
        # validate caller-supplied anchors HERE: the device gathers go
        # through jnp.take, whose default clip mode would silently duplicate
        # the first/last series rows instead of raising like the host path's
        # gather_windows (native_loader.py)
        t_x = series_x.shape[0]
        t_y = t_x if y_series is None else y_series.shape[0]
        first = window - 1
        last = min(t_x - 1, t_y - horizon - 1)
        if len(anchors) and (anchors.min() < first or anchors.max() > last):
            raise ValueError(
                f"window anchors out of range: anchors must lie in "
                f"[{first}, {last}] (x reads anchor-{window - 1}..anchor "
                f"over {t_x} rows, y reads anchor+{y_start}..anchor+"
                f"{horizon} over {t_y} rows); got "
                f"[{anchors.min()}, {anchors.max()}]")
        self.num_real = len(anchors)
        self.anchors = pad_with_last(anchors, batch_size)
        self.size = len(self.anchors)
        self.num_batch = self.size // batch_size

    def shuffle(self):
        self.anchors = self.anchors[self.rng.permutation(self.size)]

    def get_iterator(self):
        for i in range(self.num_batch):
            a = jnp.asarray(
                self.anchors[i * self.batch_size:(i + 1) * self.batch_size])
            x = self._gather(self._dev_x, a - (self.window - 1),
                             self.window)
            y = self._gather(self._dev_y, a + self.y_start, self.y_len)
            yield x, y

    # -- fused multi-step training support (Engine.train_steps_windows) --

    def resident_series(self):
        """The device-resident (x_series, y_series) raw arrays."""
        return self._dev_x, self._dev_y

    def superbatches(self, scan_steps: int):
        """(scan_steps, batch_size) int32 anchor matrices, full chunks in
        the current shuffle order."""
        b = self.batch_size
        n_full = self.num_batch // scan_steps
        for c in range(n_full):
            lo = c * scan_steps * b
            yield self.anchors[lo:lo + scan_steps * b].reshape(scan_steps, b)

    def remainder_batches(self, scan_steps: int):
        """Per-batch (x, y) pairs for the batches superbatches leaves over."""
        b = self.batch_size
        start = (self.num_batch // scan_steps) * scan_steps
        for i in range(start, self.num_batch):
            a = jnp.asarray(self.anchors[i * b:(i + 1) * b])
            x = self._gather(self._dev_x, a - (self.window - 1),
                             self.window)
            y = self._gather(self._dev_y, a + self.y_start, self.y_len)
            yield x, y

    def __len__(self):
        return self.num_batch


class DeviceArrayLoader:
    """Device-resident batcher over prebuilt (xs, ys[, adj_idx]) arrays —
    the HBM analog of ``loader.DataLoader`` (pad-with-last + shuffle +
    slice, `util.py:14-102`); batches are device-side gathers."""

    def __init__(self, xs: np.ndarray, ys: np.ndarray, batch_size: int,
                 adj_idx: np.ndarray | None = None,
                 pad_with_last_sample: bool = True,
                 rng: np.random.Generator | None = None,
                 sharding=None):
        self.batch_size = batch_size
        self.num_real = len(xs)
        self.rng = rng if rng is not None else np.random.default_rng()
        n = len(xs)
        pad = ((-n) % batch_size) if pad_with_last_sample else 0
        self.size = n + pad
        self.num_batch = self.size // batch_size
        # index indirection implements pad-with-last without duplicating data
        self._index = np.concatenate(
            [np.arange(n), np.full(pad, n - 1)]).astype(np.int32)
        put = ((lambda a: _replicate(a, sharding)) if sharding is not None
               else jax.device_put)
        self._take = (_sharded_take(sharding) if sharding is not None
                      else _take_batch)
        self._dev_x = put(np.ascontiguousarray(xs))
        self._dev_y = put(np.ascontiguousarray(ys))
        self.adj_idx = adj_idx  # host-side (used for support gathers)

    def shuffle(self):
        self._index = self._index[self.rng.permutation(self.size)]

    def get_iterator(self):
        for i in range(self.num_batch):
            sel = self._index[i * self.batch_size:(i + 1) * self.batch_size]
            dev_sel = jnp.asarray(sel)
            x = self._take(self._dev_x, dev_sel)
            y = self._take(self._dev_y, dev_sel)
            if self.adj_idx is None:
                yield x, y
            else:
                yield x, y, self.adj_idx[sel]

    # -- fused multi-step training support (Engine.train_steps_resident) --

    def resident_arrays(self):
        """The device-resident (xs, ys) sample arrays."""
        return self._dev_x, self._dev_y

    def superbatches(self, scan_steps: int):
        """(scan_steps, batch_size) int32 index matrices covering the epoch
        in full chunks, in the current shuffle order."""
        b = self.batch_size
        n_full = self.num_batch // scan_steps
        for c in range(n_full):
            lo = c * scan_steps * b
            yield self._index[lo:lo + scan_steps * b].reshape(scan_steps, b)

    def remainder_batches(self, scan_steps: int):
        """Per-batch leftovers after superbatches: (x, y) pairs, or
        (x, y, adj_idx) triples for per-sample-graph datasets."""
        b = self.batch_size
        start = (self.num_batch // scan_steps) * scan_steps
        for i in range(start, self.num_batch):
            sel = self._index[i * b:(i + 1) * b]
            dev_sel = jnp.asarray(sel)
            x = self._take(self._dev_x, dev_sel)
            y = self._take(self._dev_y, dev_sel)
            if self.adj_idx is None:
                yield x, y
            else:
                yield x, y, self.adj_idx[sel]

    def __len__(self):
        return self.num_batch
