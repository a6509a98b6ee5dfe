"""Traffic benchmark dataset loading (METR-LA / PEMS-BAY).

Two paths:

- :func:`load_dataset` — parity with ``load_dataset_metr``
  (`/root/reference/Utils/util.py:202-217`): prebuilt npz window splits ->
  scaler fit on x_train[...,0] -> feature-0 standardization -> batchers.
- :func:`load_dataset_streaming` — same sample semantics straight from the
  raw readings with NO window materialization (the reference pipeline blows
  the data up ~10x on disk and in RAM): windows are assembled on demand by
  the native loader; the scaler matches the materialized fit EXACTLY via
  window-multiplicity weighting.

Both accept ``resident="device"`` to keep the data in HBM and gather batches
on device (``data.device_loader``) — the fast feed for TPU training: per-step
host->device traffic is a batch of int32 indices instead of ~5 MB of windows.
"""

from __future__ import annotations

import os

import numpy as np

from graph_wavenet_tpu.data.loader import loader_cls, resident_sharding_kw
from graph_wavenet_tpu.data.scaler import StandardScaler, apply_feature0_scaling


def load_dataset(dataset_dir: str, batch_size: int,
                 valid_batch_size: int | None = None,
                 test_batch_size: int | None = None,
                 seed: int = 0, resident: str = "host",
                 scaler: StandardScaler | None = None,
                 node_layout: dict | None = None,
                 sharding=None) -> dict:
    """``scaler``: standardize feature 0 with THIS scaler instead of fitting
    one on this directory's x_train — evaluation of a checkpoint must use
    the training-time statistics (cli/test.py passes the sidecar scaler), or
    inputs and the inverse transform silently disagree.

    ``node_layout``: city-scale node layout (``graphs.city``) — the node
    axis of every split is permuted into model order and zero-padded to
    the block multiple AFTER the scaler fit (pad zeros must not bias the
    statistics) and before the loaders are built.

    ``sharding``: with ``resident="device"`` on a device mesh, a batch
    ``NamedSharding`` (``parallel.mesh.batch_sharding``) — the resident
    splits are replicated over the mesh and every batch gather comes out
    laid out for the pjit/fused train steps (the multi-chip fast feed)."""
    valid_batch_size = valid_batch_size or batch_size
    test_batch_size = test_batch_size or batch_size
    rng = np.random.default_rng(seed)
    data: dict = {}
    for category in ("train", "val", "test"):
        cat = np.load(os.path.join(dataset_dir, category + ".npz"))
        data["x_" + category] = cat["x"].astype(np.float32)
        data["y_" + category] = cat["y"].astype(np.float32)
    if scaler is None:
        scaler = StandardScaler.fit(data["x_train"][..., 0])
    apply_feature0_scaling(data, scaler)
    if node_layout is not None:
        from graph_wavenet_tpu.graphs.city import apply_layout_to_data

        apply_layout_to_data(data, node_layout)
    cls = loader_cls(resident)
    kw = resident_sharding_kw(resident, sharding)
    data["train_loader"] = cls(data["x_train"], data["y_train"],
                               batch_size, rng=rng, **kw)
    data["val_loader"] = cls(data["x_val"], data["y_val"],
                             valid_batch_size, rng=rng, **kw)
    data["test_loader"] = cls(data["x_test"], data["y_test"],
                              test_batch_size, rng=rng, **kw)
    data["scaler"] = scaler
    return data



def _window_multiplicity(anchors: np.ndarray, window: int,
                         t_total: int) -> np.ndarray:
    """count[t] = number of x-windows (over ``anchors``) containing row t —
    the weight each raw row carries in the materialized x_train statistics."""
    delta = np.zeros(t_total + 1, dtype=np.int64)
    np.add.at(delta, anchors - window + 1, 1)     # +1 at window starts
    np.add.at(delta, anchors + 1, -1)             # -1 past window ends
    return np.cumsum(delta[:-1])


def weighted_feature0_scaler(series: np.ndarray, anchors: np.ndarray,
                             window: int) -> StandardScaler:
    """Scaler identical to fitting on the materialized train windows'
    feature 0: rows are weighted by how many train windows duplicate them."""
    w = _window_multiplicity(np.asarray(anchors), window, series.shape[0])
    f0 = series[..., 0].astype(np.float64)          # (T, N)
    total = float((w * series.shape[1]).sum())
    mean = float((f0.sum(axis=1) * w).sum() / total)
    var = float((((f0 - mean) ** 2).sum(axis=1) * w).sum() / total)
    return StandardScaler(mean=mean, std=float(np.sqrt(var)))


def load_dataset_streaming(values: np.ndarray, index=None,
                           batch_size: int = 64, seq_length_x: int = 12,
                           seq_length_y: int = 12, y_start: int = 1,
                           add_time_in_day: bool = True,
                           add_day_in_week: bool = False,
                           seed: int = 0, resident: str = "host",
                           sharding=None) -> dict:
    """Raw (T, N) readings -> streaming loaders with reference-identical
    samples, splits (chronological 70/10/20 over anchors) and scaler.

    Returns the same dict surface as :func:`load_dataset` (three loaders,
    scaler, y_test) so the Runner consumes it unchanged.
    """
    from graph_wavenet_tpu.data.native_loader import (
        WindowDataLoader,
        gather_windows,
    )
    from graph_wavenet_tpu.data.traffic_etl import build_features

    rng = np.random.default_rng(seed)
    series = build_features(values, index, add_time_in_day,
                            add_day_in_week).astype(np.float32)
    anchors = WindowDataLoader.valid_anchors(series.shape[0], seq_length_x,
                                             seq_length_y, y_start)
    n = len(anchors)
    if n == 0:
        raise ValueError(
            f"series of length {series.shape[0]} is too short for "
            f"window {seq_length_x} + horizon {seq_length_y} "
            f"(y_start {y_start}): no valid samples")
    n_test = round(n * 0.2)
    n_train = round(n * 0.7)
    n_val = n - n_test - n_train
    if min(n_train, n_val, n_test) < 1:
        # anchors[-0:] would silently make test = ALL anchors, overlapping
        # the train split — refuse tiny series instead
        raise ValueError(
            f"series yields only {n} windowed samples — too few for the "
            f"70/10/20 chronological split "
            f"(train/val/test = {n_train}/{n_val}/{n_test})")
    splits = {"train": anchors[:n_train],
              "val": anchors[n_train:n_train + n_val],
              "test": anchors[-n_test:]}

    scaler = weighted_feature0_scaler(series, splits["train"], seq_length_x)
    x_series = series.copy()
    x_series[..., 0] = scaler.transform(x_series[..., 0])

    if resident == "device":
        from graph_wavenet_tpu.data.device_loader import DeviceWindowLoader
        window_cls = DeviceWindowLoader
    elif resident == "host":
        window_cls = WindowDataLoader
    else:
        raise ValueError(f"resident must be 'host' or 'device', "
                         f"got {resident!r}")

    data: dict = {"scaler": scaler}
    kw = resident_sharding_kw(resident, sharding)
    for name, a in splits.items():
        data[name + "_loader"] = window_cls(
            x_series, seq_length_x, seq_length_y, batch_size,
            y_start=y_start, anchors=a, y_series=series, rng=rng, **kw)
    # materialize only the test targets (the per-horizon test loop needs
    # them, `train.py:379-380`); everything else stays windows-on-demand.
    # y length follows the reference y_offsets = arange(y_start, Ly+1)
    data["y_test"] = gather_windows(series, splits["test"] + y_start,
                                    seq_length_y - y_start + 1)
    return data
