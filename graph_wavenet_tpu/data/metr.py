"""Traffic benchmark dataset loading (METR-LA / PEMS-BAY).

Parity with ``load_dataset_metr`` (`/root/reference/Utils/util.py:202-217`):
npz splits -> scaler fit on x_train[...,0] -> feature-0 standardization ->
three batchers.
"""

from __future__ import annotations

import os

import numpy as np

from graph_wavenet_tpu.data.loader import DataLoader
from graph_wavenet_tpu.data.scaler import StandardScaler, apply_feature0_scaling


def load_dataset(dataset_dir: str, batch_size: int,
                 valid_batch_size: int | None = None,
                 test_batch_size: int | None = None,
                 seed: int = 0) -> dict:
    valid_batch_size = valid_batch_size or batch_size
    test_batch_size = test_batch_size or batch_size
    rng = np.random.default_rng(seed)
    data: dict = {}
    for category in ("train", "val", "test"):
        cat = np.load(os.path.join(dataset_dir, category + ".npz"))
        data["x_" + category] = cat["x"].astype(np.float32)
        data["y_" + category] = cat["y"].astype(np.float32)
    scaler = StandardScaler.fit(data["x_train"][..., 0])
    apply_feature0_scaling(data, scaler)
    data["train_loader"] = DataLoader(data["x_train"], data["y_train"],
                                      batch_size, rng=rng)
    data["val_loader"] = DataLoader(data["x_val"], data["y_val"],
                                    valid_batch_size, rng=rng)
    data["test_loader"] = DataLoader(data["x_test"], data["y_test"],
                                     test_batch_size, rng=rng)
    data["scaler"] = scaler
    return data
