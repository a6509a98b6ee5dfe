"""Standardization of input features.

Parity with the reference ``StandardScaler``
(`/root/reference/Utils/util.py:104-117`) and its fit/apply convention: fit on
``x_train[..., 0]`` only, transform feature 0 of every split in place, and
leave the targets in raw units (`util.py:202-217`). The inverse transform is
applied to model outputs before the masked loss (`engine.py:49`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class StandardScaler:
    mean: float
    std: float

    def transform(self, data):
        return (data - self.mean) / self.std

    def inverse_transform(self, data):
        return (data * self.std) + self.mean

    @classmethod
    def fit(cls, x: np.ndarray) -> "StandardScaler":
        """Fit on the raw signal channel, e.g. ``x_train[..., 0]``."""
        return cls(mean=float(x.mean()), std=float(x.std()))


def apply_feature0_scaling(data: dict, scaler: StandardScaler) -> None:
    """Standardize feature 0 of x_{train,val,test} in place, reference-style
    (`/root/reference/Utils/util.py:210-211`). Large float32 arrays take the
    threaded native kernel (``native/windowloader.cpp``); numpy otherwise."""
    from graph_wavenet_tpu.data.native_loader import standardize_feature0

    for category in ("train", "val", "test"):
        key = "x_" + category
        if key in data:
            if not standardize_feature0(data[key], scaler.mean, scaler.std):
                data[key][..., 0] = scaler.transform(data[key][..., 0])
