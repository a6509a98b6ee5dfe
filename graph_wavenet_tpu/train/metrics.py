"""Masked regression metrics.

Behavioral parity with the reference metrics
(`/root/reference/Utils/util.py:510-559`): the mask is ``labels != null_val``
(or non-NaN when ``null_val`` is NaN), normalized by its own mean, with
NaN-safe zeroing both on the mask and on the masked loss. MAPE divides by the
raw labels with no epsilon, relying on the zero-mask to kill the infs
(quirk #7 in SURVEY.md §7.4 — replicated deliberately).

All functions are pure jnp and jit-safe; ``null_val`` must be a Python float
(static), matching the reference call sites which always pass 0.0.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _mask(labels: jnp.ndarray, null_val: float) -> jnp.ndarray:
    if math.isnan(null_val):
        mask = ~jnp.isnan(labels)
    else:
        mask = labels != null_val
    mask = mask.astype(jnp.float32)
    mask = mask / jnp.mean(mask)
    return jnp.where(jnp.isnan(mask), jnp.zeros_like(mask), mask)


def _masked_mean(loss: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    loss = loss * mask
    loss = jnp.where(jnp.isnan(loss), jnp.zeros_like(loss), loss)
    return jnp.mean(loss)


def masked_mse(preds, labels, null_val: float = float("nan")) -> jnp.ndarray:
    mask = _mask(labels, null_val)
    return _masked_mean((preds - labels) ** 2, mask)


def masked_rmse(preds, labels, null_val: float = float("nan")) -> jnp.ndarray:
    return jnp.sqrt(masked_mse(preds, labels, null_val))


def masked_mae(preds, labels, null_val: float = float("nan")) -> jnp.ndarray:
    mask = _mask(labels, null_val)
    return _masked_mean(jnp.abs(preds - labels), mask)


def masked_mape(preds, labels, null_val: float = float("nan")) -> jnp.ndarray:
    mask = _mask(labels, null_val)
    return _masked_mean(jnp.abs(preds - labels) / labels, mask)


def metric(pred, real) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(MAE, MAPE, RMSE) with null_val=0.0, as in the reference test loops
    (`/root/reference/Utils/util.py:555-559`).

    Returns on-device scalars; callers decide when to sync to host (the
    reference `.item()`s per step — we accumulate on device instead).
    """
    mae = masked_mae(pred, real, 0.0)
    mape = masked_mape(pred, real, 0.0)
    rmse = masked_rmse(pred, real, 0.0)
    return mae, mape, rmse


def batch_time_l1(yhat, y) -> jnp.ndarray:
    """Flattened L1 loss (`/root/reference/Utils/miscTools.py:112-118`)."""
    return jnp.mean(jnp.abs(yhat.reshape(-1) - y.reshape(-1)))


def batch_time_mse(yhat, y) -> jnp.ndarray:
    """Column-normalized RMSE, mean over columns of ||yhat-y|| / ||y||.

    The reference flattens everything but the LAST TWO axes into rows and
    keeps those two (N*F) as columns — ``x.view(-1, N*F)`` with
    ``F = shape[-2], N = shape[-1]`` (`/root/reference/Utils/miscTools.py:
    121-130`) — so for (B, T, N, F) inputs the norm runs over batch*time
    per (node, feature) column."""
    cols = yhat.shape[-1] * yhat.shape[-2]
    yhat2 = yhat.reshape(-1, cols)
    y2 = y.reshape(-1, cols)
    num = jnp.linalg.norm(yhat2 - y2, axis=0)
    den = jnp.linalg.norm(y2, axis=0)
    return jnp.mean(num / den)
