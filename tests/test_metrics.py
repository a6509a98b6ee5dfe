"""Masked-metric parity tests.

Golden values are computed with an independent torch implementation of the
reference formulas (`/root/reference/Utils/util.py:510-559`) written inline
here, so the jnp versions are checked against a second implementation rather
than against themselves.
"""

import numpy as np
import pytest
import torch

from graph_wavenet_tpu.train import metrics as M


def torch_masked(loss_fn, preds, labels, null_val):
    preds = torch.tensor(preds)
    labels = torch.tensor(labels)
    if np.isnan(null_val):
        mask = ~torch.isnan(labels)
    else:
        mask = labels != null_val
    mask = mask.float()
    mask = mask / torch.mean(mask)
    mask = torch.where(torch.isnan(mask), torch.zeros_like(mask), mask)
    loss = loss_fn(preds, labels)
    loss = loss * mask
    loss = torch.where(torch.isnan(loss), torch.zeros_like(loss), loss)
    return torch.mean(loss).item()


@pytest.fixture
def data(rng):
    preds = rng.normal(size=(8, 1, 20, 12)).astype(np.float32)
    labels = rng.normal(size=(8, 1, 20, 12)).astype(np.float32)
    labels[rng.random(labels.shape) < 0.3] = 0.0  # missing sensors
    return preds, labels


def test_masked_mae(data):
    preds, labels = data
    want = torch_masked(lambda p, l: torch.abs(p - l), preds, labels, 0.0)
    got = float(M.masked_mae(preds, labels, 0.0))
    assert np.isclose(got, want, rtol=1e-6)


def test_masked_mse_rmse(data):
    preds, labels = data
    want = torch_masked(lambda p, l: (p - l) ** 2, preds, labels, 0.0)
    assert np.isclose(float(M.masked_mse(preds, labels, 0.0)), want, rtol=1e-6)
    assert np.isclose(float(M.masked_rmse(preds, labels, 0.0)),
                      np.sqrt(want), rtol=1e-6)


def test_masked_mape(data):
    preds, labels = data
    want = torch_masked(lambda p, l: torch.abs(p - l) / l, preds, labels, 0.0)
    got = float(M.masked_mape(preds, labels, 0.0))
    assert np.isclose(got, want, rtol=1e-5)


def test_nan_null_val(data):
    preds, labels = data
    labels = labels.copy()
    labels[0, 0, 0, :] = np.nan
    want = torch_masked(lambda p, l: torch.abs(p - l), preds, labels,
                        float("nan"))
    got = float(M.masked_mae(preds, labels, float("nan")))
    assert np.isclose(got, want, rtol=1e-6)


def test_all_masked_returns_zero():
    labels = np.zeros((4, 3), np.float32)
    preds = np.ones((4, 3), np.float32)
    assert float(M.masked_mae(preds, labels, 0.0)) == 0.0


def test_metric_tuple(data):
    preds, labels = data
    mae, mape, rmse = M.metric(preds, labels)
    assert np.isclose(float(mae), float(M.masked_mae(preds, labels, 0.0)))
    assert np.isclose(float(rmse), float(M.masked_rmse(preds, labels, 0.0)))
    assert np.isclose(float(mape), float(M.masked_mape(preds, labels, 0.0)))


def test_batch_time_losses(rng):
    yhat = rng.normal(size=(6, 5, 7)).astype(np.float32)
    y = rng.normal(size=(6, 5, 7)).astype(np.float32)
    assert np.isclose(float(M.batch_time_l1(yhat, y)),
                      np.abs(yhat - y).mean(), rtol=1e-6)
    y2 = y.reshape(6, -1)
    yh2 = yhat.reshape(6, -1)
    want = np.mean(np.linalg.norm(yh2 - y2, axis=0) /
                   np.linalg.norm(y2, axis=0))
    assert np.isclose(float(M.batch_time_mse(yhat, y)), want, rtol=1e-5)
    # 4D case, checked against the torch reference formula verbatim
    # (miscTools.py:121-130 flattens all but the last two axes into rows)
    yhat4 = rng.normal(size=(3, 4, 5, 2)).astype(np.float32)
    y4 = rng.normal(size=(3, 4, 5, 2)).astype(np.float32)
    xt = torch.tensor(yhat4).contiguous().view(-1, 10)
    yt = torch.tensor(y4).contiguous().view(-1, 10).double()
    lv = torch.sqrt(torch.sum((xt - yt) ** 2, dim=0))
    want4 = float(torch.mean(lv / torch.norm(yt, dim=0)))
    assert np.isclose(float(M.batch_time_mse(yhat4, y4)), want4, rtol=1e-5)
