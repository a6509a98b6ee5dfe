"""Native C++ batch-assembly tests: parity with the numpy reference path
and WindowDataLoader sample semantics vs the materializing ETL."""

import numpy as np
import pytest

from graph_wavenet_tpu.data import native_loader as NL
from graph_wavenet_tpu.data import traffic_etl


def test_native_library_builds():
    assert NL.native_available(), (
        "g++ is in the image; the native loader should build")


def test_gather_windows_matches_numpy(rng):
    series = rng.normal(size=(50, 7, 2)).astype(np.float32)
    anchors = rng.integers(0, 50 - 8, size=33)
    got = NL.gather_windows(series, anchors, 8)
    idx = anchors[:, None] + np.arange(8)[None, :]
    np.testing.assert_array_equal(got, series[idx])


def test_gather_batch_matches_numpy(rng):
    samples = rng.normal(size=(20, 5, 3)).astype(np.float32)
    idx = rng.integers(0, 20, size=12)
    got = NL.gather_batch(samples, idx)
    np.testing.assert_array_equal(got, samples[idx])


def test_window_loader_matches_materialized_etl(rng):
    """WindowDataLoader's (x, y) must equal the reference-offset windows
    from the materializing pipeline."""
    series = rng.normal(size=(80, 5, 2)).astype(np.float32)
    x_off = np.arange(-11, 1)
    y_off = np.arange(1, 13)
    x_all, y_all = traffic_etl.make_windows(series, x_off, y_off)

    dl = NL.WindowDataLoader(series, window=12, horizon=12, batch_size=8,
                             rng=np.random.default_rng(0))
    assert dl.num_real == len(x_all)
    xs, ys = [], []
    for x, y in dl.get_iterator():
        xs.append(x)
        ys.append(y)
    xs = np.concatenate(xs)[:dl.num_real]
    ys = np.concatenate(ys)[:dl.num_real]
    np.testing.assert_array_equal(xs, x_all)
    np.testing.assert_array_equal(ys, y_all)


def test_window_loader_shuffle_and_padding(rng):
    series = rng.normal(size=(40, 3, 2)).astype(np.float32)
    dl = NL.WindowDataLoader(series, window=12, horizon=12, batch_size=8,
                             rng=np.random.default_rng(1))
    # 40 - 23 = 17 anchors, padded to 24
    assert dl.num_real == 17 and dl.size == 24 and dl.num_batch == 3
    before = dl.anchors.copy()
    dl.shuffle()
    assert not np.array_equal(before, dl.anchors)
    assert sorted(set(dl.anchors)) == sorted(set(before))
    for x, y in dl.get_iterator():
        assert x.shape == (8, 12, 3, 2) and y.shape == (8, 12, 3, 2)
