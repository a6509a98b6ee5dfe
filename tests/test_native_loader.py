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


def test_window_loader_y_start_matches_etl(rng):
    """y_start != 1 must follow the reference y_offsets = arange(y_start,
    Ly+1): y length Ly - y_start + 1 and the anchor range independent of
    y_start — the loader used to emit Ly-long y windows shifted past the
    ETL's, silently training on different targets than the npz path."""
    series = rng.normal(size=(60, 4, 2)).astype(np.float32)
    x_off = np.arange(-5, 1)
    y_off = np.arange(2, 7)          # y_start=2, seq_length_y=6
    x_all, y_all = traffic_etl.make_windows(series, x_off, y_off)
    dl = NL.WindowDataLoader(series, window=6, horizon=6, batch_size=4,
                             y_start=2, rng=np.random.default_rng(0))
    assert dl.num_real == len(x_all)
    xs, ys = [], []
    for x, y in dl.get_iterator():
        xs.append(x)
        ys.append(y)
    np.testing.assert_array_equal(np.concatenate(xs)[:dl.num_real], x_all)
    np.testing.assert_array_equal(np.concatenate(ys)[:dl.num_real], y_all)


def test_gather_windows_rejects_out_of_range_anchors(rng):
    series = rng.normal(size=(20, 3, 2)).astype(np.float32)
    with pytest.raises(ValueError, match="out of range"):
        NL.gather_windows(series, np.array([15]), 8)   # 15 + 8 > 20
    with pytest.raises(ValueError, match="out of range"):
        NL.gather_windows(series, np.array([-1]), 8)


def test_standardize_feature0_native_matches_numpy(rng):
    arr = rng.normal(size=(30, 6, 3)).astype(np.float32)
    want = arr.copy()
    want[..., 0] = (want[..., 0] - np.float32(2.5)) / np.float32(1.5)
    used_native = NL.standardize_feature0(arr, 2.5, 1.5)
    assert used_native, "native library should be available here"
    # BIT-identical to the numpy fallback (the kernel divides, not
    # multiply-by-reciprocal) so path choice never perturbs training data
    np.testing.assert_array_equal(arr, want)
    # non-contiguous input falls back cleanly
    assert not NL.standardize_feature0(arr.transpose(1, 0, 2), 0.0, 1.0)


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


def test_streaming_dataset_matches_materialized(tmp_path, rng):
    """load_dataset_streaming must produce bit-identical samples, splits and
    scaler to the materializing ETL + load_dataset path."""
    from graph_wavenet_tpu.data import metr

    n_nodes = 6
    values = (rng.normal(size=(200, n_nodes)) * 5 + 60).astype(np.float32)
    index = (np.datetime64("2012-03-01T00:00") +
             np.arange(200) * np.timedelta64(5, "m"))
    traffic_etl.generate_train_val_test(values, str(tmp_path), index=index)
    mat = metr.load_dataset(str(tmp_path), batch_size=8, seed=0)
    stream = metr.load_dataset_streaming(values, index=index, batch_size=8,
                                         seed=0)

    assert np.isclose(stream["scaler"].mean, mat["scaler"].mean, rtol=1e-6)
    assert np.isclose(stream["scaler"].std, mat["scaler"].std, rtol=1e-5)

    for split in ("train", "val", "test"):
        xs_m, ys_m, xs_s, ys_s = [], [], [], []
        for x, y in mat[split + "_loader"].get_iterator():
            xs_m.append(x)
            ys_m.append(y)
        for x, y in stream[split + "_loader"].get_iterator():
            xs_s.append(x)
            ys_s.append(y)
        n_real = mat[split + "_loader"].num_real
        assert stream[split + "_loader"].num_real == n_real
        np.testing.assert_allclose(
            np.concatenate(xs_s)[:n_real], np.concatenate(xs_m)[:n_real],
            atol=1e-5)
        np.testing.assert_allclose(
            np.concatenate(ys_s)[:n_real], np.concatenate(ys_m)[:n_real],
            atol=1e-5)
    np.testing.assert_allclose(stream["y_test"], mat["y_test"], atol=1e-6)


@pytest.mark.slow
def test_streaming_dataset_trains(tmp_path, rng):
    """Runner.fit consumes the streaming dict unchanged."""
    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data import metr
    from graph_wavenet_tpu.train.engine import Engine
    from graph_wavenet_tpu.train.runner import Runner

    n_nodes = 6
    values = (rng.normal(size=(150, n_nodes)) * 5 + 60).astype(np.float32)
    index = (np.datetime64("2012-03-01T00:00") +
             np.arange(150) * np.timedelta64(5, "m"))
    data = metr.load_dataset_streaming(values, index=index, batch_size=8,
                                       seed=0)
    cfg = ModelConfig(num_nodes=n_nodes, out_dim=12, residual_channels=4,
                      dilation_channels=4, skip_channels=8, end_channels=8,
                      blocks=2, layers=2, dropout=0.0, n_supports=2)
    tcfg = TrainConfig(epochs=1, save_dir=str(tmp_path), print_every=1000)
    a = rng.random((2, n_nodes, n_nodes)).astype(np.float32)
    supports = [s / s.sum(-1, keepdims=True) for s in a]
    runner = Runner(Engine(cfg, tcfg, data["scaler"]), tcfg,
                    log_fn=lambda *a: None)
    result = runner.fit(data, supports)
    runner.test(data, supports, result)
    assert np.isfinite(result.test_metrics["mae"])
