"""Device-resident loaders must yield bit-identical batches to the host
batchers under the same seed, including padding and shuffle order."""

import numpy as np
import pytest

from graph_wavenet_tpu.data.device_loader import (
    DeviceArrayLoader,
    DeviceWindowLoader,
)
from graph_wavenet_tpu.data.loader import DataLoader
from graph_wavenet_tpu.data.native_loader import WindowDataLoader


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _collect(loader):
    xs, ys = [], []
    for batch in loader.get_iterator():
        xs.append(np.asarray(batch[0]))
        ys.append(np.asarray(batch[1]))
    return np.concatenate(xs), np.concatenate(ys)


def test_device_array_loader_matches_host(rng):
    xs = rng.normal(size=(37, 12, 5, 2)).astype(np.float32)
    ys = rng.normal(size=(37, 12, 5, 2)).astype(np.float32)
    host = DataLoader(xs, ys, 8, rng=np.random.default_rng(3))
    dev = DeviceArrayLoader(xs, ys, 8, rng=np.random.default_rng(3))
    assert dev.num_real == host.num_real and dev.size == host.size
    host.shuffle()
    dev.shuffle()
    hx, hy = _collect(host)
    dx, dy = _collect(dev)
    np.testing.assert_array_equal(dx, hx)
    np.testing.assert_array_equal(dy, hy)


def test_device_array_loader_adj_idx(rng):
    xs = rng.normal(size=(20, 4, 3, 2)).astype(np.float32)
    ys = rng.normal(size=(20, 4, 3, 2)).astype(np.float32)
    idx = rng.integers(0, 5, size=20)
    host = DataLoader(xs, ys, 8, adj_idx=idx, rng=np.random.default_rng(1))
    dev = DeviceArrayLoader(xs, ys, 8, adj_idx=idx,
                            rng=np.random.default_rng(1))
    host.shuffle()
    dev.shuffle()
    for (hx, hy, hi), (dx, dy, di) in zip(host.get_iterator(),
                                          dev.get_iterator()):
        np.testing.assert_array_equal(np.asarray(dx), hx)
        np.testing.assert_array_equal(np.asarray(di), hi)
        assert isinstance(di, np.ndarray)   # host-side for support gathers


def test_device_window_loader_matches_host(rng):
    series = rng.normal(size=(120, 6, 2)).astype(np.float32)
    y_series = rng.normal(size=(120, 6, 2)).astype(np.float32)
    host = WindowDataLoader(series, 12, 12, 8, y_series=y_series,
                            rng=np.random.default_rng(5))
    dev = DeviceWindowLoader(series, 12, 12, 8, y_series=y_series,
                             rng=np.random.default_rng(5))
    assert dev.num_real == host.num_real
    host.shuffle()
    dev.shuffle()
    hx, hy = _collect(host)
    dx, dy = _collect(dev)
    np.testing.assert_array_equal(dx, hx)
    np.testing.assert_array_equal(dy, hy)


def test_streaming_dataset_device_resident_matches_host(rng):
    from graph_wavenet_tpu.data import metr

    values = (rng.normal(size=(200, 6)) * 5 + 60).astype(np.float32)
    index = (np.datetime64("2012-03-01T00:00") +
             np.arange(200) * np.timedelta64(5, "m"))
    host = metr.load_dataset_streaming(values, index=index, batch_size=8,
                                       seed=0)
    dev = metr.load_dataset_streaming(values, index=index, batch_size=8,
                                      seed=0, resident="device")
    assert dev["scaler"].mean == host["scaler"].mean
    for split in ("train", "val", "test"):
        hx, hy = _collect(host[split + "_loader"])
        dx, dy = _collect(dev[split + "_loader"])
        np.testing.assert_array_equal(dx, hx)
        np.testing.assert_array_equal(dy, hy)


def test_resident_arg_validated():
    from graph_wavenet_tpu.data.loader import loader_cls

    with pytest.raises(ValueError, match="resident"):
        loader_cls("hbm")


def test_device_loaders_sharded_batches(rng):
    """With a batch NamedSharding, gathers come out sharded over the mesh's
    data axis and a pjit-consuming step needs no resharding."""
    import jax
    from graph_wavenet_tpu.config import MeshConfig
    from graph_wavenet_tpu.parallel import mesh as M

    mesh = M.make_mesh(MeshConfig())
    sh = M.batch_sharding(mesh, MeshConfig())

    xs = rng.normal(size=(32, 12, 5, 2)).astype(np.float32)
    ys = rng.normal(size=(32, 12, 5, 2)).astype(np.float32)
    dev = DeviceArrayLoader(xs, ys, 8, rng=np.random.default_rng(3),
                            sharding=sh)
    host = DataLoader(xs, ys, 8, rng=np.random.default_rng(3))
    for (dx, dy), (hx, hy) in zip(dev.get_iterator(), host.get_iterator()):
        assert dx.sharding.is_equivalent_to(sh, dx.ndim)
        np.testing.assert_array_equal(np.asarray(dx), hx)
        np.testing.assert_array_equal(np.asarray(dy), hy)

    series = rng.normal(size=(100, 5, 2)).astype(np.float32)
    dwin = DeviceWindowLoader(series, 12, 12, 8,
                              rng=np.random.default_rng(4), sharding=sh)
    hwin = WindowDataLoader(series, 12, 12, 8, rng=np.random.default_rng(4))
    for (dx, dy), (hx, hy) in zip(dwin.get_iterator(), hwin.get_iterator()):
        assert dx.sharding.is_equivalent_to(sh, dx.ndim)
        np.testing.assert_array_equal(np.asarray(dx), hx)
        np.testing.assert_array_equal(np.asarray(dy), hy)
