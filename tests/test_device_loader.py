"""Device-resident loaders must yield bit-identical batches to the host
batchers under the same seed, including padding and shuffle order."""

import jax
import numpy as np
import pytest

from graph_wavenet_tpu.data.device_loader import (
    DeviceArrayLoader,
    DeviceWindowLoader,
)
from graph_wavenet_tpu.data.loader import DataLoader
from graph_wavenet_tpu.data.native_loader import WindowDataLoader


pytestmark = pytest.mark.slow  # multi-epoch/mesh loops; fast tier skips (README)

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


def test_dp_train_with_sharded_device_loader_matches_single(rng):
    """A DP train step consuming sharded device-resident batches must match
    the same step on unsharded host batches bit-for-bit (same seed)."""
    import jax.numpy as jnp
    from graph_wavenet_tpu.config import MeshConfig, ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.parallel import mesh as M
    from graph_wavenet_tpu.train.engine import Engine

    n = 6
    cfg = ModelConfig(num_nodes=n, in_dim=2, out_dim=12,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=16, blocks=1, layers=2,
                      dropout=0.0, gcn_bool=True, addaptadj=True,
                      n_supports=1)
    xs = rng.normal(size=(16, 12, n, 2)).astype(np.float32)
    ys = (rng.normal(size=(16, 12, n, 2)) + 50).astype(np.float32)
    a = rng.random((n, n)).astype(np.float32)
    supports = [jnp.asarray(a / a.sum(-1, keepdims=True))]

    mesh = M.make_mesh(MeshConfig())
    sh = M.batch_sharding(mesh, MeshConfig())
    dev = DeviceArrayLoader(xs, ys, 16, rng=np.random.default_rng(1),
                            sharding=sh)

    def step_on(x, y, state_holder):
        engine, state = state_holder
        new_state, m = engine.train_step(state, jnp.asarray(x),
                                         jnp.asarray(y), supports)
        state_holder[1] = new_state
        return float(m["loss"])

    e1 = Engine(cfg, TrainConfig(), StandardScaler(50.0, 5.0), seed=0)
    e2 = Engine(cfg, TrainConfig(), StandardScaler(50.0, 5.0), seed=0)
    h1, h2 = [e1, e1.state], [e2, e2.state]
    (dx, dy), = list(dev.get_iterator())
    loss_sharded = step_on(dx, dy, h1)
    loss_single = step_on(xs, ys, h2)
    assert np.isclose(loss_sharded, loss_single, rtol=1e-6)
    for pa, pb in zip(jax.tree_util.tree_leaves(h1[1].params),
                      jax.tree_util.tree_leaves(h2[1].params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=1e-6)


def test_fused_scan_training_matches_per_step(rng, tmp_path):
    """scan_steps>1 (fused multi-step dispatch) must reproduce the per-step
    path exactly: same final params, same epoch metrics."""
    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.train.engine import Engine
    from graph_wavenet_tpu.train.runner import Runner

    n = 5
    xs = rng.normal(size=(20, 12, n, 2)).astype(np.float32)
    ys = (rng.normal(size=(20, 12, n, 2)) + 50).astype(np.float32)
    cfg = ModelConfig(num_nodes=n, in_dim=2, out_dim=12,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=16, blocks=1, layers=2,
                      gcn_bool=True, addaptadj=True, n_supports=1)
    a = rng.random((n, n)).astype(np.float32)
    supports = [a / a.sum(-1, keepdims=True)]

    def run(scan_steps):
        tc = TrainConfig(epochs=2, print_every=100, scan_steps=scan_steps,
                         save_dir=str(tmp_path / f"s{scan_steps}"))
        data = {
            "train_loader": DeviceArrayLoader(
                xs, ys, 4, rng=np.random.default_rng(1)),
            "val_loader": DeviceArrayLoader(
                xs[:8], ys[:8], 4, rng=np.random.default_rng(1)),
        }
        engine = Engine(cfg, tc, StandardScaler(50.0, 5.0), seed=0)
        res = Runner(engine, tc).fit(data, supports)
        return engine.state, res.history[-1]

    s1, h1 = run(1)
    s3, h3 = run(3)   # 5 batches/epoch -> 1 chunk of 3 + 2 remainder
    assert np.isclose(h1.train["loss"], h3.train["loss"], rtol=1e-6)
    assert np.isclose(h1.valid["loss"], h3.valid["loss"], rtol=1e-6)
    for a_, b_ in zip(jax.tree_util.tree_leaves(s1.params),
                      jax.tree_util.tree_leaves(s3.params)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=2e-6)


def test_fused_scan_window_training_matches_per_step(rng, tmp_path):
    """scan_steps on the windows-on-demand device loader (gather inside the
    scan) must reproduce the per-step path exactly."""
    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data import metr
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.train.engine import Engine
    from graph_wavenet_tpu.train.runner import Runner

    values = (rng.normal(size=(300, 6)) * 5 + 60).astype(np.float32)
    index = (np.datetime64("2012-03-01T00:00") +
             np.arange(300) * np.timedelta64(5, "m"))
    cfg = ModelConfig(num_nodes=6, in_dim=2, out_dim=12,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=16, blocks=1, layers=2,
                      gcn_bool=True, addaptadj=True, n_supports=1)
    a = rng.random((6, 6)).astype(np.float32)
    supports = [a / a.sum(-1, keepdims=True)]

    def run(scan_steps):
        data = metr.load_dataset_streaming(values, index=index,
                                           batch_size=16, seed=0,
                                           resident="device")
        tc = TrainConfig(epochs=1, print_every=100, scan_steps=scan_steps,
                         save_dir=str(tmp_path / f"w{scan_steps}"))
        engine = Engine(cfg, tc, data["scaler"], seed=0)
        runner = Runner(engine, tc, log_fn=lambda *a, **k: None)
        res = runner.fit(data, supports)
        res = runner.test(data, supports, res)
        return engine.state, res.test_metrics

    s1, m1 = run(1)
    s3, m3 = run(3)
    assert np.isclose(m1["mae"], m3["mae"], rtol=1e-6)
    for a_, b_ in zip(jax.tree_util.tree_leaves(s1.params),
                      jax.tree_util.tree_leaves(s3.params)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=2e-6)


def test_fused_scan_diffg_matches_per_step(rng, tmp_path):
    """Fused diff-G training (per-sample supports gathered inside the scan)
    must reproduce the per-step path exactly."""
    from graph_wavenet_tpu.cli import train as train_cli

    def run(scan_steps):
        out = train_cli.main([
            "--data", "syn", "--gcn_bool", "--addaptadj", "--randomadj",
            "--num_nodes", "10", "--seq_length", "24", "--nhid", "4",
            "--blocks", "2", "--layers", "2", "--batch_size", "8",
            "--epochs", "1", "--n_train", "4", "--n_valid", "2",
            "--n_test", "2", "--num_timestep", "60",
            "--resident", "device", "--scan_steps", str(scan_steps),
            "--save", str(tmp_path / f"d{scan_steps}")])
        return out["result"]

    r1 = run(1)
    r3 = run(3)
    assert np.isclose(r1.test_metrics["loss"], r3.test_metrics["loss"],
                      rtol=1e-5)
    assert np.isclose(r1.history[-1].train["loss"],
                      r3.history[-1].train["loss"], rtol=1e-5)


def test_device_window_loader_rejects_out_of_range_anchors(rng):
    """jnp.take's default clip mode would silently duplicate boundary rows
    for bad anchors; the ctor must reject them like the host path does."""
    series = rng.normal(size=(40, 5, 2)).astype(np.float32)
    with pytest.raises(ValueError, match="anchors out of range"):
        DeviceWindowLoader(series, window=12, horizon=12, batch_size=8,
                           anchors=np.arange(40))   # y reach past the end
    with pytest.raises(ValueError, match="anchors out of range"):
        DeviceWindowLoader(series, window=12, horizon=12, batch_size=8,
                           anchors=np.array([3]))   # x start before row 0
    # boundary anchors are fine and match the host loader bit-for-bit
    ok = WindowDataLoader.valid_anchors(40, 12, 12)
    edge = np.array([ok[0], ok[-1]])
    dev = DeviceWindowLoader(series, window=12, horizon=12, batch_size=2,
                             anchors=edge)
    host = WindowDataLoader(series, window=12, horizon=12, batch_size=2,
                            anchors=edge)
    dx, dy = _collect(dev)
    hx, hy = _collect(host)
    np.testing.assert_array_equal(dx, hx)
    np.testing.assert_array_equal(dy, hy)
