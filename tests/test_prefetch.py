"""Device-feed prefetching: batch identity, ordering, error propagation,
and Runner integration (prefetch on == off)."""

import jax
import numpy as np
import pytest

from graph_wavenet_tpu.data.loader import DataLoader
from graph_wavenet_tpu.data.prefetch import prefetch_to_device


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_prefetch_preserves_batches_and_order(rng):
    xs = rng.normal(size=(40, 4, 3, 2)).astype(np.float32)
    ys = rng.normal(size=(40, 4, 3, 2)).astype(np.float32)
    dl = DataLoader(xs, ys, batch_size=8, rng=rng)
    direct = list(dl.get_iterator())
    fetched = list(prefetch_to_device(dl.get_iterator(), size=2))
    assert len(fetched) == len(direct)
    for (xd, yd), (xf, yf) in zip(direct, fetched):
        np.testing.assert_array_equal(np.asarray(xf), xd)
        np.testing.assert_array_equal(np.asarray(yf), yd)


def test_prefetch_producer_exits_when_consumer_abandons(rng):
    """Closing the generator mid-epoch (early break / training-loop
    exception) must release the producer thread — it used to park on the
    bounded q.put forever with device batches pinned in the queue."""
    import threading
    import time

    batches = [(rng.random((4, 2)).astype(np.float32),) for _ in range(50)]
    it = prefetch_to_device(iter(batches), size=2)
    next(it)
    it.close()                               # GeneratorExit -> stop event
    deadline = time.time() + 5.0
    while time.time() < deadline:
        if not any(t.name == "gwnet-prefetch" and t.is_alive()
                   for t in threading.enumerate()):
            break
        time.sleep(0.05)
    assert not any(t.name == "gwnet-prefetch" and t.is_alive()
                   for t in threading.enumerate())


def test_prefetch_passes_through_non_arrays():
    batches = [(np.ones((2, 2), np.float32), "tag", 7)]
    out = list(prefetch_to_device(iter(batches), size=1))
    assert out[0][1] == "tag" and out[0][2] == 7


def test_prefetch_propagates_producer_errors():
    def bad():
        yield (np.ones((2,), np.float32),)
        raise RuntimeError("boom")

    it = prefetch_to_device(bad(), size=1)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


@pytest.mark.slow
def test_runner_fit_same_result_with_and_without_prefetch(rng, tmp_path):
    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.train.engine import Engine
    from graph_wavenet_tpu.train.runner import Runner

    n = 6
    xs = rng.normal(size=(48, 12, n, 2)).astype(np.float32)
    ys = (rng.normal(size=(48, 12, n, 2)) + 50).astype(np.float32)
    cfg = ModelConfig(num_nodes=n, in_dim=2, out_dim=12,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=16, blocks=1, layers=2,
                      gcn_bool=True, addaptadj=True, n_supports=1)
    a = rng.random((n, n)).astype(np.float32)
    supports = [a / a.sum(-1, keepdims=True)]

    def run(prefetch):
        tc = TrainConfig(epochs=1, print_every=10,
                         save_dir=str(tmp_path / f"pf{prefetch}"),
                         prefetch=prefetch)
        data = {}
        loader_rng = np.random.default_rng(1)
        data["train_loader"] = DataLoader(xs, ys, 8, rng=loader_rng)
        data["val_loader"] = DataLoader(xs[:16], ys[:16], 8, rng=loader_rng)
        engine = Engine(cfg, tc, StandardScaler(50.0, 5.0), seed=0)
        runner = Runner(engine, tc)
        res = runner.fit(data, supports)
        return res.history[-1].train["loss"], res.history[-1].valid["loss"]

    t0, v0 = run(0)
    t2, v2 = run(2)
    assert np.isclose(t0, t2, rtol=1e-5)
    assert np.isclose(v0, v2, rtol=1e-5)


def test_async_checkpointer_roundtrip(rng, tmp_path):
    import jax.numpy as jnp

    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.train import checkpoint as ckpt
    from graph_wavenet_tpu.train.engine import Engine

    cfg = ModelConfig(num_nodes=5, in_dim=2, out_dim=4, residual_channels=4,
                      dilation_channels=4, skip_channels=8, end_channels=8,
                      blocks=1, layers=1, gcn_bool=False, addaptadj=False,
                      n_supports=0)
    engine = Engine(cfg, TrainConfig(), StandardScaler(0.0, 1.0), seed=3)
    writer = ckpt.AsyncCheckpointer()
    path = str(tmp_path / "async.msgpack")
    writer.save(path, engine.state, model_cfg=cfg)
    writer.wait()
    restored = ckpt.load_checkpoint(path, engine.state)
    for a, b in zip(jax.tree_util.tree_leaves(engine.state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.load_metadata(path)["model_cfg"] == cfg


def test_async_save_prune_race_stress(tmp_path):
    """Hammer the runner's save->prune pattern: the main thread prunes
    while the worker writes. Atomic publish + tracked-until-deleted scores
    must leave EXACTLY keep best checkpoints (each loadable, with its
    sidecar) and no orphans or .tmp litter."""
    import glob

    from graph_wavenet_tpu.train import checkpoint as ckpt

    writer = ckpt.AsyncCheckpointer()
    scores: dict[str, float] = {}
    keep = 2
    rng = np.random.default_rng(0)

    class Snapshot:
        def __init__(self, v):
            self._p = {"a": np.full(64, v, np.float32)}

        def as_pytree(self):
            return self._p

    vals = rng.random(25)
    for i, v in enumerate(vals):
        path = str(tmp_path / f"ck_{i}_{v:.3f}.msgpack")
        writer.save(path, Snapshot(v), extra={"i": i})
        scores[path] = float(v)
        ckpt.prune_checkpoints(keep, scores)     # races the worker write
    writer.wait()
    ckpt.prune_checkpoints(keep, scores)         # final pass (runner does too)

    files = sorted(glob.glob(str(tmp_path / "*.msgpack")))
    assert len(files) == keep, files
    # pair integrity: no orphan sidecars either (json publishes first and
    # prune keys on the msgpack)
    sidecars = sorted(glob.glob(str(tmp_path / "*.msgpack.json")))
    assert len(sidecars) == keep, sidecars
    from flax import serialization

    best = sorted(range(len(vals)), key=lambda i: vals[i])[:keep]
    for i in best:
        [f] = [f for f in files if f"ck_{i}_" in f]
        with open(f, "rb") as fh:
            pt = serialization.from_bytes({"a": np.zeros(64, np.float32)},
                                          fh.read())
        np.testing.assert_allclose(pt["a"][0], vals[i], atol=1e-6)
        assert ckpt.load_metadata(f)["extra"]["i"] == i
    assert not glob.glob(str(tmp_path / "*.tmp*"))


def test_async_checkpointer_propagates_errors(tmp_path):
    from graph_wavenet_tpu.train import checkpoint as ckpt

    writer = ckpt.AsyncCheckpointer()

    class Snapshot:
        def as_pytree(self):
            return {"a": np.zeros(2, np.float32)}

    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file in the way")
    # worker-side failure: the checkpoint's parent "directory" is a file
    writer.save(str(blocker / "x.msgpack"), Snapshot())
    with pytest.raises((NotADirectoryError, FileExistsError)):
        writer.wait()
