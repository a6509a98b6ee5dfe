"""Runner-level integration tests: learning across epochs, best-checkpoint
selection, resume, checkpoint pruning."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from graph_wavenet_tpu.config import ModelConfig, TrainConfig
from graph_wavenet_tpu.data.loader import DataLoader
from graph_wavenet_tpu.data.scaler import StandardScaler
from graph_wavenet_tpu.train.engine import Engine
from graph_wavenet_tpu.train.runner import Runner

N = 12


pytestmark = pytest.mark.slow  # multi-epoch/mesh loops; fast tier skips (README)

@pytest.fixture
def dataset(rng):
    """A learnable toy dataset: targets are a fixed linear map of a noisy
    AR signal, so the loss decreases quickly."""
    n = 96
    x = rng.normal(size=(n, 12, N, 2)).astype(np.float32)
    y = np.roll(x, -1, axis=1) * 2.0 + 5.0
    y = y.astype(np.float32)
    data = {
        "x_test": x[:32], "y_test": y[:32],
        "train_loader": DataLoader(x[:64], y[:64], 16, rng=rng),
        "val_loader": DataLoader(x[64:80], y[64:80], 16, rng=rng),
        "test_loader": DataLoader(x[80:], y[80:], 16, rng=rng),
    }
    data["x_test"], data["y_test"] = x[80:], y[80:]
    a = rng.random((2, N, N)).astype(np.float32)
    supports = [s / s.sum(-1, keepdims=True) for s in a]
    return data, supports


def make_runner(tmp_path, epochs=3, keep=0):
    cfg = ModelConfig(num_nodes=N, out_dim=12, residual_channels=8,
                      dilation_channels=8, skip_channels=16,
                      end_channels=32, blocks=2, layers=2, dropout=0.0,
                      n_supports=2)
    tcfg = TrainConfig(epochs=epochs, learning_rate=3e-3,
                      save_dir=str(tmp_path), print_every=1000,
                      keep_checkpoints=keep)
    engine = Engine(cfg, tcfg, StandardScaler(5.0, 2.0))
    return Runner(engine, tcfg, log_fn=lambda *a: None), cfg, tcfg


def test_fit_learns_and_selects_best(tmp_path, dataset):
    data, supports = dataset
    runner, cfg, tcfg = make_runner(tmp_path, epochs=3)
    result = runner.fit(data, supports)
    assert len(result.history) == 3
    assert (result.history[-1].train["loss"]
            < result.history[0].train["loss"])
    assert result.best_epoch >= 1
    assert os.path.exists(result.best_checkpoint)
    assert result.best_val_loss == min(h.valid["loss"]
                                       for h in result.history)
    res2 = runner.test(data, supports, result)
    assert len(res2.per_horizon) == 12
    assert all(np.isfinite(v) for v in res2.test_metrics.values())


def test_history_jsonl_written(tmp_path, dataset):
    import json
    data, supports = dataset
    runner, cfg, tcfg = make_runner(tmp_path, epochs=2)
    runner.fit(data, supports)
    lines = open(os.path.join(str(tmp_path), "history.jsonl")).read(
        ).strip().splitlines()
    assert len(lines) == 3               # run-start marker + 2 epochs
    assert "run_start" in json.loads(lines[0])
    rec = json.loads(lines[-1])
    assert rec["epoch"] == 2 and "loss" in rec["valid"]


def test_resume_continues_from_checkpoint(tmp_path, dataset):
    data, supports = dataset
    runner, cfg, tcfg = make_runner(tmp_path, epochs=2)
    r1 = runner.fit(data, supports)
    last_ckpt = sorted(
        (p for p in os.listdir(tmp_path) if p.endswith(".msgpack")),
        key=lambda p: os.path.getmtime(os.path.join(tmp_path, p)))[-1]

    runner2, _, _ = make_runner(tmp_path, epochs=4)
    r2 = runner2.fit(data, supports,
                     resume_from=os.path.join(tmp_path, last_ckpt))
    # epochs 3..4 only
    assert [h.epoch for h in r2.history] == [3, 4]
    assert r2.history[-1].train["loss"] < r1.history[0].train["loss"]


def test_checkpoint_pruning(tmp_path, dataset):
    data, supports = dataset
    runner, cfg, tcfg = make_runner(tmp_path, epochs=4, keep=2)
    runner.fit(data, supports)
    ckpts = [p for p in os.listdir(tmp_path) if p.endswith(".msgpack")]
    assert len(ckpts) == 2


def test_checkpoint_pruning_keep_one_retains_best(tmp_path, dataset):
    """keep_checkpoints=1 under the (default, async) writer used to hit
    prune's old keep<=0 'keep all' sentinel and retain every epoch; it must
    keep exactly the best checkpoint, which _finalize_best then reloads."""
    data, supports = dataset
    runner, cfg, tcfg = make_runner(tmp_path, epochs=4, keep=1)
    result = runner.fit(data, supports)
    ckpts = [p for p in os.listdir(tmp_path) if p.endswith(".msgpack")]
    assert len(ckpts) == 1
    assert os.path.join(str(tmp_path), ckpts[0]) == result.best_checkpoint


def test_epoch_watchdog_detects_wedge(tmp_path, dataset):
    """An epoch that exceeds epoch_timeout_s raises DeviceWedgedError and
    writes emergency diagnostics (failure detection — SURVEY.md §5 gap)."""
    import dataclasses
    import json
    from graph_wavenet_tpu.train.runner import DeviceWedgedError

    data, supports = dataset
    runner, cfg, tcfg = make_runner(tmp_path, epochs=2)
    tcfg = dataclasses.replace(tcfg, epoch_timeout_s=1e-3)
    runner = Runner(runner.engine, tcfg, log_fn=lambda *a: None)
    with pytest.raises(DeviceWedgedError):
        runner.fit(data, supports)
    info = json.load(open(os.path.join(str(tmp_path), "emergency.json")))
    assert "exceeded" in info["reason"] or "wedged" in info["reason"]


def test_fit_with_sparse_supports(tmp_path, dataset):
    """Runner.fit must accept ELL/block-sparse support objects (they are
    pytrees, not arrays — regression: jnp.asarray coercion crashed them)."""
    from graph_wavenet_tpu.ops import block_sparse, sparse

    data, _ = dataset
    runner, cfg, tcfg = make_runner(tmp_path, epochs=1)
    sup = [sparse.random_sparse_support(N, 3, np.random.default_rng(1)),
           block_sparse.random_block_support(3, 2, 4,
                                             np.random.default_rng(2))]
    res = runner.fit(data, sup)
    assert np.isfinite(res.best_val_loss)
    res = runner.test(data, sup, res)
    assert np.isfinite(res.test_metrics["mae"])


def test_early_stopping(tmp_path, dataset):
    import dataclasses
    data, supports = dataset
    runner, cfg, tcfg = make_runner(tmp_path, epochs=6)
    tcfg = dataclasses.replace(tcfg, early_stop_patience=2)
    runner = Runner(runner.engine, tcfg, log_fn=lambda *a: None)
    # deterministic plateau: every epoch evaluates to the same val loss,
    # so epoch 1 is the best and patience=2 stops training at epoch 3
    runner._eval_split = lambda *a, **k: [
        {"loss": jnp.asarray(1.0), "mape": jnp.asarray(0.1),
         "rmse": jnp.asarray(1.0)}]
    res = runner.fit(data, supports)
    assert len(res.history) == 3
    assert res.best_epoch == 1


def test_wedge_then_resume_roundtrip(tmp_path, dataset):
    """The full failure-recovery story: a run that wedges after epoch 1
    leaves a usable checkpoint + diagnostics; a new runner resumes from it
    and finishes. (The wedge is injected — the timer mechanics are covered
    by test_epoch_watchdog_detects_wedge.)"""
    import glob
    import json
    from graph_wavenet_tpu.train.runner import DeviceWedgedError

    data, supports = dataset
    runner, cfg, tcfg = make_runner(tmp_path, epochs=3)
    orig_eval = runner._eval_split
    calls = {"n": 0}

    def eval_then_wedge(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:                 # epoch 2's validation
            raise DeviceWedgedError("injected wedge")
        return orig_eval(*a, **k)

    runner._eval_split = eval_then_wedge
    with pytest.raises(DeviceWedgedError):
        runner.fit(data, supports)
    info = json.load(open(os.path.join(str(tmp_path), "emergency.json")))
    assert info["epochs_completed"] == 1
    ckpts = sorted(glob.glob(os.path.join(str(tmp_path), "*.msgpack")))
    assert ckpts, "epoch-1 checkpoint must exist"

    runner2, _, _ = make_runner(tmp_path, epochs=3)
    res = runner2.fit(data, supports, resume_from=ckpts[0])
    assert res.history[-1].epoch == 3


def test_fit_is_deterministic(tmp_path, rng):
    """Same seed + same data -> bit-identical loss history (reproducibility
    the reference approximates with global seeds, train.py:46-49)."""
    n = 96
    x = rng.normal(size=(n, 12, N, 2)).astype(np.float32)
    y = (np.roll(x, -1, axis=1) * 2.0 + 5.0).astype(np.float32)
    a = rng.random((2, N, N)).astype(np.float32)
    supports = [s / s.sum(-1, keepdims=True) for s in a]

    def run(subdir):
        data = {
            "x_test": x[80:], "y_test": y[80:],
            "train_loader": DataLoader(x[:64], y[:64], 16,
                                       rng=np.random.default_rng(7)),
            "val_loader": DataLoader(x[64:80], y[64:80], 16,
                                     rng=np.random.default_rng(8)),
            "test_loader": DataLoader(x[80:], y[80:], 16,
                                      rng=np.random.default_rng(9)),
        }
        runner, cfg, tcfg = make_runner(tmp_path / subdir, epochs=2)
        res = runner.fit(data, supports)
        return [h.train["loss"] for h in res.history]

    assert run("a") == run("b")


def test_fit_on_mesh_matches_single_device(tmp_path, dataset):
    """Runner(mesh=...): the full production loop on a DP mesh produces the
    same history as the single-device loop (GSPMD exactness at loop level;
    engine-level exactness is test_parallel.py)."""
    from graph_wavenet_tpu.config import MeshConfig
    from graph_wavenet_tpu.parallel import mesh as M

    del dataset

    def build():
        # one generator threaded through data AND loaders, so both runs see
        # bit-identical batches in identical shuffle order
        g = np.random.default_rng(7)
        x = g.normal(size=(96, 12, N, 2)).astype(np.float32)
        y = (np.roll(x, -1, axis=1) * 2.0 + 5.0).astype(np.float32)
        d = {
            "x_test": x[80:], "y_test": y[80:],
            "train_loader": DataLoader(x[:64], y[:64], 16, rng=g),
            "val_loader": DataLoader(x[64:80], y[64:80], 16, rng=g),
            "test_loader": DataLoader(x[80:], y[80:], 16, rng=g),
        }
        a = g.random((2, N, N)).astype(np.float32)
        return d, [s / s.sum(-1, keepdims=True) for s in a]

    data, supports = build()
    runner_ref, _, _ = make_runner(tmp_path / "ref", epochs=2)
    ref = runner_ref.fit(data, supports)

    data2, supports2 = build()
    mcfg = MeshConfig()
    mesh = M.make_mesh(mcfg)
    cfg = ModelConfig(num_nodes=N, out_dim=12, residual_channels=8,
                      dilation_channels=8, skip_channels=16,
                      end_channels=32, blocks=2, layers=2, dropout=0.0,
                      n_supports=2)
    tcfg = TrainConfig(epochs=2, learning_rate=3e-3,
                       save_dir=str(tmp_path / "mesh"), print_every=1000)
    engine = Engine(cfg, tcfg, StandardScaler(5.0, 2.0))
    runner = Runner(engine, tcfg, log_fn=lambda *a: None, mesh=mesh,
                    mesh_cfg=mcfg)
    got = runner.fit(data2, supports2)
    # identical data + seeds -> same losses to fp tolerance
    for h_ref, h_got in zip(ref.history, got.history):
        np.testing.assert_allclose(h_got.train["loss"],
                                   h_ref.train["loss"], rtol=1e-5)
        np.testing.assert_allclose(h_got.valid["loss"],
                                   h_ref.valid["loss"], rtol=1e-5)


def test_runner_mesh_accepts_scan_rejects_prefetch(tmp_path):
    """r4 contract: scan_steps>1 composes with the mesh (sharded
    device-resident fused feed, tests/test_parallel.py pins exactness);
    only the single-device prefetch pipeline is still refused."""
    from graph_wavenet_tpu.config import MeshConfig
    from graph_wavenet_tpu.parallel import mesh as M

    cfg = ModelConfig(num_nodes=N, out_dim=12, residual_channels=8,
                      dilation_channels=8, skip_channels=16,
                      end_channels=32, blocks=2, layers=2, n_supports=2)
    tcfg = TrainConfig(scan_steps=4, save_dir=str(tmp_path))
    engine = Engine(cfg, tcfg, StandardScaler(0.0, 1.0))
    Runner(engine, tcfg, mesh=M.make_mesh(MeshConfig()))   # no raise

    tcfg2 = TrainConfig(prefetch=2, save_dir=str(tmp_path))
    engine2 = Engine(cfg, tcfg2, StandardScaler(0.0, 1.0))
    with pytest.raises(ValueError, match="prefetch"):
        Runner(engine2, tcfg2, mesh=M.make_mesh(MeshConfig()))


def _syn_runner(tmp_path, same_g, mesh=None, mesh_cfg=None, seed=3):
    from graph_wavenet_tpu.config import DataConfig
    from graph_wavenet_tpu.data.synthetic import (
        load_dataset_syn,
        stack_support_splits,
    )

    dcfg = DataConfig(dataset="syn", num_nodes=10, seq_length=12,
                      n_train=16, n_valid=8, n_test=8, num_timestep=80,
                      same_g=same_g, n_communities=2)
    data, adjs, F_t, G = load_dataset_syn(dcfg, batch_size=8, seed=seed,
                                          resident="host")
    cfg = ModelConfig(num_nodes=10, in_dim=1, out_dim=dcfg.seq_length,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=8, blocks=4, layers=2,
                      dropout=0.0, n_supports=2, start_dilation=1)
    tcfg = TrainConfig(epochs=2, save_dir=str(tmp_path), print_every=1000)
    engine = Engine(cfg, tcfg, data["scaler"], diff_g=not same_g)
    runner = Runner(engine, tcfg, log_fn=lambda *a: None, mesh=mesh,
                    mesh_cfg=mesh_cfg)
    if same_g:
        return runner.fit_syn_shared(data, adjs, G, F_t,
                                     dcfg.n_communities)
    sup = stack_support_splits(adjs, dcfg.n_train, dcfg.n_test)
    return runner.fit_syn(data, sup, G, F_t, dcfg.n_communities)


@pytest.mark.parametrize("mesh_kind", ["dp", "tp"])
@pytest.mark.parametrize("same_g", [True, False])
def test_fit_syn_on_mesh_matches_single_device(tmp_path, same_g, mesh_kind):
    """Synthetic fit variants (shared-graph and per-sample diff-G) under a
    pure-DP mesh and a DPxnode-TP mesh reproduce the single-device
    training history."""
    from graph_wavenet_tpu.config import MeshConfig
    from graph_wavenet_tpu.parallel import mesh as M

    ref = _syn_runner(tmp_path / "ref", same_g)
    mcfg = (MeshConfig() if mesh_kind == "dp"
            else MeshConfig(data_axis=4, model_axis=2, shard_nodes=True))
    got = _syn_runner(tmp_path / "mesh", same_g, mesh=M.make_mesh(mcfg),
                      mesh_cfg=mcfg)
    assert len(got.history) == len(ref.history) and ref.history
    for h_ref, h_got in zip(ref.history, got.history):
        np.testing.assert_allclose(h_got.train["loss"],
                                   h_ref.train["loss"], rtol=1e-5)
        np.testing.assert_allclose(h_got.valid["loss"],
                                   h_ref.valid["loss"], rtol=1e-5)
