"""Shared harness for running the ACTUAL PyTorch reference trainer to
convergence — used by the convergence A/B test
(``test_convergence_ab.py``) and the full-size run
(``garage/convergence_ab.py``).

``test_reference_import_parity.py`` pins single steps against the
imported reference; this harness drives the reference's WHOLE training
loop — the epoch/shuffle/val/best-checkpoint/test semantics that live in
the reference CLI (`/root/reference/train.py:233-297,300-404`) — so final
converged accuracy can be A/B'd against ``Runner.fit``/``Runner.test`` on
a shared dataset. Reimplemented from the documented semantics, driven by
OUR data dict (same npz splits, loaders and shuffle seeds as the JAX
side), so both frameworks see identical data.
"""

from __future__ import annotations

import copy
import importlib
import pathlib
import sys
import types

import numpy as np
import torch

REF = pathlib.Path("/root/reference")


def reference_available() -> bool:
    return (REF / "model.py").exists()


def import_reference() -> types.SimpleNamespace:
    """Import the reference modules with the environment shims of
    ``test_reference_import_parity.ref`` (no behavior changes: ipdb/nibabel
    stubs, headless matplotlib)."""
    for name in ("ipdb", "nibabel"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.set_trace = lambda: None
            sys.modules[name] = mod
    import matplotlib

    matplotlib.use("Agg", force=True)
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    orig_use = matplotlib.use
    matplotlib.use = lambda *a, **k: None  # reference engine.py:5 sets TkAgg
    try:
        ns = types.SimpleNamespace(
            model=importlib.import_module("model"),
            engine=importlib.import_module("engine"),
            util=importlib.import_module("Utils.util"),
        )
    finally:
        matplotlib.use = orig_use
    return ns


def make_runnable(m: torch.nn.Module) -> torch.nn.Module:
    """Swap the reference gwnet's tuple-kernel Conv1d modules for equivalent
    Conv2d (same weights; torch>=2 rejects Conv1d on 4-D input — see
    test_reference_import_parity.py's module docstring)."""
    for mlist in (m.gate_convs, m.residual_convs, m.skip_convs):
        for i, g in enumerate(mlist):
            if isinstance(g, torch.nn.Conv1d):
                d = g.dilation[0]
                c = torch.nn.Conv2d(
                    g.weight.shape[1], g.weight.shape[0],
                    (g.weight.shape[2], g.weight.shape[3]), dilation=d)
                with torch.no_grad():
                    c.weight.copy_(g.weight)
                    c.bias.copy_(g.bias)
                mlist[i] = c
    return m


def build_ref_trainer(ref, cfg, scaler, supports, lr=1e-3, wd=1e-4,
                      aptinit=None, seed=0):
    """The reference ``trainer`` (`engine.py:9-39`) for a ModelConfig.
    ``cfg`` must follow the engine's channel convention (skip = nhid*8,
    end = nhid*16, `engine.py:24,30`); ``scaler`` is ours (mean/std)."""
    assert cfg.skip_channels == 8 * cfg.residual_channels
    assert cfg.end_channels == 16 * cfg.residual_channels
    torch.manual_seed(seed)
    t = ref.engine.trainer(
        ref.util.StandardScaler(scaler.mean, scaler.std), cfg.in_dim,
        cfg.out_dim, cfg.num_nodes, cfg.residual_channels, cfg.dropout,
        lr, wd, "cpu",
        None if supports is None else [torch.tensor(np.asarray(s))
                                       for s in supports],
        cfg.gcn_bool, cfg.addaptadj,
        None if aptinit is None else torch.tensor(np.asarray(aptinit)),
        cfg.blocks, cfg.layers)
    make_runnable(t.model)
    # the ctor's Adam captured the pre-swap Conv1d parameter objects
    t.optimizer = torch.optim.Adam(t.model.parameters(), lr=lr,
                                   weight_decay=wd)
    return t


def _to_ref_batch(x: np.ndarray) -> torch.Tensor:
    """(B, T, N, C) numpy -> the reference's (B, C, N, T) tensor
    (`train.py:244-247` transpose(1, 3))."""
    return torch.tensor(x.transpose(0, 3, 2, 1), dtype=torch.float32)


def run_reference_training(ref, t, data: dict, epochs: int,
                           log=print) -> dict:
    """The reference CLI's shared-graph training + test flow
    (`train.py:233-297,377-404`): per-epoch shuffle, ``trainer.train`` per
    batch, ``trainer.eval`` over val, best epoch by min val loss
    (state dict kept in memory instead of per-epoch .pth files), then the
    no-grad per-horizon test evaluation with predictions truncated to the
    real test count.

    ``data`` is OUR loader dict (`metr.load_dataset`) — identical batches
    and shuffle order to a same-seed ``Runner.fit`` run.
    """
    history = []
    best_val = float("inf")
    best_sd = None
    for epoch in range(1, epochs + 1):
        data["train_loader"].shuffle()
        tr = []
        for x, y in data["train_loader"].get_iterator():
            loss, mape, rmse = t.train(_to_ref_batch(np.asarray(x)),
                                       _to_ref_batch(np.asarray(y))[:, 0])
            tr.append(loss)
        va = []
        for x, y in data["val_loader"].get_iterator():
            with torch.no_grad():
                loss, mape, rmse = t.eval(_to_ref_batch(np.asarray(x)),
                                          _to_ref_batch(np.asarray(y))[:, 0])
            va.append(loss)
        ep = {"epoch": epoch, "train_loss": float(np.mean(tr)),
              "valid_loss": float(np.mean(va))}
        history.append(ep)
        log(f"[ref] Epoch: {epoch:03d}, Train Loss: {ep['train_loss']:.4f}, "
            f"Valid Loss: {ep['valid_loss']:.4f}")
        if ep["valid_loss"] < best_val:
            best_val = ep["valid_loss"]
            best_sd = copy.deepcopy(t.model.state_dict())

    t.model.load_state_dict(best_sd)
    t.model.eval()
    outputs = []
    for x, _y in data["test_loader"].get_iterator():
        with torch.no_grad():
            preds = t.model(_to_ref_batch(np.asarray(x))).transpose(1, 3)
        outputs.append(preds.squeeze(1))
    yhat = torch.cat(outputs, dim=0)
    realy = torch.tensor(
        np.asarray(data["y_test"])[..., 0].transpose(0, 2, 1),
        dtype=torch.float32)                       # (n, N, T)
    yhat = yhat[:realy.size(0)]

    scaler = t.scaler
    per_h = []
    for i in range(yhat.size(-1)):
        pred = scaler.inverse_transform(yhat[:, :, i])
        mae, mape, rmse = ref.util.metric(pred, realy[:, :, i])
        per_h.append((float(mae), float(mape), float(rmse)))
        log(f"[ref] horizon {i + 1:d}: MAE {per_h[-1][0]:.4f}, MAPE "
            f"{per_h[-1][1]:.4f}, RMSE {per_h[-1][2]:.4f}")
    return {
        "history": history,
        "best_val": best_val,
        "per_horizon": per_h,
        "test_mae": float(np.mean([m[0] for m in per_h])),
        "test_mape": float(np.mean([m[1] for m in per_h])),
        "test_rmse": float(np.mean([m[2] for m in per_h])),
    }


def load_flagship_demo():
    """Import garage/flagship_demo.py (not a package) for its synthetic
    traffic generator."""
    import importlib.util

    path = (pathlib.Path(__file__).resolve().parent.parent / "garage"
            / "flagship_demo.py")
    spec = importlib.util.spec_from_file_location("flagship_demo", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_ab_dataset(out_dir: str, n_nodes: int, n_steps: int,
                    seed: int = 7):
    """METR-shaped npz splits both frameworks read: flagship-demo synthetic
    traffic through OUR ETL (`traffic_etl.generate_train_val_test`, pinned
    against the reference ETL by the parity suite). Returns the raw
    adjacency for `mod_adj`."""
    fd = load_flagship_demo()
    rng = np.random.default_rng(seed)
    adj, _pos = fd.make_sensor_graph(n_nodes, rng)
    values = fd.synth_traffic(n_nodes, n_steps, adj, rng)
    index = (np.datetime64("2012-03-01T00:00")
             + np.arange(n_steps) * np.timedelta64(5, "m"))

    from graph_wavenet_tpu.data.traffic_etl import generate_train_val_test

    generate_train_val_test(values, out_dir, index=index)
    return adj


def engine_from_state_dict(sd: dict, cfg, tcfg, scaler):
    """Our Engine starting from the reference model's exact initial
    weights (matched-init A/B)."""
    import jax
    import jax.numpy as jnp

    from graph_wavenet_tpu.train.engine import Engine, TrainState
    from graph_wavenet_tpu.utils.torch_import import import_state_dict

    engine = Engine(cfg, tcfg, scaler)
    params, model_state = import_state_dict(
        {k: v.detach().numpy() for k, v in sd.items()}, cfg)
    params = jax.tree.map(jnp.asarray, params)
    engine.state = TrainState(
        params=params, opt_state=engine.optimizer.init(params),
        model_state=jax.tree.map(jnp.asarray, model_state),
        step=jnp.zeros((), jnp.int32), rng=engine.state.rng)
    return engine


def build_ref_trainer_syn(ref, cfg, scaler, supports_by_split,
                          seed=0, lr=1e-3, wd=1e-4, addaptadj=False):
    """The reference ``trainer`` with DICT supports -> ``gwnet_diff_G``
    (`engine.py:14-25`). supports_by_split: our ``stack_support_splits``
    output (numpy (n, N, N) stacks per split). addaptadj=False for
    matched-init A/Bs — the reference diff-G's adaptive path draws
    unseedable fresh nodevecs per forward (quirk #2 SURVEY.md §7.4), so
    it cannot be matched pointwise; pass addaptadj=True only for
    DISTRIBUTIONAL comparisons (garage/diffg_fresh_ensemble.py)."""
    assert cfg.skip_channels == 8 * cfg.residual_channels
    assert cfg.end_channels == 16 * cfg.residual_channels
    torch.manual_seed(seed)
    sup_dict = {split: [torch.tensor(np.asarray(s)) for s in sups]
                for split, sups in supports_by_split.items()}
    t = ref.engine.trainer(
        ref.util.StandardScaler(scaler.mean, scaler.std), cfg.in_dim,
        cfg.out_dim, cfg.num_nodes, cfg.residual_channels, cfg.dropout,
        lr, wd, "cpu", sup_dict, cfg.gcn_bool, addaptadj,
        {split: None for split in sup_dict}, cfg.blocks, cfg.layers)
    assert type(t.model).__name__ == "gwnet_diff_G"
    return t


def run_reference_training_syn(ref, t, data: dict, graphs_by_split: dict,
                               F_t: int, epochs: int, log=print) -> dict:
    """The reference CLI's diff-G synthetic flow (`train.py:145-208`,
    `329-361`): per-epoch shuffle, ``train_syn`` per (x, y, adj_idx)
    batch, ``eval_syn`` over val, best epoch by min val loss, then the
    test-split evaluation. One deliberate deviation, matching our
    Runner.test_syn: the test pass uses the TEST split's graphs/supports
    (the reference evaluates state='test' against G['val'] — quirk #3
    SURVEY.md §7.4)."""

    def _syn_batches(loader):
        for x, y, ai in loader.get_iterator():
            yield (_to_ref_batch(np.asarray(x)),
                   _to_ref_batch(np.asarray(y)),
                   torch.tensor(np.asarray(ai)))

    history = []
    best_val = float("inf")
    best_sd = None
    for epoch in range(1, epochs + 1):
        t.set_state("train")
        data["train_loader"].shuffle()
        tr = []
        for x, y, ai in _syn_batches(data["train_loader"]):
            loss, _, _ = t.train_syn(x, y, F_t, graphs_by_split["train"],
                                     adj_idx=ai)
            tr.append(loss)
        t.set_state("val")
        va = []
        for x, y, ai in _syn_batches(data["val_loader"]):
            with torch.no_grad():
                out = t.eval_syn(x, y, F_t, graphs_by_split["val"],
                                 adj_idx=ai)
            va.append(out[0])
        ep = {"epoch": epoch, "train_loss": float(np.mean(tr)),
              "valid_loss": float(np.mean(va))}
        history.append(ep)
        log(f"[ref] Epoch: {epoch:03d}, Train Loss: {ep['train_loss']:.4f}"
            f", Valid Loss: {ep['valid_loss']:.4f}")
        if ep["valid_loss"] < best_val:
            best_val = ep["valid_loss"]
            best_sd = copy.deepcopy(t.model.state_dict())

    t.model.load_state_dict(best_sd)
    t.set_state("test")
    te, tm, tr_ = [], [], []
    for x, y, ai in _syn_batches(data["test_loader"]):
        with torch.no_grad():
            out = t.eval_syn(x, y, F_t, graphs_by_split["test"],
                             adj_idx=ai)
        te.append(out[0])
        tm.append(out[1])
        tr_.append(out[2])
    res = {"history": history, "best_val": best_val,
           "test_loss": float(np.mean(te)),
           "test_mape": float(np.mean(tm)),
           "test_rmse": float(np.mean(tr_))}
    log(f"[ref] test loss {res['test_loss']:.4f}, mape "
        f"{res['test_mape']:.4f}, rmse {res['test_rmse']:.4f}")
    return res


def engine_from_state_dict_diff_g(sd: dict, cfg, tcfg, scaler):
    """Our diff-G Engine from the reference model's exact initial
    weights."""
    import jax
    import jax.numpy as jnp

    from graph_wavenet_tpu.train.engine import Engine, TrainState
    from graph_wavenet_tpu.utils.torch_import import import_state_dict

    engine = Engine(cfg, tcfg, scaler, diff_g=True)
    params, model_state = import_state_dict(
        {k: v.detach().numpy() for k, v in sd.items()}, cfg)
    params = jax.tree.map(jnp.asarray, params)
    engine.state = TrainState(
        params=params, opt_state=engine.optimizer.init(params),
        model_state=jax.tree.map(jnp.asarray, model_state),
        step=jnp.zeros((), jnp.int32), rng=engine.state.rng)
    return engine
