"""Serving-path tests: batch predictor, rolling scan, autoregressive
rollout, sequence reconstruction, checkpoint loading."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from graph_wavenet_tpu.config import ModelConfig, TrainConfig
from graph_wavenet_tpu.data.scaler import StandardScaler
from graph_wavenet_tpu.data.windows import reverse_sliding_window
from graph_wavenet_tpu.models.gwnet import apply_gwnet, init_gwnet
from graph_wavenet_tpu.train import serving

N = 10


def make_forecaster(rng, scaler=None):
    cfg = ModelConfig(num_nodes=N, out_dim=6, residual_channels=8,
                      dilation_channels=8, skip_channels=16,
                      end_channels=32, blocks=2, layers=2, dropout=0.0,
                      n_supports=2)
    params, state = init_gwnet(jax.random.key(0), cfg)
    a = rng.random((2, N, N)).astype(np.float32)
    supports = [jnp.asarray(s / s.sum(-1, keepdims=True)) for s in a]
    return serving.Forecaster(cfg, params, state, supports,
                              scaler or StandardScaler(3.0, 2.0))


@pytest.mark.slow
def test_predict_layout_and_inverse_transform(rng):
    f = make_forecaster(rng)
    x = jnp.asarray(rng.normal(size=(4, 12, N, 2)).astype(np.float32))
    pred = f.predict(x)
    assert pred.shape == (4, 6, N)
    out, _ = apply_gwnet(f.cfg, f.params, f.model_state, x, f.supports)
    want = np.transpose(np.asarray(out)[:, -1], (0, 2, 1)) * 2.0 + 3.0
    np.testing.assert_allclose(np.asarray(pred), want, atol=1e-5)


def test_rolling_forecast_matches_batched(rng):
    f = make_forecaster(rng)
    history = jnp.asarray(rng.normal(size=(30, N, 2)).astype(np.float32))
    rolled = serving.rolling_forecast(f, history, window=12)
    assert rolled.shape == (19, 6, N)
    # origin 5 equals a direct predict on that window
    want = f.predict(history[5:17][None])[0]
    np.testing.assert_allclose(np.asarray(rolled[5]), np.asarray(want),
                               atol=1e-5)


def test_autoregressive_forecast(rng):
    f = make_forecaster(rng)
    x = jnp.asarray(rng.normal(size=(2, 12, N, 2)).astype(np.float32))
    preds = serving.autoregressive_forecast(f, x, n_rounds=3)
    assert preds.shape == (2, 18, N)
    # first round equals the one-shot forecast
    np.testing.assert_allclose(np.asarray(preds[:, :6]),
                               np.asarray(f.predict(x)), atol=1e-5)
    assert np.isfinite(np.asarray(preds)).all()


def test_reconstruct_sequence_matches_host_reference(rng):
    rolling = rng.normal(size=(8, 5, N)).astype(np.float32)
    got = serving.reconstruct_sequence(jnp.asarray(rolling))
    assert got.shape == (12, N)
    # host reference expects (num_window, num_nodes, width)
    [want] = reverse_sliding_window([rolling.transpose(0, 2, 1)])
    np.testing.assert_allclose(np.asarray(got), want.T, atol=1e-5)


@pytest.mark.slow
def test_forecaster_from_checkpoint(tmp_path, rng):
    from graph_wavenet_tpu.train import checkpoint as ckpt
    from graph_wavenet_tpu.train.engine import Engine

    f = make_forecaster(rng)
    cfg = f.cfg
    tcfg = TrainConfig()
    engine = Engine(cfg, tcfg, StandardScaler(3.0, 2.0))
    path = str(tmp_path / "ck.msgpack")
    ckpt.save_checkpoint(path, engine.state, cfg, tcfg,
                         StandardScaler(3.0, 2.0))
    f2 = serving.Forecaster.from_checkpoint(path, f.supports)
    x = jnp.asarray(rng.normal(size=(2, 12, N, 2)).astype(np.float32))
    p2 = f2.predict(x)
    out, _ = apply_gwnet(cfg, engine.state.params, engine.state.model_state,
                         x, f.supports)
    want = np.transpose(np.asarray(out)[:, -1], (0, 2, 1)) * 2.0 + 3.0
    np.testing.assert_allclose(np.asarray(p2), want, atol=1e-5)


def test_export_roundtrip(tmp_path, rng):
    """AOT deployment artifact: serialized predictor reproduces
    Forecaster.predict exactly, without the model objects."""
    f = make_forecaster(rng)
    x = jnp.asarray(rng.normal(size=(4, 12, N, 2)).astype(np.float32))
    want = np.asarray(f.predict(x))
    path = serving.export_forecaster(f, str(tmp_path / "model.jaxexp"),
                                     batch_size=4, seq_len=12)
    loaded = serving.load_exported_forecaster(path)
    assert loaded.in_shape == (4, 12, N, 2)
    got = np.asarray(loaded.predict(x))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_export_default_seq_len(tmp_path, rng):
    f = make_forecaster(rng)
    path = serving.export_forecaster(f, str(tmp_path / "m.jaxexp"),
                                     batch_size=1)
    loaded = serving.load_exported_forecaster(path)
    assert loaded.in_shape[0] == 1


def test_exported_artifact_pads_shorter_windows(tmp_path, rng):
    """A default (receptive-field) export must accept the canonical K-step
    window: the loader left-zero-pads it, bit-identical to the model's own
    rf padding, so predictions match Forecaster.predict on the short
    window."""
    f = make_forecaster(rng)
    path = serving.export_forecaster(f, str(tmp_path / "m.jaxexp"),
                                     batch_size=2)
    loaded = serving.load_exported_forecaster(path)
    rf = f.cfg.receptive_field
    assert loaded.in_shape[1] == rf
    x = jnp.asarray(rng.normal(size=(2, rf - 1, N, 2)).astype(np.float32))
    got = np.asarray(loaded.predict(x))
    np.testing.assert_allclose(got, np.asarray(f.predict(x)), atol=1e-6)


def test_from_checkpoint_with_lr_decay_config(tmp_path, rng):
    """Serving load must not require steps_per_epoch for decay-trained
    checkpoints — inference never steps the optimizer."""
    from graph_wavenet_tpu.train import checkpoint as ckpt
    from graph_wavenet_tpu.train.engine import Engine

    f = make_forecaster(rng)
    tcfg = TrainConfig(lr_decay=0.5, lr_decay_every=2)
    engine = Engine(f.cfg, TrainConfig(), StandardScaler(3.0, 2.0))
    path = str(tmp_path / "ck.msgpack")
    ckpt.save_checkpoint(path, engine.state, f.cfg, tcfg,
                         StandardScaler(3.0, 2.0))
    f2 = serving.Forecaster.from_checkpoint(path, f.supports)
    x = jnp.asarray(rng.normal(size=(1, 12, N, 2)).astype(np.float32))
    assert np.isfinite(np.asarray(f2.predict(x))).all()


def test_autoregressive_future_aux_conditioning(rng):
    """future_aux feeds each round the true future auxiliary channels; when
    it happens to equal the tail-repeat values the rollout is identical,
    and when it differs the conditioning visibly changes rounds >= 2."""
    f = make_forecaster(rng)
    x = jnp.asarray(rng.normal(size=(2, 12, N, 2)).astype(np.float32))
    h, rounds = 6, 3
    # tail-repeat equivalent future_aux: each round repeats x's last h aux
    tail = np.asarray(x)[:, -h:, :, 1:]
    fa_same = jnp.asarray(np.concatenate([tail] * rounds, axis=1))
    want = serving.autoregressive_forecast(f, x, rounds)
    got = serving.autoregressive_forecast(f, x, rounds, future_aux=fa_same)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    fa_diff = fa_same + 1.5
    other = serving.autoregressive_forecast(f, x, rounds,
                                            future_aux=fa_diff)
    # round 1 is conditioned on x only -> unchanged; later rounds differ
    np.testing.assert_allclose(np.asarray(other[:, :h]),
                               np.asarray(want[:, :h]), atol=1e-5)
    assert np.abs(np.asarray(other[:, h:]) -
                  np.asarray(want[:, h:])).max() > 1e-4


# ---------------------------------------------------------------------------
# Serving the rest of the model family (VERDICT r2 #3)
# ---------------------------------------------------------------------------


def test_forecaster_block_sparse_supports_match_dense(rng):
    """Forecaster over flat block-sparse supports + the block-masked
    adaptive mask == the dense-supports dense-adaptive forecaster."""
    from graph_wavenet_tpu.ops import adaptive_block, block_sparse
    from graph_wavenet_tpu.graphs.spatial import transition_edge_weights

    n, bs = 32, 8
    cfg = ModelConfig(num_nodes=n, out_dim=6, residual_channels=8,
                      dilation_channels=8, skip_channels=16,
                      end_channels=32, blocks=2, layers=2, dropout=0.0,
                      n_supports=2, addaptadj=True)
    params, state = init_gwnet(jax.random.key(0), cfg)
    src = rng.integers(0, n, size=100)
    dst = rng.integers(0, n, size=100)
    w = rng.random(100).astype(np.float32) + 0.1
    dense, sparse = [], []
    for s, d in ((src, dst), (dst, src)):
        wt = transition_edge_weights(s, d, w, n)
        a = np.zeros((n, n), np.float32)
        np.add.at(a, (s, d), wt)
        dense.append(jnp.asarray(a))
        sparse.append(block_sparse.from_edges_flat(s, d, wt, n, bs, bs))
    mask = adaptive_block.full_mask(n, bs)
    scaler = StandardScaler(3.0, 2.0)
    fc_dense = serving.Forecaster(cfg, params, state, dense, scaler)
    fc_sparse = serving.Forecaster(cfg, params, state,
                                   list(sparse) + [mask], scaler)
    x = jnp.asarray(rng.normal(size=(3, 13, n, 2)), jnp.float32)
    np.testing.assert_allclose(np.asarray(fc_sparse.predict(x)),
                               np.asarray(fc_dense.predict(x)),
                               rtol=1e-4, atol=1e-4)


def test_forecaster_city_checkpoint_roundtrip(tmp_path, rng):
    """from_city_checkpoint: fingerprint verified, supports rebuilt under
    the persisted permutation, predictions in ORIGINAL node order."""
    from graph_wavenet_tpu.graphs import city
    from graph_wavenet_tpu.graphs.spatial import knn_graph_edges
    from graph_wavenet_tpu.train import checkpoint as ckpt
    from graph_wavenet_tpu.train.engine import Engine

    n = 30
    pos = rng.random((n, 2))
    src, dst, w = knn_graph_edges(pos, 3)
    gpath = str(tmp_path / "g.npz")
    city.save_graph_npz(gpath, src, dst, w, pos=pos, n_nodes=n)
    supports, mask, layout = city.build_city_supports(
        src, dst, w, n, pos=pos, ordering="rcm", form="flat",
        block_size=16, addaptadj=True)

    cfg = ModelConfig(num_nodes=layout["n_pad"], out_dim=6,
                      residual_channels=8, dilation_channels=8,
                      skip_channels=16, end_channels=32, blocks=2,
                      layers=2, dropout=0.0, n_supports=2, addaptadj=True)
    scaler = StandardScaler(3.0, 2.0)
    engine = Engine(cfg, TrainConfig(), scaler, seed=0)
    path = str(tmp_path / "city.msgpack")
    ckpt.save_checkpoint(path, engine.state, model_cfg=cfg,
                         train_cfg=TrainConfig(), scaler=scaler,
                         extra={"graph_layout": layout})

    fc = serving.Forecaster.from_city_checkpoint(path, gpath)
    assert fc.input_nodes == n
    x_raw = rng.normal(size=(2, 13, n, 2)).astype(np.float32)
    pred = np.asarray(fc.predict(jnp.asarray(x_raw)))
    assert pred.shape == (2, 6, n) and np.isfinite(pred).all()

    # manual roundtrip: permute+pad input, model-space forecaster, invert
    fc_model = serving.Forecaster(cfg, engine.state.params,
                                  engine.state.model_state,
                                  list(supports) + [mask], scaler)
    xm = city.apply_node_layout(x_raw, layout, axis=2)
    pm = np.asarray(fc_model.predict(jnp.asarray(xm)))   # (2, 6, n_pad)
    want = city.invert_node_layout(pm, layout, axis=2)
    np.testing.assert_allclose(pred, want, rtol=1e-5, atol=1e-5)

    # a different graph is refused
    wrong = str(tmp_path / "wrong.npz")
    city.save_graph_npz(wrong, src, dst, w * 2.0, pos=pos, n_nodes=n)
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        serving.Forecaster.from_city_checkpoint(path, wrong)
    # a non-city checkpoint is refused with a pointer
    plain = str(tmp_path / "plain.msgpack")
    ckpt.save_checkpoint(plain, engine.state, model_cfg=cfg,
                         train_cfg=TrainConfig(), scaler=scaler)
    with pytest.raises(ValueError, match="graph_layout"):
        serving.Forecaster.from_city_checkpoint(plain, gpath)


def test_diffg_forecaster_matches_eval_step(tmp_path, rng):
    """DiffGForecaster: per-sample supports in, fine signal + pooled F/E
    out, equal to the training engine's eval_step_syn quantities."""
    from graph_wavenet_tpu.train import checkpoint as ckpt
    from graph_wavenet_tpu.train.engine import (
        Engine,
        cluster_mean_projector,
    )

    n, k, b = 12, 6, 3   # blocks=2/layers=2 collapse K=6 to one step
    cfg = ModelConfig(num_nodes=n, in_dim=2, out_dim=k,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=16, blocks=2, layers=2,
                      dropout=0.0, n_supports=1, start_dilation=1)
    scaler = StandardScaler(1.5, 0.5)
    engine = Engine(cfg, TrainConfig(), scaler, diff_g=True, seed=0)
    path = str(tmp_path / "diffg.msgpack")
    ckpt.save_checkpoint(path, engine.state, model_cfg=cfg,
                         train_cfg=TrainConfig(), scaler=scaler)

    fc = serving.DiffGForecaster.from_checkpoint(path)
    a = rng.random((b, n, n)).astype(np.float32)
    sup = [jnp.asarray(a / a.sum(-1, keepdims=True))]
    x = jnp.asarray(rng.normal(size=(b, k, n, 2)), jnp.float32)
    labels = rng.integers(0, 3, size=n)
    proj = jnp.asarray(cluster_mean_projector(labels, 3))

    pred = np.asarray(fc.predict(x, sup))
    assert pred.shape == (b, k, n) and np.isfinite(pred).all()
    f_hat, e_hat = fc.predict_modalities(x, sup, proj, F_t=2)

    # reference quantities from the engine's eval step (which also
    # engine-pads by one like training)
    y = jnp.asarray(rng.normal(size=(b, k, n, 2)), jnp.float32)
    m = engine.eval_step_syn(engine.state, x, y, sup, proj, 2)
    np.testing.assert_allclose(
        np.asarray(f_hat),
        np.transpose(np.asarray(m["pred_F"])[:, -1], (0, 2, 1)),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(e_hat),
        np.transpose(np.asarray(m["pred_E"])[:, -1], (0, 2, 1)),
        rtol=1e-5, atol=1e-5)


def test_export_city_checkpoint_roundtrip(tmp_path, rng):
    """gwt-export --graph_npz: the AOT artifact bakes the node-layout
    gathers and the block-sparse hops; it predicts in ORIGINAL node
    order, equal to the live Forecaster."""
    from graph_wavenet_tpu.cli import export as export_cli
    from graph_wavenet_tpu.graphs import city
    from graph_wavenet_tpu.graphs.spatial import knn_graph_edges
    from graph_wavenet_tpu.train import checkpoint as ckpt
    from graph_wavenet_tpu.train.engine import Engine

    n = 30
    pos = rng.random((n, 2))
    src, dst, w = knn_graph_edges(pos, 3)
    gpath = str(tmp_path / "g.npz")
    city.save_graph_npz(gpath, src, dst, w, pos=pos, n_nodes=n)
    _, _, layout = city.build_city_supports(
        src, dst, w, n, pos=pos, ordering="rcm", form="flat",
        block_size=16, addaptadj=True)
    cfg = ModelConfig(num_nodes=layout["n_pad"], out_dim=6,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=16, blocks=2,
                      layers=2, dropout=0.0, n_supports=2, addaptadj=True)
    scaler = StandardScaler(3.0, 2.0)
    engine = Engine(cfg, TrainConfig(), scaler, seed=0)
    path = str(tmp_path / "city.msgpack")
    from graph_wavenet_tpu.train import checkpoint as _c

    _c.save_checkpoint(path, engine.state, model_cfg=cfg,
                       train_cfg=TrainConfig(), scaler=scaler,
                       extra={"graph_layout": layout})
    out = export_cli.main(["--checkpoint", path, "--graph_npz", gpath,
                           "--out", str(tmp_path / "m.jaxexp"),
                           "--batch_size", "2", "--seq_len", "12"])
    loaded = serving.load_exported_forecaster(out["path"])
    assert tuple(loaded.in_shape) == (2, 12, n, 2)
    x = rng.normal(size=(2, 12, n, 2)).astype(np.float32)
    got = np.asarray(loaded.predict(x))
    fc = serving.Forecaster.from_city_checkpoint(path, gpath)
    want = np.asarray(fc.predict(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_diffg_bank_indexed_matches_direct(tmp_path, rng):
    """bind_bank + predict_indexed == predict with hand-gathered supports;
    same for the pooled modalities (VERDICT r3 #3 library surface)."""
    from graph_wavenet_tpu.graphs.normalize import mod_adj
    from graph_wavenet_tpu.train import checkpoint as ckpt
    from graph_wavenet_tpu.train.engine import Engine, cluster_mean_projector

    n, k, b, G = 12, 6, 4, 3
    cfg = ModelConfig(num_nodes=n, in_dim=2, out_dim=k,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=16, blocks=2, layers=2,
                      dropout=0.0, n_supports=2, start_dilation=1)
    scaler = StandardScaler(1.5, 0.5)
    engine = Engine(cfg, TrainConfig(), scaler, diff_g=True, seed=0)
    path = str(tmp_path / "diffg.msgpack")
    ckpt.save_checkpoint(path, engine.state, model_cfg=cfg,
                         train_cfg=TrainConfig(), scaler=scaler,
                         extra={"diff_g": True})

    W = rng.random((G, n, n)).astype(np.float32)
    labels = rng.integers(0, 3, size=(G, n)).astype(np.int32)
    bank_path = str(tmp_path / "bank.npz")
    serving.save_graph_bank(bank_path, W, labels=labels, F_t=2)

    fc = serving.DiffGForecaster.from_checkpoint(path)
    with pytest.raises(ValueError, match="no graph bank"):
        fc.predict_indexed(jnp.zeros((1, k, n, 2)), np.zeros(1, np.int32))
    fc.bind_bank(serving.load_graph_bank(bank_path))

    x = jnp.asarray(rng.normal(size=(b, k, n, 2)), jnp.float32)
    idx = np.array([0, 2, 1, 2], np.int32)
    got = np.asarray(fc.predict_indexed(x, idx))

    # direct path: gather each sample's supports by hand
    per_graph = [mod_adj(w, "doubletransition") for w in W]
    sup = [jnp.asarray(np.stack([per_graph[g][j] for g in idx]))
           for j in range(2)]
    want = np.asarray(fc.predict(x, sup))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    f_got, e_got = fc.predict_modalities_indexed(x, idx)
    proj = jnp.asarray(np.stack(
        [cluster_mean_projector(labels[g], 3) for g in idx]))
    f_want, e_want = fc.predict_modalities(x, sup, proj, F_t=2)
    np.testing.assert_allclose(np.asarray(f_got), np.asarray(f_want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_got), np.asarray(e_want),
                               rtol=1e-5, atol=1e-5)

    # wrong adjtype vs checkpoint support count is a named error
    fc2 = serving.DiffGForecaster.from_checkpoint(path)
    with pytest.raises(ValueError, match="n_supports"):
        fc2.bind_bank(serving.load_graph_bank(bank_path),
                      adjtype="transition")


def test_export_diffg_roundtrip(tmp_path, rng):
    """export_diffg_forecaster bakes weights + bank; the loaded artifact's
    (x, adj_idx) call equals the live indexed predictor (VERDICT r3 #3
    export surface)."""
    from graph_wavenet_tpu.train import checkpoint as ckpt
    from graph_wavenet_tpu.train.engine import Engine

    n, k, G = 10, 6, 3
    cfg = ModelConfig(num_nodes=n, in_dim=2, out_dim=k,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=16, blocks=2, layers=2,
                      dropout=0.0, n_supports=1, start_dilation=1)
    scaler = StandardScaler(0.0, 1.0)
    engine = Engine(cfg, TrainConfig(), scaler, diff_g=True, seed=0)
    path = str(tmp_path / "diffg.msgpack")
    ckpt.save_checkpoint(path, engine.state, model_cfg=cfg,
                         train_cfg=TrainConfig(), scaler=scaler,
                         extra={"diff_g": True})
    W = rng.random((G, n, n)).astype(np.float32)
    bank_path = str(tmp_path / "bank.npz")
    serving.save_graph_bank(bank_path, W)

    fc = serving.DiffGForecaster.from_checkpoint(path).bind_bank(
        serving.load_graph_bank(bank_path), adjtype="transition")
    art = str(tmp_path / "diffg.jaxexp")
    serving.export_diffg_forecaster(fc, art, batch_size=2, seq_len=k)

    loaded = serving.load_exported_forecaster(art)
    assert loaded.n_inputs == 2
    x = jnp.asarray(rng.normal(size=(2, k, n, 2)), jnp.float32)
    idx = jnp.asarray(np.array([2, 0], np.int32))
    got = np.asarray(loaded.predict(x, idx))
    want = np.asarray(fc.predict_indexed(x, idx))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # arity mismatch is a named error, not a cryptic XLA one
    with pytest.raises(TypeError, match="input"):
        loaded.predict(x)
