"""Training-engine tests: optimizer parity vs torch, step mechanics, the
synthetic two-modality pooling supervision, and checkpoint roundtrip."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
import optax

from graph_wavenet_tpu.config import DataConfig, ModelConfig, TrainConfig
from graph_wavenet_tpu.data.scaler import StandardScaler
from graph_wavenet_tpu.train import checkpoint as ckpt
from graph_wavenet_tpu.train import engine as eng
from graph_wavenet_tpu.train.metrics import masked_mae

N = 16


def small_model_cfg(**kw):
    base = dict(num_nodes=N, in_dim=2, out_dim=12, residual_channels=8,
                dilation_channels=8, skip_channels=16, end_channels=32,
                blocks=2, layers=2, dropout=0.3, n_supports=2)
    base.update(kw)
    return ModelConfig(**base)


def make_supports(rng, batch=None):
    shape = (N, N) if batch is None else (batch, N, N)
    out = []
    for _ in range(2):
        a = rng.random(shape).astype(np.float32)
        out.append(jnp.asarray(a / a.sum(-1, keepdims=True)))
    return out


def test_optimizer_matches_torch_adam_with_clip_and_wd(rng):
    """Our optax chain must reproduce torch's backward -> clip_grad_norm_(5)
    -> Adam(lr, weight_decay).step() trajectory (`engine.py:33,52-55`)."""
    w0 = rng.normal(size=(6, 4)).astype(np.float32)
    xs = rng.normal(size=(20, 8, 6)).astype(np.float32) * 3
    ys = rng.normal(size=(20, 8, 4)).astype(np.float32)

    tcfg = TrainConfig(learning_rate=1e-2, weight_decay=1e-3, grad_clip=5.0)
    opt = eng.make_optimizer(tcfg)
    params = {"w": jnp.asarray(w0)}
    opt_state = opt.init(params)

    wt = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.Adam([wt], lr=1e-2, weight_decay=1e-3)

    def loss_fn(p, x, y):
        return jnp.mean(jnp.abs(x @ p["w"] - y))

    for i in range(20):
        g = jax.grad(loss_fn)(params, xs[i], ys[i])
        updates, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)

        topt.zero_grad()
        tl = torch.mean(torch.abs(torch.tensor(xs[i]) @ wt -
                                  torch.tensor(ys[i])))
        tl.backward()
        torch.nn.utils.clip_grad_norm_([wt], 5.0)
        topt.step()

    np.testing.assert_allclose(np.asarray(params["w"]),
                               wt.detach().numpy(), atol=2e-5)


def test_optimizer_clip_actually_clips(rng):
    tcfg = TrainConfig(learning_rate=1.0, weight_decay=0.0, grad_clip=0.1)
    opt = eng.make_optimizer(tcfg)
    params = {"w": jnp.zeros((3,))}
    st = opt.init(params)
    big_grad = {"w": jnp.array([100.0, 0.0, 0.0])}
    upd, _ = opt.update(big_grad, st, params)
    # after clipping to norm 0.1, adam normalizes: |update| <= lr
    assert np.all(np.abs(np.asarray(upd["w"])) <= 1.0 + 1e-6)


def test_horizon_target_layout(rng):
    y = rng.normal(size=(4, 12, N, 2)).astype(np.float32)
    got = np.asarray(eng.horizon_target(jnp.asarray(y)))
    assert got.shape == (4, 1, N, 12)
    # real[b, 0, n, h] == y[b, h, n, 0] (reference unsqueeze/transpose chain)
    np.testing.assert_allclose(got[2, 0, 5, 7], y[2, 7, 5, 0])


def test_pool_F_matches_reference_blockmean(rng):
    F_t = 4
    pred = rng.normal(size=(3, 1, N, 12)).astype(np.float32)
    got = np.asarray(eng.pool_F(jnp.asarray(pred), F_t))
    # torch reference: reshape(..., -1, F_t).mean(-1), repeat back
    p = torch.tensor(pred)
    f = p.reshape(*p.shape[:-1], -1, F_t).mean(-1)
    f = f.unsqueeze(-1).repeat(*[1] * len(f.shape), F_t)
    want = f.view(*f.shape[:-2], -1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pool_E_matches_reference_cluster_scatter(rng):
    labels = rng.integers(0, 4, size=N)
    pred = rng.normal(size=(3, 1, N, 12)).astype(np.float32)
    P = eng.cluster_mean_projector(labels, 4)
    got = np.asarray(eng.pool_E(jnp.asarray(pred), jnp.asarray(P)))
    # reference in-place scatter (`engine.py:93-98`)
    want = pred.copy()
    for k in range(4):
        idx = np.nonzero(labels == k)[0]
        want[:, :, idx, :] = want[:, :, idx, :].mean(2, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pool_E_batched_projectors(rng):
    B = 3
    labels = rng.integers(0, 4, size=(B, N))
    pred = rng.normal(size=(B, 1, N, 8)).astype(np.float32)
    P = np.stack([eng.cluster_mean_projector(l, 4) for l in labels])
    got = np.asarray(eng.pool_E(jnp.asarray(pred), jnp.asarray(P)))
    want = pred.copy()
    for b in range(B):
        for k in range(4):
            idx = np.nonzero(labels[b] == k)[0]
            want[b, :, idx, :] = want[b, :, idx, :].mean(0, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_train_step_learns(rng):
    cfg = small_model_cfg()
    tcfg = TrainConfig(learning_rate=3e-3, batch_size=8)
    e = eng.Engine(cfg, tcfg, StandardScaler(0.0, 1.0))
    supports = make_supports(rng)
    x = jnp.asarray(rng.normal(size=(8, 12, N, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(8, 12, N, 2)).astype(np.float32) + 5)

    state = e.state
    losses = []
    for _ in range(30):
        state, m = e.train_step(state, x, y, supports)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7
    assert int(state.step) == 30
    # eval runs and is deterministic
    m1 = e.eval_step(state, x, y, supports)
    m2 = e.eval_step(state, x, y, supports)
    assert float(m1["loss"]) == float(m2["loss"])


def test_eval_matches_manual_loss(rng):
    cfg = small_model_cfg(dropout=0.0)
    e = eng.Engine(cfg, TrainConfig(), StandardScaler(2.0, 3.0))
    supports = make_supports(rng)
    x = jnp.asarray(rng.normal(size=(4, 12, N, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(4, 12, N, 2)).astype(np.float32))
    m = e.eval_step(e.state, x, y, supports)
    pred, _ = e._forward(e.state.params, e.state.model_state, x, supports,
                         False, e.state.rng)
    want = masked_mae(pred, eng.horizon_target(y), 0.0)
    np.testing.assert_allclose(float(m["loss"]), float(want), rtol=1e-6)


def test_predict_step_no_engine_pad(rng):
    """Reference test loop omits the 1-step pad (`train.py:382-386`);
    predict_step must reproduce that exact path."""
    cfg = small_model_cfg(dropout=0.0)
    e = eng.Engine(cfg, TrainConfig(), StandardScaler(0.0, 1.0))
    supports = make_supports(rng)
    x = jnp.asarray(rng.normal(size=(4, 12, N, 2)).astype(np.float32))
    out = e.predict_step(e.state, x, supports)
    # rf=7 for blocks=2: a 12-step input is NOT padded (12 >= rf), so the
    # stack shrinks it to T_out = 12 - 6 = 6, exactly as the reference would
    assert out.shape == (4, 6, N, 12)
    from graph_wavenet_tpu.models.gwnet import apply_gwnet
    want, _ = apply_gwnet(cfg, e.state.params, e.state.model_state, x,
                          supports, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want))


@pytest.mark.slow
def test_train_step_syn_diff_g(rng):
    K = 24
    cfg = small_model_cfg(out_dim=K, start_dilation=4)
    e = eng.Engine(cfg, TrainConfig(learning_rate=3e-3),
                   StandardScaler(0.0, 1.0), diff_g=True)
    B = 4
    supports = make_supports(rng, batch=B)
    labels = rng.integers(0, 4, size=(B, N))
    P = jnp.asarray(np.stack(
        [eng.cluster_mean_projector(l, 4) for l in labels]))
    x = jnp.asarray(rng.normal(size=(B, K, N, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, K, N, 2)).astype(np.float32))

    state = e.state
    losses = []
    for _ in range(15):
        state, m = e.train_step_syn(state, x, y, supports, P, 4)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]

    ev = e.eval_step_syn(state, x, y, supports, P, 4)
    assert ev["pred_F"].shape == (B, 1, N, K)
    assert ev["pred_E"].shape == (B, 1, N, K)
    # F̂ is piecewise-constant over F_t windows
    f = np.asarray(ev["pred_F"])
    np.testing.assert_allclose(f[..., 0], f[..., 3], atol=1e-6)


@pytest.mark.parametrize("batched", [True, False])
@pytest.mark.slow
def test_train_step_syn_accum_matches_full_batch(rng, batched):
    """Syn/CRASH gradient accumulation (lifts the round-1
    NotImplementedError): n_micro micro-batches with micro-sliced
    per-sample supports/projectors average to the full-batch gradient
    (dropout off) within BN-noise tolerance — both diff-G batched and
    shared-support forms."""
    K, B, F_t = 24, 8, 4
    cfg = small_model_cfg(out_dim=K, start_dilation=4, dropout=0.0)
    x = jnp.asarray(rng.normal(size=(B, K, N, 2)).astype(np.float32))
    y = jnp.asarray((rng.normal(size=(B, K, N, 2)) + 5).astype(np.float32))
    if batched:
        supports = make_supports(rng, batch=B)
        labels = rng.integers(0, 4, size=(B, N))
        P = jnp.asarray(np.stack(
            [eng.cluster_mean_projector(l, 4) for l in labels]))
    else:
        supports = make_supports(rng)
        P = jnp.asarray(eng.cluster_mean_projector(
            rng.integers(0, 4, size=N), 4))

    tc = TrainConfig(learning_rate=1e-3)
    e1 = eng.Engine(cfg, tc, StandardScaler(0.0, 1.0), diff_g=batched,
                    seed=4)
    s1, m1 = e1.train_step_syn(e1.state, x, y, supports, P, F_t)
    e2 = eng.Engine(cfg, tc, StandardScaler(0.0, 1.0), diff_g=batched,
                    seed=4)
    s2, m2 = e2.train_step_syn_accum(e2.state, x, y, supports, P, F_t, 4)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=5e-3)
    # same tolerance rationale as test_train_step_accum_matches_full_batch
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(np.asarray(p),
                                                np.asarray(q), atol=2.5e-3),
        jax.device_get(s1.params), jax.device_get(s2.params))


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = small_model_cfg()
    tcfg = TrainConfig()
    e = eng.Engine(cfg, tcfg, StandardScaler(1.0, 2.0))
    supports = make_supports(rng)
    x = jnp.asarray(rng.normal(size=(4, 12, N, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(4, 12, N, 2)).astype(np.float32))
    state, _ = e.train_step(e.state, x, y, supports)

    path = str(tmp_path / "ck.msgpack")
    ckpt.save_checkpoint(path, state, cfg, tcfg, StandardScaler(1.0, 2.0),
                         extra={"epoch": 1, "val_loss": 0.5})

    e2 = eng.Engine(cfg, tcfg, StandardScaler(1.0, 2.0))
    restored = ckpt.load_checkpoint(path, e2.state)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b)),
        jax.device_get(state.params), jax.device_get(restored.params))
    assert int(restored.step) == 1
    m1 = e.eval_step(state, x, y, supports)
    m2 = e2.eval_step(restored, x, y, supports)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    meta = ckpt.load_metadata(path)
    assert meta["scaler"].mean == 1.0
    assert meta["model_cfg"] == cfg
    assert meta["extra"]["epoch"] == 1


def test_lr_decay_schedule(rng):
    """Optional step-decay: lr drops by lr_decay every lr_decay_every
    epochs, floored at min_lr."""
    tcfg = TrainConfig(learning_rate=1e-2, weight_decay=0.0,
                       lr_decay=0.1, lr_decay_every=1, min_lr=1e-5)
    opt = eng.make_optimizer(tcfg, steps_per_epoch=2)
    params = {"w": jnp.zeros((2,))}
    st = opt.init(params)
    g = {"w": jnp.ones((2,))}
    lrs = []
    for _ in range(6):
        upd, st = opt.update(g, st, params)
        # constant grad of ones: |update| == current lr after warm moments
        lrs.append(float(jnp.abs(upd["w"][0])))
    # epoch boundaries at steps 2 and 4: lr drops 10x each time
    assert lrs[1] / lrs[3] == pytest.approx(10.0, rel=0.2)
    assert lrs[3] / lrs[5] == pytest.approx(10.0, rel=0.2)


def test_lr_decay_without_steps_per_epoch_rejected():
    """lr_decay < 1 with unknown steps_per_epoch used to silently train at
    a constant lr; it must be a config error instead."""
    tcfg = TrainConfig(learning_rate=1e-2, lr_decay=0.5)
    with pytest.raises(ValueError, match="steps_per_epoch"):
        eng.make_optimizer(tcfg)


def test_pool_F_indivisible_seq_rejected(rng):
    pred = jnp.asarray(rng.normal(size=(2, 1, 4, 12)).astype(np.float32))
    with pytest.raises(ValueError, match="divisible"):
        eng.pool_F(pred, 5)


@pytest.mark.slow
def test_train_step_accum_matches_full_batch(rng):
    """Gradient accumulation: n_micro micro-batches average to the
    full-batch gradient (dropout off, balanced masks) within tolerance."""
    cfg = ModelConfig(num_nodes=10, out_dim=12, residual_channels=8,
                      dilation_channels=8, skip_channels=16,
                      end_channels=32, blocks=2, layers=2, dropout=0.0,
                      n_supports=1)
    tc = TrainConfig(learning_rate=1e-3)
    x = rng.normal(size=(8, 12, 10, 2)).astype(np.float32)
    y = (rng.normal(size=(8, 12, 10, 2)) + 10).astype(np.float32)
    a = rng.random((10, 10)).astype(np.float32)
    sup = [jnp.asarray(a / a.sum(-1, keepdims=True))]

    e1 = eng.Engine(cfg, tc, StandardScaler(10.0, 2.0), seed=4)
    s1, m1 = e1.train_step(e1.state, jnp.asarray(x), jnp.asarray(y), sup)
    e2 = eng.Engine(cfg, tc, StandardScaler(10.0, 2.0), seed=4)
    s2, m2 = e2.train_step_accum(e2.state, jnp.asarray(x), jnp.asarray(y),
                                 sup, 4)
    # per-micro-batch BatchNorm statistics make this approximate (the
    # standard gradient-accumulation semantics) — close, not bit-equal
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=5e-3)
    # Adam steps are +-lr per element, so a BN-noise-induced gradient
    # sign flip shows up as a 2*lr difference: bound by 2.5*lr
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(np.asarray(p),
                                                np.asarray(q), atol=2.5e-3),
        jax.device_get(s1.params), jax.device_get(s2.params))



def test_train_config_validation():
    with pytest.raises(ValueError):
        TrainConfig(grad_accum=0)
    with pytest.raises(ValueError):
        TrainConfig(batch_size=32, grad_accum=5)
    TrainConfig(batch_size=32, grad_accum=4)  # ok
