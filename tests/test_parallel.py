"""Mesh / sharding tests on the 8-device virtual CPU mesh: DP train step
equivalence, node-TP sharded diffusion, time-halo SP conv exactness."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from graph_wavenet_tpu.config import MeshConfig, ModelConfig, TrainConfig
from graph_wavenet_tpu.data.scaler import StandardScaler
from graph_wavenet_tpu.ops.diffusion import nconv
from graph_wavenet_tpu.ops.temporal import causal_conv_apply, causal_conv_init
from graph_wavenet_tpu.parallel import halo, mesh as M
from graph_wavenet_tpu.train.engine import Engine

N = 16


pytestmark = pytest.mark.slow  # multi-epoch/mesh loops; fast tier skips (README)

def test_make_mesh_shapes():
    m = M.make_mesh(MeshConfig())
    assert m.devices.size == 8
    assert m.axis_names == ("data", "model", "time")
    m2 = M.make_mesh(MeshConfig(model_axis=2, time_axis=2))
    assert dict(zip(m2.axis_names, m2.devices.shape)) == {
        "data": 2, "model": 2, "time": 2}
    with pytest.raises(AssertionError):
        M.make_mesh(MeshConfig(model_axis=3))


def test_dp_train_step_matches_single_device(rng):
    """One batch-sharded train step must produce the same params as the
    unsharded step (global BN stats + summed grads are exact under GSPMD)."""
    cfg = ModelConfig(num_nodes=N, out_dim=12, residual_channels=8,
                      dilation_channels=8, skip_channels=16, end_channels=32,
                      blocks=2, layers=2, dropout=0.0, n_supports=2)
    tcfg = TrainConfig(learning_rate=1e-3)
    x = rng.normal(size=(16, 12, N, 2)).astype(np.float32)
    y = rng.normal(size=(16, 12, N, 2)).astype(np.float32)
    a = rng.random((2, N, N)).astype(np.float32)
    supports = [jnp.asarray(s / s.sum(-1, keepdims=True)) for s in a]

    e1 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0))
    s1, m1 = e1.train_step(e1.state, jnp.asarray(x), jnp.asarray(y),
                           supports)

    mesh = M.make_mesh(MeshConfig())
    mcfg = MeshConfig()
    e2 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0))
    state = M.shard_state(mesh, e2.state)
    xb, yb = M.shard_batch(mesh, mcfg, x, y)
    sup = [jax.device_put(s, M.support_sharding(mesh, mcfg))
           for s in supports]
    s2, m2 = e2.train_step(state, xb, yb, sup)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), atol=1e-5),
        jax.device_get(s1.params), jax.device_get(s2.params))


@pytest.mark.parametrize("variant", ["grad_accum", "bf16", "remat"])
def test_feature_combos_under_dp_mesh_match_single_device(rng, variant):
    """Feature flags compose with the mesh: gradient accumulation (the
    micro-batch reshape splits the sharded batch axis), bf16 activations,
    and remat each reproduce the single-device step under 8-way DP."""
    cfg = ModelConfig(num_nodes=N, out_dim=12, residual_channels=8,
                      dilation_channels=8, skip_channels=16, end_channels=32,
                      blocks=2, layers=2, dropout=0.0, n_supports=2,
                      dtype="bfloat16" if variant == "bf16" else "float32",
                      remat=variant == "remat")
    tcfg = TrainConfig(learning_rate=1e-3)
    x = rng.normal(size=(16, 12, N, 2)).astype(np.float32)
    y = rng.normal(size=(16, 12, N, 2)).astype(np.float32)
    a = rng.random((2, N, N)).astype(np.float32)
    supports = [jnp.asarray(s / s.sum(-1, keepdims=True)) for s in a]

    def step(engine, state, xx, yy, sup):
        if variant == "grad_accum":
            return engine.train_step_accum(state, xx, yy, sup, 4)
        return engine.train_step(state, xx, yy, sup)

    e1 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0))
    s1, m1 = step(e1, e1.state, jnp.asarray(x), jnp.asarray(y), supports)

    mesh = M.make_mesh(MeshConfig())
    mcfg = MeshConfig()
    e2 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0))
    state = M.shard_state(mesh, e2.state)
    xb, yb = M.shard_batch(mesh, mcfg, x, y)
    sup = [jax.device_put(s, M.support_sharding(mesh, mcfg))
           for s in supports]
    s2, m2 = step(e2, state, xb, yb, sup)

    # bf16 summation order differs across layouts; fp32 paths are exact
    tol = dict(rtol=2e-2) if variant == "bf16" else dict(rtol=1e-5)
    np.testing.assert_allclose(float(np.mean(np.asarray(m1["loss"]))),
                               float(np.mean(np.asarray(m2["loss"]))),
                               **tol)
    atol = 5e-3 if variant == "bf16" else 1e-5
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p, np.float32), np.asarray(q, np.float32),
            atol=atol),
        jax.device_get(s1.params), jax.device_get(s2.params))


def test_node_tp_sharded_diffusion_exact(rng):
    """nconv with the node dim sharded over 'model' equals the replicated
    result — GSPMD inserts the collective."""
    mesh = M.make_mesh(MeshConfig(model_axis=2))
    x = rng.normal(size=(4, 6, 32, 8)).astype(np.float32)
    A = rng.random((32, 32)).astype(np.float32)
    want = np.asarray(nconv(jnp.asarray(x), jnp.asarray(A)))

    xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "model", None)))
    As = jax.device_put(A, NamedSharding(mesh, P("model", None)))
    got = jax.jit(nconv)(xs, As)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_halo_sharded_conv_matches_unsharded(rng):
    mesh = M.make_mesh(MeshConfig(time_axis=2))
    p = causal_conv_init(jax.random.key(0), 5, 7, 2)
    x = rng.normal(size=(3, 16, 4, 5)).astype(np.float32)
    for dilation in (1, 2, 4):
        want = np.asarray(causal_conv_apply(p, jnp.asarray(x), dilation))
        got = halo.sharded_causal_conv(jnp.asarray(x), p["w"], p["b"],
                                       dilation, mesh)
        valid = x.shape[1] - dilation
        np.testing.assert_allclose(np.asarray(got)[:, :valid], want,
                                   atol=1e-5)


def test_halo_sharded_conv_bf16_matches_unsharded(rng):
    """Mixed-precision contract: the sharded conv casts weights per use and
    returns the activation dtype, like causal_conv_apply — bf16 in, bf16
    out, identical numerics to the unsharded op on this backend."""
    mesh = M.make_mesh(MeshConfig(time_axis=2))
    p = causal_conv_init(jax.random.key(0), 5, 7, 2)
    x = jnp.asarray(rng.normal(size=(2, 16, 4, 5)).astype(np.float32),
                    jnp.bfloat16)
    want = causal_conv_apply(p, x, 2)
    got = halo.sharded_causal_conv(x, p["w"], p["b"], 2, mesh)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got[:, :x.shape[1] - 2], np.float32),
        np.asarray(want, np.float32), atol=2e-2)


def test_halo_wider_than_shard_rejected(rng):
    """halo > per-shard time width needs multi-hop exchange; fail with the
    constraint named instead of an opaque slice error."""
    mesh = M.make_mesh(MeshConfig(time_axis=2))
    p = causal_conv_init(jax.random.key(0), 5, 7, 2)
    x = jnp.asarray(rng.normal(size=(1, 16, 4, 5)).astype(np.float32))
    with pytest.raises(ValueError, match="time-halo"):
        halo.sharded_causal_conv(x, p["w"], p["b"], 12, mesh)


def test_halo_exchange_right(rng):
    mesh = M.make_mesh(MeshConfig(time_axis=2))
    x = rng.normal(size=(1, 8, 2, 3)).astype(np.float32)

    def body(blk):
        return halo.halo_exchange_right(blk, 2)

    out = jax.shard_map(body, mesh=mesh,
                        in_specs=P(None, "time", None, None),
                        out_specs=P(None, "time", None, None))(
        jnp.asarray(x))
    out = np.asarray(out)
    assert out.shape == (1, 12, 2, 3)
    # first shard's extended block = its 4 steps + first 2 of second shard
    np.testing.assert_allclose(out[:, :4], x[:, :4])
    np.testing.assert_allclose(out[:, 4:6], x[:, 4:6])
    # second shard: its 4 steps + wraparound head of first shard
    np.testing.assert_allclose(out[:, 6:10], x[:, 4:8])
    np.testing.assert_allclose(out[:, 10:12], x[:, :2])


def test_full_tp_sp_dp_train_step_compiles(rng):
    """The acid test for dryrun_multichip: a full train step jitted over a
    2x2x2 (data, model, time) mesh with all three shardings active."""
    cfg = ModelConfig(num_nodes=N, out_dim=12, residual_channels=8,
                      dilation_channels=8, skip_channels=16, end_channels=32,
                      blocks=2, layers=2, dropout=0.3, n_supports=2)
    mcfg = MeshConfig(model_axis=2, time_axis=2, shard_nodes=True,
                      shard_time=True)
    mesh = M.make_mesh(mcfg)
    e = Engine(cfg, TrainConfig(), StandardScaler(0.0, 1.0))
    state = M.shard_state(mesh, e.state)
    x = rng.normal(size=(8, 12, N, 2)).astype(np.float32)
    y = rng.normal(size=(8, 12, N, 2)).astype(np.float32)
    a = rng.random((2, N, N)).astype(np.float32)
    xb, yb = M.shard_batch(mesh, mcfg, x, y)
    sup = [jax.device_put(jnp.asarray(s / s.sum(-1, keepdims=True)),
                          M.support_sharding(mesh, mcfg)) for s in a]
    new_state, metrics = e.train_step(state, xb, yb, sup)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_dp_diff_g_batched_supports_matches_single_device(rng):
    """diff-G under DP: per-sample (B, N, N) supports and cluster projectors
    shard along the batch axis like x/y; the sharded syn train step matches
    the single-device step exactly."""
    # rf = blocks*(2^layers - 1) + 1 = 7 must equal K+1 so the stack
    # collapses time to one step (modality-supervision requirement)
    cfg = ModelConfig(num_nodes=N, in_dim=1, out_dim=6, residual_channels=8,
                      dilation_channels=8, skip_channels=16, end_channels=32,
                      blocks=2, layers=2, dropout=0.0, n_supports=2,
                      start_dilation=1)
    tcfg = TrainConfig(learning_rate=1e-3)
    B, K = 16, 6
    x = rng.normal(size=(B, K, N, 1)).astype(np.float32)
    y = (rng.normal(size=(B, K, N, 2)) + 3.0).astype(np.float32)
    a = rng.random((B, 2, N, N)).astype(np.float32)
    a = a / a.sum(-1, keepdims=True)
    supports = [jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1])]
    proj = jnp.asarray(
        np.tile(np.eye(N, dtype=np.float32) / 1.0, (B, 1, 1)))
    F_t = 3

    e1 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0), diff_g=True)
    s1, m1 = e1.train_step_syn(e1.state, jnp.asarray(x), jnp.asarray(y),
                               supports, proj, F_t)

    mesh = M.make_mesh(MeshConfig())
    mcfg = MeshConfig()
    e2 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0), diff_g=True)
    state = M.shard_state(mesh, e2.state)
    xb, yb = M.shard_batch(mesh, mcfg, x, y)
    bsh3 = M.support_sharding(mesh, mcfg, batched=True)
    sup = [jax.device_put(s, bsh3) for s in supports]
    pb = jax.device_put(proj, bsh3)
    s2, m2 = e2.train_step_syn(state, xb, yb, sup, pb, F_t)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), atol=1e-5),
        jax.device_get(s1.params), jax.device_get(s2.params))


def test_sparse_supports_under_dp_mesh(rng):
    """ELL sparse supports (replicated) with the batch sharded over 'data':
    the sharded step matches single-device exactly — the custom-VJP gathers
    are batch-independent, so GSPMD partitions them cleanly."""
    from graph_wavenet_tpu.ops import sparse

    cfg = ModelConfig(num_nodes=N, out_dim=12, residual_channels=8,
                      dilation_channels=8, skip_channels=16, end_channels=32,
                      blocks=2, layers=2, dropout=0.0, n_supports=2,
                      addaptadj=False)
    tcfg = TrainConfig(learning_rate=1e-3)
    x = rng.normal(size=(16, 12, N, 2)).astype(np.float32)
    y = (rng.normal(size=(16, 12, N, 2)) + 10.0).astype(np.float32)
    sup = [sparse.random_sparse_support(N, 4, np.random.default_rng(s))
           for s in (1, 2)]

    e1 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0))
    s1, m1 = e1.train_step(e1.state, jnp.asarray(x), jnp.asarray(y), sup)

    mesh = M.make_mesh(MeshConfig())
    mcfg = MeshConfig()
    e2 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0))
    state = M.shard_state(mesh, e2.state)
    xb, yb = M.shard_batch(mesh, mcfg, x, y)
    rep = M.replicated(mesh)
    sup_r = [jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), s)
             for s in sup]
    s2, m2 = e2.train_step(state, xb, yb, sup_r)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), atol=1e-5),
        jax.device_get(s1.params), jax.device_get(s2.params))


def test_time_sp_crash_scale_long_k(rng):
    """CRASH-scale sequence parallelism end-to-end (VERDICT r1 #7): the
    diff-G modality-supervised train step at the reference's K = 2912
    (`util.py:416-417`) with the time axis sharded 4-way must equal the
    unsharded step — pinning that the engine +1 pad, dilated-stack time
    collapse, skip cropping and BN statistics all compose under time
    sharding. Architecture: 13 blocks x 3 layers, start_dilation 32
    (receptive field 1 + 13*32*7 = 2913 = K+1, the collapse the modality
    loss requires)."""
    K, B = 2912, 4
    cfg = ModelConfig(num_nodes=N, in_dim=1, out_dim=K,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=16, blocks=13,
                      layers=3, start_dilation=32, dropout=0.0,
                      gcn_bool=True, addaptadj=False, n_supports=1)
    assert cfg.receptive_field == K + 1
    tcfg = TrainConfig(learning_rate=1e-3)
    x = rng.normal(size=(B, K, N, 1)).astype(np.float32)
    y = (rng.normal(size=(B, K, N, 2)) + 3.0).astype(np.float32)
    ba = rng.random((B, N, N)).astype(np.float32)
    ba = ba / ba.sum(-1, keepdims=True)
    labels = rng.integers(0, 4, size=(B, N))
    from graph_wavenet_tpu.train.engine import cluster_mean_projector
    proj_np = np.stack([cluster_mean_projector(l, 4) for l in labels])
    F_t = 4                                    # divides K = 2912

    e1 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0), diff_g=True)
    s1, m1 = e1.train_step_syn(e1.state, jnp.asarray(x), jnp.asarray(y),
                               [jnp.asarray(ba)], jnp.asarray(proj_np),
                               F_t)

    mcfg = MeshConfig(model_axis=1, time_axis=4, data_axis=2,
                      shard_time=True)
    mesh = M.make_mesh(mcfg)
    e2 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0), diff_g=True)
    state = M.shard_state(mesh, e2.state)
    xb, yb = M.shard_batch(mesh, mcfg, x, y)
    bsh = M.support_sharding(mesh, mcfg, batched=True)
    sup = [jax.device_put(jnp.asarray(ba), bsh)]
    proj = jax.device_put(jnp.asarray(proj_np), bsh)
    s2, m2 = e2.train_step_syn(state, xb, yb, sup, proj, F_t)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), atol=2e-5),
        jax.device_get(s1.params), jax.device_get(s2.params))


def test_syn_accum_under_time_sp_mesh_matches_single_device(rng):
    """Gradient accumulation composes with DP x time-SP on the
    modality-supervised path: the accumulated step under the sharded mesh
    equals the single-device accumulated step (r2; the accuracy-
    neutrality of accum itself is measured in garage/bn_accum_ab.py)."""
    K, B = 48, 4                              # rf = 1 + 4*4*(2^2-1) = 49
    cfg = ModelConfig(num_nodes=N, in_dim=1, out_dim=K,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=16, blocks=4,
                      layers=2, start_dilation=4, dropout=0.0,
                      gcn_bool=True, addaptadj=False, n_supports=1)
    assert cfg.receptive_field == K + 1
    tcfg = TrainConfig(learning_rate=1e-3)
    x = rng.normal(size=(B, K, N, 1)).astype(np.float32)
    y = (rng.normal(size=(B, K, N, 2)) + 3.0).astype(np.float32)
    ba = rng.random((B, N, N)).astype(np.float32)
    ba = ba / ba.sum(-1, keepdims=True)
    labels = rng.integers(0, 4, size=(B, N))
    from graph_wavenet_tpu.train.engine import cluster_mean_projector
    proj_np = np.stack([cluster_mean_projector(l, 4) for l in labels])
    F_t = 4

    e1 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0), diff_g=True)
    s1, m1 = e1.train_step_syn_accum(
        e1.state, jnp.asarray(x), jnp.asarray(y), [jnp.asarray(ba)],
        jnp.asarray(proj_np), F_t, 2)

    mcfg = MeshConfig(model_axis=1, time_axis=2, data_axis=4,
                      shard_time=True)
    mesh = M.make_mesh(mcfg)
    e2 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0), diff_g=True)
    state = M.shard_state(mesh, e2.state)
    xb, yb = M.shard_batch(mesh, mcfg, x, y)
    bsh = M.support_sharding(mesh, mcfg, batched=True)
    s2, m2 = e2.train_step_syn_accum(
        state, xb, yb, [jax.device_put(jnp.asarray(ba), bsh)],
        jax.device_put(jnp.asarray(proj_np), bsh), F_t, 2)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), atol=2e-5),
        jax.device_get(s1.params), jax.device_get(s2.params))


# ----------------------------------------------------------------------
# sharded device-resident feed (VERDICT r3 #2): the multi-chip fast feed
# ----------------------------------------------------------------------

def _feed_dataset(rng, n_samples=32, horizon=12):
    x = rng.normal(size=(n_samples, 12, N, 2)).astype(np.float32)
    y = (rng.normal(size=(n_samples, horizon, N, 2)) + 40).astype(np.float32)
    a = rng.random((2, N, N)).astype(np.float32)
    supports = [jnp.asarray(s / s.sum(-1, keepdims=True)) for s in a]
    return x, y, supports


def _fit_cfgs(scan_steps=1, tmp=None):
    cfg = ModelConfig(num_nodes=N, out_dim=12, residual_channels=4,
                      dilation_channels=4, skip_channels=8, end_channels=16,
                      blocks=2, layers=2, dropout=0.0, n_supports=2)
    tcfg = TrainConfig(learning_rate=1e-3, epochs=2, print_every=100,
                      scan_steps=scan_steps,
                      save_dir=str(tmp) if tmp else "/tmp/gwt_feed_test")
    return cfg, tcfg


def _build_data(x, y, loader_cls_or_fn, batch, seed):
    data = {"x_train": x, "y_train": y, "x_val": x[:8], "y_val": y[:8],
            "x_test": x[:8], "y_test": y[:8],
            "scaler": StandardScaler(40.0, 4.0)}
    for split, (xs, ys) in (("train", (x, y)), ("val", (x[:8], y[:8])),
                            ("test", (x[:8], y[:8]))):
        data[split + "_loader"] = loader_cls_or_fn(
            xs, ys, batch, rng=np.random.default_rng(seed))
    return data


def _history_losses(res):
    return [(h.train["loss"], h.valid["loss"]) for h in res.history]


def test_device_resident_feed_under_dp_mesh_full_fit(rng, tmp_path):
    """The VERDICT r3 #2 exactness triangle: a full Runner.fit with
    (a) single device + host feed, (b) DP mesh + host feed, and (c) DP
    mesh + sharded device-resident feed must produce the same epoch
    losses and final params — the CLI restriction forcing --resident
    host under --mesh_* is gone."""
    import functools
    from graph_wavenet_tpu.data.device_loader import DeviceArrayLoader
    from graph_wavenet_tpu.data.loader import DataLoader
    from graph_wavenet_tpu.train.runner import Runner

    x, y, supports = _feed_dataset(rng)
    mesh = M.make_mesh(MeshConfig())
    mcfg = MeshConfig()
    sh = M.batch_sharding(mesh, mcfg)

    def run(loader_fn, use_mesh, sub):
        cfg, tcfg = _fit_cfgs(tmp=tmp_path / sub)
        engine = Engine(cfg, tcfg, StandardScaler(40.0, 4.0), seed=0)
        runner = Runner(engine, tcfg,
                        mesh=mesh if use_mesh else None,
                        mesh_cfg=mcfg if use_mesh else None)
        data = _build_data(x, y, loader_fn, 16, seed=7)
        res = runner.fit(data, supports)
        return res, engine

    res_a, e_a = run(DataLoader, False, "a")
    res_b, e_b = run(DataLoader, True, "b")
    res_c, e_c = run(
        functools.partial(DeviceArrayLoader, sharding=sh), True, "c")

    la, lb, lc = map(_history_losses, (res_a, res_b, res_c))
    np.testing.assert_allclose(la, lb, rtol=1e-5)
    np.testing.assert_allclose(la, lc, rtol=1e-5)
    for other in (e_b, e_c):
        jax.tree_util.tree_map(
            lambda p, q: np.testing.assert_allclose(
                np.asarray(p), np.asarray(q), atol=2e-5),
            jax.device_get(e_a.state.params),
            jax.device_get(other.state.params))


def test_fused_scan_under_dp_mesh_matches_single_device(rng, tmp_path):
    """scan_steps>1 now composes with the mesh: the fused multi-step scan
    over a mesh-replicated resident dataset (batch gathers constrained to
    the DP layout) reproduces the single-device fused run exactly."""
    import functools
    from graph_wavenet_tpu.data.device_loader import DeviceArrayLoader
    from graph_wavenet_tpu.train.runner import Runner

    x, y, supports = _feed_dataset(rng)
    mesh = M.make_mesh(MeshConfig())
    mcfg = MeshConfig()
    sh = M.batch_sharding(mesh, mcfg)

    def run(loader_fn, use_mesh, sub):
        cfg, tcfg = _fit_cfgs(scan_steps=2, tmp=tmp_path / sub)
        engine = Engine(cfg, tcfg, StandardScaler(40.0, 4.0), seed=0)
        runner = Runner(engine, tcfg,
                        mesh=mesh if use_mesh else None,
                        mesh_cfg=mcfg if use_mesh else None)
        data = _build_data(x, y, loader_fn, 8, seed=5)
        res = runner.fit(data, supports)
        return res, engine

    res_1, e_1 = run(DeviceArrayLoader, False, "single")
    res_m, e_m = run(
        functools.partial(DeviceArrayLoader, sharding=sh), True, "mesh")

    np.testing.assert_allclose(_history_losses(res_1),
                               _history_losses(res_m), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), atol=2e-5),
        jax.device_get(e_1.state.params), jax.device_get(e_m.state.params))


def test_fused_scan_mesh_requires_mesh_resident_loader(rng, tmp_path):
    """A device-resident loader built WITHOUT the mesh sharding fails the
    fused mesh path with a named error (not an opaque jit device error)."""
    from graph_wavenet_tpu.data.device_loader import DeviceArrayLoader
    from graph_wavenet_tpu.train.runner import Runner

    x, y, supports = _feed_dataset(rng)
    mesh = M.make_mesh(MeshConfig())
    cfg, tcfg = _fit_cfgs(scan_steps=2, tmp=tmp_path)
    engine = Engine(cfg, tcfg, StandardScaler(40.0, 4.0), seed=0)
    runner = Runner(engine, tcfg, mesh=mesh, mesh_cfg=MeshConfig())
    data = _build_data(x, y, DeviceArrayLoader, 8, seed=5)
    with pytest.raises(ValueError, match="mesh-replicated"):
        runner.fit(data, supports)


def test_fused_window_scan_under_dp_mesh_matches_single(rng, tmp_path):
    """Windows-on-demand fused scan (DeviceWindowLoader) under the mesh ==
    single device: the streaming METR-LA feed keeps scan fusion on
    multi-chip runs too."""
    import functools
    from graph_wavenet_tpu.data.device_loader import DeviceWindowLoader
    from graph_wavenet_tpu.train.runner import Runner

    series = rng.normal(size=(160, N, 2)).astype(np.float32)
    a = rng.random((2, N, N)).astype(np.float32)
    supports = [jnp.asarray(s / s.sum(-1, keepdims=True)) for s in a]
    mesh = M.make_mesh(MeshConfig())
    mcfg = MeshConfig()
    sh = M.batch_sharding(mesh, mcfg)

    def run(sharding, use_mesh, sub):
        cfg, tcfg = _fit_cfgs(scan_steps=2, tmp=tmp_path / sub)
        engine = Engine(cfg, tcfg, StandardScaler(0.0, 1.0), seed=0)
        runner = Runner(engine, tcfg,
                        mesh=mesh if use_mesh else None,
                        mesh_cfg=mcfg if use_mesh else None)
        kw = {"sharding": sharding} if sharding is not None else {}
        data = {"scaler": StandardScaler(0.0, 1.0)}
        for split, seed in (("train", 3), ("val", 4)):
            data[split + "_loader"] = DeviceWindowLoader(
                series, 12, 12, 8, rng=np.random.default_rng(seed), **kw)
        res = runner.fit(data, supports)
        return res, engine

    res_1, e_1 = run(None, False, "single")
    res_m, e_m = run(sh, True, "mesh")
    np.testing.assert_allclose(_history_losses(res_1),
                               _history_losses(res_m), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), atol=2e-5),
        jax.device_get(e_1.state.params), jax.device_get(e_m.state.params))


def test_fused_syn_resident_scan_under_mesh_matches_single(rng):
    """The fused diff-G scan (per-sample supports/projectors gathered
    in-scan) under a DP mesh with batch + batched-support constraints ==
    the unsharded fused scan."""
    K, B, S = 12, 4, 2
    cfg = ModelConfig(num_nodes=N, in_dim=1, out_dim=K,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=16, blocks=4,
                      layers=2, start_dilation=1, dropout=0.0,
                      gcn_bool=True, addaptadj=False, n_supports=1)
    assert cfg.receptive_field == K + 1
    tcfg = TrainConfig(learning_rate=1e-3)
    n_samples, n_graphs = 8, 3
    xs = rng.normal(size=(n_samples, K, N, 1)).astype(np.float32)
    ys = (rng.normal(size=(n_samples, K, N, 2)) + 3.0).astype(np.float32)
    sup = rng.random((n_graphs, N, N)).astype(np.float32)
    sup = sup / sup.sum(-1, keepdims=True)
    labels = rng.integers(0, 4, size=(n_graphs, N))
    from graph_wavenet_tpu.train.engine import cluster_mean_projector
    proj = np.stack([cluster_mean_projector(l, 4) for l in labels])
    adj = rng.integers(0, n_graphs, size=n_samples).astype(np.int32)
    idx = rng.integers(0, n_samples, size=(S, B)).astype(np.int32)
    F_t = 4

    e1 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0), diff_g=True)
    s1, m1 = e1.train_steps_syn_resident(
        e1.state, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(idx),
        jnp.asarray(adj), [jnp.asarray(sup)], jnp.asarray(proj), F_t)

    mcfg = MeshConfig()
    mesh = M.make_mesh(mcfg)
    rep = M.replicated(mesh)
    e2 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0), diff_g=True)
    state = M.shard_state(mesh, e2.state)
    put = lambda a: jax.device_put(jnp.asarray(a), rep)
    s2, m2 = e2.train_steps_syn_resident(
        state, put(xs), put(ys), put(idx), put(adj), [put(sup)],
        put(proj), F_t,
        batch_sharding=M.batch_sharding(mesh, mcfg),
        batched_sharding=M.support_sharding(mesh, mcfg, batched=True))

    np.testing.assert_allclose(np.asarray(m1["loss"]),
                               np.asarray(m2["loss"]), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), atol=2e-5),
        jax.device_get(s1.params), jax.device_get(s2.params))


def test_tp_sp_nontoy_shape_matches_single_device(rng):
    """TP x SP exactness at a NON-toy shape (VERDICT r4 #5): N=1024
    nodes, K=512 input timesteps on the 2x2x2 (data, model, time) mesh
    with node and time sharding both active — the multichip dryrun
    exercises these axes only at N=16/K=12, which cannot catch
    halo/gather bugs that need multiple 128-lane tiles per node shard or
    a halo window smaller than the time shard. Full model incl. the
    learned adaptive adjacency; receptive field 1 + 2*256*(2^1-1) = 513
    = K+1 so the stack collapses time (engine +1 pad included), matching
    the real-path out_dim=12 head. Must equal the single-device step."""
    Nn, K, B = 1024, 512, 2
    cfg = ModelConfig(num_nodes=Nn, out_dim=12, residual_channels=4,
                      dilation_channels=4, skip_channels=8,
                      end_channels=16, blocks=2, layers=1,
                      start_dilation=256, dropout=0.0, gcn_bool=True,
                      addaptadj=True, n_supports=2)
    assert cfg.receptive_field == K + 1
    tcfg = TrainConfig(learning_rate=1e-3)
    x = rng.normal(size=(B, K, Nn, 2)).astype(np.float32)
    y = (rng.normal(size=(B, 12, Nn, 2)) + 3.0).astype(np.float32)
    a = rng.random((2, Nn, Nn)).astype(np.float32)
    supports = [jnp.asarray(s / s.sum(-1, keepdims=True)) for s in a]

    e1 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0))
    s1, m1 = e1.train_step(e1.state, jnp.asarray(x), jnp.asarray(y),
                           supports)

    mcfg = MeshConfig(model_axis=2, time_axis=2, shard_nodes=True,
                      shard_time=True)
    mesh = M.make_mesh(mcfg)
    e2 = Engine(cfg, tcfg, StandardScaler(0.0, 1.0))
    state = M.shard_state(mesh, e2.state)
    xb, yb = M.shard_batch(mesh, mcfg, x, y)
    sup = [jax.device_put(s, M.support_sharding(mesh, mcfg))
           for s in supports]
    s2, m2 = e2.train_step(state, xb, yb, sup)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), atol=2e-5),
        jax.device_get(s1.params), jax.device_get(s2.params))
