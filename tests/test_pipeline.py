"""Pipeline parallelism (parallel/pipeline.py): GPipe over the block stack.

Exactness targets:
- eval-mode forward == apply_gwnet bit-for-bit (micro-batching changes
  nothing without BatchNorm batch statistics);
- train step == Engine.train_step_accum with the same n_micro (same
  micro-batch BN semantics, same per-micro dropout streams, same
  mean-of-micro-losses objective) — params, metrics, and BN running stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_wavenet_tpu.config import ModelConfig, TrainConfig
from graph_wavenet_tpu.data.scaler import StandardScaler
from graph_wavenet_tpu.models.gwnet import apply_gwnet
from graph_wavenet_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    make_pipeline_train_step,
    pipeline_apply,
    stack_stages,
    unstack_stages,
)
from graph_wavenet_tpu.train.engine import Engine

N_NODES = 12


pytestmark = pytest.mark.slow  # multi-epoch/mesh loops; fast tier skips (README)

def _cfg(**kw):
    base = dict(num_nodes=N_NODES, in_dim=2, out_dim=6,
                residual_channels=8, dilation_channels=8, skip_channels=16,
                end_channels=32, blocks=4, layers=2, gcn_bool=True,
                addaptadj=True, n_supports=2, dropout=0.3)
    base.update(kw)
    return ModelConfig(**base)


def _data(rng, batch=8, seq=12, horizon=6, in_dim=2):
    x = rng.normal(size=(batch, seq, N_NODES, in_dim)).astype(np.float32)
    y = (rng.normal(size=(batch, horizon, N_NODES, in_dim)) + 5.0
         ).astype(np.float32)
    a = rng.random((2, N_NODES, N_NODES)).astype(np.float32)
    supports = [jnp.asarray(s / s.sum(-1, keepdims=True)) for s in a]
    return jnp.asarray(x), jnp.asarray(y), supports


def test_stack_unstack_roundtrip(rng):
    eng = Engine(_cfg(), TrainConfig(), StandardScaler(0.0, 1.0))
    layers = eng.state.params["layers"]
    rt = unstack_stages(stack_stages(layers, 4), len(layers))
    for a, b in zip(jax.tree_util.tree_leaves(layers),
                    jax.tree_util.tree_leaves(rt)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("n_stages,n_micro", [(4, 2), (2, 4), (2, 1)])
def test_pipeline_forward_matches_single_device(rng, n_stages, n_micro):
    cfg = _cfg()
    eng = Engine(cfg, TrainConfig(), StandardScaler(0.0, 1.0))
    x, _, supports = _data(rng)
    mesh = make_pipeline_mesh(n_stages)
    ref, _ = jax.jit(lambda p, s, xx: apply_gwnet(
        cfg, p, s, xx, supports, train=False))(
        eng.state.params, eng.state.model_state, x)
    out, new_state = jax.jit(lambda p, s, xx: pipeline_apply(
        cfg, p, s, xx, supports, mesh=mesh, n_micro=n_micro))(
        eng.state.params, eng.state.model_state, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)
    # eval mode must not touch BN state
    for a, b in zip(jax.tree_util.tree_leaves(new_state),
                    jax.tree_util.tree_leaves(eng.state.model_state)):
        np.testing.assert_array_equal(a, b)


def test_pipeline_forward_temporal_only(rng):
    cfg = _cfg(gcn_bool=False, addaptadj=False)
    eng = Engine(cfg, TrainConfig(), StandardScaler(0.0, 1.0))
    x, _, _ = _data(rng)
    mesh = make_pipeline_mesh(4)
    ref, _ = apply_gwnet(cfg, eng.state.params, eng.state.model_state, x,
                         None, train=False)
    out, _ = pipeline_apply(cfg, eng.state.params, eng.state.model_state,
                            x, None, mesh=mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("dropout", [0.0, 0.3])
def test_pipeline_train_step_matches_accum(rng, dropout):
    """Pipeline step == train_step_accum: params, BN stats, metrics."""
    cfg = _cfg(dropout=dropout)
    tcfg = TrainConfig(batch_size=8)
    scaler = StandardScaler(5.0, 2.0)
    n_micro = 2
    x, y, supports = _data(rng)

    eng_ref = Engine(cfg, tcfg, scaler)
    eng_pipe = Engine(cfg, tcfg, scaler)
    mesh = make_pipeline_mesh(4)
    pipe_step = make_pipeline_train_step(eng_pipe, mesh, n_micro)

    ref_state, ref_metrics = eng_ref.train_step_accum(
        eng_ref.state, x, y, supports, n_micro)
    pipe_state, pipe_metrics = pipe_step(eng_pipe.state, x, y, supports)

    for k in ("loss", "mape", "rmse"):
        np.testing.assert_allclose(float(pipe_metrics[k]),
                                   float(ref_metrics[k]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(pipe_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.model_state),
                    jax.tree_util.tree_leaves(pipe_state.model_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pipeline_multi_step_training_converges(rng):
    """A few pipeline steps on a learnable signal reduce the loss."""
    cfg = _cfg(dropout=0.0)
    eng = Engine(cfg, TrainConfig(batch_size=8, learning_rate=1e-2),
                 StandardScaler(0.0, 1.0))
    x, _, supports = _data(rng)
    y = jnp.ones((8, 6, N_NODES, 2), jnp.float32) * 3.0
    mesh = make_pipeline_mesh(2)
    step = make_pipeline_train_step(eng, mesh, 2)
    state = eng.state
    losses = []
    for _ in range(8):
        state, m = step(state, x, y, supports)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7
    assert int(state.step) == 8


def test_pipeline_rejects_misaligned_stages(rng):
    cfg = _cfg(blocks=3)
    eng = Engine(cfg, TrainConfig(), StandardScaler(0.0, 1.0))
    x, _, supports = _data(rng)
    mesh = make_pipeline_mesh(2)
    with pytest.raises(AssertionError, match="blocks"):
        pipeline_apply(cfg, eng.state.params, eng.state.model_state, x,
                       supports, mesh=mesh, n_micro=2)


def test_pipeline_remat_matches_unrematted(rng):
    """cfg.remat rematerializes the stage in the backward pipeline without
    changing a single number."""
    tcfg = TrainConfig(batch_size=8)
    x, y, supports = _data(rng)
    mesh = make_pipeline_mesh(4)
    states = {}
    for remat in (False, True):
        eng = Engine(_cfg(dropout=0.3, remat=remat), tcfg,
                     StandardScaler(5.0, 2.0))
        step = make_pipeline_train_step(eng, mesh, 2)
        states[remat], _ = step(eng.state, x, y, supports)
    for a, b in zip(jax.tree_util.tree_leaves(states[False].params),
                    jax.tree_util.tree_leaves(states[True].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_pipeline_rejects_diff_g(rng):
    mesh = make_pipeline_mesh(2)
    eng_dg = Engine(_cfg(start_dilation=1), TrainConfig(),
                    StandardScaler(0.0, 1.0), diff_g=True)
    with pytest.raises(AssertionError, match="shared-graph"):
        make_pipeline_train_step(eng_dg, mesh, 2)


def test_pipeline_stacked_mode_with_sparse_supports(rng):
    """gcn_mode='stacked' + sparse supports: power stacks have no matmul
    form for support objects — the pipeline must skip them (gcn_apply
    downgrades to the fused chain) exactly like apply_gwnet does."""
    from graph_wavenet_tpu.ops import sparse

    cfg = _cfg(gcn_mode="stacked", addaptadj=False, n_supports=1,
               dropout=0.0)
    eng = Engine(cfg, TrainConfig(), StandardScaler(0.0, 1.0))
    x, _, _ = _data(rng)
    sp = sparse.random_sparse_support(N_NODES, 4,
                                      rng=np.random.default_rng(0))
    mesh = make_pipeline_mesh(2)
    ref, _ = apply_gwnet(cfg, eng.state.params, eng.state.model_state, x,
                         [jnp.asarray(sp.to_dense())], train=False)
    out, _ = pipeline_apply(cfg, eng.state.params, eng.state.model_state, x,
                            [sp], mesh=mesh, n_micro=2, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)


def test_pipeline_train_step_rejects_sparse_supports(rng):
    """Sparse-support gradients are undefined under the manual pipe axis
    (custom-VJP cotangents vary where the primal is replicated) — the step
    must fail with the named error, not a shard_map type error."""
    from graph_wavenet_tpu.ops import sparse

    cfg = _cfg(addaptadj=False, n_supports=1, dropout=0.0)
    eng = Engine(cfg, TrainConfig(), StandardScaler(0.0, 1.0))
    step = make_pipeline_train_step(eng, make_pipeline_mesh(2), n_micro=2)
    x, y, _ = _data(rng)
    sp = sparse.random_sparse_support(N_NODES, 4,
                                      rng=np.random.default_rng(0))
    with pytest.raises(ValueError, match="dense .* supports only"):
        step(eng.state, x, y, [sp])
