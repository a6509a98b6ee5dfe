"""Full-model equivalence: use_pallas=True (interpret mode on CPU) must
match the XLA path bit-for-tolerance, forward and through a train step."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_wavenet_tpu.config import ModelConfig, TrainConfig
from graph_wavenet_tpu.data.scaler import StandardScaler
from graph_wavenet_tpu.models.gwnet import apply_gwnet, init_gwnet
from graph_wavenet_tpu.train.engine import Engine

pytestmark = pytest.mark.slow  # full-model interpret-mode kernels; fast tier skips (README)

N = 14


def cfgs():
    xla = ModelConfig(num_nodes=N, out_dim=12, residual_channels=8,
                      dilation_channels=8, skip_channels=16, end_channels=32,
                      blocks=2, layers=2, dropout=0.0, n_supports=2)
    return xla, dataclasses.replace(xla, use_pallas=True,
                                    pallas_row_block=8)


def make_inputs(rng):
    supports = []
    for _ in range(2):
        a = rng.random((N, N)).astype(np.float32)
        supports.append(jnp.asarray(a / a.sum(-1, keepdims=True)))
    x = jnp.asarray(rng.normal(size=(4, 13, N, 2)).astype(np.float32))
    return x, supports


def test_forward_equivalence(rng):
    xla_cfg, pls_cfg = cfgs()
    params, state = init_gwnet(jax.random.key(0), xla_cfg)
    x, supports = make_inputs(rng)
    want, _ = apply_gwnet(xla_cfg, params, state, x, supports)
    got, _ = apply_gwnet(pls_cfg, params, state, x, supports)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_train_step_equivalence(rng):
    xla_cfg, pls_cfg = cfgs()
    tcfg = TrainConfig(learning_rate=1e-3)
    x = rng.normal(size=(4, 12, N, 2)).astype(np.float32)
    y = rng.normal(size=(4, 12, N, 2)).astype(np.float32)
    _, supports = make_inputs(rng)

    states = []
    for cfg in (xla_cfg, pls_cfg):
        e = Engine(cfg, tcfg, StandardScaler(0.0, 1.0))
        st = e.state
        for _ in range(3):
            st, m = e.train_step(st, jnp.asarray(x), jnp.asarray(y),
                                 supports)
        states.append((st, float(m["loss"])))
    (s1, l1), (s2, l2) = states
    assert np.isclose(l1, l2, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        jax.device_get(s1.params), jax.device_get(s2.params))


def test_forward_equivalence_temporal_only(rng):
    """use_pallas with gcn disabled: fused gated TCN only."""
    xla_cfg, pls_cfg = cfgs()
    xla_cfg = dataclasses.replace(xla_cfg, gcn_bool=False, addaptadj=False)
    pls_cfg = dataclasses.replace(pls_cfg, gcn_bool=False, addaptadj=False)
    params, state = init_gwnet(jax.random.key(1), xla_cfg)
    x, _ = make_inputs(rng)
    want, _ = apply_gwnet(xla_cfg, params, state, x, None)
    got, _ = apply_gwnet(pls_cfg, params, state, x, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_bfloat16_forward_close_to_fp32(rng):
    """Mixed-precision path: bf16 activations, fp32 params/accum — outputs
    within bf16 tolerance of the fp32 path, and a train step runs."""
    import jax.numpy as jnp
    from graph_wavenet_tpu.config import TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.train.engine import Engine

    xla_cfg, _ = cfgs()
    bf_cfg = dataclasses.replace(xla_cfg, dtype="bfloat16")
    params, state = init_gwnet(jax.random.key(2), xla_cfg)
    x, supports = make_inputs(rng)
    want, _ = apply_gwnet(xla_cfg, params, state, x, supports)
    got, _ = apply_gwnet(bf_cfg, params, state, x, supports)
    assert got.dtype == jnp.float32          # predictions leave in fp32
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = np.abs(np.asarray(want)).max()
    assert err.max() < 0.05 * max(scale, 1.0)

    e = Engine(bf_cfg, TrainConfig(), StandardScaler(0.0, 1.0))
    xt = jnp.asarray(rng.normal(size=(4, 12, N, 2)).astype(np.float32))
    yt = jnp.asarray(rng.normal(size=(4, 12, N, 2)).astype(np.float32))
    st, m = e.train_step(e.state, xt, yt, supports)
    assert np.isfinite(float(m["loss"]))
    # params remain fp32 after the update
    assert st.params["start_conv"]["w"].dtype == jnp.float32


def test_remat_equivalence(rng):
    """cfg.remat recomputes layers in backward — results must be identical
    (same math, different schedule)."""
    import jax.numpy as jnp
    from graph_wavenet_tpu.config import TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.train.engine import Engine

    base, _ = cfgs()
    rcfg = dataclasses.replace(base, remat=True)
    params, state = init_gwnet(jax.random.key(3), base)
    x, supports = make_inputs(rng)
    a, _ = apply_gwnet(base, params, state, x, supports)
    b, _ = apply_gwnet(rcfg, params, state, x, supports)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    xt = jnp.asarray(rng.normal(size=(4, 12, N, 2)).astype(np.float32))
    yt = jnp.asarray(rng.normal(size=(4, 12, N, 2)).astype(np.float32))
    outs = []
    for cfg in (base, rcfg):
        e = Engine(cfg, TrainConfig(), StandardScaler(0.0, 1.0))
        st, m = e.train_step(e.state, xt, yt, supports)
        outs.append((jax.device_get(st.params), float(m["loss"])))
    assert np.isclose(outs[0][1], outs[1][1], rtol=1e-6)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(np.asarray(p),
                                                np.asarray(q), atol=1e-6),
        outs[0][0], outs[1][0])
