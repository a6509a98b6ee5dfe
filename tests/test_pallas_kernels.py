"""Pallas kernel correctness vs the XLA reference ops, forward and gradient.

Run in interpreter mode on the CPU test mesh; the same kernels compile for
TPU (exercised by bench.py / the TPU smoke script).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from graph_wavenet_tpu.ops.diffusion import gcn_apply, gcn_init
from graph_wavenet_tpu.ops.pallas.diffusion import fused_gcn, gcn_rows
from graph_wavenet_tpu.ops.pallas.gated_tcn import (
    fused_gated_tcn,
    gated_tcn_reference,
    pack_gate_params,
)
from graph_wavenet_tpu.ops.temporal import causal_conv_init

B, T, N, C, F = 3, 9, 12, 5, 6


@pytest.fixture
def gate_params():
    pf = causal_conv_init(jax.random.key(0), C, F, 2)
    pg = causal_conv_init(jax.random.key(1), C, F, 2)
    return pf, pg


@pytest.mark.parametrize("dilation", [1, 2])
def test_fused_gated_tcn_forward(rng, gate_params, dilation):
    pf, pg = gate_params
    x = jnp.asarray(rng.normal(size=(B, T, N, C)).astype(np.float32))
    w, b = pack_gate_params(pf, pg)
    got = fused_gated_tcn(x, w, b, dilation, True)
    want = gated_tcn_reference(pf, pg, x, dilation)
    assert got.shape == (B, T - dilation, N, F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_gated_tcn_grad(rng, gate_params):
    pf, pg = gate_params
    x = jnp.asarray(rng.normal(size=(B, T, N, C)).astype(np.float32))
    w, b = pack_gate_params(pf, pg)

    def loss_fused(x, w, b):
        return jnp.sum(fused_gated_tcn(x, w, b, 2, True) ** 2)

    def loss_ref(x, w, b):
        pf2 = {"w": w[..., :F], "b": b[:F]}
        pg2 = {"w": w[..., F:], "b": b[F:]}
        return jnp.sum(gated_tcn_reference(pf2, pg2, x, 2) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


@pytest.mark.parametrize("n_supports,order", [(2, 2), (3, 2), (1, 3)])
def test_fused_gcn_forward(rng, n_supports, order):
    p = gcn_init(jax.random.key(2), C, F, n_supports, order)
    x = jnp.asarray(rng.normal(size=(B * T, N, C)).astype(np.float32))
    supports = []
    for _ in range(n_supports):
        a = rng.random((N, N)).astype(np.float32)
        supports.append(jnp.asarray(a / a.sum(-1, keepdims=True)))
    got = fused_gcn(x, jnp.stack(supports), p["w"], p["b"], order,
                    n_supports, 4, True)
    want = gcn_apply(p, x[None], supports, order=order, mode="concat")[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_gcn_row_padding(rng):
    """Row count not divisible by the block: padded internally, exact out."""
    p = gcn_init(jax.random.key(3), C, F, 1, 2)
    x = jnp.asarray(rng.normal(size=(7, N, C)).astype(np.float32))
    a = rng.random((N, N)).astype(np.float32)
    a = jnp.asarray(a / a.sum(-1, keepdims=True))
    got = fused_gcn(x, a[None], p["w"], p["b"], 2, 1, 4, True)
    want = gcn_apply(p, x[None], [a], order=2, mode="concat")[0]
    assert got.shape == (7, N, F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_gcn_grads_including_supports(rng):
    """dx, dA (adaptive adjacency is learned!), dW, db all match jax.grad
    of the XLA path."""
    n_supports, order = 2, 2
    p = gcn_init(jax.random.key(4), C, F, n_supports, order)
    x = jnp.asarray(rng.normal(size=(10, N, C)).astype(np.float32))
    a = np.stack([rng.random((N, N)).astype(np.float32)
                  for _ in range(n_supports)])
    a = jnp.asarray(a / a.sum(-1, keepdims=True))

    def loss_fused(x, a, w, b):
        return jnp.sum(fused_gcn(x, a, w, b, order, n_supports, 4, True)
                       ** 2)

    def loss_ref(x, a, w, b):
        out = gcn_apply({"w": w, "b": b}, x[None], [a[0], a[1]],
                        order=order, mode="concat")[0]
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, a, p["w"], p["b"])
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, a, p["w"], p["b"])
    for name, ga, gb in zip(("dx", "dA", "dW", "db"), g1, g2):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=1e-4, err_msg=name)


def test_gcn_rows_adapter(rng):
    p = gcn_init(jax.random.key(5), C, F, 2, 2)
    x = jnp.asarray(rng.normal(size=(B, T, N, C)).astype(np.float32))
    supports = []
    for _ in range(2):
        a = rng.random((N, N)).astype(np.float32)
        supports.append(jnp.asarray(a / a.sum(-1, keepdims=True)))
    got = gcn_rows(x, supports, p, 2, row_block=8, interpret=True)
    want = gcn_apply(p, x, supports, order=2, mode="concat")
    assert got.shape == (B, T, N, F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
