"""Op-level parity tests vs torch primitives.

Each op is checked against the corresponding torch building block configured
the way the reference uses it (layouts adapted: ours is (B, T, N, C), torch's
is (B, C, N, T))."""

import numpy as np
import pytest
import torch

from graph_wavenet_tpu.ops import adaptive, diffusion, linear, normalization
from graph_wavenet_tpu.ops import temporal
import jax
import jax.numpy as jnp


def to_torch_btnc(x):
    """(B,T,N,C) -> torch (B,C,N,T)"""
    return torch.tensor(np.asarray(x).transpose(0, 3, 2, 1))


def from_torch(x):
    """torch (B,C,N,T) -> (B,T,N,C)"""
    return x.detach().numpy().transpose(0, 3, 2, 1)


@pytest.fixture
def x(rng):
    return rng.normal(size=(3, 9, 11, 5)).astype(np.float32)


def test_linear_matches_conv1x1(x, rng):
    p = linear.linear_init(jax.random.key(0), 5, 7)
    conv = torch.nn.Conv2d(5, 7, kernel_size=(1, 1))
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(
            np.asarray(p["w"]).T[:, :, None, None]))
        conv.bias.copy_(torch.tensor(np.asarray(p["b"])))
    want = from_torch(conv(to_torch_btnc(x)))
    got = np.asarray(linear.linear_apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("dilation", [1, 2, 4])
def test_causal_conv_matches_torch_dilated_conv(x, dilation):
    p = temporal.causal_conv_init(jax.random.key(1), 5, 6, 2)
    conv = torch.nn.Conv2d(5, 6, kernel_size=(1, 2), dilation=dilation)
    w = np.asarray(p["w"])  # (k, c_in, c_out)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(
            w.transpose(2, 1, 0)[:, :, None, :]))
        conv.bias.copy_(torch.tensor(np.asarray(p["b"])))
    want = from_torch(conv(to_torch_btnc(x)))
    got = np.asarray(temporal.causal_conv_apply(p, jnp.asarray(x), dilation))
    assert got.shape[1] == x.shape[1] - dilation
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gated_tcn(x):
    pf = temporal.causal_conv_init(jax.random.key(2), 5, 6, 2)
    pg = temporal.causal_conv_init(jax.random.key(3), 5, 6, 2)
    got = temporal.gated_tcn_apply(pf, pg, jnp.asarray(x), 2)
    want = np.tanh(np.asarray(
        temporal.causal_conv_apply(pf, jnp.asarray(x), 2))) * (
        1 / (1 + np.exp(-np.asarray(
            temporal.causal_conv_apply(pg, jnp.asarray(x), 2)))))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_left_pad_time(x):
    y = temporal.left_pad_time(jnp.asarray(x), 13)
    assert y.shape == (3, 13, 11, 5)
    np.testing.assert_array_equal(np.asarray(y[:, :4]), 0)
    np.testing.assert_array_equal(np.asarray(y[:, 4:]), x)
    # no-op when already long enough
    assert temporal.left_pad_time(jnp.asarray(x), 9).shape == x.shape


def test_nconv_matches_reference_einsum(x, rng):
    A = rng.random((11, 11)).astype(np.float32)
    got = np.asarray(diffusion.nconv(jnp.asarray(x), jnp.asarray(A)))
    # reference: einsum('ncvl,vw->ncwl') in (B,C,N,T) layout
    want = np.einsum("ncvl,vw->ncwl", x.transpose(0, 3, 2, 1), A)
    np.testing.assert_allclose(got.transpose(0, 3, 2, 1), want, atol=1e-5)


def test_nconv_batched(x, rng):
    A = rng.random((3, 11, 11)).astype(np.float32)
    got = np.asarray(diffusion.nconv_batched(jnp.asarray(x), jnp.asarray(A)))
    want = np.einsum("ncvl,nvw->ncwl", x.transpose(0, 3, 2, 1), A)
    np.testing.assert_allclose(got.transpose(0, 3, 2, 1), want, atol=1e-5)


def test_gcn_fused_equals_concat(x, rng):
    supports = [jnp.asarray(rng.random((11, 11)).astype(np.float32))
                for _ in range(3)]
    p = diffusion.gcn_init(jax.random.key(4), 5, 8, n_supports=3, order=2)
    a = diffusion.gcn_apply(p, jnp.asarray(x), supports, mode="concat")
    b = diffusion.gcn_apply(p, jnp.asarray(x), supports, mode="fused")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_gcn_stacked_equals_concat(x, rng):
    # higher order to exercise the power stack, shared + batched supports,
    # and gradient-path equivalence through the wide-matmul form
    shared = [jnp.asarray(rng.random((11, 11)).astype(np.float32))
              for _ in range(2)]
    batched = [jnp.asarray(rng.random((3, 11, 11)).astype(np.float32))]
    for supports in (shared, shared + batched):
        p = diffusion.gcn_init(jax.random.key(4), 5, 8,
                               n_supports=len(supports), order=3)
        a = diffusion.gcn_apply(p, jnp.asarray(x), supports, order=3,
                                mode="concat")
        b = diffusion.gcn_apply(p, jnp.asarray(x), supports, order=3,
                                mode="stacked")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def loss(mode, w):
        return diffusion.gcn_apply({"w": w, "b": p["b"]}, jnp.asarray(x),
                                   supports, order=3, mode=mode).sum()

    ga = jax.grad(lambda w: loss("concat", w))(p["w"])
    gb = jax.grad(lambda w: loss("stacked", w))(p["w"])
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=2e-4,
                               atol=1e-3)


def test_gcn_hop_structure(x, rng):
    # identity support: hops equal x, so output = x @ (sum of weight blocks)
    eye = jnp.eye(11)
    p = diffusion.gcn_init(jax.random.key(5), 5, 4, n_supports=1, order=2)
    got = diffusion.gcn_apply(p, jnp.asarray(x), [eye])
    w = np.asarray(p["w"])
    wsum = w[:5] + w[5:10] + w[10:]
    want = np.einsum("btnc,cf->btnf", x, wsum) + np.asarray(p["b"])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_gcn_dropout(x, rng):
    supports = [jnp.eye(11)]
    p = diffusion.gcn_init(jax.random.key(6), 5, 4, n_supports=1, order=2)
    ref = diffusion.gcn_apply(p, jnp.asarray(x), supports)
    drop = diffusion.gcn_apply(p, jnp.asarray(x), supports, dropout=0.5,
                               rng=jax.random.key(7), train=True)
    d = np.asarray(drop)
    r = np.asarray(ref)
    zeros = d == 0
    assert 0.3 < zeros.mean() < 0.7
    np.testing.assert_allclose(d[~zeros], (r / 0.5)[~zeros], atol=1e-4)
    # eval mode: dropout inert even with rate set
    same = diffusion.gcn_apply(p, jnp.asarray(x), supports, dropout=0.5,
                               train=False)
    np.testing.assert_allclose(np.asarray(same), r, atol=1e-6)


def test_adaptive_adjacency_matches_torch(rng):
    nv1 = rng.normal(size=(11, 10)).astype(np.float32)
    nv2 = rng.normal(size=(10, 11)).astype(np.float32)
    got = np.asarray(adaptive.adaptive_adjacency(jnp.asarray(nv1),
                                                 jnp.asarray(nv2)))
    want = torch.softmax(torch.relu(
        torch.tensor(nv1) @ torch.tensor(nv2)), dim=1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(got.sum(1), 1.0, atol=1e-5)


def test_adaptive_adjacency_batched(rng):
    nv1 = rng.normal(size=(4, 11, 10)).astype(np.float32)
    nv2 = rng.normal(size=(4, 10, 11)).astype(np.float32)
    got = np.asarray(adaptive.adaptive_adjacency_batched(
        jnp.asarray(nv1), jnp.asarray(nv2)))
    want = torch.softmax(torch.relu(
        torch.tensor(nv1) @ torch.tensor(nv2)), dim=2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_svd_nodevecs(rng):
    A = rng.random((11, 11)).astype(np.float64)
    e1, e2 = adaptive.svd_nodevecs(A, rank=10)
    m, p, n = torch.svd(torch.tensor(A))
    w1 = (m[:, :10] @ torch.diag(p[:10] ** 0.5)).numpy()
    w2 = (torch.diag(p[:10] ** 0.5) @ n[:, :10].t()).numpy()
    # SVD sign ambiguity: compare the products (what the model consumes)
    np.testing.assert_allclose(e1 @ e2, w1 @ w2, atol=1e-4)


def test_batch_norm_matches_torch(x):
    p, s = normalization.batch_norm_init(5)
    bn = torch.nn.BatchNorm2d(5)
    xt = to_torch_btnc(x)

    # train step
    bn.train()
    want = from_torch(bn(xt))
    got, new_s = normalization.batch_norm_apply(p, s, jnp.asarray(x),
                                                train=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_s["mean"]),
                               bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_s["var"]),
                               bn.running_var.numpy(), atol=1e-4)

    # eval step uses running stats
    bn.eval()
    want = from_torch(bn(xt))
    got, s2 = normalization.batch_norm_apply(p, new_s, jnp.asarray(x),
                                             train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
    assert s2 is new_s


def test_sparse_support_roundtrip_and_nconv(x, rng):
    from graph_wavenet_tpu.ops import sparse

    # a column-sparse dense support: <=4 nonzeros per column
    a = np.zeros((11, 11), np.float32)
    for c in range(11):
        rows = rng.choice(11, size=4, replace=False)
        a[rows, c] = rng.random(4).astype(np.float32)
    sp = sparse.from_dense(a)
    assert sp.max_degree == 4
    np.testing.assert_allclose(sp.to_dense(), a, atol=1e-7)

    got = np.asarray(sparse.nconv_sparse(jnp.asarray(x), sp))
    want = np.asarray(diffusion.nconv(jnp.asarray(x), jnp.asarray(a)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sparse_gcn_matches_dense(x, rng):
    from graph_wavenet_tpu.ops import sparse

    a = np.zeros((11, 11), np.float32)
    for c in range(11):
        rows = rng.choice(11, size=3, replace=False)
        a[rows, c] = rng.random(3).astype(np.float32)
    dense_sup = [jnp.asarray(a)]
    sparse_sup = [sparse.from_dense(a)]
    p = diffusion.gcn_init(jax.random.key(11), 5, 4, n_supports=1, order=2)
    want = diffusion.gcn_apply(p, jnp.asarray(x), dense_sup, order=2)
    for mode in ("fused", "concat", "stacked"):  # stacked falls back
        got = diffusion.gcn_apply(p, jnp.asarray(x), sparse_sup, order=2,
                                  mode=mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    # gradients: the scatter-free custom VJP must match dense autodiff
    # for BOTH dx (transpose-table gather) and dw (per-edge row dot)
    sp0 = sparse_sup[0]

    def loss_sparse(xx, w):
        sp = sparse.SparseSupport(sp0.idx, w, sp0.idx_t, sp0.perm_t,
                                  sp0.live)
        return (diffusion.gcn_apply(p, xx, [sp], order=2) ** 2).sum()

    def loss_dense(xx, ww):
        return (diffusion.gcn_apply(p, xx, [ww], order=2) ** 2).sum()

    dx_s, dw_s = jax.grad(loss_sparse, argnums=(0, 1))(jnp.asarray(x), sp0.w)
    dx_d, da_d = jax.grad(loss_dense, argnums=(0, 1))(jnp.asarray(x),
                                                      jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_d), atol=1e-3)
    # dense dA at the table's edge positions equals dw
    idx = np.asarray(sp0.idx)
    for r in range(11):
        for j in range(3):
            np.testing.assert_allclose(
                float(dw_s[r, j]), float(da_d[idx[r, j], r]), atol=1e-3)


def test_sparse_padding_slots_pinned_at_zero_gradient(rng):
    """Padding slots of the ELL table must get EXACTLY zero dw: they point
    at a real node (the row's own index), so a raw gradient there would let
    an optimizer step grow edges the precomputed transpose table cannot
    see — dx would silently diverge from dense autodiff after one update
    on w (the bug this pins). Gradients on build-time edges stay exact."""
    from graph_wavenet_tpu.ops import sparse

    # ragged column degrees -> from_dense pads short rows
    a = np.zeros((7, 7), np.float32)
    a[:4, 0] = [1.0, 2.0, 3.0, 4.0]
    a[2, 1] = 5.0
    a[(0, 3), 2] = [6.0, 7.0]
    sp = sparse.from_dense(a)
    live = np.asarray(sp.live)
    assert not live.all(), "fixture must contain padding slots"

    x = jnp.asarray(rng.normal(size=(2, 3, 7, 4)).astype(np.float32))

    def loss(w):
        s = sparse.SparseSupport(sp.idx, w, sp.idx_t, sp.perm_t, sp.live)
        return (sparse.nconv_sparse(x, s) ** 2).sum()

    dw = np.asarray(jax.grad(loss)(sp.w))
    assert (dw[~live] == 0).all()
    # after an update on w (live slots only move), dx still matches dense
    w2 = sp.w - 0.05 * jnp.asarray(dw)
    s2 = sparse.SparseSupport(sp.idx, w2, sp.idx_t, sp.perm_t, sp.live)
    dx_s = jax.grad(lambda xx: (sparse.nconv_sparse(xx, s2) ** 2).sum())(x)
    a2 = s2.to_dense()
    from graph_wavenet_tpu.ops import diffusion
    dx_d = jax.grad(lambda xx: (diffusion.nconv(
        xx, jnp.asarray(a2)) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_d), atol=1e-4)


def test_sparse_support_topk_truncation(rng):
    from graph_wavenet_tpu.ops import sparse

    a = np.zeros((6, 6), np.float32)
    a[:, 0] = [5.0, -4.0, 3.0, -2.0, 1.0, 0.5]       # column 0: 6 nonzeros
    sp = sparse.from_dense(a, max_degree=3)
    d = sp.to_dense()
    np.testing.assert_allclose(d[:3, 0], [5.0, -4.0, 3.0])
    assert (d[3:, 0] == 0).all()                      # smallest dropped


def test_block_sparse_matches_dense(x, rng):
    from graph_wavenet_tpu.ops import block_sparse

    # 12-node graph in 3 blocks of 4, with block structure: only some
    # block pairs populated
    n, bs = 12, 4
    a = np.zeros((n, n), np.float32)
    for (sb, db) in ((0, 0), (1, 0), (2, 2), (0, 1)):
        a[sb * bs:(sb + 1) * bs, db * bs:(db + 1) * bs] = rng.random(
            (bs, bs)).astype(np.float32)
    sp = block_sparse.from_dense(a, block_size=bs)
    np.testing.assert_allclose(sp.to_dense(), a, atol=1e-7)

    xb = jnp.asarray(rng.normal(size=(3, 9, n, 5)).astype(np.float32))
    got = np.asarray(block_sparse.nconv_block_sparse(xb, sp))
    want = np.asarray(diffusion.nconv(xb, jnp.asarray(a)))
    np.testing.assert_allclose(got, want, atol=1e-4)

    # through gcn_apply (duck-typed sparse fast path), vs dense
    p = diffusion.gcn_init(jax.random.key(21), 5, 4, n_supports=1, order=2)
    want = diffusion.gcn_apply(p, xb, [jnp.asarray(a)], order=2)
    got = diffusion.gcn_apply(p, xb, [sp], order=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    # gradients (dx and dblocks) vs dense autodiff
    def loss_sp(xx, blocks):
        s2 = block_sparse.BlockSparseSupport(blocks, sp.block_idx,
                                             sp.idx_t, sp.perm_t)
        return (block_sparse.nconv_block_sparse(xx, s2) ** 2).sum()

    def loss_d(xx, aa):
        return (diffusion.nconv(xx, aa) ** 2).sum()

    dx_s, db_s = jax.grad(loss_sp, argnums=(0, 1))(xb, sp.blocks)
    dx_d, da_d = jax.grad(loss_d, argnums=(0, 1))(xb, jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_d), atol=1e-3)
    bidx = np.asarray(sp.block_idx)
    for r in range(3):
        for m in range(bidx.shape[1]):
            s = bidx[r, m]
            if s >= 3:
                continue
            np.testing.assert_allclose(
                np.asarray(db_s[r, m]),
                np.asarray(da_d)[s * bs:(s + 1) * bs, r * bs:(r + 1) * bs],
                atol=1e-3)


def test_block_sparse_from_edges(rng):
    from graph_wavenet_tpu.ops import block_sparse

    # random edges on 11 nodes (pads to 12 with block_size 4), with a
    # duplicate edge (accumulates) and a permutation
    src = np.array([0, 3, 3, 7, 10, 2, 5])
    dst = np.array([1, 4, 4, 2, 9, 10, 5])
    w = rng.random(7).astype(np.float32)
    perm = rng.permutation(11)
    sp = block_sparse.from_edges_blocked(src, dst, w, 11, block_size=4,
                                         perm=perm)
    dense = np.zeros((12, 12), np.float32)
    for s_, d_, w_ in zip(perm[src], perm[dst], w):
        dense[s_, d_] += w_
    np.testing.assert_allclose(sp.to_dense(), dense, atol=1e-6)


def test_sparse_from_edges_accumulates_and_topk(rng):
    from graph_wavenet_tpu.ops import sparse

    # duplicate (src, dst) pairs accumulate; top-|w| per dest under
    # max_degree — consistent with block_sparse.from_edges_blocked
    src = np.array([0, 0, 2, 3, 4, 5])
    dst = np.array([1, 1, 1, 1, 2, 2])
    w = np.array([0.5, 0.25, -2.0, 0.1, 1.0, 3.0], np.float32)
    sp = sparse.from_edges(src, dst, w, 6)
    d = sp.to_dense()
    np.testing.assert_allclose(d[0, 1], 0.75, atol=1e-6)   # accumulated
    np.testing.assert_allclose(d[2, 1], -2.0, atol=1e-6)
    # max_degree=2 keeps the largest-|w| incoming edges of node 1
    sp2 = sparse.from_edges(src, dst, w, 6, max_degree=2)
    d2 = sp2.to_dense()
    np.testing.assert_allclose(d2[2, 1], -2.0, atol=1e-6)
    np.testing.assert_allclose(d2[0, 1], 0.75, atol=1e-6)
    assert d2[3, 1] == 0.0                                   # dropped


def test_masked_batch_norm_accepts_python_int_t_valid(rng):
    """t_valid may be a static int, not only a traced scalar."""
    p, s = normalization.batch_norm_init(4)
    x = jnp.asarray(rng.normal(size=(2, 6, 3, 4)).astype(np.float32))
    out_static, st_static = normalization.batch_norm_apply(
        p, s, x, train=True, t_valid=4)
    out_traced, st_traced = normalization.batch_norm_apply(
        p, s, x, train=True, t_valid=jnp.asarray(4))
    np.testing.assert_allclose(np.asarray(out_static),
                               np.asarray(out_traced), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st_static["mean"]),
                               np.asarray(st_traced["mean"]), rtol=1e-6)


def test_causal_conv_chunked_accum_bitwise_identical(rng, monkeypatch):
    """The long-K fp32-accumulator chunking (r5: the unchunked
    accumulator is the largest buffer at K=2912 x 40k nodes) must be
    bitwise identical to the unchunked conv — each output element's
    contraction is unchanged, chunks only bound the materialized fp32
    accumulator. Forced at toy size via the module threshold."""
    from graph_wavenet_tpu.ops import temporal

    p = temporal.causal_conv_init(jax.random.key(5), 4, 6, 2)
    for dilation in (1, 2, 4):
        x = jnp.asarray(rng.normal(size=(2, 37, 5, 4)), jnp.float32)
        want = np.asarray(temporal.causal_conv_apply(p, x, dilation))
        monkeypatch.setattr(temporal, "_CONV_ACCUM_CHUNK_BYTES", 4096)
        got = np.asarray(temporal.causal_conv_apply(p, x, dilation))
        monkeypatch.setattr(temporal, "_CONV_ACCUM_CHUNK_BYTES", 2 ** 30)
        np.testing.assert_array_equal(got, want)
        # bf16 path too (the production dtype)
        xb = x.astype(jnp.bfloat16)
        want = np.asarray(temporal.causal_conv_apply(p, xb, dilation),
                          np.float32)
        monkeypatch.setattr(temporal, "_CONV_ACCUM_CHUNK_BYTES", 4096)
        got = np.asarray(temporal.causal_conv_apply(p, xb, dilation),
                         np.float32)
        monkeypatch.setattr(temporal, "_CONV_ACCUM_CHUNK_BYTES", 2 ** 30)
        np.testing.assert_array_equal(got, want)
