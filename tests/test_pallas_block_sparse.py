"""Pallas block-sparse diffusion kernels (ops/pallas/block_diffusion.py).

CPU runs the kernels in interpret mode; the parity target is the XLA
block-sparse path (itself pinned against dense supports in test_ops.py).
Hardware numbers: 1.30x full train step at 41k nodes, 1.17x at 5k
(BENCH_NOTES.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_wavenet_tpu.ops import block_sparse as B


@pytest.fixture
def support(rng):
    return B.random_block_support(4, 2, block_size=128, rng=rng)


def test_pallas_forward_matches_xla(rng, support):
    x2 = jnp.asarray(
        rng.normal(size=(support.n_nodes, 96)).astype(np.float32))
    ref = support.mix_2d(x2)
    out = B.as_pallas(support).mix_2d(x2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pallas_forward_bf16(rng, support):
    x2 = jnp.asarray(
        rng.normal(size=(support.n_nodes, 160)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref = support.mix_2d(x2).astype(jnp.float32)
    out = B.as_pallas(support).mix_2d(x2).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=1e-2)
    assert B.as_pallas(support).mix_2d(x2).dtype == jnp.bfloat16


def test_pallas_gradients_match_xla(rng, support):
    x2 = jnp.asarray(
        rng.normal(size=(support.n_nodes, 96)).astype(np.float32))

    def loss(cls, x2, blocks):
        s = cls(blocks, support.block_idx, support.idx_t, support.perm_t)
        return jnp.sum(jnp.sin(s.mix_2d(x2)))

    gr = jax.grad(lambda *a: loss(B.BlockSparseSupport, *a),
                  argnums=(0, 1))(x2, support.blocks)
    gp = jax.grad(lambda *a: loss(B.PallasBlockSparseSupport, *a),
                  argnums=(0, 1))(x2, support.blocks)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pallas_model_level_matches_xla(rng, support):
    """Full gwnet forward with Pallas block supports == XLA block supports
    (duck-typed through the all-sparse gcn fast path)."""
    from graph_wavenet_tpu.config import ModelConfig
    from graph_wavenet_tpu.models.gwnet import apply_gwnet, init_gwnet

    n = support.n_nodes
    cfg = ModelConfig(num_nodes=n, in_dim=1, out_dim=4,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=8, blocks=1, layers=2,
                      gcn_bool=True, addaptadj=False, n_supports=1,
                      dropout=0.0)
    params, state = init_gwnet(jax.random.key(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, 13, n, 1)).astype(np.float32))
    ref, _ = apply_gwnet(cfg, params, state, x, [support], train=False)
    out, _ = apply_gwnet(cfg, params, state, x, [B.as_pallas(support)],
                         train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_as_pallas_preserves_structure(support):
    p = B.as_pallas(support)
    assert isinstance(p, B.BlockSparseSupport)
    np.testing.assert_array_equal(p.block_idx, support.block_idx)
    # pytree roundtrip (checkpoint/device_put paths flatten supports)
    leaves, treedef = jax.tree_util.tree_flatten(p)
    p2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(p2, B.PallasBlockSparseSupport)


def test_pick_rt_prefers_large_divisors():
    from graph_wavenet_tpu.ops.pallas.block_diffusion import _pick_rt
    assert _pick_rt(1664) == 1664          # whole row under the cap
    assert _pick_rt(4096) == 4096
    assert _pick_rt(128 * 33) == 128 * 11  # odd multiple: largest divisor,
    #                                        not the RT=128 launch cliff
    assert _pick_rt(8192) == 4096


def test_pallas_sentinel_padded_rows(rng):
    """Block-rows with fewer nonzero blocks than MB carry the sentinel
    (block_idx == NB); the kernel must read the zero x row for them."""
    n = 3 * 128
    a = np.zeros((n, n), np.float32)
    # block (0,0) dense, block-row 1 gets two sources, row 2 one source
    a[:128, :128] = rng.random((128, 128))
    a[:128, 128:256] = rng.random((128, 128))
    a[128:256, 128:256] = rng.random((128, 128))
    a[256:, 256:] = rng.random((128, 128))
    sp = B.from_dense(a, block_size=128)
    assert (np.asarray(sp.block_idx) == 3).any()   # sentinel present
    x2 = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    ref = sp.mix_2d(x2)
    got = B.as_pallas(sp).mix_2d(x2)
    # fp32 accumulation-order noise across 128-wide block dots; a sentinel
    # bug would produce O(1) errors (wrong rows mixed in), not 1e-5
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # gradients through the sentinel rows too
    g1 = jax.grad(lambda b: jnp.sum(B.BlockSparseSupport(
        b, sp.block_idx, sp.idx_t, sp.perm_t).mix_2d(x2) ** 2))(sp.blocks)
    g2 = jax.grad(lambda b: jnp.sum(B.PallasBlockSparseSupport(
        b, sp.block_idx, sp.idx_t, sp.perm_t).mix_2d(x2) ** 2))(sp.blocks)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-3, atol=1e-3)
    # sentinel slots contribute exactly zero gradient
    sent = np.asarray(sp.block_idx) == sp.blocks.shape[0]
    assert np.all(np.asarray(g2)[sent] == 0.0)


# ---------------------------------------------------------------------------
# Flat (live-block CSR) form
# ---------------------------------------------------------------------------


def test_flat_forward_matches_xla(rng, support):
    x2 = jnp.asarray(
        rng.normal(size=(support.n_nodes, 96)).astype(np.float32))
    ref = support.mix_2d(x2)
    out = B.as_flat_pallas(support).mix_2d(x2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_flat_gradients_match_xla(rng, support):
    """dx through the flat form == the padded XLA form; dblocks maps back
    to the same per-block values through the flat storage order."""
    x2 = jnp.asarray(
        rng.normal(size=(support.n_nodes, 96)).astype(np.float32))
    flat = B.as_flat_pallas(support)

    gr = jax.grad(lambda a: jnp.sum(jnp.sin(support.mix_2d(a))))(x2)
    gf = jax.grad(lambda a: jnp.sum(jnp.sin(flat.mix_2d(a))))(x2)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)

    def loss_flat(bf):
        s = B.FlatBlockSparseSupport(bf, flat.row_tbl, flat.src_tbl,
                                     flat.slot_tbl, flat.row_t, flat.src_t,
                                     flat.slot_t, flat.inv_slot)
        return jnp.sum(jnp.sin(s.mix_2d(x2)))

    def loss_padded(blocks):
        s = B.BlockSparseSupport(blocks, support.block_idx, support.idx_t,
                                 support.perm_t)
        return jnp.sum(jnp.sin(s.mix_2d(x2)))

    gbf = jax.grad(loss_flat)(flat.blocks_flat)
    gbp = jax.grad(loss_padded)(support.blocks)
    # map the padded gradient into flat storage order (live, row-major)
    bidx = np.asarray(support.block_idx)
    rr, mm = np.nonzero(bidx < bidx.shape[0])
    np.testing.assert_allclose(np.asarray(gbf)[:len(rr)],
                               np.asarray(gbp)[rr, mm],
                               rtol=1e-5, atol=1e-5)
    # the shared trailing zero block gets exactly zero gradient
    assert np.all(np.asarray(gbf)[-1] == 0.0)


def test_flat_skewed_rows_and_empty_rows(rng):
    """Rows with different live-block counts (the flat form's reason to
    exist) plus an entirely empty block-row and an x block-row nothing
    reads from: forward and both gradients must match the dense support."""
    n = 4 * 128
    a = np.zeros((n, n), np.float32)
    a[:128, :128] = rng.random((128, 128))        # col-block 0: 1 source
    a[:384, 128:256] = rng.random((384, 128))     # col-block 1: 3 sources
    # col-block 2: empty (no in-edges); source row 3 unused (no out-edges)
    a[:128, 384:] = rng.random((128, 128))        # col-block 3: 1 source
    sp = B.from_dense(a, block_size=128)
    flat = B.as_flat_pallas(sp)
    x2 = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    ref = sp.mix_2d(x2)
    out = flat.mix_2d(x2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(out)[256:384] == 0.0)  # empty dest row
    gr = jax.grad(lambda v: jnp.sum(sp.mix_2d(v) ** 2))(x2)
    gf = jax.grad(lambda v: jnp.sum(flat.mix_2d(v) ** 2))(x2)
    # gradient magnitudes reach ~5e3 here; fp32 accumulation-order noise
    # needs a matching absolute term (a real indexing bug is O(1e3) off)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=0.5)
    assert np.all(np.asarray(gf)[384:] == 0.0)      # unused source row


def test_flat_pytree_roundtrip(support):
    f = B.as_flat_pallas(support)
    leaves, treedef = jax.tree_util.tree_flatten(f)
    f2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(f2, B.FlatBlockSparseSupport)
    assert f2.n_nodes == support.n_nodes


def test_rect_flat_matches_dense(rng):
    """Rectangular (128-src x 256-dest) flat blocks from an edge list:
    forward and both gradients match the square padded support built from
    the same edges."""
    n = 512
    n_edges = 2000
    src = rng.integers(0, n, n_edges)
    dst = rng.integers(0, n, n_edges)
    w = rng.normal(size=n_edges).astype(np.float32)
    sq = B.from_edges_blocked(src, dst, w, n, block_size=128)
    rect = B.from_edges_flat(src, dst, w, n, bs_src=128, bs_dst=256)
    assert rect.blocks_flat.shape[1:] == (128, 256)
    x2 = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(rect.mix_2d(x2)),
                               np.asarray(sq.mix_2d(x2)),
                               rtol=1e-4, atol=1e-4)
    gr = jax.grad(lambda v: jnp.sum(jnp.sin(sq.mix_2d(v))))(x2)
    gf = jax.grad(lambda v: jnp.sum(jnp.sin(rect.mix_2d(v))))(x2)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)
    # weight grads: rect dblocks reassemble the same dense cotangent
    def dense_cotangent(sp_blocks, to_dense):
        return jax.grad(lambda b: jnp.sum(
            jnp.sin(to_dense(b).mix_2d(x2))))(sp_blocks)
    grect = dense_cotangent(
        rect.blocks_flat,
        lambda b: B.FlatBlockSparseSupport(
            b, rect.row_tbl, rect.src_tbl, rect.slot_tbl, rect.row_t,
            rect.src_t, rect.slot_t, rect.inv_slot))
    gsq = dense_cotangent(
        sq.blocks,
        lambda b: B.BlockSparseSupport(b, sq.block_idx, sq.idx_t,
                                       sq.perm_t))
    # compare as dense (N, N) gradients; live-support masks differ between
    # the two layouts (a rect block covers 2 square blocks), so only the
    # union of live edges is comparable — build dense grids
    def to_dense_grad_sq(g):
        out = np.zeros((n, n), np.float32)
        bidx = np.asarray(sq.block_idx)
        for r in range(bidx.shape[0]):
            for m in range(bidx.shape[1]):
                s = bidx[r, m]
                if s < bidx.shape[0]:
                    out[s * 128:(s + 1) * 128, r * 128:(r + 1) * 128] += \
                        np.asarray(g)[r, m]
        return out

    def to_dense_grad_rect(g):
        out = np.zeros((n, n), np.float32)
        row = np.asarray(rect.row_tbl)
        srcb = np.asarray(rect.src_tbl)
        slot = np.asarray(rect.slot_tbl)
        g = np.asarray(g)
        for i in range(len(row)):
            if slot[i] == g.shape[0] - 1:
                continue
            out[srcb[i] * 128:(srcb[i] + 1) * 128,
                row[i] * 256:(row[i] + 1) * 256] += g[slot[i]]
        return out

    dsq = to_dense_grad_sq(gsq)
    drect = to_dense_grad_rect(grect)
    # only live positions carry gradient; rect covers a superset of the
    # square support's live mask — compare where the SQUARE mask is live
    live_sq = to_dense_grad_sq(np.ones_like(np.asarray(gsq))) != 0
    np.testing.assert_allclose(drect[live_sq], dsq[live_sq],
                               rtol=1e-4, atol=1e-4)


def test_from_edges_flat_square_matches_padded_route(rng):
    """Direct square from_edges_flat == as_flat_pallas(from_edges_blocked)
    on the same edges (the spatial builder's fast path)."""
    n = 512
    src = rng.integers(0, n, 1500)
    dst = rng.integers(0, n, 1500)
    w = rng.normal(size=1500).astype(np.float32)
    via_padded = B.as_flat_pallas(
        B.from_edges_blocked(src, dst, w, n, block_size=128))
    direct = B.from_edges_flat(src, dst, w, n, 128, 128)
    x2 = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(direct.mix_2d(x2)),
                               np.asarray(via_padded.mix_2d(x2)),
                               rtol=1e-5, atol=1e-5)
    gr = jax.grad(lambda v: jnp.sum(via_padded.mix_2d(v) ** 2))(x2)
    gd = jax.grad(lambda v: jnp.sum(direct.mix_2d(v) ** 2))(x2)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Fused order-2 hop chain (VERDICT r2 #7)
# ---------------------------------------------------------------------------


def _banded_flat_support(rng, nb=8, bs=16):
    n = nb * bs
    a = np.zeros((n, n), np.float32)
    for i in range(nb):
        for j in (i - 1, i, i + 1):
            if 0 <= j < nb:
                a[j * bs:(j + 1) * bs, i * bs:(i + 1) * bs] = \
                    rng.random((bs, bs)) / (3 * bs)
    return B.as_flat_pallas(B.from_dense(a, block_size=bs))


def test_fused2_matches_chained_hops(rng):
    flat = _banded_flat_support(rng)
    fused = B.as_fused2(flat)
    assert isinstance(fused, B.Fused2FlatSupport)
    n = flat.n_nodes
    x = jnp.asarray(rng.normal(size=(n, 40)), jnp.float32)
    x1 = flat.mix_2d(x)
    x2 = flat.mix_2d(x1)
    o1, o2 = fused.mix2_2d(x)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(x1))
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(x2))


def test_fused2_grads_match_chain(rng):
    import dataclasses

    flat = _banded_flat_support(rng)
    fused = B.as_fused2(flat)
    n = flat.n_nodes
    x = jnp.asarray(rng.normal(size=(n, 24)), jnp.float32)

    def loss_chain(x, blocks):
        sp = dataclasses.replace(flat, blocks_flat=blocks)
        a1 = sp.mix_2d(x)
        a2 = sp.mix_2d(a1)
        return jnp.sum(jnp.sin(a1) + jnp.cos(a2))

    def loss_fused(x, blocks):
        sp = dataclasses.replace(fused, blocks_flat=blocks)
        a1, a2 = sp.mix2_2d(x)
        return jnp.sum(jnp.sin(a1) + jnp.cos(a2))

    gc = jax.grad(loss_chain, argnums=(0, 1))(x, flat.blocks_flat)
    gf = jax.grad(loss_fused, argnums=(0, 1))(x, fused.blocks_flat)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_fused2_refuses_wide_band(rng):
    """Unordered layouts (a far off-band block) must fall back."""
    nb, bs = 8, 16
    n = nb * bs
    a = np.zeros((n, n), np.float32)
    for i in range(nb):
        a[i * bs:(i + 1) * bs, i * bs:(i + 1) * bs] = rng.random((bs, bs))
    a[:bs, -bs:] = 1.0     # block (src 0 -> dest nb-1): span nb
    sp = B.as_flat_pallas(B.from_dense(a, block_size=bs))
    out = B.as_fused2(sp, max_ring=4)
    assert not isinstance(out, B.Fused2FlatSupport)
    # and rectangular blocks are refused too
    rect = B.from_edges_flat(np.array([0]), np.array([1]),
                             np.ones(1, np.float32), 128, 16, 64)
    assert not isinstance(B.as_fused2(rect), B.Fused2FlatSupport)


def test_fused2_through_gcn_apply(rng):
    """gcn_apply takes the fused path for order-2 and matches the
    unfused sparse supports."""
    from graph_wavenet_tpu.ops.diffusion import gcn_apply, gcn_init

    flat = _banded_flat_support(rng)
    fused = B.as_fused2(flat)
    n = flat.n_nodes
    params = gcn_init(jax.random.key(0), 4, 6, n_supports=2, order=2)
    x = jnp.asarray(rng.normal(size=(2, 3, n, 4)), jnp.float32)
    want = gcn_apply(params, x, [flat, flat], order=2)
    got = gcn_apply(params, x, [fused, fused], order=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused2_bf16(rng):
    """bf16 activations: the fused inter-hop cast equals the chain's."""
    flat = _banded_flat_support(rng)
    fused = B.as_fused2(flat)
    n = flat.n_nodes
    x = jnp.asarray(rng.normal(size=(n, 32)), jnp.bfloat16)
    x1 = flat.mix_2d(x)
    x2 = flat.mix_2d(x1)
    o1, o2 = fused.mix2_2d(x)
    np.testing.assert_array_equal(np.asarray(o1, np.float32),
                                  np.asarray(x1, np.float32))
    np.testing.assert_array_equal(np.asarray(o2, np.float32),
                                  np.asarray(x2, np.float32))


def test_fused2_chain_dispatch_branch(rng, monkeypatch):
    """The small-size chain-fallback BRANCH of the fused2 dispatch
    (r4 advisor: previously only reachable on real TPUs below the size
    threshold, so no test covered the seam). ``GWT_FUSED2_DISPATCH=
    chain`` forces it even in interpret mode; outputs and grads must be
    bit-identical to the fused branch."""
    import jax

    flat = _banded_flat_support(rng)
    fused = B.as_fused2(flat)
    n = flat.n_nodes
    x = jnp.asarray(rng.normal(size=(n, 24)), jnp.float32)

    def loss(v):
        a1, a2 = fused.mix2_2d(v)
        return jnp.sum(jnp.sin(a1) + jnp.cos(a2))

    o_fused = fused.mix2_2d(x)
    g_fused = jax.grad(loss)(x)

    monkeypatch.setenv("GWT_FUSED2_DISPATCH", "chain")
    jax.clear_caches()   # dispatch is read at trace time
    o_chain = fused.mix2_2d(x)
    g_chain = jax.grad(loss)(x)

    for a, b in zip(o_chain, o_fused):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(g_chain), np.asarray(g_fused),
                               rtol=1e-6, atol=1e-6)


def test_astype_bf16_storage_bitwise_identical(rng):
    """bf16-STORED blocks == fp32-stored under bf16 activations: the mix
    op casts blocks to the activation dtype per use, so moving the cast
    to storage is numerically free (round-5 327k full-model enabler)."""
    sp32 = B.as_flat_pallas(B.random_block_support(4, 2, 128, rng=rng))
    sp16 = sp32.astype(jnp.bfloat16)
    assert sp16.blocks_flat.dtype == jnp.bfloat16
    assert sp16.row_tbl is sp32.row_tbl          # tables untouched
    x2 = jnp.asarray(rng.normal(size=(sp32.n_nodes, 96)),
                     jnp.float32).astype(jnp.bfloat16)
    a = np.asarray(sp32.mix_2d(x2).astype(jnp.float32))
    b = np.asarray(sp16.mix_2d(x2).astype(jnp.float32))
    np.testing.assert_array_equal(a, b)


def test_astype_preserves_fused2_and_padded_form(rng):
    sp = B.as_flat_pallas(B.random_block_support(4, 1, 128, rng=rng))
    f2 = B.as_fused2(sp)
    if isinstance(f2, B.Fused2FlatSupport):
        cast = f2.astype(jnp.bfloat16)
        assert isinstance(cast, B.Fused2FlatSupport)
        assert (cast.delay, cast.ring_w) == (f2.delay, f2.ring_w)
    padded = B.random_block_support(4, 2, 128, rng=rng)
    c = padded.astype(jnp.bfloat16)
    assert c.blocks.dtype == jnp.bfloat16
    x2 = jnp.asarray(rng.normal(size=(padded.n_nodes, 64)),
                     jnp.float32).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(padded.mix_2d(x2).astype(jnp.float32)),
        np.asarray(c.mix_2d(x2).astype(jnp.float32)))
