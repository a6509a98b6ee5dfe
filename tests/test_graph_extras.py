"""Tests for node orderings, spectral source nodes, spline basis, and the
coarsening suite."""

import numpy as np
import pytest

from graph_wavenet_tpu.graphs import coarsening, ordering
from graph_wavenet_tpu.graphs.generate import create_sbm


@pytest.fixture
def sbm(rng):
    W, assign = create_sbm(30, 3, 0.9, 0.05, rng=rng)
    return W, assign


def test_spectral_clustering_recovers_sbm_communities(sbm, rng):
    W, assign = sbm
    labels = ordering.spectral_clustering(W, 3, rng)
    # clustering should be consistent with the planted partition up to
    # relabeling: nodes in the same community get the same label
    for c, idx in assign.items():
        assert len(np.unique(labels[idx])) == 1
    assert len(np.unique(labels)) == 3


def test_compute_source_nodes(sbm, rng):
    W, assign = sbm
    sources = ordering.compute_source_nodes(W, 3, rng)
    assert len(sources) == 3
    degree = W.sum(1)
    for s in sources:
        # source is max-degree within its community
        for c, idx in assign.items():
            if s in idx:
                assert degree[s] == degree[idx].max()
                break
        else:
            pytest.fail("source not in any community")


def test_perm_identity(sbm):
    W, _ = sbm
    S, order = ordering.perm_identity(W)
    np.testing.assert_array_equal(S, W)
    assert order == list(range(30))


def test_perm_degree(sbm):
    W, _ = sbm
    S, order = ordering.perm_degree(W)
    d = W.sum(1)
    assert list(d[order]) == sorted(d, reverse=True)
    np.testing.assert_array_equal(S, W[np.ix_(order, order)])


def test_perm_spectral_proxies_and_eds(sbm):
    W, _ = sbm
    for fn in (ordering.perm_spectral_proxies, ordering.perm_eds):
        S, order = fn(W)
        assert sorted(order) == list(range(30))
        np.testing.assert_array_equal(S, W[np.ix_(order, order)])


def test_spline_basis_partition_of_unity():
    x = np.linspace(0, 1, 50)
    B = coarsening.spline_basis(5, x, degree=3)
    assert B.shape == (50, 5)
    np.testing.assert_allclose(B.sum(1), 1.0, atol=1e-9)
    assert (B >= -1e-12).all()
    # unsorted evaluation points: the end-knot patch must hit the x==max
    # ROWS, not blindly the last row (the reference assumes sorted input)
    xs = np.array([0.5, 1.0, 0.0])
    Bu = coarsening.spline_basis(5, xs, degree=3)
    np.testing.assert_allclose(Bu.sum(1), 1.0, atol=1e-9)
    np.testing.assert_allclose(Bu[1], [0, 0, 0, 0, 1.0], atol=1e-12)


def test_compute_source_nodes_always_returns_C(rng):
    """Empty spectral clusters are backfilled so exactly C distinct sources
    come back (the reference contract — downstream C-class label spaces)."""
    W = np.ones((4, 4)) - np.eye(4)     # K4: clustering degeneracy likely
    sources = ordering.compute_source_nodes(W, 4, rng)
    assert len(sources) == 4 and len(set(sources)) == 4


def test_coarsen_halves_nodes(sbm, rng):
    W, _ = sbm
    graphs, parents = coarsening.coarsen(W, levels=2, rng=rng)
    assert len(graphs) == 3 and len(parents) == 2
    assert graphs[1].shape[0] <= 30 and graphs[1].shape[0] >= 15
    assert graphs[2].shape[0] <= graphs[1].shape[0]
    # edge weight is conserved by cluster-summing (minus internal edges
    # moved to the removed diagonal)
    assert graphs[1].sum() <= W.sum() + 1e-9
    # parents map every node
    assert len(parents[0]) == 30
    assert max(parents[0]) + 1 == graphs[1].shape[0]


def test_compute_perm_binary_tree(sbm, rng):
    W, _ = sbm
    graphs, parents = coarsening.coarsen(W, levels=2, rng=rng)
    perms = coarsening.compute_perm(parents)
    assert len(perms) == 3
    # finest level has 2^levels * coarsest count slots
    assert len(perms[0]) == 4 * len(perms[-1])
    assert len(perms[1]) == 2 * len(perms[-1])
    # a permutation with fake nodes: all real nodes present once
    reals = [i for i in perms[0] if i < 30]
    assert sorted(reals) == list(range(30))


def test_perm_adjacency_and_data(sbm, rng):
    W, _ = sbm
    graphs, parents = coarsening.coarsen(W, levels=1, rng=rng)
    perms = coarsening.compute_perm(parents)
    Ap = coarsening.perm_adjacency(W, perms[0])
    M = len(perms[0])
    assert Ap.shape == (M, M)
    # fake nodes are disconnected
    fake_positions = [k for k, i in enumerate(perms[0]) if i >= 30]
    for f in fake_positions:
        assert Ap[f].sum() == 0
    x = rng.normal(size=(4, 30))
    xp = coarsening.perm_coarsening(x, perms[0])
    assert xp.shape == (4, M)
    for f in fake_positions:
        np.testing.assert_array_equal(xp[:, f], 0)
    # real data preserved
    k0 = perms[0].index(0)
    np.testing.assert_array_equal(xp[:, k0], x[:, 0])


def knn_spatial_edges(n, k, rng):
    """k-NN graph on random 2D points — the locality structure of a road
    network (used by the RCM block-locality tests and city demo)."""
    pos = rng.random((n, 2))
    d = ((pos[:, None] - pos[None, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    nbr = np.argsort(d, axis=1)[:, :k]
    src = np.repeat(np.arange(n), k)
    dst = nbr.reshape(-1)
    return src, dst


def test_rcm_order_is_valid_permutation(rng):
    src, dst = knn_spatial_edges(200, 4, rng)
    perm = ordering.rcm_order_edges(src, dst, 200)
    assert sorted(perm.tolist()) == list(range(200))


def test_rcm_reduces_block_count_on_spatial_graph(rng):
    """The point of the ordering: a spatial graph under RCM needs far
    fewer distinct source blocks per destination block-row (HBM traffic of
    the block-sparse hop is linear in that count, BENCH_NOTES.md)."""
    n = 1024
    src, dst = knn_spatial_edges(n, 6, rng)
    ident = ordering.block_locality_stats(src, dst, n, block_size=64)
    perm = ordering.rcm_order_edges(src, dst, n)
    rcm = ordering.block_locality_stats(src, dst, n, perm, block_size=64)
    assert rcm["n_blocks"] < ident["n_blocks"] * 0.55, (ident, rcm)
    assert rcm["blocks_per_row_max"] <= ident["blocks_per_row_max"]


def test_rcm_perm_composes_with_from_edges_blocked(rng):
    from graph_wavenet_tpu.ops import block_sparse

    n = 60
    src, dst = knn_spatial_edges(n, 3, rng)
    w = rng.random(len(src)).astype(np.float32)
    perm = ordering.rcm_order_edges(src, dst, n)
    sp = block_sparse.from_edges_blocked(src, dst, w, n, block_size=4,
                                         perm=perm)
    dense = np.zeros((sp.n_nodes, sp.n_nodes), np.float32)
    for s_, d_, w_ in zip(perm[src], perm[dst], w):
        dense[s_, d_] += w_
    np.testing.assert_allclose(sp.to_dense(), dense, atol=1e-6)


def test_rcm_handles_disconnected_graph():
    # two components + an isolated node
    src = np.array([0, 1, 4, 5])
    dst = np.array([1, 2, 5, 6])
    perm = ordering.rcm_order_edges(src, dst, 8)
    assert sorted(perm.tolist()) == list(range(8))


# ---------------------------------------------------------------------------
# Hilbert ordering + spatial graph builders (round 2)
# ---------------------------------------------------------------------------


def test_hilbert_order_is_valid_permutation(rng):
    pos = rng.random((300, 2))
    perm = ordering.hilbert_order_points(pos)
    assert sorted(perm.tolist()) == list(range(300))


def test_hilbert_reduces_block_count_on_spatial_graph(rng):
    n = 1024
    pos = rng.random((n, 2))
    from graph_wavenet_tpu.graphs import spatial

    src, dst, _w = spatial.knn_graph_edges(pos, 6)
    ident = ordering.block_locality_stats(src, dst, n, block_size=64)
    perm = ordering.hilbert_order_points(pos)
    hil = ordering.block_locality_stats(src, dst, n, perm, block_size=64)
    assert hil["n_blocks"] < ident["n_blocks"] * 0.55, (ident, hil)


def test_hilbert_locality_nearby_points_nearby_ids(rng):
    # points inside one tiny cell land in a contiguous id range
    pos = rng.random((256, 2))
    pos[:8] = 0.5 + pos[:8] * 1e-4           # cluster
    perm = ordering.hilbert_order_points(pos)
    ids = np.sort(perm[:8])
    assert ids[-1] - ids[0] == 7, ids        # consecutive
    assert sorted(perm.tolist()) == list(range(256))


def test_best_block_ordering_picks_fewest_blocks(rng):
    n = 512
    pos = rng.random((n, 2))
    from graph_wavenet_tpu.graphs import spatial

    src, dst, _w = spatial.knn_graph_edges(pos, 5)
    perm, name, stats = ordering.best_block_ordering(src, dst, n, pos=pos,
                                                     block_size=64)
    assert name in ("rcm", "hilbert")
    for cand in (ordering.rcm_order_edges(src, dst, n),
                 ordering.hilbert_order_points(pos)):
        other = ordering.block_locality_stats(src, dst, n, cand,
                                              block_size=64)
        assert stats["n_blocks"] <= other["n_blocks"]


def test_spatial_transition_weights_row_normalized(rng):
    from graph_wavenet_tpu.graphs import spatial

    n = 40
    src, dst, w = spatial.random_spatial_graph(n, 4, rng)
    wt = spatial.transition_edge_weights(src, dst, w, n)
    sums = np.bincount(src, weights=wt, minlength=n)
    has_out = np.bincount(src, minlength=n) > 0
    np.testing.assert_allclose(sums[has_out], 1.0, atol=1e-6)
    assert np.all(sums[~has_out] == 0.0)


def test_spatial_doubletransition_matches_mod_adj(rng):
    """The edge-list doubletransition pair == dense mod_adj('doubletransition')
    on the same adjacency (reference util.py:178-194)."""
    from graph_wavenet_tpu.graphs import spatial
    from graph_wavenet_tpu.graphs.normalize import mod_adj

    n = 64
    src, dst, w = spatial.random_spatial_graph(n, 4, rng)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (src, dst), w)
    ref = mod_adj(dense, "doubletransition")
    sup = spatial.doubletransition_block_supports(src, dst, w, n,
                                                  form="block")
    for got, want in zip(sup, ref):
        dense = got.to_dense()          # zero-padded up to the block size
        np.testing.assert_allclose(dense[:n, :n], np.asarray(want),
                                   atol=1e-5)
        assert np.all(dense[n:] == 0) and np.all(dense[:, n:] == 0)
