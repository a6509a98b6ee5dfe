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
