"""Graph synthesis / spectral tool tests (vs `/root/reference/Utils/
graphTools.py` semantics, checked property-wise)."""

import numpy as np
import pytest

from graph_wavenet_tpu.graphs import generate as G


def test_balanced_communities():
    blocks = G.balanced_communities(80, 5)
    assert [len(b) for b in blocks] == [16] * 5
    blocks = G.balanced_communities(82, 5)
    assert [len(b) for b in blocks] == [17, 17, 16, 16, 16]
    assert np.concatenate(blocks).tolist() == list(range(82))


def test_sbm_properties(rng):
    W, assign = G.create_sbm(40, 5, 0.8, 0.2, rng=rng)
    assert W.shape == (40, 40)
    np.testing.assert_allclose(W, W.T)            # undirected
    assert np.all(np.diag(W) == 0)                 # no self loops
    assert set(np.unique(W)) <= {0.0, 1.0}
    assert G.is_connected(W)
    assert len(assign) == 5
    # intra-community density should exceed inter-community density
    labels = np.zeros(40, int)
    for c, idx in assign.items():
        labels[idx] = c
    same = labels[:, None] == labels[None, :]
    intra = W[same & ~np.eye(40, dtype=bool)].mean()
    inter = W[~same].mean()
    assert intra > inter


def test_sbm_seeded_determinism():
    W1, _ = G.create_sbm(30, 3, 0.7, 0.1, rng=np.random.default_rng(7))
    W2, _ = G.create_sbm(30, 3, 0.7, 0.1, rng=np.random.default_rng(7))
    np.testing.assert_array_equal(W1, W2)


def test_is_connected():
    W = np.zeros((4, 4))
    W[0, 1] = W[1, 0] = 1
    W[2, 3] = W[3, 2] = 1
    assert not G.is_connected(W)
    W[1, 2] = W[2, 1] = 1
    assert G.is_connected(W)


def test_gft_orderings(rng):
    W, _ = G.create_sbm(20, 4, 0.9, 0.1, rng=rng)
    E, V = G.compute_gft(W, order="totalVariation")
    e = np.diag(E)
    # first eigenvalue is the largest (distance-to-max ordering)
    assert np.isclose(e[0], e.max())
    # reconstruction: V E V^T = W for symmetric W
    np.testing.assert_allclose(V @ E @ V.T, W, atol=1e-8)
    E2, _ = G.compute_gft(W, order="increasing")
    assert np.abs(np.diag(E2))[0] == pytest.approx(np.abs(e).min())


def test_graph_container(rng):
    g = G.Graph("SBM", 40, {"nCommunities": 5, "probIntra": 0.8,
                            "probInter": 0.2}, rng=rng)
    assert g.N == 40
    assert g.undirected and not g.selfLoops
    assert g.L is not None
    np.testing.assert_allclose(g.L, np.diag(g.W.sum(1)) - g.W)
    assert g.M == int(np.triu(g.W).sum())
    assert g.E is None
    g.computeGFT()
    assert g.E is not None and g.V is not None
    labels = g.community_labels
    for c, idx in g.assign_dict.items():
        assert np.all(labels[idx] == c)
    assert g.lambda_max() > 0


def test_graph_adjacency_passthrough():
    W = np.array([[0, 1.0], [1.0, 0]])
    g = G.Graph("adjacency", 2, {"adjacencyMatrix": W})
    np.testing.assert_array_equal(g.W, W)


def test_small_world(rng):
    W = G.create_small_world(24, 0.25, 0.1, rng=rng)
    np.testing.assert_allclose(W, W.T)
    assert G.is_connected(W)


def test_matrix_powers():
    S = np.array([[0, 1.0], [1.0, 0]])
    P = G.matrix_powers(S, 3)
    np.testing.assert_array_equal(P[0], np.eye(2))
    np.testing.assert_array_equal(P[1], S)
    np.testing.assert_array_equal(P[2], np.eye(2))


def test_k_hop_neighborhood():
    # path graph 0-1-2-3
    S = np.zeros((4, 4))
    for i in range(3):
        S[i, i + 1] = S[i + 1, i] = 1
    nb = G.k_hop_neighborhood(S, 2)
    assert nb[0] == [0, 1, 2]
    assert nb[1] == [0, 1, 2, 3]


def test_edge_fail_sampling(rng):
    W, _ = G.create_sbm(30, 3, 0.9, 0.2, rng=rng)
    W2 = G.edge_fail_sampling(W, 0.5, rng=rng)
    np.testing.assert_allclose(W2, W2.T)
    assert W2.sum() < W.sum()
    assert np.all((W2 == 0) | (W == 1))
    np.testing.assert_array_equal(G.edge_fail_sampling(W, 0.0, rng=rng), W)


def test_sparsify(rng):
    W = rng.random((10, 10))
    W = 0.5 * (W + W.T)
    np.fill_diagonal(W, 0)
    thr = G.sparsify_graph(W, "threshold", 0.5)
    # effective threshold may be LOWER than requested (connectivity repair
    # halves it); every kept entry clears it, every entry comes from W
    eff = np.min(np.abs(thr)[thr != 0])
    assert np.all((np.abs(thr) >= eff) | (thr == 0))
    assert np.all((thr == 0) | (thr == W))
    assert G.is_connected(thr)
    knn = G.sparsify_graph(W, "NN", 3)
    np.testing.assert_allclose(knn, knn.T)
    assert G.is_connected(knn)


def test_sparsify_connectivity_repair():
    """A connected graph must stay connected: the weak bridge edge is
    restored by halving the threshold / raising k
    (`graphTools.py:469-515`)."""
    rng = np.random.default_rng(3)
    W = rng.random((8, 8)) * 0.4 + 0.6
    W = 0.5 * (W + W.T)
    np.fill_diagonal(W, 0)
    W[0, :] = W[:, 0] = 0.0
    W[0, 1] = W[1, 0] = 0.05          # sole bridge to node 0
    assert G.is_connected(W)
    thr = G.sparsify_graph(W, "threshold", 0.5)
    assert G.is_connected(thr)
    assert thr[0, 1] == W[0, 1]       # the bridge survived the repair
    knn = G.sparsify_graph(W, "NN", 2)
    assert G.is_connected(knn)
    # disconnected input: repair must NOT resurrect edges
    W2 = W.copy()
    W2[0, 1] = W2[1, 0] = 0.0
    thr2 = G.sparsify_graph(W2, "threshold", 0.5)
    assert not G.is_connected(thr2)
    assert np.all(np.abs(thr2)[thr2 != 0] >= 0.5)


def test_fuse_edges():
    A = np.stack([np.array([[0, 1.0], [0, 0]]),
                  np.array([[0, 1.0], [2.0, 0]])])
    fused = G.fuse_edges(A, "sum", "no", force_undirected=False)
    np.testing.assert_array_equal(fused, [[0, 2.0], [2.0, 0]])
    rows = G.fuse_edges(A, "avg", "rows")
    np.testing.assert_allclose(rows.sum(1), [1.0, 1.0])


def test_fuse_edges_full_option_surface():
    """isolatedNodes removal, forceConnected largest-component extraction,
    nodeList / extraComponents outputs (`graphTools.py:748-819`)."""
    A = np.zeros((1, 7, 7))
    # main component 0-1-2, secondary 3-4, node 5 weaker pair with 6?
    A[0, 0, 1] = A[0, 1, 0] = 1.0
    A[0, 1, 2] = A[0, 2, 1] = 1.0
    A[0, 3, 4] = A[0, 4, 3] = 1.0
    # nodes 5, 6 isolated
    node_list: list = []
    extra: list = []
    W = G.fuse_edges(A[..., :, :], "sum", "no", isolated_nodes=False,
                     force_undirected=True, force_connected=True,
                     node_list=node_list, extra_components=extra)
    assert W.shape == (3, 3)
    assert node_list == [0, 1, 2]
    assert len(extra) == 2
    assert len(extra[0]) == 1 and extra[0][0].shape == (2, 2)
    np.testing.assert_array_equal(extra[1][0], [3, 4])
    assert G.is_connected(W)

    # isolated nodes allowed: nothing dropped, node_list is all nodes
    node_list2: list = []
    W2 = G.fuse_edges(A, "sum", "no", node_list=node_list2)
    assert W2.shape == (7, 7)
    assert node_list2 == list(range(7))


def test_fuse_edges_normalization_zero_rows(rng):
    """np.divide(where=) without out= left isolated rows as uninitialized
    memory — zero-sum rows/cols must come out exactly zero."""
    a = np.zeros((2, 5, 5))
    a[0, 0, 1] = a[1, 0, 1] = 1.0
    a[0, 2, 3] = 2.0            # node 4 fully isolated
    for norm, axis in (("rows", 1), ("cols", 0)):
        w = G.fuse_edges(a, aggregation="sum", normalization=norm)
        s = w.sum(axis=axis)
        np.testing.assert_array_equal(w[4], 0.0)
        np.testing.assert_array_equal(w[:, 4], 0.0)
        nz = s != 0
        np.testing.assert_allclose(s[nz], 1.0)


def test_edge_fail_sampling_keeps_self_loops_at_p0(rng):
    w = np.ones((6, 6))          # undirected, self-loops on the diagonal
    out = G.edge_fail_sampling(w, 0.0, rng=rng)
    np.testing.assert_array_equal(out, w)   # p=0 is the identity
    out = G.edge_fail_sampling(w, 1.0, rng=rng)
    np.testing.assert_array_equal(out, 0.0)
    # self-loops survive with their own Bernoulli draw, never doubled
    mid = G.edge_fail_sampling(w, 0.5, rng=np.random.default_rng(3))
    assert np.all(np.diag(mid) <= 1.0)
    assert np.allclose(mid, mid.T)
