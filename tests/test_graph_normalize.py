"""Adjacency normalizer parity vs an independent scipy.sparse implementation
of the reference math (`/root/reference/Utils/util.py:121-199`)."""

import numpy as np
import pytest
import scipy.sparse as sp

from graph_wavenet_tpu.graphs import normalize as N


def ref_sym_adj(adj):
    adj = sp.coo_matrix(adj)
    rowsum = np.array(adj.sum(1))
    d_inv_sqrt = np.power(rowsum, -0.5).flatten()
    d_inv_sqrt[np.isinf(d_inv_sqrt)] = 0.0
    d = sp.diags(d_inv_sqrt)
    return np.asarray(
        adj.dot(d).transpose().dot(d).astype(np.float32).todense())


def ref_asym_adj(adj):
    adj = sp.coo_matrix(adj)
    rowsum = np.array(adj.sum(1)).flatten()
    d_inv = np.power(rowsum, -1).flatten()
    d_inv[np.isinf(d_inv)] = 0.0
    return np.asarray(sp.diags(d_inv).dot(adj).astype(np.float32).todense())


@pytest.fixture
def adj(rng):
    a = (rng.random((30, 30)) < 0.2).astype(np.float64)
    np.fill_diagonal(a, 0)
    a[5] = 0  # an isolated row exercises the inf->0 path
    return a


def test_asym_adj(adj):
    np.testing.assert_allclose(N.asym_adj(adj), ref_asym_adj(adj), atol=1e-6)


def test_sym_adj_directed(adj):
    np.testing.assert_allclose(N.sym_adj(adj), ref_sym_adj(adj), atol=1e-6)


def test_sym_adj_undirected(adj):
    und = np.maximum(adj, adj.T)
    np.testing.assert_allclose(N.sym_adj(und), ref_sym_adj(und), atol=1e-6)
    # undirected => symmetric output
    np.testing.assert_allclose(N.sym_adj(und), N.sym_adj(und).T, atol=1e-6)


def test_normalized_laplacian(adj):
    want = np.eye(30) - ref_sym_adj(adj)
    np.testing.assert_allclose(N.normalized_laplacian(adj), want, atol=1e-6)


def test_scaled_laplacian(adj):
    got = N.scaled_laplacian(adj)
    und = np.maximum(adj, adj.T)
    want = 2.0 / 2.0 * (np.eye(30) - ref_sym_adj(und)) - np.eye(30)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # spectrum of the scaled laplacian lies in [-1, 1] for lambda_max exact
    e = np.linalg.eigvalsh((got + got.T) / 2)
    assert e.max() < 1.5 and e.min() > -1.5


def test_mod_adj_dispatch(adj):
    assert len(N.mod_adj(adj, "doubletransition")) == 2
    a1, a2 = N.mod_adj(adj, "doubletransition")
    np.testing.assert_allclose(a1, ref_asym_adj(adj), atol=1e-6)
    np.testing.assert_allclose(a2, ref_asym_adj(adj.T), atol=1e-6)
    np.testing.assert_allclose(N.mod_adj(adj, "identity")[0], np.eye(30))
    assert len(N.mod_adj(adj, "transition")) == 1
    assert len(N.mod_adj(adj, "symnadj")) == 1
    assert len(N.mod_adj(adj, "scalap")) == 1
    assert len(N.mod_adj(adj, "normlap")) == 1
    with pytest.raises(ValueError):
        N.mod_adj(adj, "bogus")


def test_row_stochastic(adj):
    t = N.asym_adj(np.maximum(adj, adj.T) + np.eye(30))
    np.testing.assert_allclose(t.sum(axis=1), 1.0, atol=1e-6)


def test_load_adj_roundtrip(tmp_path, adj):
    import pickle
    p = tmp_path / "adj_mx.pkl"
    with open(p, "wb") as f:
        pickle.dump((["s1"], {"s1": 0}, adj), f)
    ids, mapping, supports = N.load_adj(str(p), "doubletransition")
    assert ids == ["s1"] and mapping == {"s1": 0}
    assert len(supports) == 2
