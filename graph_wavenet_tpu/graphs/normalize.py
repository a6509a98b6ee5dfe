"""Adjacency / graph-shift-operator normalizers and the ``adjtype`` dispatch.

Semantics match `/root/reference/Utils/util.py:121-199` (sym_adj, asym_adj,
normalized/scaled Laplacians, mod_adj, load_adj) but are written dense-numpy
first: the graphs this framework targets (hundreds to a few thousand nodes)
are dense on TPU anyway, and the normalizers run once on the host at data-load
time, not on the compute path.

All functions accept a dense ``(N, N)`` float array and return float32.
"""

from __future__ import annotations

import pickle

import numpy as np


def sym_adj(adj: np.ndarray) -> np.ndarray:
    """Symmetric normalization D^-1/2 A D^-1/2.

    Note the reference computes ``(A D^-1/2)^T D^-1/2 = D^-1/2 A^T D^-1/2``
    (`/root/reference/Utils/util.py:121-128`); for the undirected matrices it
    is applied to, this equals the usual symmetric normalization. We replicate
    the transpose so directed inputs also match bit-for-bit.
    """
    adj = np.asarray(adj, dtype=np.float64)
    rowsum = adj.sum(axis=1)
    d_inv_sqrt = np.power(rowsum, -0.5, where=rowsum > 0,
                          out=np.zeros_like(rowsum))
    d_inv_sqrt[~np.isfinite(d_inv_sqrt)] = 0.0
    return ((adj * d_inv_sqrt[None, :]).T * d_inv_sqrt[None, :]).astype(
        np.float32)


def asym_adj(adj: np.ndarray) -> np.ndarray:
    """Random-walk transition matrix D^-1 A
    (`/root/reference/Utils/util.py:130-136`)."""
    adj = np.asarray(adj, dtype=np.float64)
    rowsum = adj.sum(axis=1)
    d_inv = np.power(rowsum, -1.0, where=rowsum > 0, out=np.zeros_like(rowsum))
    d_inv[~np.isfinite(d_inv)] = 0.0
    return (d_inv[:, None] * adj).astype(np.float32)


def normalized_laplacian(adj: np.ndarray) -> np.ndarray:
    """L = I - D^-1/2 A D^-1/2 (`/root/reference/Utils/util.py:138-151`).

    Replicates the reference's transpose quirk via :func:`sym_adj`.
    """
    adj = np.asarray(adj, dtype=np.float64)
    return (np.eye(adj.shape[0]) - sym_adj(adj)).astype(np.float32)


def scaled_laplacian(adj: np.ndarray, lambda_max: float | None = 2.0,
                     undirected: bool = True) -> np.ndarray:
    """2 L / lambda_max - I (`/root/reference/Utils/util.py:153-164`)."""
    adj = np.asarray(adj, dtype=np.float64)
    if undirected:
        adj = np.maximum(adj, adj.T)
    lap = normalized_laplacian(adj).astype(np.float64)
    if lambda_max is None:
        lambda_max = float(np.max(np.linalg.eigvalsh((lap + lap.T) / 2)))
    n = lap.shape[0]
    return ((2.0 / lambda_max) * lap - np.eye(n)).astype(np.float32)


def mod_adj(adj_mx: np.ndarray, adjtype: str) -> list[np.ndarray]:
    """``adjtype`` dispatch (`/root/reference/Utils/util.py:178-194`).

    "doubletransition" — ``[D^-1 A, D^-1 A^T-normalized]`` — is the canonical
    configuration used by the reference train command (`README.md:37`).
    """
    if adjtype == "scalap":
        return [scaled_laplacian(adj_mx)]
    if adjtype == "normlap":
        return [normalized_laplacian(adj_mx)]
    if adjtype == "symnadj":
        return [sym_adj(adj_mx)]
    if adjtype == "transition":
        return [asym_adj(adj_mx)]
    if adjtype == "doubletransition":
        return [asym_adj(adj_mx), asym_adj(np.transpose(adj_mx))]
    if adjtype == "identity":
        return [np.eye(adj_mx.shape[0], dtype=np.float32)]
    raise ValueError(f"adj type not defined: {adjtype!r}")


def load_pickle(path: str):
    """Unpickle with latin1 fallback for python2-era DCRNN pickles
    (`/root/reference/Utils/util.py:166-176`)."""
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except UnicodeDecodeError:
        with open(path, "rb") as f:
            return pickle.load(f, encoding="latin1")


def load_adj(pkl_filename: str, adjtype: str):
    """Load a DCRNN-format ``(sensor_ids, id_to_ind, adj_mx)`` pickle and
    normalize (`/root/reference/Utils/util.py:196-199`)."""
    sensor_ids, sensor_id_to_ind, adj_mx = load_pickle(pkl_filename)
    return sensor_ids, sensor_id_to_ind, mod_adj(np.asarray(adj_mx), adjtype)
