"""Spatial (road-network-like) graph construction on edge lists — the
city-scale companion to :mod:`graphs.normalize` (whose dense ``asym_adj`` /
``mod_adj``, reference ``util.py:130-136,178-194``, would need an O(N^2)
matrix these graphs can't afford).

A k-NN graph on sensor coordinates with Gaussian kernel weights is how
the METR-LA ``adj_mx.pkl`` itself was built (DCRNN's recipe); here it is
computed with a kd-tree so 40k+ node graphs stay O(N k log N), normalized
directly on the edge list, and handed to
:func:`ops.block_sparse.from_edges_blocked` under a locality-maximising
node ordering (:func:`graphs.ordering.rcm_order_edges`).
"""

from __future__ import annotations

import numpy as np


def knn_graph_edges(pos: np.ndarray, k: int
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Directed k-NN edges ``(src, dst, weight)`` on point coordinates
    ``pos (N, d)`` with Gaussian kernel weights ``exp(-d^2 / sigma^2)``,
    sigma = the std of all k-NN distances (the DCRNN kernel-bandwidth
    convention). kd-tree; no O(N^2) distance matrix.

    The self match is filtered by INDEX, not by assuming it lands in
    column 0: with coincident points (duplicate sensor coordinates) the
    kd-tree may return the self point in any zero-distance column, and a
    positional drop would keep a self-loop while dropping a true
    neighbor (ADVICE r2). Rows whose k+1 nearest are all coincident keep
    k neighbors by dropping the LAST tied column instead. sigma is
    guarded against degenerate all-equidistant inputs."""
    from scipy.spatial import cKDTree

    n = pos.shape[0]
    d, nbr = cKDTree(pos).query(pos, k=k + 1)
    # drop the self match per row wherever it landed; if self is absent
    # (> k coincident duplicates) drop the last column (a tied duplicate)
    self_col = np.argmax(nbr == np.arange(n)[:, None], axis=1)
    self_col = np.where((nbr == np.arange(n)[:, None]).any(axis=1),
                        self_col, k)
    keep = np.ones((n, k + 1), bool)
    keep[np.arange(n), self_col] = False
    src = np.repeat(np.arange(n), k)
    dst = nbr[keep].reshape(-1)
    dist = d[keep].reshape(-1)
    sigma = max(float(dist.std()), 1e-12)
    w = np.exp(-(dist ** 2) / (sigma ** 2)).astype(np.float32)
    return src, dst, w


def random_spatial_graph(n: int, k: int, rng: np.random.Generator
                         ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """k-NN graph on uniform random 2-D points: the synthetic road-network
    stand-in used by the city-scale demo and benchmarks."""
    return knn_graph_edges(rng.random((n, 2)), k)


def transition_edge_weights(src: np.ndarray, dst: np.ndarray,
                            w: np.ndarray, n: int) -> np.ndarray:
    """Row-normalized random-walk weights on the edge list (``asym_adj``,
    reference ``util.py:130-136``): ``A[s, d] / sum_d A[s, :]``. Rows with
    no out-edges keep weight 0 (dense ``asym_adj`` would emit inf)."""
    deg = np.bincount(src, weights=w, minlength=n)
    out = np.zeros_like(w, np.float32)
    nz = deg[src] > 0
    out[nz] = w[nz] / deg[src[nz]]
    return out


def doubletransition_block_supports(src: np.ndarray, dst: np.ndarray,
                                    w: np.ndarray, n: int,
                                    perm: np.ndarray | None = None,
                                    use_pallas: bool = False,
                                    form: str | None = None,
                                    block_size: int = 128) -> list:
    """The canonical doubletransition support pair (``mod_adj``,
    reference ``util.py:187-188``: ``[asym_adj(A), asym_adj(A^T)]``) built
    in 128x128 block-sparse form straight from the edge list, under node
    ordering ``perm`` (``new = perm[old]``).

    form: "block" (padded XLA), "pallas" (padded Pallas kernels),
    "flat" (live-block Pallas kernels — fastest square form on skewed
    real graphs) or "flat-rect" (128x512 rectangular dest blocks — the
    bandwidth lever; N must divide by 512); defaults to "pallas" if
    ``use_pallas`` else "block".
    """
    from graph_wavenet_tpu.ops import block_sparse

    if form is None:
        form = "pallas" if use_pallas else "block"
    sup = []
    for s, d in ((src, dst), (dst, src)):        # A and A^T transitions
        wt = transition_edge_weights(s, d, w, n)
        if form == "flat":
            # build the live-block form directly — the padded
            # intermediate costs ~25x the host build time at 82k nodes.
            # as_fused2 upgrades banded layouts (RCM) to the fused
            # order-2 hop-chain kernel (bit-exact; no-op otherwise) —
            # measured ~4% step win over the chain at 41k nodes and the
            # most run-to-run-consistent config (BENCH_NOTES round 3)
            sup.append(block_sparse.as_fused2(block_sparse.from_edges_flat(
                s, d, wt, n, block_size, block_size, perm=perm)))
        elif form == "flat-rect":
            sup.append(block_sparse.from_edges_flat(
                s, d, wt, n, block_size, 4 * block_size, perm=perm))
        else:
            wrap = {"block": lambda sp: sp,
                    "pallas": block_sparse.as_pallas}[form]
            sup.append(wrap(block_sparse.from_edges_blocked(
                s, d, wt, n, block_size=block_size, perm=perm)))
    return sup
