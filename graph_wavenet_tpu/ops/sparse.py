"""Sparse diffusion supports: padded max-degree neighbor format.

Beyond-reference feature. The reference's diffusion supports are dense
(N, N) matrices (`/root/reference/model.py:13`), fine at N=207 but O(N^2)
per hop in compute and memory — dense supports stop fitting long before
city-scale graphs (N=50k would be 10 GB per support). Real road/sensor
networks are ~constant-degree, so the TPU-native sparse form is a PADDED
neighbor table (ELL format):

    idx (N, D) int32   — source node of each incoming edge (row-padded with
                         the row's own index),
    w   (N, D) float32 — edge weight (padded with 0),

chosen over CSR/COO because every row has the same static width D: the hop
becomes one leading-axis gather plus a weighted sum over D — static shapes,
XLA-native, shardable along N. FLOPs drop from O(N^2) to O(N*D) per hop.

Two TPU-specific design points (measured, BENCH_NOTES.md):

1. **Gather axis.** A middle-axis ``jnp.take`` over (B, T, N, C) is ~25x
   slower than transposing the node axis to the front and gathering whole
   (B*T*C)-wide rows of a 2-D array.
2. **Backward = gather, never scatter.** The autodiff VJP of a gather is a
   scatter-add, which TPU executes serially (the naive sparse train step
   is SLOWER than dense). Each support therefore precomputes its TRANSPOSE
   table at construction, and ``nconv_sparse`` carries a custom VJP:
   ``dx = A^T-mix(g)`` is another ELL gather over the transpose table, and
   ``dw`` is a per-edge row dot — no scatters anywhere in fwd or bwd.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from graph_wavenet_tpu.ops.linear import accum_dtype


@jax.tree_util.register_dataclass
@dataclass
class SparseSupport:
    """Padded neighbor-table support (ELL) with its precomputed transpose.

    Semantics match a dense support A used by ``nconv`` (which contracts
    x's node axis with A's FIRST axis): row n of the table lists the
    nonzeros of COLUMN n of A — ``out_n = sum_d w[n, d] * x[idx[n, d]]``.

    idx_t (N, Dt): for each node v, the nodes n whose tables reference v
    (the transpose adjacency); perm_t (N, Dt): flat positions ``n*D + d`` of
    those edges in ``w`` (sentinel N*D = padding, reads a constant 0), so
    the backward pass can materialize the transpose WEIGHTS from the
    current ``w`` — gradients through ``w`` stay exact *within the fixed
    sparsity structure*: ``live`` (N, D) marks the build-time edges, and
    the custom VJP pins ``dw`` to zero at padding slots (their build-time
    weight is 0 and the transpose table does not reference them, so a
    gradient there would move the forward off the structure the backward
    can see — same contract as block_sparse's zero-gradient sentinels).
    """

    idx: jnp.ndarray      # (N, D) int32
    w: jnp.ndarray        # (N, D)
    idx_t: jnp.ndarray    # (N, Dt) int32
    perm_t: jnp.ndarray   # (N, Dt) int32 into w.ravel() (N*D = zero slot)
    live: jnp.ndarray     # (N, D) bool — build-time edge mask

    @property
    def n_nodes(self) -> int:
        return self.idx.shape[0]

    @property
    def max_degree(self) -> int:
        return self.idx.shape[1]

    def mix_2d(self, x2: jnp.ndarray) -> jnp.ndarray:
        """Node-leading (N, R) -> (N, R) mix (duck-typed sparse API)."""
        return _ell_mix(x2, self.w, self.idx, self.idx_t, self.perm_t,
                        self.live)

    def to_dense(self) -> np.ndarray:
        """Dense (N, N) support with identical ``nconv`` semantics."""
        n, d = self.idx.shape
        dense = np.zeros((n, n), np.float32)
        idx = np.asarray(self.idx)
        w = np.asarray(self.w, np.float32)
        for r in range(n):
            for j in range(d):
                dense[idx[r, j], r] += w[r, j]
        return dense


def _build(idx: np.ndarray, w: np.ndarray) -> SparseSupport:
    """Assemble a SparseSupport, deriving the transpose table."""
    n, d = idx.shape
    targets = idx.reshape(-1)                    # edge e feeds node e // d
    flat = np.arange(n * d, dtype=np.int64)
    live = w.reshape(-1) != 0
    order = np.argsort(targets[live], kind="stable")
    tgt_sorted = targets[live][order]
    flat_sorted = flat[live][order]
    counts = np.bincount(tgt_sorted, minlength=n)
    dt = max(int(counts.max()) if counts.size else 0, 1)
    idx_t = np.tile(np.arange(n, dtype=np.int64)[:, None], (1, dt))
    perm_t = np.full((n, dt), n * d, dtype=np.int64)   # sentinel: zero slot
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    # vectorized fill: each sorted edge lands at (its target row, its
    # position within the target's group)
    pos = np.arange(len(tgt_sorted), dtype=np.int64) - starts[tgt_sorted]
    idx_t[tgt_sorted, pos] = flat_sorted // d          # source row n
    perm_t[tgt_sorted, pos] = flat_sorted
    return SparseSupport(jnp.asarray(idx, jnp.int32),
                         jnp.asarray(w),
                         jnp.asarray(idx_t, jnp.int32),
                         jnp.asarray(perm_t, jnp.int32),
                         jnp.asarray(w != 0))


def from_dense(a: np.ndarray, max_degree: int | None = None,
               ) -> SparseSupport:
    """Convert a dense support to the padded neighbor form.

    ``nconv`` computes ``out[.., n, c] = sum_v x[.., v, c] * A[v, n]`` —
    node n aggregates along COLUMN n of A. Row r of the table therefore
    lists the column-r nonzeros. If a column has more than ``max_degree``
    nonzeros the smallest-magnitude ones are dropped (top-k sparsification,
    the `sparsifyGraph` 'NN' policy of `graphTools.py:426-515`); default
    D = the max column-degree (exact conversion).
    """
    a = np.asarray(a, np.float32)
    n = a.shape[0]
    cols = a.T                                   # row r = incoming weights
    nnz = (cols != 0).sum(1)
    d = int(max_degree if max_degree is not None else max(int(nnz.max()), 1))
    # vectorized top-|w| per row: zeros sort last, so kept nonzeros are
    # already compacted to the front of each row
    order = np.argsort(-np.abs(cols), axis=1, kind="stable")[:, :d]
    vals = np.take_along_axis(cols, order, axis=1)
    live = vals != 0
    idx = np.where(live, order, np.arange(n, dtype=np.int64)[:, None])
    w = np.where(live, vals, 0.0).astype(np.float32)
    return _build(idx.astype(np.int64), w)


def from_edges(src: np.ndarray, dst: np.ndarray, weight: np.ndarray,
               n_nodes: int, max_degree: int | None = None) -> SparseSupport:
    """Build from an edge list — O(E), no dense intermediate. Edge
    (src -> dst, weight) contributes ``weight * x[src]`` to node dst
    (``A[src, dst] = weight``); duplicate (src, dst) pairs accumulate, like
    ``block_sparse.from_edges_blocked``. ``max_degree``: keep the top-|w|
    incoming edges per node (the `sparsifyGraph` 'NN' policy)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    weight = np.asarray(weight, np.float32)
    # accumulate duplicates
    pair = dst * n_nodes + src
    uniq, inv = np.unique(pair, return_inverse=True)
    wsum = np.zeros(len(uniq), np.float32)
    np.add.at(wsum, inv, weight)
    u_dst, u_src = uniq // n_nodes, uniq % n_nodes
    live = wsum != 0
    u_dst, u_src, wsum = u_dst[live], u_src[live], wsum[live]
    # sort per dest node by descending |w| for the top-k cut
    order = np.lexsort((-np.abs(wsum), u_dst))
    u_dst, u_src, wsum = u_dst[order], u_src[order], wsum[order]
    counts = np.bincount(u_dst, minlength=n_nodes)
    d_full = max(int(counts.max()) if counts.size else 0, 1)
    d = min(max_degree, d_full) if max_degree is not None else d_full
    starts = np.zeros(n_nodes + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(len(u_dst), dtype=np.int64) - starts[u_dst]
    keep = pos < d
    idx = np.tile(np.arange(n_nodes, dtype=np.int64)[:, None], (1, d))
    w = np.zeros((n_nodes, d), np.float32)
    idx[u_dst[keep], pos[keep]] = u_src[keep]
    w[u_dst[keep], pos[keep]] = wsum[keep]
    return _build(idx, w)


def random_sparse_support(n_nodes: int, degree: int,
                          rng: np.random.Generator | None = None,
                          row_normalize: bool = True) -> SparseSupport:
    """Synthetic constant-degree support (benchmarks / large-graph tests)
    without materializing an O(N^2) dense matrix."""
    rng = rng or np.random.default_rng()
    idx = rng.integers(0, n_nodes, size=(n_nodes, degree))
    w = rng.random((n_nodes, degree)).astype(np.float32)
    if row_normalize:
        w = w / w.sum(1, keepdims=True)
    return _build(idx.astype(np.int64), w)


def _ell_mix_rows(x2: jnp.ndarray, idx: jnp.ndarray, w_rows: jnp.ndarray,
                  out_dtype) -> jnp.ndarray:
    """Core mix on the node-leading 2-D view: (N, R), (N, D), (N, D) ->
    (N, R) with out[n] = sum_d w_rows[n, d] * x2[idx[n, d]]."""
    n, d = idx.shape
    acc = accum_dtype(out_dtype) or out_dtype
    rows = jnp.take(x2, idx.reshape(-1), axis=0)          # (N*D, R)
    rows = rows * w_rows.reshape(-1, 1).astype(x2.dtype)
    return rows.reshape(n, d, -1).sum(1, dtype=acc).astype(out_dtype)


@jax.custom_vjp
def _ell_mix(x2, w, idx, idx_t, perm_t, live):
    return _ell_mix_rows(x2, idx, w, x2.dtype)


def _ell_mix_fwd(x2, w, idx, idx_t, perm_t, live):
    return (_ell_mix(x2, w, idx, idx_t, perm_t, live),
            (x2, w, idx, idx_t, perm_t, live))


def _ell_mix_bwd(res, g):
    x2, w, idx, idx_t, perm_t, live = res
    # transpose weights from the CURRENT w (exact grads through w)
    w_pad = jnp.concatenate([w.reshape(-1),
                             jnp.zeros((1,), w.dtype)])
    w_t = w_pad[perm_t.reshape(-1)].reshape(perm_t.shape)
    dx2 = _ell_mix_rows(g.astype(x2.dtype), idx_t, w_t, x2.dtype)
    # dw[n, d] = <x2[idx[n, d]], g[n]> — per-edge row dot, no scatter.
    # Padding slots are pinned at zero: they point at a REAL node (the
    # row's own index), so an optimizer step driven by their raw gradient
    # would add edges the transpose table can't see, silently desyncing
    # dx2 from the forward.
    xg = jnp.take(x2, idx.reshape(-1), axis=0).reshape(
        *idx.shape, -1)                                    # (N, D, R)
    dw = jnp.einsum("ndr,nr->nd", xg, g.astype(x2.dtype),
                    preferred_element_type=accum_dtype(x2.dtype)
                    ).astype(w.dtype)
    dw = jnp.where(live, dw, 0)
    zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return dx2, dw, zero(idx), zero(idx_t), zero(perm_t), zero(live)


_ell_mix.defvjp(_ell_mix_fwd, _ell_mix_bwd)


def nconv_sparse(x: jnp.ndarray, sp: SparseSupport) -> jnp.ndarray:
    """Sparse diffusion step, same contract as ``ops.diffusion.nconv``:
    x (B, T, N, C) -> (B, T, N, C) with out_n = sum_d w[n,d] * x[idx[n,d]].
    fp32 accumulation; scatter-free forward AND backward (see module doc).
    """
    b, t, n, c = x.shape
    x2 = jnp.transpose(x, (2, 0, 1, 3)).reshape(n, b * t * c)
    out = sp.mix_2d(x2)
    return jnp.transpose(out.reshape(n, b, t, c), (1, 2, 0, 3))
