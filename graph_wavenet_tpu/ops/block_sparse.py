"""Block-sparse diffusion supports: the MXU form of graph sparsity.

Complement to the ELL form (`ops.sparse`): ELL hops are gather-bound
(~180 GB/s effective on v5e), while the TPU's strength is dense matmuls.
For graphs with cluster structure (road networks, SBM communities — which
the reorderings in ``graphs.ordering`` expose), most 128x128 node blocks of
the support are exactly zero. Keeping only the nonzero blocks turns a hop
into a batched dense (BS, BS) x (BS, R) matmul over each block-row's
nonzero blocks — MXU work, no per-row gathers:

    blocks    (NB, MB, BS, BS)  — nonzero blocks, padded per block-row
    block_idx (NB, MB) int32    — source block-row of each, NB = zero pad

Backward is scatter-free by the same construction as ELL: a transpose
block table is precomputed, ``dx`` contracts the transposed blocks
(materialized from the CURRENT ``blocks`` via a flat permutation, so
gradients through the weights stay exact), and ``dblocks`` is a per-block
outer contraction.

``nconv`` orientation (`/root/reference/model.py:13`): out node j of block
row n aggregates x over A's column j — ``out[n,j] = sum_{m,k}
blocks[n,m,k,j] * x[block_idx[n,m], k]``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from graph_wavenet_tpu.ops.linear import accum_dtype


@jax.tree_util.register_dataclass
@dataclass
class BlockSparseSupport:
    """Nonzero 128x128 (or ``block_size``) blocks of a support matrix."""

    blocks: jnp.ndarray      # (NB, MB, BS, BS)
    block_idx: jnp.ndarray   # (NB, MB) int32; NB = zero-block sentinel
    idx_t: jnp.ndarray       # (NB, MBt) int32: source BLOCK-ROW n per t-edge
    perm_t: jnp.ndarray      # (NB, MBt) int32 into blocks[:NB*MB]; NB*MB = 0

    @property
    def n_nodes(self) -> int:
        return self.blocks.shape[0] * self.blocks.shape[2]

    @property
    def block_size(self) -> int:
        return self.blocks.shape[2]

    def mix_2d(self, x2: jnp.ndarray) -> jnp.ndarray:
        """Node-leading (N, R) -> (N, R) mix (duck-typed sparse API)."""
        return _block_mix(x2, self.blocks, self.block_idx, self.idx_t,
                          self.perm_t)

    def astype(self, dtype) -> "BlockSparseSupport":
        """Copy with block VALUES stored in ``dtype`` (tables untouched).
        Under a matching activation dtype this is numerically free: every
        mix op casts blocks to the activation dtype per use anyway, so
        bf16 storage halves the support's resident HBM and deletes the
        per-step fp32-read + bf16-write cast copy (the 327k full-model
        enabler — BENCH_NOTES round 5)."""
        import dataclasses
        return dataclasses.replace(
            self, blocks=jnp.asarray(self.blocks).astype(dtype))

    def to_dense(self) -> np.ndarray:
        nb, mb, bs, _ = self.blocks.shape
        n = nb * bs
        dense = np.zeros((n, n), np.float32)
        blocks = np.asarray(self.blocks, np.float32)
        bidx = np.asarray(self.block_idx)
        for r in range(nb):
            for m in range(mb):
                src = bidx[r, m]
                if src >= nb:
                    continue
                dense[src * bs:(src + 1) * bs, r * bs:(r + 1) * bs] += (
                    blocks[r, m])
        return dense


def from_dense(a: np.ndarray, block_size: int = 128) -> BlockSparseSupport:
    """Partition a dense support into blocks, keep the nonzero ones.

    N must divide by ``block_size`` (pad the graph first if not — zero
    rows/cols are inert under diffusion). Use a cluster-exposing node
    permutation (``graphs.ordering``) beforehand: block count is what
    determines the speedup.
    """
    a = np.asarray(a, np.float32)
    n = a.shape[0]
    assert n % block_size == 0, (
        f"N={n} must divide by block_size={block_size}; zero-pad the "
        "support first (zero rows/cols are inert)")
    nb = n // block_size
    # block (s, r): rows of source block s, columns of dest block-row r
    tiles = a.reshape(nb, block_size, nb, block_size)
    nz = np.abs(tiles).sum((1, 3)).T != 0          # (dest r, src s)
    mb = max(int(nz.sum(1).max()), 1)
    blocks = np.zeros((nb, mb, block_size, block_size), np.float32)
    bidx = np.full((nb, mb), nb, np.int64)
    for r in range(nb):
        srcs = np.nonzero(nz[r])[0]
        for m, s in enumerate(srcs):
            blocks[r, m] = tiles[s, :, r, :]
            bidx[r, m] = s
    return _finish(blocks, bidx)


def _finish(blocks: np.ndarray, bidx: np.ndarray) -> BlockSparseSupport:
    """Derive the transpose block table (scatter-free backward)."""
    nb, mb = bidx.shape
    live = bidx.reshape(-1) < nb
    flat = np.arange(nb * mb, dtype=np.int64)
    targets = bidx.reshape(-1)                     # source block-row
    order = np.argsort(targets[live], kind="stable")
    tgt_sorted = targets[live][order]
    flat_sorted = flat[live][order]
    counts = np.bincount(tgt_sorted, minlength=nb)
    mbt = max(int(counts.max()) if counts.size else 0, 1)
    idx_t = np.tile(np.arange(nb, dtype=np.int64)[:, None], (1, mbt))
    perm_t = np.full((nb, mbt), nb * mb, dtype=np.int64)
    starts = np.zeros(nb + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(len(tgt_sorted), dtype=np.int64) - starts[tgt_sorted]
    idx_t[tgt_sorted, pos] = flat_sorted // mb     # dest block-row r
    perm_t[tgt_sorted, pos] = flat_sorted
    return BlockSparseSupport(jnp.asarray(blocks),
                              jnp.asarray(bidx, jnp.int32),
                              jnp.asarray(idx_t, jnp.int32),
                              jnp.asarray(perm_t, jnp.int32))


def from_edges_blocked(src: np.ndarray, dst: np.ndarray,
                       weight: np.ndarray, n_nodes: int,
                       block_size: int = 128,
                       perm: np.ndarray | None = None,
                       ) -> BlockSparseSupport:
    """Build directly from an edge list — O(E) memory, no dense
    intermediate (city-scale graphs cannot afford the (N, N) matrix).

    Edge (src -> dst, weight) contributes ``weight * x[src]`` to node dst
    (``A[src, dst] = weight``; duplicate edges accumulate). ``perm``:
    optional node permutation applied first (new_id = perm[old_id]) — use a
    cluster-exposing ordering from ``graphs.ordering`` to minimize the
    number of nonzero blocks, which is what determines the speedup.
    N is zero-padded up to a multiple of ``block_size`` (inert rows).
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    weight = np.asarray(weight, np.float32)
    if perm is not None:
        perm = np.asarray(perm, np.int64)
        src, dst = perm[src], perm[dst]
    n_pad = -(-n_nodes // block_size) * block_size
    nb = n_pad // block_size
    sb, db = src // block_size, dst // block_size
    pair = db * nb + sb                             # dest-major block pair
    uniq, inv = np.unique(pair, return_inverse=True)
    # per dest block-row slot assignment
    u_db, u_sb = uniq // nb, uniq % nb
    counts = np.bincount(u_db, minlength=nb)
    mb = max(int(counts.max()) if counts.size else 0, 1)
    starts = np.zeros(nb + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    slot_of_uniq = np.arange(len(uniq), dtype=np.int64) - starts[u_db]
    bidx = np.full((nb, mb), nb, np.int64)
    bidx[u_db, slot_of_uniq] = u_sb
    blocks = np.zeros((nb, mb, block_size, block_size), np.float32)
    np.add.at(blocks,
              (db, slot_of_uniq[inv], src % block_size, dst % block_size),
              weight)
    return _finish(blocks, bidx)


def random_block_support(n_blocks: int, blocks_per_row: int,
                         block_size: int = 128,
                         rng: np.random.Generator | None = None,
                         ) -> BlockSparseSupport:
    """Synthetic clustered support built directly in block form (no O(N^2)
    dense intermediate) — benchmarks / large-graph tests. Each block-row
    gets its own diagonal block plus ``blocks_per_row - 1`` random others;
    columns are normalized within the materialized blocks."""
    rng = rng or np.random.default_rng()
    mb = min(blocks_per_row, n_blocks)
    bidx = np.zeros((n_blocks, mb), np.int64)
    blocks = rng.random((n_blocks, mb, block_size, block_size)).astype(
        np.float32)
    for r in range(n_blocks):
        pool = np.delete(np.arange(n_blocks), r)
        others = rng.choice(pool, size=mb - 1, replace=False) if mb > 1 \
            else np.empty(0, np.int64)
        bidx[r] = np.concatenate([[r], others])[:mb]
    col_sums = blocks.sum((1, 2), keepdims=True)   # normalize per column j
    blocks = blocks / col_sums
    return _finish(blocks, bidx)


def _mix_blocks(xb_pad, blocks_g, idx, acc):
    """out[r] = sum_m blocks_g[r, m].T-contract x block idx[r, m].
    xb_pad (NB+1, BS, R); blocks_g (NB, MB, BS, BS) -> (NB, BS, R)."""
    g = jnp.take(xb_pad, idx, axis=0)              # (NB, MB, BS, R)
    return jnp.einsum("nmkj,nmkr->njr", blocks_g, g,
                      preferred_element_type=acc)


@jax.custom_vjp
def _block_mix(x2, blocks, block_idx, idx_t, perm_t):
    """x2 (N, R) -> (N, R) through the block structure."""
    n, r = x2.shape
    nb, mb, bs, _ = blocks.shape
    acc = accum_dtype(x2.dtype)
    xb = x2.reshape(nb, bs, r)
    xb_pad = jnp.concatenate([xb, jnp.zeros((1, bs, r), x2.dtype)])
    out = _mix_blocks(xb_pad, blocks.astype(x2.dtype), block_idx, acc)
    return out.reshape(n, r).astype(x2.dtype)


def _block_mix_fwd(x2, blocks, block_idx, idx_t, perm_t):
    return (_block_mix(x2, blocks, block_idx, idx_t, perm_t),
            (x2, blocks, block_idx, idx_t, perm_t))


def _block_mix_bwd(res, gout):
    x2, blocks, block_idx, idx_t, perm_t = res
    n, r = x2.shape
    nb, mb, bs, _ = blocks.shape
    acc = accum_dtype(x2.dtype)
    gb = gout.reshape(nb, bs, r).astype(x2.dtype)
    gb_pad = jnp.concatenate([gb, jnp.zeros((1, bs, r), x2.dtype)])
    # dx[s] = sum over transposed edges (r, m): blocks[r, m] @ gout[r]
    # (contract the DEST index j): materialize transpose blocks from the
    # CURRENT weights via the flat permutation (exact grads through blocks)
    bflat = jnp.concatenate([
        blocks.reshape(nb * mb, bs, bs),
        jnp.zeros((1, bs, bs), blocks.dtype)])
    bt = jnp.take(bflat, perm_t.reshape(-1), axis=0).reshape(
        nb, perm_t.shape[1], bs, bs).astype(x2.dtype)   # (NB, MBt, BSk, BSj)
    gt = jnp.take(gb_pad, idx_t, axis=0)           # (NB, MBt, BS, R)
    dxb = jnp.einsum("vtkj,vtjr->vkr", bt, gt,
                     preferred_element_type=acc)
    dx2 = dxb.reshape(n, r).astype(x2.dtype)
    # dblocks[r, m, k, j] = <x block idx[r, m] row k, gout[r] row j>
    xb = x2.reshape(nb, bs, r)
    xb_pad = jnp.concatenate([xb, jnp.zeros((1, bs, r), x2.dtype)])
    xg = jnp.take(xb_pad, block_idx, axis=0)       # (NB, MB, BS, R)
    dblocks = jnp.einsum("nmkr,njr->nmkj", xg, gb,
                         preferred_element_type=acc).astype(blocks.dtype)
    zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return dx2, dblocks, zero(block_idx), zero(idx_t), zero(perm_t)


_block_mix.defvjp(_block_mix_fwd, _block_mix_bwd)


def nconv_block_sparse(x: jnp.ndarray,
                       sp: BlockSparseSupport) -> jnp.ndarray:
    """Block-sparse diffusion step, same contract as ``nconv``:
    x (B, T, N, C) -> (B, T, N, C). Alias of ``sparse.nconv_sparse``,
    which is duck-typed over any ``mix_2d`` support."""
    from graph_wavenet_tpu.ops.sparse import nconv_sparse

    return nconv_sparse(x, sp)


# ---------------------------------------------------------------------------
# Pallas-backed variant: the hop never materializes the gathered blocks
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fused2_dispatch() -> str:
    """Fused-vs-chained dispatch override for the order-2 kernel
    ("auto" | "fused" | "chain") — read at TRACE time, so tests that flip
    it must clear jit caches or use fresh shapes. Used by the TPU probe
    (garage/fused2_dispatch_probe.py) and the CPU test of the chained
    branch (tests/test_pallas_block_sparse.py)."""
    import os

    return os.environ.get("GWT_FUSED2_DISPATCH", "auto")


@jax.custom_vjp
def _block_mix_pallas(x2, blocks, block_idx, idx_t, perm_t):
    """Same contract as ``_block_mix``, but each hop is a Pallas gathered
    block matmul (``ops.pallas.block_diffusion``): the block table rides as
    a scalar-prefetch argument and the source tiles are DMA'd straight from
    HBM by the BlockSpec index maps — the XLA path's (NB, MB, BS, R)
    gather (545 MB/hop at 41k nodes) never exists."""
    from graph_wavenet_tpu.ops.pallas.block_diffusion import (
        gathered_block_mix,
    )

    n, r = x2.shape
    nb, mb, bs, _ = blocks.shape
    assert _interpret() or bs % 128 == 0, (
        f"Pallas block-sparse kernels need block_size % 128 == 0 on TPU "
        f"(got {bs}); use the XLA BlockSparseSupport for smaller blocks")
    xb_pad = jnp.concatenate(
        [x2.reshape(nb, bs, r), jnp.zeros((1, bs, r), x2.dtype)])
    bflat = blocks.reshape(nb * mb, bs, bs).astype(x2.dtype)
    slot = jnp.arange(nb * mb, dtype=jnp.int32).reshape(nb, mb)
    out = gathered_block_mix(bflat, slot, xb_pad, block_idx,
                             transpose_lhs=True, interpret=_interpret())
    return out.reshape(n, r)


def _block_mix_pallas_fwd(x2, blocks, block_idx, idx_t, perm_t):
    return (_block_mix_pallas(x2, blocks, block_idx, idx_t, perm_t),
            (x2, blocks, block_idx, idx_t, perm_t))


def _block_mix_pallas_bwd(res, gout):
    from graph_wavenet_tpu.ops.pallas.block_diffusion import (
        gathered_block_mix,
        gathered_block_outer,
    )

    x2, blocks, block_idx, idx_t, perm_t = res
    n, r = x2.shape
    nb, mb, bs, _ = blocks.shape
    interp = _interpret()
    gout = gout.astype(x2.dtype)
    gb = gout.reshape(nb, bs, r)
    gb_pad = jnp.concatenate([gb, jnp.zeros((1, bs, r), x2.dtype)])
    bflat = blocks.reshape(nb * mb, bs, bs).astype(x2.dtype)
    bflat_z = jnp.concatenate([bflat, jnp.zeros((1, bs, bs), x2.dtype)])
    # dx: transpose table, contract the block's dest axis with gout
    dxb = gathered_block_mix(bflat_z, perm_t, gb_pad, idx_t,
                             transpose_lhs=False, interpret=interp)
    dx2 = dxb.reshape(n, r).astype(x2.dtype)
    xb_pad = jnp.concatenate(
        [x2.reshape(nb, bs, r), jnp.zeros((1, bs, r), x2.dtype)])
    dblocks = gathered_block_outer(xb_pad, gb, block_idx,
                                   out_dtype=blocks.dtype, interpret=interp)
    zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return dx2, dblocks, zero(block_idx), zero(idx_t), zero(perm_t)


_block_mix_pallas.defvjp(_block_mix_pallas_fwd, _block_mix_pallas_bwd)


@jax.tree_util.register_dataclass
@dataclass
class PallasBlockSparseSupport(BlockSparseSupport):
    """A :class:`BlockSparseSupport` whose hops run the Pallas gathered
    block-matmul kernels. Same semantics (custom VJP, scatter-free both
    directions); build with :func:`as_pallas`. Falls back to interpret mode
    off-TPU."""

    def mix_2d(self, x2: jnp.ndarray) -> jnp.ndarray:
        return _block_mix_pallas(x2, self.blocks, self.block_idx,
                                 self.idx_t, self.perm_t)


def as_pallas(sp: BlockSparseSupport) -> PallasBlockSparseSupport:
    """Rewrap a block-sparse support to run on the Pallas kernels."""
    return PallasBlockSparseSupport(sp.blocks, sp.block_idx, sp.idx_t,
                                    sp.perm_t)


# ---------------------------------------------------------------------------
# Flat (CSR-style) Pallas variant: work proportional to LIVE blocks
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass
class FlatBlockSparseSupport:
    """Live nonzero blocks stored once, row-sorted — no (NB, MB) max-padding.

    The padded layout's compute is NB * MB grid steps where MB is the MAX
    blocks per block-row; real graphs are skewed (spatial k-NN under RCM at
    41k nodes: mean 7.6 vs max 11 → ~1.45x sentinel waste). Here the
    Pallas grid iterates exactly the live list (``ops.pallas.
    block_diffusion.gathered_block_mix_flat``); dummy zero-block entries
    guarantee every output row is visited (empty rows) without adding
    compute that matters.

    Storage: ``blocks_flat (L+1, BS, BS)`` with a trailing all-zero block
    that dummy table entries point at. Tables (forward, sorted by ``row``;
    transpose, sorted by ``row_t``) carry the destination row, source
    x-block-row, and storage slot per entry. The trailing zero block also
    makes the weight cotangent exact: dummy entries contract the zero
    block, so ``dblocks_flat[:L]`` is the live gradient and the trailing
    slot's gradient is identically zero.
    """

    blocks_flat: jnp.ndarray   # (L+1, BS, BS), [L] = zero block
    row_tbl: jnp.ndarray       # (Lt,) int32 dest block-row, sorted
    src_tbl: jnp.ndarray       # (Lt,) int32 source x block-row
    slot_tbl: jnp.ndarray      # (Lt,) int32 into blocks_flat
    row_t: jnp.ndarray         # (Lt2,) int32 x block-row (dx out), sorted
    src_t: jnp.ndarray         # (Lt2,) int32 dest block-row (g source)
    slot_t: jnp.ndarray        # (Lt2,) int32 into blocks_flat
    inv_slot: jnp.ndarray      # (L+1,) int32 fwd-table position of slot s

    @property
    def n_nodes(self) -> int:
        # row_tbl is sorted and covers every DEST block-row (dummy
        # entries); the dest axis is the blocks' second (rectangular form)
        return (int(self.row_tbl[-1]) + 1) * self.blocks_flat.shape[2]

    @property
    def block_size(self) -> int:
        return self.blocks_flat.shape[1]

    def mix_2d(self, x2: jnp.ndarray) -> jnp.ndarray:
        return _block_mix_flat(x2, self.blocks_flat, self.row_tbl,
                               self.src_tbl, self.slot_tbl, self.row_t,
                               self.src_t, self.slot_t, self.inv_slot)

    def astype(self, dtype):
        """Copy with block values stored in ``dtype`` (tables untouched);
        preserves the subclass (``Fused2FlatSupport`` keeps its schedule).
        See :meth:`BlockSparseSupport.astype` for why this is numerically
        free under a matching activation dtype."""
        import dataclasses
        return dataclasses.replace(
            self, blocks_flat=jnp.asarray(self.blocks_flat).astype(dtype))


def as_flat_pallas(sp: BlockSparseSupport) -> FlatBlockSparseSupport:
    """Build the flat live-block form from a padded block-sparse support
    (host-side, numpy)."""
    bidx = np.asarray(sp.block_idx, np.int64)      # (NB, MB)
    blocks = np.asarray(sp.blocks, np.float32)
    nb, mb = bidx.shape
    bs = blocks.shape[2]
    rr, mm = np.nonzero(bidx < nb)                 # row-major => row-sorted
    n_live = len(rr)
    blocks_flat = np.concatenate(
        [blocks[rr, mm], np.zeros((1, bs, bs), np.float32)])
    row = rr
    src = bidx[rr, mm]
    slot = np.arange(n_live, dtype=np.int64)
    # dummy coverage: every output block-row must be visited once
    empty = np.setdiff1d(np.arange(nb), row)
    if len(empty):
        row = np.concatenate([row, empty])
        src = np.concatenate([src, np.zeros(len(empty), np.int64)])
        slot = np.concatenate([slot,
                               np.full(len(empty), n_live, np.int64)])
        order = np.argsort(row, kind="stable")
        row, src, slot = row[order], src[order], slot[order]
    # inverse: forward-table position of each live storage slot (the weight
    # cotangent is a static GATHER of the per-entry outer products — no
    # scatter; the trailing zero block's row is pinned to zero in the VJP)
    inv_slot = np.zeros(n_live + 1, np.int64)
    inv_slot[slot] = np.arange(len(slot), dtype=np.int64)
    inv_slot[n_live] = len(slot)  # sentinel: VJP indexes a zero-padded row
    # transpose tables: dx rows are the x block-rows (= src of live entries)
    order_t = np.argsort(bidx[rr, mm], kind="stable")
    row_t = bidx[rr, mm][order_t]
    src_t = rr[order_t]
    slot_t = np.arange(n_live, dtype=np.int64)[order_t]
    empty_t = np.setdiff1d(np.arange(nb), row_t)
    if len(empty_t):
        row_t = np.concatenate([row_t, empty_t])
        src_t = np.concatenate([src_t, np.zeros(len(empty_t), np.int64)])
        slot_t = np.concatenate([slot_t,
                                 np.full(len(empty_t), n_live, np.int64)])
        order = np.argsort(row_t, kind="stable")
        row_t, src_t, slot_t = row_t[order], src_t[order], slot_t[order]
    as_i32 = lambda a: jnp.asarray(a, jnp.int32)
    return FlatBlockSparseSupport(
        jnp.asarray(blocks_flat), as_i32(row), as_i32(src), as_i32(slot),
        as_i32(row_t), as_i32(src_t), as_i32(slot_t), as_i32(inv_slot))


def from_edges_flat(src: np.ndarray, dst: np.ndarray, weight: np.ndarray,
                    n_nodes: int, bs_src: int = 128, bs_dst: int = 512,
                    perm: np.ndarray | None = None
                    ) -> FlatBlockSparseSupport:
    """Build the flat form straight from an edge list, with optionally
    RECTANGULAR blocks (``bs_src`` x ``bs_dst``).

    Wide destination blocks are the city-scale bandwidth lever: the mix
    kernel reads one (bs_src, R) x tile per live block, so grouping
    ``bs_dst / bs_src`` destination rows per block amortizes each x read
    across them (under a locality ordering adjacent dest rows share most
    sources). The zero fill inside wider blocks costs MXU flops, which are
    cheap while the kernel is gather-bound (BENCH_NOTES.md round-2 floor
    accounting).

    Edge (src -> dst, weight): ``A[src, dst] = weight`` (duplicates
    accumulate), ``out[dst] += weight * x[src]`` — the ``nconv``
    orientation. ``n_nodes`` must divide by both block sizes (pad the
    graph first; zero rows are inert). ``perm``: node reordering applied
    first (``new = perm[old]``).
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    weight = np.asarray(weight, np.float32)
    if perm is not None:
        perm = np.asarray(perm, np.int64)
        src, dst = perm[src], perm[dst]
    assert n_nodes % bs_src == 0 and n_nodes % bs_dst == 0, (
        f"N={n_nodes} must divide by both block sizes ({bs_src}, "
        f"{bs_dst}); zero-pad the graph first (zero rows are inert)")
    nbs = n_nodes // bs_src
    nbd = n_nodes // bs_dst
    sb, gd = src // bs_src, dst // bs_dst
    pair = gd * nbs + sb                            # dest-major
    uniq, inv = np.unique(pair, return_inverse=True)
    u_gd, u_sb = uniq // nbs, uniq % nbs
    n_live = len(uniq)
    blocks_flat = np.zeros((n_live + 1, bs_src, bs_dst), np.float32)
    np.add.at(blocks_flat, (inv, src % bs_src, dst % bs_dst), weight)

    row, srct, slot = u_gd, u_sb, np.arange(n_live, dtype=np.int64)
    empty = np.setdiff1d(np.arange(nbd), row)
    if len(empty):
        row = np.concatenate([row, empty])
        srct = np.concatenate([srct, np.zeros(len(empty), np.int64)])
        slot = np.concatenate([slot,
                               np.full(len(empty), n_live, np.int64)])
        order = np.argsort(row, kind="stable")
        row, srct, slot = row[order], srct[order], slot[order]
    inv_slot = np.zeros(n_live + 1, np.int64)
    inv_slot[slot] = np.arange(len(slot), dtype=np.int64)
    inv_slot[n_live] = len(slot)

    order_t = np.argsort(u_sb, kind="stable")
    row_t = u_sb[order_t]
    src_t = u_gd[order_t]
    slot_t = np.arange(n_live, dtype=np.int64)[order_t]
    empty_t = np.setdiff1d(np.arange(nbs), row_t)
    if len(empty_t):
        row_t = np.concatenate([row_t, empty_t])
        src_t = np.concatenate([src_t, np.zeros(len(empty_t), np.int64)])
        slot_t = np.concatenate([slot_t,
                                 np.full(len(empty_t), n_live, np.int64)])
        order = np.argsort(row_t, kind="stable")
        row_t, src_t, slot_t = row_t[order], src_t[order], slot_t[order]
    as_i32 = lambda a: jnp.asarray(a, jnp.int32)
    return FlatBlockSparseSupport(
        jnp.asarray(blocks_flat), as_i32(row), as_i32(srct), as_i32(slot),
        as_i32(row_t), as_i32(src_t), as_i32(slot_t), as_i32(inv_slot))


@jax.custom_vjp
def _block_mix_flat(x2, blocks_flat, row_tbl, src_tbl, slot_tbl, row_t,
                    src_t, slot_t, inv_slot):
    """(N, R) -> (N, R) through the flat live-block structure."""
    from graph_wavenet_tpu.ops.pallas.block_diffusion import (
        gathered_block_mix_flat,
    )

    n, r = x2.shape
    bs_s, bs_d = blocks_flat.shape[1], blocks_flat.shape[2]
    assert _interpret() or (bs_s % 128 == 0 and bs_d % 128 == 0), (
        f"Pallas block-sparse kernels need block sizes % 128 == 0 on TPU "
        f"(got {bs_s}x{bs_d})")
    assert n % bs_s == 0 and n % bs_d == 0, (
        f"N={n} must divide by both block sizes ({bs_s}, {bs_d})")
    out = gathered_block_mix_flat(
        blocks_flat.astype(x2.dtype), slot_tbl, x2.reshape(n // bs_s, bs_s, r),
        src_tbl, row_tbl, nb=n // bs_d, transpose_lhs=True,
        interpret=_interpret())
    return out.reshape(n, r)


def _block_mix_flat_fwd(x2, blocks_flat, row_tbl, src_tbl, slot_tbl, row_t,
                        src_t, slot_t, inv_slot):
    return (_block_mix_flat(x2, blocks_flat, row_tbl, src_tbl, slot_tbl,
                            row_t, src_t, slot_t, inv_slot),
            (x2, blocks_flat, row_tbl, src_tbl, slot_tbl, row_t, src_t,
             slot_t, inv_slot))


def _block_mix_flat_bwd(res, gout):
    from graph_wavenet_tpu.ops.pallas.block_diffusion import (
        gathered_block_mix_flat,
        gathered_block_outer_flat,
    )

    (x2, blocks_flat, row_tbl, src_tbl, slot_tbl, row_t, src_t,
     slot_t, inv_slot) = res
    n, r = x2.shape
    bs_s, bs_d = blocks_flat.shape[1], blocks_flat.shape[2]
    interp = _interpret()
    gout = gout.astype(x2.dtype)
    gb = gout.reshape(n // bs_d, bs_d, r)
    # dx[v] = sum over live blocks with src == v: block (contract dest j) g
    dxb = gathered_block_mix_flat(
        blocks_flat.astype(x2.dtype), slot_t, gb, src_t, row_t,
        nb=n // bs_s, transpose_lhs=False, interpret=interp)
    dx2 = dxb.reshape(n, r)
    # per-entry weight cotangents, one row per forward-table entry; each
    # live storage slot appears exactly once, so reassembling storage
    # order is a static GATHER by inv_slot (scatter-free backward). Dummy
    # entries' cotangents (x[0] outer g[empty row] != 0) belong to the
    # shared trailing zero block, whose gradient is pinned to zero —
    # inv_slot's sentinel points past dflat into the zero pad row.
    dflat = gathered_block_outer_flat(
        x2.reshape(n // bs_s, bs_s, r), gb, src_tbl, row_tbl,
        out_dtype=accum_dtype(x2.dtype), interpret=interp)
    dflat_pad = jnp.concatenate(
        [dflat, jnp.zeros((1, bs_s, bs_d), dflat.dtype)])
    dblocks = jnp.take(dflat_pad, inv_slot, axis=0)
    zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dx2, dblocks.astype(blocks_flat.dtype), zero(row_tbl),
            zero(src_tbl), zero(slot_tbl), zero(row_t), zero(src_t),
            zero(slot_t), zero(inv_slot))


_block_mix_flat.defvjp(_block_mix_flat_fwd, _block_mix_flat_bwd)


# ---------------------------------------------------------------------------
# Fused order-2 hop chain (both hops of one support in one kernel pass)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _block_mix_flat2(delay, ring_w, delay_t, ring_w_t, x2, blocks_flat,
                     row_tbl, src_tbl, slot_tbl, row_t, src_t, slot_t,
                     inv_slot):
    """(N, R) -> ((N, R), (N, R)): hop and hop-of-hop through the flat
    block structure in ONE kernel pass (``ops.pallas.block_diffusion.
    gathered_block_mix_flat2`` — hop 2 reads the intermediate from a VMEM
    ring instead of HBM). Numerically identical to chaining
    ``_block_mix_flat`` twice."""
    from graph_wavenet_tpu.ops.pallas.block_diffusion import (
        gathered_block_mix_flat2,
    )

    n, r = x2.shape
    bs = blocks_flat.shape[1]
    nb = n // bs
    o1, o2 = gathered_block_mix_flat2(
        blocks_flat.astype(x2.dtype), slot_tbl,
        x2.reshape(nb, bs, r), src_tbl, row_tbl, nb=nb, delay=delay,
        ring_w=ring_w, transpose_lhs=True, interpret=_interpret(),
        dispatch=_fused2_dispatch())
    return o1.reshape(n, r), o2.reshape(n, r)


def _block_mix_flat2_fwd(delay, ring_w, delay_t, ring_w_t, x2,
                         blocks_flat, row_tbl, src_tbl, slot_tbl, row_t,
                         src_t, slot_t, inv_slot):
    out = _block_mix_flat2(delay, ring_w, delay_t, ring_w_t, x2,
                           blocks_flat, row_tbl, src_tbl, slot_tbl,
                           row_t, src_t, slot_t, inv_slot)
    return out, (x2, out[0], blocks_flat, row_tbl, src_tbl, slot_tbl,
                 row_t, src_t, slot_t, inv_slot)


def _block_mix_flat2_bwd(delay, ring_w, delay_t, ring_w_t, res, g):
    """Chain-rule of the two hops:
    g1_eff = g1 + A-mixT(g2); dx = A-mixT(g1_eff);
    dA[l] = x[src[l]] (x) g1_eff[row[l]]  +  x1[src[l]] (x) g2[row[l]].

    The transpose chain is itself an order-2 hop chain over the
    transpose tables, so when the transpose band qualifies
    (``delay_t > 0``) it runs the SAME fused kernel with ``g1`` as the
    additive hop-1 epilogue — one pass yields (g1_eff, dx). The
    per-entry weight cotangents keep the two outer kernels (x and the
    saved x1 = out1 are forward values the gcn projection consumes
    anyway)."""
    from graph_wavenet_tpu.ops.pallas.block_diffusion import (
        gathered_block_mix_flat,
        gathered_block_mix_flat2,
        gathered_block_outer_flat,
    )

    (x2, x1, blocks_flat, row_tbl, src_tbl, slot_tbl, row_t, src_t,
     slot_t, inv_slot) = res
    g1, g2 = g
    n, r = x2.shape
    bs = blocks_flat.shape[1]
    nb = n // bs
    interp = _interpret()
    dt = x2.dtype
    g1 = g1.astype(dt)
    g2 = g2.astype(dt)
    bf = blocks_flat.astype(dt)

    if delay_t > 0:
        ge, dxb = gathered_block_mix_flat2(
            bf, slot_t, g2.reshape(nb, bs, r), src_t, row_t, nb=nb,
            delay=delay_t, ring_w=ring_w_t, transpose_lhs=False,
            add=g1.reshape(nb, bs, r), interpret=interp,
            dispatch=_fused2_dispatch())
        g1_eff = ge.reshape(n, r)
        dx = dxb.reshape(n, r)
    else:
        def mixT(gb):
            return gathered_block_mix_flat(
                bf, slot_t, gb.reshape(nb, bs, r), src_t, row_t, nb=nb,
                transpose_lhs=False, interpret=interp).reshape(n, r)

        g1_eff = g1 + mixT(g2)
        dx = mixT(g1_eff)
    # accum_dtype returns None for bf16-on-CPU ("accumulate in the input
    # dtype"); here it names a concrete output dtype, so fall back to dt
    acc = accum_dtype(dt) or dt
    dflat = gathered_block_outer_flat(
        x2.reshape(nb, bs, r), g1_eff.reshape(nb, bs, r), src_tbl,
        row_tbl, out_dtype=acc, interpret=interp)
    dflat = dflat + gathered_block_outer_flat(
        x1.astype(dt).reshape(nb, bs, r), g2.reshape(nb, bs, r), src_tbl,
        row_tbl, out_dtype=acc, interpret=interp)
    dflat_pad = jnp.concatenate(
        [dflat, jnp.zeros((1, bs, bs), dflat.dtype)])
    dblocks = jnp.take(dflat_pad, inv_slot, axis=0).astype(
        blocks_flat.dtype)
    zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dx, dblocks, zero(row_tbl), zero(src_tbl), zero(slot_tbl),
            zero(row_t), zero(src_t), zero(slot_t), zero(inv_slot))


_block_mix_flat2.defvjp(_block_mix_flat2_fwd, _block_mix_flat2_bwd)


@jax.tree_util.register_dataclass
@dataclass
class Fused2FlatSupport(FlatBlockSparseSupport):
    """A :class:`FlatBlockSparseSupport` whose order-2 hop chain runs the
    fused kernel (``mix2_2d``); single hops (``mix_2d``) are inherited.
    Build with :func:`as_fused2` — only banded/ordered layouts qualify."""

    delay: int = field(metadata=dict(static=True), default=1)
    ring_w: int = field(metadata=dict(static=True), default=1)
    # transpose-table schedule for the fused BACKWARD chain; 0 = the
    # transpose band does not qualify, bwd falls back to chained hops
    delay_t: int = field(metadata=dict(static=True), default=0)
    ring_w_t: int = field(metadata=dict(static=True), default=0)

    def mix2_2d(self, x2: jnp.ndarray):
        return _block_mix_flat2(self.delay, self.ring_w, self.delay_t,
                                self.ring_w_t, x2,
                                self.blocks_flat, self.row_tbl,
                                self.src_tbl, self.slot_tbl, self.row_t,
                                self.src_t, self.slot_t, self.inv_slot)


def as_unfused(sp: FlatBlockSparseSupport) -> FlatBlockSparseSupport:
    """Downgrade a fused support to the plain two-call chain (A/B
    tooling; bit-identical results either way)."""
    if not isinstance(sp, Fused2FlatSupport):
        return sp
    return FlatBlockSparseSupport(sp.blocks_flat, sp.row_tbl, sp.src_tbl,
                                  sp.slot_tbl, sp.row_t, sp.src_t,
                                  sp.slot_t, sp.inv_slot)


def as_fused2(sp: FlatBlockSparseSupport,
              max_ring: int = 24) -> FlatBlockSparseSupport:
    """Upgrade a flat support to the fused order-2 kernel when its layout
    qualifies (banded under the node ordering; square blocks); returns
    the support unchanged otherwise — callers need no fallback logic."""
    from graph_wavenet_tpu.ops.pallas.block_diffusion import fused2_schedule

    if isinstance(sp, Fused2FlatSupport):
        return sp
    if sp.blocks_flat.shape[1] != sp.blocks_flat.shape[2]:
        return sp
    nb = int(np.asarray(sp.row_tbl)[-1]) + 1
    sched = fused2_schedule(np.asarray(sp.row_tbl), np.asarray(sp.src_tbl),
                            nb, max_ring=max_ring)
    if sched is None:
        return sp
    d, w = sched
    sched_t = fused2_schedule(np.asarray(sp.row_t), np.asarray(sp.src_t),
                              nb, max_ring=max_ring)
    dt, wt = sched_t if sched_t is not None else (0, 0)
    return Fused2FlatSupport(sp.blocks_flat, sp.row_tbl, sp.src_tbl,
                             sp.slot_tbl, sp.row_t, sp.src_t, sp.slot_t,
                             sp.inv_slot, delay=d, ring_w=w,
                             delay_t=dt, ring_w_t=wt)
