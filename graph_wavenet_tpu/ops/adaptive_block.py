"""Block-masked adaptive adjacency — the learned graph at city scale.

The reference's signature learned feature appends ``adp =
softmax(relu(nodevec1 @ nodevec2), dim=1)`` to the supports every forward
(`/root/reference/model.py:117-127,184-189`). That materializes an (N, N)
dense matrix — 6.7 GB at 41k nodes — so until this module every at-scale
configuration had to switch the adaptive graph off.

Here the adaptive adjacency is computed ONLY on the live blocks of a flat
block-sparse mask (:class:`BlockAdaptiveMask`, usually the union of the
fixed supports' live patterns):

- gather the per-block nodevec tiles: ``E1[src-block] (BS, r)`` and
  ``E2[:, dst-block] (r, BS)`` per live block;
- per-block logits ``relu(E1_tile @ E2_tile)`` — (L, BS, BS) total, the
  same O(live blocks) compute class as one diffusion hop;
- ROW-softmax over the live entries of each global source row, via
  segment reductions keyed by source block-row (the reference's ``dim=1``:
  each source row's outgoing weights normalize over destinations,
  `ops/adaptive.py:adaptive_adjacency`).

Where the mask covers every block (small N), this equals the dense
adaptive adjacency EXACTLY — including the relu zeros' exp(0)=1
contributions, because a full mask makes every destination live. Under a
partial mask it is the masked softmax over the representable edge set:
the learned graph constrained to the sparsity pattern the model's
diffusion can use.

The materialized support is an ordinary :class:`FlatBlockSparseSupport`,
so it drops into ``gcn_apply``'s all-sparse fast path and its Pallas hop
kernels unchanged; gradients flow to the nodevecs through the flat mix's
exact ``dblocks`` cotangent (`ops/block_sparse.py:_block_mix_flat_bwd`)
and then through the materialization by ordinary autodiff.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from graph_wavenet_tpu.ops.block_sparse import (
    BlockSparseSupport,
    FlatBlockSparseSupport,
    from_edges_flat,
)
from graph_wavenet_tpu.ops.linear import accum_dtype


@jax.tree_util.register_dataclass
@dataclass
class BlockAdaptiveMask:
    """Static live-block pattern + tables for a materializable adaptive
    support. Carries every table of the :class:`FlatBlockSparseSupport`
    it materializes (block values are the only thing computed per
    forward) plus the storage-order live-block coordinates the
    materialization gathers nodevec tiles with.

    Not a support itself — it has no ``mix_2d``; passing it to the model
    without ``addaptadj`` is an error the model raises on.
    """

    # duck-type marker checked by models.gwnet (also set on the node-TP
    # counterpart, parallel.sparse_tp.ShardedBlockAdaptiveMask)
    adaptive_mask = True

    # FlatBlockSparseSupport tables for the materialized support
    row_tbl: jnp.ndarray
    src_tbl: jnp.ndarray
    slot_tbl: jnp.ndarray
    row_t: jnp.ndarray
    src_t: jnp.ndarray
    slot_t: jnp.ndarray
    inv_slot: jnp.ndarray
    # storage-order live-block coordinates (slot i -> dst/src block-row)
    live_dst: jnp.ndarray   # (L,) int32
    live_src: jnp.ndarray   # (L,) int32
    bs_src: int = field(metadata=dict(static=True))
    bs_dst: int = field(metadata=dict(static=True))
    n_src_blocks: int = field(metadata=dict(static=True))
    n_dst_blocks: int = field(metadata=dict(static=True))
    # (delay, ring_w, delay_t, ring_w_t) when the pattern qualifies for
    # the fused order-2 hop-chain kernel (ops.block_sparse.
    # Fused2FlatSupport; the _t pair covers the fused backward transpose
    # chain, 0 = bwd falls back) — banded layouts under RCM orderings;
    # None = plain chained hops
    fuse2: tuple | None = field(metadata=dict(static=True), default=None)

    @property
    def n_live(self) -> int:
        return self.live_dst.shape[0]

    @property
    def n_nodes(self) -> int:
        return self.n_src_blocks * self.bs_src

    def materialize(self, nodevec1: jnp.ndarray, nodevec2: jnp.ndarray,
                    out_dtype=None) -> FlatBlockSparseSupport:
        """Adaptive support for the current embeddings; differentiable in
        both nodevecs. nodevec1 (N, r), nodevec2 (r, N). When the
        pattern qualifies (``fuse2``), the result runs the fused order-2
        hop-chain kernel like the fixed supports.

        ``out_dtype``: storage dtype of the materialized blocks. The
        softmax always runs in the nodevec dtype (fp32 params) with fp32
        accumulation; casting at the exit is exactly the cast the mix op
        would apply per use, so under bf16 activations the forward is
        bitwise unchanged while the resident support halves (gradients
        round to bf16 one cast earlier — mixed-precision path only)."""
        from graph_wavenet_tpu.ops.block_sparse import Fused2FlatSupport

        blocks = adaptive_blocks(self, nodevec1, nodevec2)
        if out_dtype is not None:
            blocks = blocks.astype(out_dtype)
        blocks_flat = jnp.concatenate(
            [blocks, jnp.zeros((1, self.bs_src, self.bs_dst),
                               blocks.dtype)])
        tables = (blocks_flat, self.row_tbl, self.src_tbl, self.slot_tbl,
                  self.row_t, self.src_t, self.slot_t, self.inv_slot)
        if self.fuse2 is not None:
            d, w, dt, wt = self.fuse2
            return Fused2FlatSupport(*tables, delay=d, ring_w=w,
                                     delay_t=dt, ring_w_t=wt)
        return FlatBlockSparseSupport(*tables)


def adaptive_blocks(mask: BlockAdaptiveMask, nodevec1: jnp.ndarray,
                    nodevec2: jnp.ndarray) -> jnp.ndarray:
    """Live blocks (L, BS_src, BS_dst) of the block-masked adaptive
    adjacency (see module docstring). Row-softmax runs per GLOBAL source
    row over that row's live destinations via segment max/sum keyed by
    source block-row — static shapes, one pass, O(L * BS^2)."""
    r = nodevec1.shape[1]
    dt = nodevec1.dtype
    acc = accum_dtype(dt)
    e1 = nodevec1.reshape(mask.n_src_blocks, mask.bs_src, r)
    e1 = jnp.take(e1, mask.live_src, axis=0)            # (L, BS_s, r)
    e2 = jnp.transpose(nodevec2.reshape(r, mask.n_dst_blocks, mask.bs_dst),
                       (1, 0, 2))
    e2 = jnp.take(e2, mask.live_dst, axis=0)            # (L, r, BS_d)
    logits = jax.nn.relu(
        jnp.einsum("lkr,lrj->lkj", e1, e2,
                   preferred_element_type=acc))          # (L, BS_s, BS_d)
    seg = mask.live_src
    nbs = mask.n_src_blocks
    # per-source-row max over live destinations (stability shift only —
    # stop_gradient like jax.nn.softmax, the shift cancels analytically)
    row_max = jax.ops.segment_max(logits.max(axis=2), seg,
                                  num_segments=nbs)      # (nbs, BS_s)
    row_max = jax.lax.stop_gradient(
        jnp.where(jnp.isfinite(row_max), row_max, 0.0))
    ex = jnp.exp(logits - jnp.take(row_max, seg, axis=0)[:, :, None])
    row_sum = jax.ops.segment_sum(ex.sum(axis=2), seg,
                                  num_segments=nbs)      # (nbs, BS_s)
    return (ex / jnp.take(row_sum, seg, axis=0)[:, :, None]).astype(dt)


def _live_pairs(sp) -> tuple[np.ndarray, np.ndarray, int, int, int, int]:
    """(dst_block, src_block) live pairs + block geometry of a flat or
    padded block-sparse support (host-side)."""
    if isinstance(sp, FlatBlockSparseSupport):
        slot = np.asarray(sp.slot_tbl, np.int64)
        n_live = sp.blocks_flat.shape[0] - 1
        live = slot < n_live
        dst = np.asarray(sp.row_tbl, np.int64)[live]
        src = np.asarray(sp.src_tbl, np.int64)[live]
        bs_s, bs_d = sp.blocks_flat.shape[1], sp.blocks_flat.shape[2]
        nbs = int(np.asarray(sp.row_t)[-1]) + 1
        nbd = int(np.asarray(sp.row_tbl)[-1]) + 1
        return dst, src, bs_s, bs_d, nbs, nbd
    if isinstance(sp, BlockSparseSupport):
        bidx = np.asarray(sp.block_idx, np.int64)
        nb = bidx.shape[0]
        dst, m = np.nonzero(bidx < nb)
        src = bidx[dst, m]
        bs = sp.block_size
        return dst, src, bs, bs, nb, nb
    raise TypeError(
        f"cannot derive a block mask from {type(sp).__name__}; pass flat "
        "or padded block-sparse supports")


def widen_block_pairs(dst_block, src_block, n_blocks: int,
                      hops: int) -> tuple[np.ndarray, np.ndarray]:
    """K-hop closure of a block pattern: pair (d, s) is live iff a path
    of <= ``hops`` pattern edges connects source block s to destination
    block d. Host-side boolean matrix powers — n_blocks is N/128, so even
    163k nodes is a (1280, 1280) bool product."""
    if hops <= 1:
        return np.asarray(dst_block, np.int64), np.asarray(src_block,
                                                           np.int64)
    P = np.zeros((n_blocks, n_blocks), np.bool_)
    P[np.asarray(dst_block, np.int64), np.asarray(src_block, np.int64)] \
        = True
    acc, cur = P.copy(), P
    for _ in range(hops - 1):
        # (P_cur @ P)[d, s] = exists m: d <- m and m <- s
        cur = (cur.astype(np.uint8) @ P.astype(np.uint8)) > 0
        acc |= cur
    d, s = np.nonzero(acc)
    return d.astype(np.int64), s.astype(np.int64)


def mask_from_supports(supports: list, add_diagonal: bool = True,
                       hops: int = 1) -> BlockAdaptiveMask:
    """Build the adaptive mask as the UNION of the given block-sparse
    supports' live patterns (host-side).

    The union is the natural choice: the fixed supports' pattern is where
    the diffusion already reads/writes, so the adaptive graph adds no new
    HBM traffic class — hop cost grows by one support, exactly like the
    reference's ``new_supports = supports + [adp]``
    (`/root/reference/model.py:184-189`).

    add_diagonal: also include every (d, d) diagonal block — self-edges
    are the one structurally-load-bearing pattern a transition-matrix
    union can miss, and the learned graph plausibly wants them.

    hops: mask-widening knob (the fidelity dial between the union mask
    and the reference's unconstrained dense softmax): hops=k makes every
    block pair reachable within k pattern edges live, so the learned
    graph can place weight on k-hop-neighborhood edges the fixed
    supports never carry directly. Cost grows with the widened pattern's
    live-block count (reported by ``mask.n_live``); measured at city
    scale in BENCH_NOTES.md round-4.
    """
    assert supports, "mask_from_supports needs at least one support"
    geom = None
    all_dst, all_src = [], []
    for sp in supports:
        dst, src, bs_s, bs_d, nbs, nbd = _live_pairs(sp)
        if geom is None:
            geom = (bs_s, bs_d, nbs, nbd)
        else:
            assert geom == (bs_s, bs_d, nbs, nbd), (
                "all supports must share block geometry: "
                f"{geom} vs {(bs_s, bs_d, nbs, nbd)}")
        all_dst.append(dst)
        all_src.append(src)
    bs_s, bs_d, nbs, nbd = geom
    assert bs_s == bs_d, (
        "the adaptive mask needs square blocks (rectangular dest grouping "
        "would softmax over lcm-aligned source ranges); build fixed "
        "supports with form='flat' rather than 'flat-rect' when training "
        "the adaptive adjacency")
    if add_diagonal:
        diag = np.arange(min(nbs, nbd), dtype=np.int64)
        all_dst.append(diag)
        all_src.append(diag)
    dst = np.concatenate(all_dst)
    src = np.concatenate(all_src)
    dst, src = widen_block_pairs(dst, src, max(nbs, nbd), hops)
    return mask_from_pairs(dst, src, bs_s, nbs)


def mask_from_pairs(dst_block: np.ndarray, src_block: np.ndarray,
                    block_size: int, n_blocks: int) -> BlockAdaptiveMask:
    """Mask from explicit (dst, src) block pairs (duplicates collapse).
    ``n_blocks`` is the square block-grid side (N = n_blocks *
    block_size)."""
    pair = np.unique(np.asarray(dst_block, np.int64) * n_blocks
                     + np.asarray(src_block, np.int64))
    dst, src = pair // n_blocks, pair % n_blocks
    # one unit edge per live pair reuses from_edges_flat's table builder;
    # the storage order (dest-major unique pairs) is recomputed below the
    # same way, so live_dst/live_src line up with the slots
    tmpl = from_edges_flat(src * block_size, dst * block_size,
                           np.ones(len(dst), np.float32),
                           n_blocks * block_size, block_size, block_size)
    from graph_wavenet_tpu.ops.pallas.block_diffusion import fused2_schedule

    fuse2 = fused2_schedule(np.asarray(tmpl.row_tbl),
                            np.asarray(tmpl.src_tbl), n_blocks)
    if fuse2 is not None:
        sched_t = fused2_schedule(np.asarray(tmpl.row_t),
                                  np.asarray(tmpl.src_t), n_blocks)
        fuse2 = fuse2 + (sched_t if sched_t is not None else (0, 0))
    return BlockAdaptiveMask(
        row_tbl=tmpl.row_tbl, src_tbl=tmpl.src_tbl, slot_tbl=tmpl.slot_tbl,
        row_t=tmpl.row_t, src_t=tmpl.src_t, slot_t=tmpl.slot_t,
        inv_slot=tmpl.inv_slot,
        live_dst=jnp.asarray(dst, jnp.int32),
        live_src=jnp.asarray(src, jnp.int32),
        bs_src=block_size, bs_dst=block_size,
        n_src_blocks=n_blocks, n_dst_blocks=n_blocks, fuse2=fuse2)


def full_mask(n_nodes: int, block_size: int = 128) -> BlockAdaptiveMask:
    """All-live mask: the materialized support equals the dense adaptive
    adjacency exactly (parity/testing; at scale use a sparse union)."""
    assert n_nodes % block_size == 0
    nb = n_nodes // block_size
    d, s = np.meshgrid(np.arange(nb), np.arange(nb), indexing="ij")
    return mask_from_pairs(d.reshape(-1), s.reshape(-1), block_size, nb)
