"""Node-dimension tensor parallelism for BLOCK-SPARSE diffusion supports.

Dense node-TP (``parallel.mesh.support_sharding``) is pure GSPMD: shard
the (N, N) support's rows and let the compiler insert the collectives.
That cannot work for the flat block-sparse supports — their hops are
Pallas kernels with data-dependent index maps the partitioner cannot see
through — so city-scale graphs (the workload block-sparse exists for,
BENCH_NOTES.md) were single-chip. This module is the ``shard_map``
counterpart, same design as ``parallel.halo`` for time-SP:

- every shard on the ``model`` axis owns a contiguous range of
  DESTINATION block-rows (contiguous is what the RCM/Hilbert orderings
  in ``graphs.ordering`` optimize for) and the live blocks targeting
  them;
- forward: ``all_gather`` the node-sharded activations over ICI (the
  same collective GSPMD inserts for dense row-sharded supports), then
  run the LOCAL flat kernel (``ops.pallas.block_diffusion.
  gathered_block_mix_flat``) — output is born node-sharded;
- backward dx: the same pattern over a SOURCE-partitioned copy of the
  blocks with the transposed tables (scatter-free, like single-chip);
- backward dblocks — two forms:
  * :class:`ShardedFlatSupport` (default): BOTH partitioned copies get
    zero cotangents. The weights are fixed-graph supports (the
    city-scale norm); do not put one on the parameter path.
  * :class:`TrainableShardedFlatSupport` (``shard_flat_support(...,
    trainable=True)``): the single GLOBAL ``blocks`` array is the leaf;
    both partitioned copies are derived from it per mix by static
    gathers, and the dest copy's cotangent (computed exactly per shard
    from the gathered activations — each live block lives on exactly
    one dest shard, so no psum is needed) scatters back through the
    gather's VJP. The source copy's cotangent is zero BY CONSTRUCTION
    (the forward output is a function of the dest copy only; the source
    copy appears only in the dx rule), so the global gradient is exact
    and a sharded train step matches the single-chip trainable-support
    step. This is also what the block-masked adaptive adjacency rides
    under node-TP (:func:`shard_adaptive_mask`).

Per-shard tables are stacked with a leading shard axis and padded to the
max per-shard length with dummy zero-block entries (they contribute
nothing — same trick as the single-chip flat form's empty-row dummies).

Sharded supports are duck-typed like every other support: they carry
``mix_2d`` and drop into ``ops.diffusion.gcn_apply``'s all-sparse fast
path unchanged, so the whole mesh-aware train step works by passing
``shard_flat_support(flat, mesh)`` instead of ``flat``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from graph_wavenet_tpu.ops.block_sparse import (
    FlatBlockSparseSupport,
    _interpret,
)
from graph_wavenet_tpu.parallel.mesh import MODEL


def _extract_live(flat: FlatBlockSparseSupport):
    """(row, src, blocks) of the live entries, storage order."""
    row = np.asarray(flat.row_tbl, np.int64)
    src = np.asarray(flat.src_tbl, np.int64)
    slot = np.asarray(flat.slot_tbl, np.int64)
    blocks = np.asarray(flat.blocks_flat)
    n_live = blocks.shape[0] - 1
    live = slot < n_live
    order = np.argsort(slot[live], kind="stable")
    return (row[live][order], src[live][order], blocks[:n_live])


def _partition(row, src, blocks, n_shards: int, nb_local: int, bs_a: int,
               bs_b: int):
    """Partition live entries by ``row // nb_local``; localize rows; pad
    every shard to the same (max) table length with zero-block dummies and
    guarantee every local row appears. Returns stacked arrays with a
    leading shard axis:

    (blocks, rows, srcs, slots, glob, inv) where ``glob (S, Lmax+1)``
    maps each shard-local block-storage slot to its GLOBAL storage slot
    (sentinel slots -> n_live_global, the global zero block) and ``inv
    (S, Lmax+1)`` gives the table position of each local live slot
    (sentinel -> table length, a zero pad row) — the two tables the
    trainable path's exact weight cotangent needs."""
    per_rows, per_srcs, per_slots, per_blocks = [], [], [], []
    per_glob, per_inv = [], []
    n_live_global = len(row)
    max_live = 0
    shards = []
    for s in range(n_shards):
        sel = (row // nb_local) == s
        r = row[sel] - s * nb_local
        sc = src[sel]
        b = blocks[sel]
        gids = np.nonzero(sel)[0]                 # global slot per local
        # local dummy coverage for empty local dest rows; dummy sources
        # point at the shard's OWN first row (the zero block makes the
        # value irrelevant, and halo mode needs in-range sources)
        empty = np.setdiff1d(np.arange(nb_local), r)
        n_live = len(r)
        rr = np.concatenate([r, empty])
        ss = np.concatenate([sc, np.full(len(empty), s * nb_local,
                                         np.int64)])
        sl = np.concatenate([np.arange(n_live, dtype=np.int64),
                             np.full(len(empty), -1, np.int64)])  # -1 = zero
        order = np.argsort(rr, kind="stable")
        shards.append((rr[order], ss[order], sl[order], b, n_live, gids))
        max_live = max(max_live, n_live)
    max_tbl = max(len(s[0]) for s in shards)
    for shard_id, (rr, ss, sl, b, n_live, gids) in enumerate(shards):
        pad_t = max_tbl - len(rr)
        # pad tables with dummies on the LAST local row (rows stay sorted)
        rr = np.concatenate([rr, np.full(pad_t, nb_local - 1, np.int64)])
        ss = np.concatenate([ss, np.full(pad_t, shard_id * nb_local,
                                         np.int64)])
        sl = np.concatenate([sl, np.full(pad_t, -1, np.int64)])
        sl = np.where(sl < 0, max_live, sl)       # sentinel -> zero block
        order = np.argsort(rr, kind="stable")
        rr, ss, sl = rr[order], ss[order], sl[order]
        per_rows.append(rr)
        per_srcs.append(ss)
        per_slots.append(sl)
        bpad = np.zeros((max_live + 1, bs_a, bs_b), np.float32)
        bpad[:b.shape[0]] = b
        per_blocks.append(bpad)
        glob = np.full(max_live + 1, n_live_global, np.int64)
        glob[:n_live] = gids
        per_glob.append(glob)
        inv = np.full(max_live + 1, len(sl), np.int64)
        live_pos = np.nonzero(sl < max_live)[0]
        inv[sl[live_pos]] = live_pos
        per_inv.append(inv)
    as_i32 = lambda a: jnp.asarray(np.stack(a), jnp.int32)
    return (jnp.asarray(np.stack(per_blocks)), as_i32(per_rows),
            as_i32(per_srcs), as_i32(per_slots), as_i32(per_glob),
            as_i32(per_inv))


@jax.tree_util.register_dataclass
@dataclass
class ShardedFlatSupport:
    """Node-TP flat block-sparse support (see module docstring).

    All table/block fields carry a leading shard axis (sharded over the
    ``model`` mesh axis inside ``mix_2d``'s shard_map)."""

    blocks_f: jnp.ndarray   # (S, Lf+1, BS, BS) dest-partitioned
    row_f: jnp.ndarray      # (S, Ltf) LOCAL dest block-row, sorted
    src_f: jnp.ndarray      # (S, Ltf) GLOBAL source x block-row
    slot_f: jnp.ndarray     # (S, Ltf)
    blocks_b: jnp.ndarray   # (S, Lb+1, BS, BS) source-partitioned (dx)
    row_b: jnp.ndarray      # (S, Ltb) LOCAL x block-row, sorted
    src_b: jnp.ndarray      # (S, Ltb) GLOBAL dest block-row
    slot_b: jnp.ndarray     # (S, Ltb)
    mesh: Mesh = field(metadata=dict(static=True))
    axis: str = field(metadata=dict(static=True))
    # halo mode: sources fit in {s-1, s, s+1} for every shard (what the
    # RCM/Hilbert orderings produce) -> two (N/S, R) neighbor ppermutes
    # replace the (N, R) all_gather, cutting received off-chip bytes
    # (S-1)/2-fold per hop — pinned as a compiled-HLO fact in
    # tests/test_sparse_tp.py::test_halo_traffic_pinned_in_hlo. When True
    # the src tables are pre-remapped into the [prev | own | next] concat.
    halo: bool = field(metadata=dict(static=True))

    @property
    def block_size(self) -> int:
        return self.blocks_f.shape[2]

    @property
    def n_nodes(self) -> int:
        # S shards x local dest rows x block size (square supports)
        s = self.blocks_f.shape[0]
        nb_local = int(self.row_f[0][-1]) + 1
        return s * nb_local * self.block_size

    def mix_2d(self, x2: jnp.ndarray) -> jnp.ndarray:
        return _sharded_mix(self.mesh, self.axis, self.halo, x2,
                            self.blocks_f, self.row_f, self.src_f,
                            self.slot_f, self.blocks_b, self.row_b,
                            self.src_b, self.slot_b)


def _halo_eligible(src_stacked: jnp.ndarray, nb_local: int) -> bool:
    """True iff every shard's sources lie in shards {s-1, s, s+1}
    (no wrap) — the band structure RCM/Hilbert orderings produce."""
    src = np.asarray(src_stacked, np.int64) // nb_local   # (S, Lt) shards
    s_idx = np.arange(src.shape[0])[:, None]
    return bool(np.all(np.abs(src - s_idx) <= 1))


def _remap_halo(src_stacked: jnp.ndarray, nb_local: int) -> jnp.ndarray:
    """Global block-row ids -> indices into each shard's
    [prev | own | next] 3*nb_local concat: src - (s-1)*nb_local."""
    src = np.asarray(src_stacked, np.int64)
    s_idx = np.arange(src.shape[0])[:, None]
    return jnp.asarray(src - (s_idx - 1) * nb_local, jnp.int32)


def shard_flat_support(flat: FlatBlockSparseSupport, mesh: Mesh,
                       axis: str = MODEL, halo: bool | str = "auto",
                       trainable: bool = False):
    """Partition a flat block-sparse support over ``mesh``'s ``axis``
    (host-side). N's block-rows must divide evenly by the axis size.

    halo: "auto" (default) switches to the neighbor-ppermute exchange
    when every shard's sources fit in the adjacent shards (see the class
    docstring); True forces it (build-time assert), False forces the
    all_gather form.

    trainable: return a :class:`TrainableShardedFlatSupport` whose single
    global ``blocks`` array is a differentiable leaf with an EXACT
    gradient (see module docstring) — put ``.blocks`` on the parameter
    path and rebuild the support with ``dataclasses.replace`` inside the
    loss. Default False: fixed-graph weights, zero cotangents."""
    n_shards = mesh.shape[axis]
    bs_a, bs_b = flat.blocks_flat.shape[1], flat.blocks_flat.shape[2]
    assert bs_a == bs_b, (
        "node-TP sharding currently supports square blocks (the "
        "rectangular form's dest grouping would need lcm-aligned ranges)")
    row, src, blocks = _extract_live(flat)
    nb = int(np.asarray(flat.row_tbl)[-1]) + 1
    assert nb % n_shards == 0, (
        f"{nb} block-rows must divide by the {axis} axis size {n_shards}")
    nb_local = nb // n_shards
    blocks_f, row_f, src_f, slot_f, glob_f, inv_f = _partition(
        row, src, blocks, n_shards, nb_local, bs_a, bs_b)
    # source partition for dx: same entries keyed by src, contract dest
    blocks_b, row_b, src_b, slot_b, glob_b, _ = _partition(
        src, row, blocks, n_shards, nb_local, bs_a, bs_b)
    eligible = (n_shards >= 2 and _halo_eligible(src_f, nb_local)
                and _halo_eligible(src_b, nb_local))
    if halo is True and not eligible:
        raise ValueError(
            "halo=True but some shard draws sources beyond its adjacent "
            "shards; reorder the graph (graphs.ordering rcm/hilbert) or "
            "use halo=False")
    use_halo = eligible if halo == "auto" else bool(halo)
    if use_halo:
        src_f = _remap_halo(src_f, nb_local)
        src_b = _remap_halo(src_b, nb_local)
    if trainable:
        blocks_global = jnp.asarray(
            np.concatenate([blocks,
                            np.zeros((1, bs_a, bs_b), np.float32)]))
        return TrainableShardedFlatSupport(
            blocks_global, glob_f, row_f, src_f, slot_f, inv_f,
            glob_b, row_b, src_b, slot_b,
            mesh=mesh, axis=axis, halo=use_halo)
    return ShardedFlatSupport(blocks_f, row_f, src_f, slot_f,
                              blocks_b, row_b, src_b, slot_b,
                              mesh=mesh, axis=axis, halo=use_halo)


def _local_mix(blocks, row, src, slot, x_full, nb_local: int,
               transpose_lhs: bool):
    from graph_wavenet_tpu.ops.pallas.block_diffusion import (
        gathered_block_mix_flat,
    )

    return gathered_block_mix_flat(
        blocks.astype(x_full.dtype), slot, x_full, src, row, nb=nb_local,
        transpose_lhs=transpose_lhs, interpret=_interpret())


def _gathered(x_local, axis: str, halo: bool):
    """Inside shard_map: the rows visible to this shard's kernel —
    either the full all_gather or the [prev | own | next] halo concat
    (two neighbor ppermutes; wrap slots exist but remapped tables never
    reference out-of-band rows)."""
    if not halo:
        return jax.lax.all_gather(x_local, axis, axis=0, tiled=True)
    s = jax.lax.axis_size(axis)
    prev = jax.lax.ppermute(
        x_local, axis, perm=[(i, (i + 1) % s) for i in range(s)])
    nxt = jax.lax.ppermute(
        x_local, axis, perm=[(i, (i - 1) % s) for i in range(s)])
    return jnp.concatenate([prev, x_local, nxt], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _sharded_mix(mesh, axis, halo, x2, blocks_f, row_f, src_f, slot_f,
                 blocks_b, row_b, src_b, slot_b):
    """(N, R) -> (N, R), N sharded over ``axis``; see module docstring.

    Sparse support WEIGHTS get zero cotangents here — BOTH partitioned
    copies (fixed-graph supports are the city-scale norm). Do not put a
    ShardedFlatSupport on the parameter path; to train sharded support
    weights use ``shard_flat_support(..., trainable=True)``
    (:func:`_sharded_mix_train`, exact global gradient).
    """
    bs = blocks_f.shape[3]
    n, r = x2.shape
    nb_local = n // bs // mesh.shape[axis]
    spec_t = P(axis)        # per-shard tables/blocks by leading axis

    def fwd(x_local, bf, rf, sf, lf):
        xb = _gathered(x_local, axis, halo).reshape(-1, bs, r)
        out = _local_mix(bf[0], rf[0], sf[0], lf[0], xb,
                         nb_local=nb_local, transpose_lhs=True)
        return out.reshape(-1, r)

    # check_vma off: the Pallas calls inside don't declare varying-axis
    # info; correctness is pinned by the exactness tests instead
    return jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(axis, None), spec_t, spec_t, spec_t, spec_t),
        out_specs=P(axis, None),
        check_vma=False)(x2, blocks_f, row_f, src_f, slot_f)


def _sharded_mix_fwd(mesh, axis, halo, x2, blocks_f, row_f, src_f,
                     slot_f, blocks_b, row_b, src_b, slot_b):
    out = _sharded_mix(mesh, axis, halo, x2, blocks_f, row_f, src_f,
                       slot_f, blocks_b, row_b, src_b, slot_b)
    return out, (x2, blocks_f, row_f, src_f, slot_f, blocks_b, row_b,
                 src_b, slot_b)


def _sharded_mix_bwd(mesh, axis, halo, res, gout):
    (x2, blocks_f, row_f, src_f, slot_f, blocks_b, row_b, src_b,
     slot_b) = res
    bs = blocks_f.shape[3]
    n, r = x2.shape
    nb_local = n // bs // mesh.shape[axis]
    spec_t = P(axis)
    gout = gout.astype(x2.dtype)

    def bwd(g_local, bb, rb, sb, lb):
        # dx over the SOURCE partition: contract the blocks' dest axis
        gb = _gathered(g_local, axis, halo).reshape(-1, bs, r)
        dx = _local_mix(bb[0], rb[0], sb[0], lb[0], gb, nb_local=nb_local,
                        transpose_lhs=False)
        return dx.reshape(-1, r)

    dx = jax.shard_map(
        bwd, mesh=mesh,
        in_specs=(P(axis, None), spec_t, spec_t, spec_t, spec_t),
        out_specs=P(axis, None),
        check_vma=False)(gout, blocks_b, row_b, src_b, slot_b)
    zi = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dx.astype(x2.dtype), jnp.zeros_like(blocks_f), zi(row_f),
            zi(src_f), zi(slot_f), jnp.zeros_like(blocks_b), zi(row_b),
            zi(src_b), zi(slot_b))


_sharded_mix.defvjp(_sharded_mix_fwd, _sharded_mix_bwd)


# ---------------------------------------------------------------------------
# Trainable variant: one global blocks leaf, exact weight gradient
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass
class TrainableShardedFlatSupport:
    """Node-TP flat support whose weights are TRAINABLE (module
    docstring). ``blocks (L+1, BS, BS)`` is the single global storage
    (trailing zero block); both partitioned copies are derived views
    gathered per mix via ``glob_f`` / ``glob_b``, so ``blocks`` is the
    one differentiable leaf and its gradient is exact."""

    blocks: jnp.ndarray     # (L+1, BS, BS) global storage, [L] = zero
    glob_f: jnp.ndarray     # (S, Lf+1) local slot -> global slot
    row_f: jnp.ndarray
    src_f: jnp.ndarray
    slot_f: jnp.ndarray
    inv_f: jnp.ndarray      # (S, Lf+1) local slot -> fwd-table position
    glob_b: jnp.ndarray
    row_b: jnp.ndarray
    src_b: jnp.ndarray
    slot_b: jnp.ndarray
    mesh: Mesh = field(metadata=dict(static=True))
    axis: str = field(metadata=dict(static=True))
    halo: bool = field(metadata=dict(static=True))

    @property
    def block_size(self) -> int:
        return self.blocks.shape[1]

    @property
    def n_nodes(self) -> int:
        s = self.row_f.shape[0]
        nb_local = int(self.row_f[0][-1]) + 1
        return s * nb_local * self.block_size

    def mix_2d(self, x2: jnp.ndarray) -> jnp.ndarray:
        # derived per-shard copies: static gathers whose VJP scatter-adds
        # the dest copy's exact cotangent back into the global storage
        # (each global live slot appears on exactly one dest shard; the
        # sentinel slots hit the zero block at [L], whose cotangent rows
        # are pinned to zero by inv_f)
        blocks_f = jnp.take(self.blocks, self.glob_f, axis=0)
        blocks_b = jnp.take(self.blocks, self.glob_b, axis=0)
        return _sharded_mix_train(
            self.mesh, self.axis, self.halo, x2, blocks_f, blocks_b,
            self.row_f, self.src_f, self.slot_f, self.inv_f,
            self.row_b, self.src_b, self.slot_b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _sharded_mix_train(mesh, axis, halo, x2, blocks_f, blocks_b, row_f,
                       src_f, slot_f, inv_f, row_b, src_b, slot_b):
    """(N, R) -> (N, R), N sharded over ``axis`` — same forward as
    ``_sharded_mix`` but with an EXACT cotangent for the dest-partitioned
    ``blocks_f`` (each live block lives on exactly one dest shard, so the
    per-shard weight cotangent needs no psum). ``blocks_b`` is a derived
    view used only by the dx rule: the output is not a function of it, so
    its cotangent is zero by construction and the global gradient
    assembled through the callers' gathers is exact."""
    bs = blocks_f.shape[3]
    n, r = x2.shape
    nb_local = n // bs // mesh.shape[axis]
    spec_t = P(axis)

    def fwd(x_local, bf, rf, sf, lf):
        xb = _gathered(x_local, axis, halo).reshape(-1, bs, r)
        out = _local_mix(bf[0], rf[0], sf[0], lf[0], xb,
                         nb_local=nb_local, transpose_lhs=True)
        return out.reshape(-1, r)

    return jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(axis, None), spec_t, spec_t, spec_t, spec_t),
        out_specs=P(axis, None),
        check_vma=False)(x2, blocks_f, row_f, src_f, slot_f)


def _sharded_mix_train_fwd(mesh, axis, halo, x2, blocks_f, blocks_b,
                           row_f, src_f, slot_f, inv_f, row_b, src_b,
                           slot_b):
    out = _sharded_mix_train(mesh, axis, halo, x2, blocks_f, blocks_b,
                             row_f, src_f, slot_f, inv_f, row_b, src_b,
                             slot_b)
    return out, (x2, blocks_f, blocks_b, row_f, src_f, slot_f, inv_f,
                 row_b, src_b, slot_b)


def _sharded_mix_train_bwd(mesh, axis, halo, res, gout):
    from graph_wavenet_tpu.ops.linear import accum_dtype
    from graph_wavenet_tpu.ops.pallas.block_diffusion import (
        gathered_block_outer_flat,
    )

    (x2, blocks_f, blocks_b, row_f, src_f, slot_f, inv_f, row_b, src_b,
     slot_b) = res
    bs = blocks_f.shape[3]
    n, r = x2.shape
    nb_local = n // bs // mesh.shape[axis]
    spec_t = P(axis)
    gout = gout.astype(x2.dtype)

    def bwd_x(g_local, bb, rb, sb, lb):
        gb = _gathered(g_local, axis, halo).reshape(-1, bs, r)
        dx = _local_mix(bb[0], rb[0], sb[0], lb[0], gb, nb_local=nb_local,
                        transpose_lhs=False)
        return dx.reshape(-1, r)

    dx = jax.shard_map(
        bwd_x, mesh=mesh,
        in_specs=(P(axis, None), spec_t, spec_t, spec_t, spec_t),
        out_specs=P(axis, None),
        check_vma=False)(gout, blocks_b, row_b, src_b, slot_b)

    def bwd_w(x_local, g_local, rf, sf, invf):
        # per-forward-table-entry outer products from the gathered x and
        # this shard's local gout rows, then a static gather (inv_f) back
        # to local slot order — dummy entries' garbage cotangents land in
        # the appended zero row, pinning the local zero block's grad to 0
        # (the same scatter-free construction as the single-chip flat
        # backward, ops/block_sparse.py:_block_mix_flat_bwd)
        xg = _gathered(x_local, axis, halo).reshape(-1, bs, r)
        gb = g_local.reshape(nb_local, bs, r)
        dflat = gathered_block_outer_flat(
            xg, gb, sf[0], rf[0], out_dtype=accum_dtype(x2.dtype),
            interpret=_interpret())
        dflat_pad = jnp.concatenate(
            [dflat, jnp.zeros((1, bs, bs), dflat.dtype)])
        return jnp.take(dflat_pad, invf[0], axis=0)[None]

    dblocks_f = jax.shard_map(
        bwd_w, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), spec_t, spec_t, spec_t),
        out_specs=spec_t,
        check_vma=False)(x2, gout, row_f, src_f, inv_f)
    zi = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dx.astype(x2.dtype), dblocks_f.astype(blocks_f.dtype),
            jnp.zeros_like(blocks_b), zi(row_f), zi(src_f), zi(slot_f),
            zi(inv_f), zi(row_b), zi(src_b), zi(slot_b))


_sharded_mix_train.defvjp(_sharded_mix_train_fwd, _sharded_mix_train_bwd)


# ---------------------------------------------------------------------------
# Sharded block-masked adaptive adjacency
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass
class ShardedBlockAdaptiveMask:
    """Node-TP counterpart of :class:`ops.adaptive_block.
    BlockAdaptiveMask`: ``materialize(nv1, nv2)`` returns a
    :class:`TrainableShardedFlatSupport` whose global blocks are the
    block-masked adaptive adjacency, so nodevec gradients flow through
    the exact sharded weight cotangent. The materialization itself
    (O(live blocks * BS^2) segment softmax) runs replicated — it is tiny
    next to one diffusion hop over batched activations."""

    inner: object           # BlockAdaptiveMask (pytree of static tables)
    template: TrainableShardedFlatSupport   # blocks = (1, BS, BS) dummy
    adaptive_mask = True    # duck-type marker used by models.gwnet

    @property
    def n_live(self):
        return self.inner.n_live

    def materialize(self, nodevec1, nodevec2, out_dtype=None):
        import dataclasses

        from graph_wavenet_tpu.ops.adaptive_block import adaptive_blocks

        blocks = adaptive_blocks(self.inner, nodevec1, nodevec2)
        if out_dtype is not None:
            # exit-cast, same semantics as BlockAdaptiveMask.materialize
            blocks = blocks.astype(out_dtype)
        blocks_flat = jnp.concatenate(
            [blocks, jnp.zeros((1, self.inner.bs_src, self.inner.bs_dst),
                               blocks.dtype)])
        return dataclasses.replace(self.template, blocks=blocks_flat)


def shard_adaptive_mask(mask, mesh: Mesh, axis: str = MODEL,
                        halo: bool | str = "auto"
                        ) -> ShardedBlockAdaptiveMask:
    """Partition a :class:`BlockAdaptiveMask`'s live pattern over the
    mesh (host-side); pass the result in the supports list exactly like
    the single-chip mask. The partition tables are built once from a
    unit-weight template support on the mask's pattern.

    NB: unlike a fixed support, the materialized blocks change every
    forward — storage-order alignment between the mask's ``live_*``
    arrays and the template tables is what makes the derived-copy
    gathers pick the right live block."""
    dummy = mask.materialize(
        jnp.ones((mask.n_nodes, 1), jnp.float32),
        jnp.ones((1, mask.n_nodes), jnp.float32))
    sharded = shard_flat_support(dummy, mesh, axis=axis, halo=halo,
                                 trainable=True)
    import dataclasses

    template = dataclasses.replace(
        sharded, blocks=jnp.zeros((1, mask.bs_src, mask.bs_dst),
                                  jnp.float32))
    return ShardedBlockAdaptiveMask(inner=mask, template=template)
