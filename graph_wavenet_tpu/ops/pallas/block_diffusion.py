"""Pallas block-sparse diffusion kernels: gathered block matmuls.

The XLA block-sparse hop (`ops.block_sparse._block_mix`) materializes the
gathered source blocks ``take(x_blocks, block_idx) -> (NB, MB, BS, R)``
before the contraction — at 41k nodes that is ~545 MB of HBM write + read
per hop that exists only to feed the einsum. These kernels delete it with
the canonical TPU sparse pattern: the block table is a **scalar-prefetch**
argument, and each grid step's ``BlockSpec`` index_map uses it to DMA the
right (BS, RT) source tile straight from HBM into VMEM — the gather never
exists as a tensor.

Per grid step: one (BS, BS) @ (BS, RT) MXU matmul accumulated in fp32
VMEM scratch over the MB nonzero blocks of a block-row; the out tile is
written once. HBM traffic per hop drops from ~3x the gathered volume to
1x read of the needed tiles + 1x write of the output.

Three uses, one kernel skeleton:
- forward mix:      out[i] = sum_m blocks[i,m]^T-contract x[block_idx[i,m]]
- backward dx:      dx[v]  = sum_t bflat[perm_t[v,t]] @ g[idx_t[v,t]]
  (the transpose table, same kernel with the other contraction side)
- backward dblocks: dW[i,m] = x[block_idx[i,m]] @ g[i]^T (contract R).

All shapes are native MXU tiles (BS = 128); works for fp32 and bf16
activations (blocks cast to the activation dtype, fp32 accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rt(r_pad: int) -> int:
    """Columns per grid step. Small grids win: per-step DMA/launch overhead
    dominates tiny tiles (measured: RT=128 runs 9 TFLOPS, whole-row 416 KB
    tiles ~3x faster), so take the whole padded row when it fits a VMEM
    budget of ~1 MB/tile and fall back to the largest aligned divisor."""
    cap = 4096                      # bf16: 1 MB per (128, RT) tile
    if r_pad <= cap:
        return r_pad
    # largest 128-multiple divisor <= cap (NOT just powers of two: e.g.
    # r_pad = 128*33 has divisor 128*11 — falling to RT=128 is the
    # measured 3x launch-bound cliff)
    for k in range(cap // 128, 1, -1):
        if r_pad % (k * 128) == 0:
            return k * 128
    return 128   # always divides (callers pad r to a 128 multiple)


def _mix_kernel(slot_ref, src_ref, blocks_ref, x_ref, o_ref, acc_ref, *,
                mb: int, transpose_lhs: bool):
    del slot_ref, src_ref  # consumed by the index maps
    m = pl.program_id(2)

    @pl.when(m == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dims = ((((0,), (0,)) if transpose_lhs else ((1,), (0,))), ((), ()))
    acc_ref[...] += jax.lax.dot_general(
        blocks_ref[0], x_ref[0], dimension_numbers=dims,
        preferred_element_type=jnp.float32)

    @pl.when(m == mb - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("transpose_lhs", "interpret"))
def gathered_block_mix(blocks_flat: jnp.ndarray, slot_tbl: jnp.ndarray,
                       x_pad: jnp.ndarray, src_tbl: jnp.ndarray,
                       *, transpose_lhs: bool,
                       interpret: bool = False) -> jnp.ndarray:
    """out (NB, BS, R): for each block-row i, accumulate over its MB slots
    ``blocks_flat[slot_tbl[i*MB+m]] (contract) x_pad[src_tbl[i*MB+m]]``.

    blocks_flat: (L, BS, BS) — include a zero block at a sentinel slot if
    the table pads. x_pad: (NBx, BS, R) — include the zero block-row
    sentinel. transpose_lhs: contract the block's FIRST axis with x's node
    axis (the ``nconv`` orientation); False contracts the second.
    """
    assert slot_tbl.ndim == 2 and src_tbl.shape == slot_tbl.shape, (
        "pass slot/src tables as (NB, MB)")
    nb, mb = src_tbl.shape
    bs = blocks_flat.shape[1]
    r = x_pad.shape[-1]
    slot_flat = slot_tbl.reshape(-1).astype(jnp.int32)
    src_flat = src_tbl.reshape(-1).astype(jnp.int32)

    pad_r = (-r) % 128
    if pad_r:
        x_pad = jnp.pad(x_pad, ((0, 0), (0, 0), (0, pad_r)))
    rp = r + pad_r
    rt = _pick_rt(rp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, rp // rt, mb),
        in_specs=[
            pl.BlockSpec((1, bs, bs),
                         lambda i, j, m, slot, src: (slot[i * mb + m], 0, 0)),
            pl.BlockSpec((1, bs, rt),
                         lambda i, j, m, slot, src: (src[i * mb + m], 0, j)),
        ],
        out_specs=pl.BlockSpec((1, bs, rt),
                               lambda i, j, m, slot, src: (i, 0, j)),
        scratch_shapes=[pltpu.VMEM((bs, rt), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_mix_kernel, mb=mb, transpose_lhs=transpose_lhs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, bs, rp), x_pad.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * mb * bs * bs * rp,
            bytes_accessed=(nb * mb * (bs * bs + bs * rt)
                            + nb * bs * rp) * x_pad.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(slot_flat, src_flat, blocks_flat, x_pad)
    return out[..., :r] if pad_r else out


# ---------------------------------------------------------------------------
# Flat (CSR-style) variants: grid over the LIVE block list
# ---------------------------------------------------------------------------
#
# The padded (NB, MB) table above runs NB * MB grid steps — MB is the MAX
# blocks per block-row, so skewed real graphs (spatial k-NN under RCM at
# 41k nodes: mean 7.6, max 11 per row) pay ~1.45x the live work in
# sentinel slots. The flat form stores the live blocks once, sorted by
# destination block-row, and the grid iterates exactly L = n_live steps:
# work is proportional to the MEAN, not the max. Consecutive grid steps
# that share a destination row revisit the same output tile (legal: the
# revisits are consecutive because the list is row-sorted) and accumulate
# in VMEM scratch; the row boundary tests read the prefetched row table.


def _mix_flat_kernel(row_ref, slot_ref, src_ref, blocks_ref, x_ref, o_ref,
                     acc_ref, *, n_live: int, transpose_lhs: bool):
    del slot_ref, src_ref  # consumed by the index maps
    ell = pl.program_id(1)
    row = row_ref[ell]

    @pl.when((ell == 0) | (row != row_ref[jnp.maximum(ell - 1, 0)]))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dims = ((((0,), (0,)) if transpose_lhs else ((1,), (0,))), ((), ()))
    acc_ref[...] += jax.lax.dot_general(
        blocks_ref[0], x_ref[0], dimension_numbers=dims,
        preferred_element_type=jnp.float32)

    @pl.when((ell == n_live - 1)
             | (row != row_ref[jnp.minimum(ell + 1, n_live - 1)]))
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("nb", "transpose_lhs", "interpret"))
def gathered_block_mix_flat(blocks_flat: jnp.ndarray, slot_tbl: jnp.ndarray,
                            x_pad: jnp.ndarray, src_tbl: jnp.ndarray,
                            row_tbl: jnp.ndarray, *, nb: int,
                            transpose_lhs: bool,
                            interpret: bool = False) -> jnp.ndarray:
    """out (nb, BSo, R): for each live entry l (row-sorted),
    ``blocks_flat[slot_tbl[l]] (contract) x_pad[src_tbl[l]]`` accumulated
    into block-row ``row_tbl[l]``.

    Blocks may be RECTANGULAR (BSc, BSo): the contracted axis must match
    ``x_pad``'s row size, the other becomes the output row size (under
    ``transpose_lhs`` the first axis contracts; else the second).
    Rectangular dest blocks amortize each x tile read over BSo
    destination rows — the bandwidth lever at city scale.

    Every block-row in [0, nb) MUST appear at least once in ``row_tbl``
    (callers insert a zero-block dummy for empty rows) or its output tile
    is left unwritten.
    """
    assert slot_tbl.ndim == 1 and src_tbl.shape == slot_tbl.shape \
        and row_tbl.shape == slot_tbl.shape, "flat tables must be (L,)"
    n_live = slot_tbl.shape[0]
    bs_a, bs_b = blocks_flat.shape[1], blocks_flat.shape[2]
    bs_x = bs_a if transpose_lhs else bs_b      # contracted (x) axis
    bs_o = bs_b if transpose_lhs else bs_a      # output rows
    assert x_pad.shape[1] == bs_x, (
        f"x rows {x_pad.shape[1]} must match the contracted block axis "
        f"{bs_x}")
    r = x_pad.shape[-1]
    slot_tbl = slot_tbl.astype(jnp.int32)
    src_tbl = src_tbl.astype(jnp.int32)
    row_tbl = row_tbl.astype(jnp.int32)

    pad_r = (-r) % 128
    if pad_r:
        x_pad = jnp.pad(x_pad, ((0, 0), (0, 0), (0, pad_r)))
    rp = r + pad_r
    rt = _pick_rt(rp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        # j OUTER so same-row steps stay consecutive per output tile
        grid=(rp // rt, n_live),
        in_specs=[
            pl.BlockSpec((1, bs_a, bs_b),
                         lambda j, l, row, slot, src: (slot[l], 0, 0)),
            pl.BlockSpec((1, bs_x, rt),
                         lambda j, l, row, slot, src: (src[l], 0, j)),
        ],
        out_specs=pl.BlockSpec((1, bs_o, rt),
                               lambda j, l, row, slot, src: (row[l], 0, j)),
        scratch_shapes=[pltpu.VMEM((bs_o, rt), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_mix_flat_kernel, n_live=n_live,
                          transpose_lhs=transpose_lhs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, bs_o, rp), x_pad.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_live * bs_a * bs_b * rp,
            bytes_accessed=(n_live * (bs_a * bs_b + bs_x * rt)
                            + nb * bs_o * rp) * x_pad.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(row_tbl, slot_tbl, src_tbl, blocks_flat, x_pad)
    return out[..., :r] if pad_r else out


def _dblocks_flat_kernel(row_ref, src_ref, x_ref, g_ref, o_ref, acc_ref, *,
                         nj: int):
    del row_ref, src_ref
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[0], g_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def gathered_block_outer_flat(x_pad: jnp.ndarray, g_blocks: jnp.ndarray,
                              src_tbl: jnp.ndarray, row_tbl: jnp.ndarray,
                              *, out_dtype,
                              interpret: bool = False) -> jnp.ndarray:
    """dblocks (L, BSx, BSg): per live entry l, contract the R axis of
    ``x_pad[src_tbl[l]]`` (BSx, R) with ``g_blocks[row_tbl[l]]``
    (BSg, R) — the flat-layout weight cotangent. Rectangular blocks
    (BSx != BSg) are supported."""
    n_live = src_tbl.shape[0]
    bs_x = x_pad.shape[1]
    bs_g = g_blocks.shape[1]
    r = x_pad.shape[-1]
    src_tbl = src_tbl.astype(jnp.int32)
    row_tbl = row_tbl.astype(jnp.int32)
    pad_r = (-r) % 128
    if pad_r:
        x_pad = jnp.pad(x_pad, ((0, 0), (0, 0), (0, pad_r)))
        g_blocks = jnp.pad(g_blocks, ((0, 0), (0, 0), (0, pad_r)))
    rp = r + pad_r
    rt = _pick_rt(rp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_live, rp // rt),
        in_specs=[
            pl.BlockSpec((1, bs_x, rt),
                         lambda l, j, row, src: (src[l], 0, j)),
            pl.BlockSpec((1, bs_g, rt),
                         lambda l, j, row, src: (row[l], 0, j)),
        ],
        out_specs=pl.BlockSpec((1, bs_x, bs_g),
                               lambda l, j, row, src: (l, 0, 0)),
        scratch_shapes=[pltpu.VMEM((bs_x, bs_g), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_dblocks_flat_kernel, nj=rp // rt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_live, bs_x, bs_g), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_live * bs_x * bs_g * rp,
            bytes_accessed=(n_live * (bs_x + bs_g) * rt
                            + n_live * bs_x * bs_g
                            ) * x_pad.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(row_tbl, src_tbl, x_pad, g_blocks)


def _dblocks_kernel(src_ref, x_ref, g_ref, o_ref, acc_ref, *, nj: int):
    del src_ref
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # dW[k, jnode] = sum_r x[k, r] * g[jnode, r]
    acc_ref[...] += jax.lax.dot_general(
        x_ref[0], g_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        o_ref[0, 0] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def gathered_block_outer(x_pad: jnp.ndarray, g_blocks: jnp.ndarray,
                         src_tbl: jnp.ndarray, *, out_dtype,
                         interpret: bool = False) -> jnp.ndarray:
    """dblocks (NB, MB, BS, BS): per (i, m), contract the R axis of
    ``x_pad[src_tbl[i, m]]`` (BS, R) with ``g_blocks[i]`` (BS, R)."""
    nb, mb = src_tbl.shape
    bs = x_pad.shape[1]
    r = x_pad.shape[-1]
    src_flat = src_tbl.reshape(-1).astype(jnp.int32)
    pad_r = (-r) % 128
    if pad_r:
        x_pad = jnp.pad(x_pad, ((0, 0), (0, 0), (0, pad_r)))
        g_blocks = jnp.pad(g_blocks, ((0, 0), (0, 0), (0, pad_r)))
    rp = r + pad_r
    rt = _pick_rt(rp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, mb, rp // rt),
        in_specs=[
            pl.BlockSpec((1, bs, rt),
                         lambda i, m, j, src: (src[i * mb + m], 0, j)),
            pl.BlockSpec((1, bs, rt), lambda i, m, j, src: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, 1, bs, bs),
                               lambda i, m, j, src: (i, m, 0, 0)),
        scratch_shapes=[pltpu.VMEM((bs, bs), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_dblocks_kernel, nj=rp // rt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, mb, bs, bs), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * mb * bs * bs * rp,
            bytes_accessed=(2 * nb * mb * bs * rt + nb * mb * bs * bs
                            ) * x_pad.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(src_flat, x_pad, g_blocks)


# ---------------------------------------------------------------------------
# Fused order-2 hop chain: both hops of one support in one kernel pass
# ---------------------------------------------------------------------------
#
# The gcn's diffusion order is 2 (`/root/reference/model.py:45-50`): each
# support runs x1 = A-mix(x), x2 = A-mix(x1). Run as two kernel calls the
# intermediate x1 costs one HBM write + one full gathered re-read — and
# the x-tile gathers are what the flat kernel is bound by at city scale
# (BENCH_NOTES round-2 floor accounting; ~136 MB per hop pair at 41k).
#
# This kernel deletes hop 2's HBM x reads: one pass over the row-sorted
# live-entry list does hop 1 as usual, parks each COMPLETED x1 block-row
# (cast to the activation dtype, exactly like the two-call chain) in a
# small VMEM ring, and runs hop 2 DELAYED by a host-computed entry count
# D chosen so every x1 row a hop-2 entry reads is complete before it
# runs. The ring width W is the max block-row span between a row's
# completion and its last hop-2 use — small exactly when the node
# ordering is banded (RCM/Hilbert, the same structure the node-TP halo
# exchange exploits); the host-side scheduler refuses wide-band layouts
# (callers fall back to the two-call chain).
#
# HBM traffic per hop pair: L x-tiles + 2L blocks + 2 out writes, vs the
# chain's 2L x-tiles + 2L blocks + 2 writes + 1 intermediate read — the
# hop-2 gather (the largest term when R >> BS) never exists.


def fused2_schedule(row_tbl, src_tbl, n_rows: int,
                    max_ring: int = 24) -> tuple[int, int] | None:
    """(delay D, ring width W) for the fused order-2 kernel, or None when
    the layout's band is too wide to ring-buffer (unordered graphs).

    D = max over entries m of comp[src[m]] - m + 1 where comp[s] is the
    last entry index of dest row s (every x1 row is complete D entries
    before any hop-2 read of it). W = max over m of
    row[min(m + D, L-1)] - src[m] + 1 (no ring slot is overwritten
    between a row's completion and its last read)."""
    import numpy as np

    row = np.asarray(row_tbl, np.int64)
    src = np.asarray(src_tbl, np.int64)
    n_live = len(row)
    comp = np.zeros(n_rows, np.int64)
    comp[row] = np.arange(n_live)        # row-sorted: last index wins
    d = int((comp[src] - np.arange(n_live)).max()) + 1
    d = max(d, 1)
    w = int((row[np.minimum(np.arange(n_live) + d, n_live - 1)]
             - src).max()) + 1
    if w < 1 or w > max_ring:
        return None
    return d, w


def _mix_flat2_kernel(row_ref, slot_ref, src_ref, blocks1_ref, x_ref,
                      blocks2_ref, *refs, n_live: int, delay: int,
                      ring_w: int, transpose_lhs: bool, with_add: bool):
    if with_add:
        # additive hop-1 epilogue (the backward transpose chain's
        # ``g1 + mixT(g2)``): one extra streamed input tile per hop-1 row
        add_ref, o1_ref, o2_ref, acc1_ref, acc2_ref, ring_ref = refs
    else:
        add_ref = None
        o1_ref, o2_ref, acc1_ref, acc2_ref, ring_ref = refs
    l = pl.program_id(1)
    dims = ((((0,), (0,)) if transpose_lhs else ((1,), (0,))), ((), ()))

    @pl.when(l < n_live)
    def _hop1():
        lc = jnp.minimum(l, n_live - 1)
        row = row_ref[lc]

        @pl.when((l == 0) | (row != row_ref[jnp.maximum(l - 1, 0)]))
        def _():
            acc1_ref[...] = jnp.zeros_like(acc1_ref)

        acc1_ref[...] += jax.lax.dot_general(
            blocks1_ref[0], x_ref[0], dimension_numbers=dims,
            preferred_element_type=jnp.float32)

        @pl.when((l == n_live - 1)
                 | (row != row_ref[jnp.minimum(l + 1, n_live - 1)]))
        def _():
            # cast at row completion = the two-call chain's inter-hop
            # cast (mix_2d returns the activation dtype) — bit-identical;
            # the additive term lands AFTER the cast, matching the
            # chain's dtype-space ``g1 + mixT(g2)`` elementwise add
            val = acc1_ref[...].astype(o1_ref.dtype)
            if with_add:
                val = val + add_ref[0]
            o1_ref[0] = val
            ring_ref[row % ring_w] = val

    @pl.when(l >= delay)
    def _hop2():
        m = jnp.maximum(l - delay, 0)
        row2 = row_ref[m]

        @pl.when((m == 0) | (row2 != row_ref[jnp.maximum(m - 1, 0)]))
        def _():
            acc2_ref[...] = jnp.zeros_like(acc2_ref)

        x1 = ring_ref[src_ref[m] % ring_w]
        acc2_ref[...] += jax.lax.dot_general(
            blocks2_ref[0], x1, dimension_numbers=dims,
            preferred_element_type=jnp.float32)

        @pl.when((m == n_live - 1)
                 | (row2 != row_ref[jnp.minimum(m + 1, n_live - 1)]))
        def _():
            o2_ref[0] = acc2_ref[...].astype(o2_ref.dtype)


# Chain-fallback boundary for the fused order-2 kernel, in TOTAL output
# bytes (both outs + optional add operand). Probed on TPU v5e
# (garage/fused2_dispatch_probe.py, fig/fused2_probe.json): after the
# r4 rt-cap fix (Mosaic double-buffering accounted in the VMEM budget)
# the fused path now COMPILES at every probed size 8-128 MiB, fwd and
# bwd-with-add — including the historical "scoped allocation 18.00M,
# limit 16.00M" shape — so the fallback is no longer compile-safety, it
# is a measured perf choice: chaining is FASTER below ~16 MiB total
# (fwd fused/chain 0.72-0.96x at 8-16 MiB; small grids can't amortize
# the fused kernel's ring/delay overhead) while fused wins at >=24 MiB
# (1.1-1.5x). The old 64 MiB guess (r4 advisor finding) un-fused the
# 24-64 MiB range where fused measurably wins.
_CHAIN_FALLBACK_BYTES = 16 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("nb", "delay", "ring_w",
                                             "transpose_lhs", "interpret",
                                             "dispatch"))
def gathered_block_mix_flat2(blocks_flat: jnp.ndarray,
                             slot_tbl: jnp.ndarray, x_pad: jnp.ndarray,
                             src_tbl: jnp.ndarray, row_tbl: jnp.ndarray,
                             *, nb: int, delay: int, ring_w: int,
                             transpose_lhs: bool,
                             add: jnp.ndarray | None = None,
                             interpret: bool = False,
                             dispatch: str = "auto"):
    """Both order-2 hops in one pass: returns ``(out1, out2)``, each
    (nb, BS, R), with ``out1`` = the single-hop mix and ``out2`` the hop
    over ``out1`` — numerically identical to two ``gathered_block_mix_
    flat`` calls (same accumulation order, same inter-hop cast). Square
    blocks only; ``delay``/``ring_w`` from :func:`fused2_schedule`.

    ``add`` (nb, BS, R, optional): added to out1 AFTER the inter-hop
    cast, so out1 = mix(x) + add and out2 = mix(out1) — the backward
    transpose chain ``g1_eff = g1 + mixT(g2); dx = mixT(g1_eff)`` as one
    call, identical to the chained form's dtype-space elementwise add."""
    assert blocks_flat.shape[1] == blocks_flat.shape[2], (
        "fused order-2 chain needs square blocks")
    n_live = slot_tbl.shape[0]
    bs = blocks_flat.shape[1]
    r = x_pad.shape[-1]
    slot_tbl = slot_tbl.astype(jnp.int32)
    src_tbl = src_tbl.astype(jnp.int32)
    row_tbl = row_tbl.astype(jnp.int32)

    # Small-scale dispatch: below _CHAIN_FALLBACK_BYTES of total output
    # just chain the single-hop kernel — bit-identical by construction
    # (same accumulation order, same inter-hop cast, add applied after
    # the cast) and MEASURED faster there (see the threshold note beside
    # _CHAIN_FALLBACK_BYTES; the fused pass exists to cut HBM
    # round-trips on LARGE intermediates). ``dispatch`` overrides for
    # the probe and for tests: "chain"/"fused" force a branch (chain
    # works in interpret mode too, so CPU tests cover the dispatch
    # seam); "auto" = the size rule, where interpret mode keeps the
    # fused path.
    out_bytes = nb * bs * (r + (-r) % 128) * x_pad.dtype.itemsize
    total_out = (2 + (add is not None)) * out_bytes
    use_chain = (dispatch == "chain"
                 or (dispatch == "auto" and not interpret
                     and total_out <= _CHAIN_FALLBACK_BYTES))
    if use_chain:
        o1 = gathered_block_mix_flat(
            blocks_flat, slot_tbl, x_pad, src_tbl, row_tbl, nb=nb,
            transpose_lhs=transpose_lhs, interpret=interpret)
        if add is not None:
            o1 = o1 + add.astype(o1.dtype)
        o2 = gathered_block_mix_flat(
            blocks_flat, slot_tbl, o1, src_tbl, row_tbl, nb=nb,
            transpose_lhs=transpose_lhs, interpret=interpret)
        return o1, o2

    pad_r = (-r) % 128
    if pad_r:
        x_pad = jnp.pad(x_pad, ((0, 0), (0, 0), (0, pad_r)))
    rp = r + pad_r
    # VMEM residency per rt-column of 128 rows: the x tile and both out
    # tiles are DOUBLE-buffered by Mosaic (2x + 2*2x itemsize), the two
    # fp32 accumulators are scratch (8 B), the ring holds ring_w x-dtype
    # rows, and with_add streams one more double-buffered tile. Validated
    # against a compiler-reported 16.50M overflow at rp=12288/fp32/
    # ring_w=3 — the old formula ignored double-buffering and blew the
    # 16 MB scoped limit. Budget 13.5 MB, leaving headroom for the
    # (1, bs, bs) block tiles (~0.5 MB with buffering) and rounding.
    itemsize = x_pad.dtype.itemsize
    with_add_tiles = 2 if add is not None else 0
    unit = bs * (itemsize * (6 + with_add_tiles + ring_w) + 8)
    budget = 13_500_000
    cap = max(128, budget // unit // 128 * 128)
    rt = min(_pick_rt(rp), cap)
    while rp % rt:
        rt -= 128
    rt = max(rt, 128)

    with_add = add is not None
    in_specs = [
        pl.BlockSpec((1, bs, bs),
                     lambda j, l, row, slot, src:
                     (slot[jnp.minimum(l, n_live - 1)], 0, 0)),
        pl.BlockSpec((1, bs, rt),
                     lambda j, l, row, slot, src:
                     (src[jnp.minimum(l, n_live - 1)], 0, j)),
        pl.BlockSpec((1, bs, bs),
                     lambda j, l, row, slot, src:
                     (slot[jnp.maximum(l - delay, 0)], 0, 0)),
    ]
    inputs = [blocks_flat, x_pad, blocks_flat]
    if with_add:
        if pad_r:
            add = jnp.pad(add, ((0, 0), (0, 0), (0, pad_r)))
        in_specs.append(
            pl.BlockSpec((1, bs, rt),
                         lambda j, l, row, slot, src:
                         (row[jnp.minimum(l, n_live - 1)], 0, j)))
        inputs.append(add.astype(x_pad.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(rp // rt, n_live + delay),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bs, rt),
                         lambda j, l, row, slot, src:
                         (row[jnp.minimum(l, n_live - 1)], 0, j)),
            pl.BlockSpec((1, bs, rt),
                         lambda j, l, row, slot, src:
                         (row[jnp.maximum(l - delay, 0)], 0, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bs, rt), jnp.float32),
            pltpu.VMEM((bs, rt), jnp.float32),
            pltpu.VMEM((ring_w, bs, rt), x_pad.dtype),
        ],
    )
    out1, out2 = pl.pallas_call(
        functools.partial(_mix_flat2_kernel, n_live=n_live, delay=delay,
                          ring_w=ring_w, transpose_lhs=transpose_lhs,
                          with_add=with_add),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nb, bs, rp), x_pad.dtype),
                   jax.ShapeDtypeStruct((nb, bs, rp), x_pad.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_live * bs * bs * rp,
            bytes_accessed=(n_live * (2 * bs * bs + bs * rt)
                            + (2 + with_add) * nb * bs * rp)
            * x_pad.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(row_tbl, slot_tbl, src_tbl, *inputs)
    if pad_r:
        return out1[..., :r], out2[..., :r]
    return out1, out2
