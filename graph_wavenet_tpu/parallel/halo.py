"""Explicit time-halo sequence parallelism for the dilated causal conv.

The conv analogue of context parallelism (SURVEY.md §2.8/§5): shard the time
axis of ``(B, T, N, C)`` across the ``time`` mesh axis; each shard computes
its local valid outputs after receiving a halo of ``dilation * (kernel-1)``
boundary steps from its right neighbor via ``ppermute``. Exact — not an
approximation — and the halo (a few timesteps) rides ICI while the conv
matmuls overlap.

This is the hand-written ``shard_map`` counterpart of what GSPMD infers for
the sharded-jit path; it exists (a) as the guaranteed-communication-pattern
implementation for CRASH-scale sequences and (b) as a testable spec of the
halo protocol.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from graph_wavenet_tpu.ops.linear import accum_dtype
from graph_wavenet_tpu.parallel.mesh import TIME


def halo_exchange_right(x_local: jnp.ndarray, halo: int,
                        axis_name: str = TIME) -> jnp.ndarray:
    """Inside shard_map: append the first ``halo`` timesteps of the right
    neighbor's block to the local block. The last shard receives the first
    shard's head (wrap-around) — its trailing outputs are invalid and must be
    cropped by the caller (the global valid length is T - halo)."""
    n = jax.lax.axis_size(axis_name)
    head = jax.lax.slice_in_dim(x_local, 0, halo, axis=1)
    # send my head to my LEFT neighbor == receive right neighbor's head
    recv = jax.lax.ppermute(
        head, axis_name, perm=[(i, (i - 1) % n) for i in range(n)])
    return jnp.concatenate([x_local, recv], axis=1)


def sharded_causal_conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                        dilation: int, mesh: Mesh) -> jnp.ndarray:
    """Time-sharded valid dilated causal conv.

    x: (B, T, N, C) with T divisible by the ``time`` axis size; w: (k, C, F).
    Returns (B, T, N, F) where only the first ``T - dilation*(k-1)`` steps
    are valid (matching the unsharded valid conv); the trailing halo-width
    steps are wrap-around garbage to keep shapes static — crop with
    ``out[:, :T - dilation*(k-1)]``.
    """
    k = w.shape[0]
    halo = dilation * (k - 1)
    n_time = mesh.shape[TIME]
    t_shard = x.shape[1] // n_time
    if halo > t_shard:
        raise ValueError(
            f"time-halo SP needs the per-shard time width (T/time_axis = "
            f"{x.shape[1]}/{n_time} = {t_shard}) >= the halo "
            f"dilation*(kernel-1) = {halo}: one ppermute only reaches the "
            "immediate right neighbor. Use fewer time shards or a smaller "
            "dilation at this depth.")

    def local(x_blk, w_, b_):
        # mixed-precision contract of ops.temporal.causal_conv_apply: weights
        # cast to the activation dtype per use, fp32 accumulation, output in
        # the activation dtype — the sharded conv stays bit-comparable
        w_ = w_.astype(x_blk.dtype)
        acc = accum_dtype(x_blk.dtype)
        x_ext = halo_exchange_right(x_blk, halo)
        t_loc = x_blk.shape[1]
        out = jnp.einsum("btnc,cf->btnf", x_ext[:, :t_loc], w_[0],
                         preferred_element_type=acc)
        for i in range(1, k):
            out = out + jnp.einsum(
                "btnc,cf->btnf",
                jax.lax.slice_in_dim(x_ext, i * dilation,
                                     i * dilation + t_loc, axis=1),
                w_[i], preferred_element_type=acc)
        return (out + b_).astype(x_blk.dtype)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, TIME, None, None), P(), P()),
        out_specs=P(None, TIME, None, None))(x, w, b)
