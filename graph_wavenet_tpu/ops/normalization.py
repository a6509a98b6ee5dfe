"""Batch normalization with explicit state.

Parity target: ``nn.BatchNorm2d(residual_channels)`` applied to
``(B, C, N, T)`` activations (`/root/reference/model.py:152,236`) — i.e.
normalize per channel over all (batch, node, time) positions, momentum 0.1,
eps 1e-5, affine; running var updated with the *unbiased* batch variance
while normalization uses the biased one (torch semantics).

TPU-native twist: under ``jit`` with a batch-sharded mesh, the ``jnp.mean``
over the batch axis is a global reduction — GSPMD inserts the cross-device
``all-reduce`` automatically, so distributed BN statistics match single-device
semantics with no hand-written collectives (SURVEY.md §7.3 "BatchNorm under
pjit").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_norm_init(c: int, dtype=jnp.float32) -> tuple[dict, dict]:
    """Returns (params, state): scale/bias and running mean/var."""
    params = {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    state = {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}
    return params, state


def batch_norm_apply(params: dict, state: dict, x: jnp.ndarray,
                     train: bool, momentum: float = 0.1,
                     eps: float = 1e-5,
                     t_valid: jnp.ndarray | None = None
                     ) -> tuple[jnp.ndarray, dict]:
    """x: (B, T, N, C); stats per channel over (B, T, N).

    Statistics and normalization run in fp32 regardless of the activation
    dtype (standard mixed-precision practice); output returns to the input
    dtype.

    ``t_valid`` (optional, may be a traced scalar): restrict the statistics
    to the LAST ``t_valid`` timesteps. Used by the pipeline-parallel stack
    (``parallel/pipeline.py``), where every stage re-pads its activations to
    a uniform width so all stages run one SPMD program: the causal prefix
    holds garbage the valid tail never reads — except through BN's batch
    statistics, which the mask excludes. Matches the unmasked path on the
    valid region up to fp32 summation-order rounding; ``None`` (the hot
    path) takes the plain ``jnp.mean`` branch with no mask multiply.
    """
    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    reduce_axes = tuple(range(x.ndim - 1))
    if train:
        if t_valid is None:
            mean = jnp.mean(x, axis=reduce_axes)
            var = jnp.mean((x - mean) ** 2, axis=reduce_axes)  # biased
            n = float(x.size // x.shape[-1])
        else:
            t = x.shape[1]
            mask = (jnp.arange(t) >= t - t_valid).astype(jnp.float32)
            mask = mask[None, :, None, None]
            n = ((x.size // (x.shape[-1] * t))
                 * jnp.asarray(t_valid)).astype(jnp.float32)
            mean = jnp.sum(x * mask, axis=reduce_axes) / n
            var = jnp.sum(jnp.square(x - mean) * mask, axis=reduce_axes) / n
        unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        # running stats keep the STATE dtype: the fp32 update otherwise
        # silently promotes non-fp32 state (and a lax.scan carrying BN
        # state, as in parallel/pipeline.py, hard-fails on the carry
        # dtype change)
        new_state = {
            "mean": ((1 - momentum) * state["mean"].astype(jnp.float32)
                     + momentum * mean).astype(state["mean"].dtype),
            "var": ((1 - momentum) * state["var"].astype(jnp.float32)
                    + momentum * unbiased).astype(state["var"].dtype),
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv * params["scale"] + params["bias"]
    return y.astype(in_dtype), new_state


def masked_batch_norm_apply(params: dict, state: dict, x: jnp.ndarray,
                            t_valid: jnp.ndarray, train: bool,
                            momentum: float = 0.1,
                            eps: float = 1e-5) -> tuple[jnp.ndarray, dict]:
    """:func:`batch_norm_apply` with statistics restricted to the last
    ``t_valid`` timesteps (thin alias; see the ``t_valid`` parameter)."""
    return batch_norm_apply(params, state, x, train, momentum, eps,
                            t_valid=t_valid)
