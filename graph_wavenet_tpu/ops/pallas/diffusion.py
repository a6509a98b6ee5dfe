"""Fused multi-support diffusion GCN Pallas kernel.

The FLOP center of the model: for each support A_s, K-hop diffusion
``x -> A_s^T x -> (A_s^T)^2 x`` and the projection of all hops onto the
output channels (`/root/reference/model.py:32-55`). The XLA reference path
(`ops.diffusion.gcn_apply``) issues each hop as a separate einsum with the
intermediate hops round-tripping through HBM; this kernel keeps everything
resident in VMEM:

- one program handles a block of R = B*T rows; the supports (S, N, N) and the
  split projection weights live in VMEM across the whole grid;
- the row block is transposed ONCE to ``(N, RB*C)`` so every diffusion hop is
  a single large MXU matmul ``A^T @ X`` (M=K=N, N=RB*C — all MXU-sized);
- each hop is immediately projected (viewing the same buffer as
  ``(N*RB, C)``) and accumulated into the output block — the 7-hop concat of
  the reference never exists anywhere;
- only the final (RB, N, F) block is written back to HBM: HBM traffic is
  1x read + 1x write of x instead of ~8x.

Backward is a custom VJP in XLA: it needs the reverse-mode chain through the
hop recurrence (dx, dW, db and — because the adaptive adjacency is learned —
dA), which has a different dataflow; XLA fuses it acceptably and the
gradients are verified against ``jax.grad`` of the XLA path in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, a_ref, w_ref, b_ref, o_ref, *, order: int,
            n_supports: int):
    # x_ref: (RB, N, C); a_ref: (S, N, N); w_ref: (H*C, F); b_ref: (1, F)
    # All math stays in model layout — Mosaic lowers the batched einsums to
    # MXU matmuls directly; no transposes or lane reshapes needed.
    rb, n, c = x_ref.shape
    x = x_ref[...]

    def proj(hop, w_slice):
        # hop (RB, N, C) @ (C, F) -> (RB, N, F)
        return jnp.einsum("rnc,cf->rnf", hop, w_slice,
                          preferred_element_type=jnp.float32)

    acc = proj(x, w_ref[0:c])
    idx = c
    for s in range(n_supports):
        a = a_ref[s]                              # (N, N)
        hop = x
        for _ in range(order):
            # nconv: out[r, w, c] = sum_v A[v, w] * hop[r, v, c]
            hop = jnp.einsum("vw,rvc->rwc", a, hop,
                             preferred_element_type=jnp.float32
                             ).astype(x.dtype)
            acc = acc + proj(hop, w_ref[idx:idx + c])
            idx += c
    acc = acc + b_ref[0][None, None, :]
    o_ref[...] = acc.astype(o_ref.dtype)


def _forward(x, a_stack, w, b, order: int, n_supports: int,
             row_block: int = 32, interpret: bool = False):
    """x: (R, N, C) flattened rows; a_stack: (S, N, N); w: ((S*order+1)*C, F).
    Returns (R, N, F)."""
    r, n, c = x.shape
    f = w.shape[1]
    rb = min(row_block, r)
    pad = (-r) % rb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    rp = x.shape[0]
    kernel = functools.partial(_kernel, order=order, n_supports=n_supports)
    hops = n_supports * order + 1
    out = pl.pallas_call(
        kernel,
        grid=(rp // rb,),
        in_specs=[
            pl.BlockSpec((rb, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_supports, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, n, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, n, f), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * (n_supports * order * n * n * c +
                            hops * n * c * f),
            bytes_accessed=(x.size + a_stack.size + w.size) *
            x.dtype.itemsize + rp * n * f * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, a_stack, w, b.reshape(1, f))
    return out[:r] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_gcn(x, a_stack, w, b, order: int, n_supports: int,
              row_block: int = 32, interpret: bool = False):
    """Differentiable fused diffusion GCN over flattened rows.

    Equivalent to ``ops.diffusion.gcn_apply`` (without dropout — applied by
    the caller) on x reshaped (B*T, N, C) with supports stacked (S, N, N).
    Gradients flow to x, the supports (needed for the learned adaptive
    adjacency), w and b.
    """
    return _forward(x, a_stack, w, b, order, n_supports, row_block,
                    interpret)


def _hops_xla(x, a_stack, order, n_supports):
    hops = [x]
    for s in range(n_supports):
        hop = x
        for _ in range(order):
            hop = jnp.einsum("rvc,vw->rwc", hop, a_stack[s])
            hops.append(hop)
    return hops


def _fwd(x, a_stack, w, b, order, n_supports, row_block, interpret):
    out = _forward(x, a_stack, w, b, order, n_supports, row_block,
                   interpret)
    return out, (x, a_stack, w, b)


def _bwd(order, n_supports, row_block, interpret, res, g):
    x, a_stack, w, b = res
    r, n, c = x.shape
    hops = _hops_xla(x, a_stack, order, n_supports)   # recompute
    db = g.sum(axis=(0, 1))
    dw = jnp.concatenate(
        [jnp.einsum("rnc,rnf->cf", h, g) for h in hops], axis=0)
    # backprop through the hop recurrence per support
    dx = jnp.einsum("rnf,cf->rnc", g, w[0:c])
    da = []
    for s in range(n_supports):
        a = a_stack[s]
        base = (1 + s * order) * c
        # gradient flowing into hop k of this support from the projection
        g_hops = [jnp.einsum("rnf,cf->rnc", g,
                             w[base + k * c: base + (k + 1) * c])
                  for k in range(order)]
        da_s = jnp.zeros_like(a)
        # reverse through hop_k = einsum('rvc,vw->rwc', hop_{k-1}, A)
        carry = jnp.zeros_like(x)
        for k in reversed(range(order)):
            carry = carry + g_hops[k]
            # input of hop (s, k): x for k=0, else this support's hop k-1
            prev = x if k == 0 else hops[1 + s * order + (k - 1)]
            da_s = da_s + jnp.einsum("rvc,rwc->vw", prev, carry)
            carry = jnp.einsum("rwc,vw->rvc", carry, a)
        dx = dx + carry
        da.append(da_s)
    # cotangents must carry the primal dtypes (bf16 activations with fp32
    # params otherwise promote and poison downstream adds/scatters)
    return (dx.astype(x.dtype), jnp.stack(da).astype(a_stack.dtype),
            dw.astype(w.dtype), db.astype(b.dtype))


fused_gcn.defvjp(_fwd, _bwd)


def gcn_rows(x_btnc, supports, params, order: int, row_block: int = 32,
             interpret: bool = False):
    """Model-layer adapter: (B, T, N, C) + list of (N, N) supports ->
    (B, T, N, F) via the fused kernel."""
    assert supports, (
        "the fused Pallas gcn needs at least one support — the "
        "identity-only GCN (supports=[]) takes the XLA gcn_apply path")
    b, t, n, c = x_btnc.shape
    n_hops = order * len(supports) + 1
    assert params["w"].shape[0] == n_hops * c, (
        f"gcn weight expects {params['w'].shape[0] // c} hop blocks, got "
        f"{n_hops} ({len(supports)} supports x order {order} + identity) — "
        "same contract as ops.diffusion.gcn_apply")
    a_stack = jnp.stack(supports)
    out = fused_gcn(x_btnc.reshape(b * t, n, c), a_stack, params["w"],
                    params["b"], order, len(supports), row_block, interpret)
    return out.reshape(b, t, n, -1)
