"""Fused gated dilated TCN Pallas kernel.

Computes ``tanh(conv_d(x, Wf)) * sigmoid(conv_d(x, Wg))`` — the gated
activation unit of every WaveNet layer (`/root/reference/model.py:208-212`)
— in one kernel. Why fuse:

- the two convolutions read the SAME input taps; fusing halves the HBM x
  traffic and keeps the taps in VMEM;
- filter and gate weights are concatenated to a single ``(k, C, 2F)`` matmul
  operand, so each tap is ONE MXU contraction with a 128-wide (2F = 64 ->
  padded) output instead of two 32-wide ones;
- the tanh/sigmoid/multiply epilogue runs on the VPU over data already in
  registers/VMEM — no intermediate filter/gate arrays ever reach HBM.

Grid: one program per batch element; each program matmuls the two shifted
row-ranges of its ``(T*N, C)``-flattened block (the k=2 taps of a dilated
valid conv are contiguous row-ranges) and applies the gate.

Backward is a custom VJP in plain XLA (the gradient has a different fusion
structure — dx needs scatter-adds over taps — and XLA fuses it well);
gradients are verified against the XLA forward in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graph_wavenet_tpu.ops.temporal import causal_conv_apply


def _kernel(x_ref, w_ref, b_ref, o_ref, *, dilation: int, t_out: int,
            f_out: int):
    # x_ref: (BB, T, N, C); w_ref: (k, C, 2F); b_ref: (1, 2F)
    # One big matmul over ALL rows of the block (merge-leading reshape, MXU
    # M = BB*T*N), then per-tap results are SHIFTED-ADDED via static time
    # slices of the 4-D view — no per-batch or per-tap small matmuls.
    bb, t, n, c = x_ref.shape
    k = w_ref.shape[0]
    f2 = w_ref.shape[2]
    x2d = x_ref[...].reshape(bb * t * n, c)
    taps = [jnp.dot(x2d, w_ref[i], preferred_element_type=jnp.float32)
            .reshape(bb, t, n, f2) for i in range(k)]
    acc = taps[0][:, :t_out]
    for i in range(1, k):
        acc = acc + taps[i][:, i * dilation:i * dilation + t_out]
    acc = acc + b_ref[0]
    gated = jnp.tanh(acc[..., :f_out]) * jax.nn.sigmoid(acc[..., f_out:])
    o_ref[...] = gated.astype(o_ref.dtype)


def _forward(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
             dilation: int, interpret: bool = False,
             batch_block: int = 16) -> jnp.ndarray:
    """x: (B, T, N, C); w: (k, C, 2F) = concat(Wf, Wg) on the out axis;
    b: (2F,). Returns (B, T - d*(k-1), N, F)."""
    bsz, t, n, c = x.shape
    k, _, f2 = w.shape
    f_out = f2 // 2
    t_out = t - dilation * (k - 1)
    bb = min(batch_block, bsz)
    pad = (-bsz) % bb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0)))
    bp = x.shape[0]
    kernel = functools.partial(_kernel, dilation=dilation, t_out=t_out,
                               f_out=f_out)
    out = pl.pallas_call(
        kernel,
        grid=(bp // bb,),
        in_specs=[
            pl.BlockSpec((bb, t, n, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, f2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, t_out, n, f_out),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, t_out, n, f_out), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * t * n * c * f2 * k,
            bytes_accessed=(x.size + w.size + b.size) * x.dtype.itemsize +
            bp * t_out * n * f_out * x.dtype.itemsize,
            transcendentals=2 * bp * t_out * n * f_out,
        ),
    )(x, w, b.reshape(1, f2))
    return out[:bsz] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_gated_tcn(x, w, b, dilation: int, interpret: bool = False):
    """Differentiable fused gated TCN; see module docstring.

    Equivalent to ``gated_tcn_apply`` with filter params w[..., :F], b[:F]
    and gate params w[..., F:], b[F:].
    """
    return _forward(x, w, b, dilation, interpret)


def _fwd(x, w, b, dilation, interpret):
    out = _forward(x, w, b, dilation, interpret)
    return out, (x, w, b)


def _bwd(dilation, interpret, res, g):
    x, w, b = res
    k, c, f2 = w.shape
    f = f2 // 2
    t_out = x.shape[1] - dilation * (k - 1)
    # recompute pre-activations with XLA (cheaper than saving them)
    taps = [x[:, i * dilation:i * dilation + t_out] for i in range(k)]
    pre = sum(jnp.einsum("btnc,cf->btnf", taps[i], w[i]) for i in range(k))
    pre = pre + b
    th = jnp.tanh(pre[..., :f])
    sg = jax.nn.sigmoid(pre[..., f:])
    g_th = g * sg
    g_sg = g * th
    g_pre = jnp.concatenate(
        [g_th * (1.0 - th * th), g_sg * sg * (1.0 - sg)], axis=-1)
    db = g_pre.sum(axis=(0, 1, 2)).astype(b.dtype)
    dw = jnp.stack(
        [jnp.einsum("btnc,btnf->cf", taps[i], g_pre) for i in range(k)]
    ).astype(w.dtype)
    dx = jnp.zeros_like(x)
    for i in range(k):
        dx = dx.at[:, i * dilation:i * dilation + t_out].add(
            jnp.einsum("btnf,cf->btnc", g_pre, w[i]).astype(x.dtype))
    return dx, dw, db


fused_gated_tcn.defvjp(_fwd, _bwd)


def pack_gate_params(filter_params: dict, gate_params: dict
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused-kernel operands from the ONE shared packing convention
    (``ops.temporal.pack_gated_conv_params``)."""
    from graph_wavenet_tpu.ops.temporal import pack_gated_conv_params

    packed = pack_gated_conv_params(filter_params, gate_params)
    return packed["w"], packed["b"]


def gated_tcn_reference(filter_params, gate_params, x, dilation):
    """XLA fallback with identical semantics (used off-TPU and as the
    allclose baseline)."""
    filt = jnp.tanh(causal_conv_apply(filter_params, x, dilation))
    gate = jax.nn.sigmoid(causal_conv_apply(gate_params, x, dilation))
    return filt * gate
