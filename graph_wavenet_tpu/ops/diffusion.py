"""Diffusion graph convolution.

The FLOP center of the model (SURVEY.md §3.5): K-hop diffusion over each
support followed by a channel projection of the concatenated hops
(`/root/reference/model.py:32-80`). The diffusion step ``nconv`` is the einsum
``x[b,t,v,c], A[v,w] -> [b,t,w,c]`` — a (B*T*C, N) x (N, N) matmul, an ideal
MXU shape.

Three algebraically equivalent forms are provided:

- ``concat``: materialize the ``(order*n_supports+1)*C`` concat then one
  matmul — bitwise-parallel to the reference, used for parity tests.
- ``fused`` (default): accumulate ``h += hop_k @ W_k`` with the projection
  weight pre-split per hop, never materializing the concat — saves
  ``(order*n_supports)*C`` channels of HBM traffic per layer; XLA fuses the
  accumulation chain. Weight slices are taken in concat order, so the two
  forms agree to float tolerance.
- ``stacked``: the reference's hop chain ``A(Ax)`` serializes
  narrow (rows, N)x(N, N) matmuls back to back — the MXU stalls on the
  dependency. Squaring the support first is O(N^3) — trivial next to the
  O(B*T*C*N^2) hops — so we precompute the power stack ``[A, A^2, ...,
  A^order]`` and generate ALL hops of a support in ONE wide matmul
  ``(rows, N) x (N, order*N)``, then project with a single contraction over
  (hop, channel). Fixed supports get no cotangent (they are not on the
  param path), so the adaptive support's dA cost is unchanged. Measured
  (BENCH_NOTES.md): tie with ``fused`` at N=207, loses at N=5120 (streaming
  the 2x-wider power stacks through HBM outweighs the chain removal) —
  hence ``fused`` stays the default; ``stacked`` is the knob for deep
  diffusion orders / many supports at small N.

Weight layout of the projection: ``w ((order*n_supports+1)*c_in, c_out)``,
row-blocks ordered [x, s1 hop1, s1 hop2, ..., sS hop1, sS hop2] exactly like
the reference's ``torch.cat(out, dim=1)`` (`model.py:41-55`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graph_wavenet_tpu.ops.linear import accum_dtype, linear_init
from graph_wavenet_tpu.ops.sparse import nconv_sparse


def nconv(x: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
    """Graph diffusion step with a shared dense support
    (reference einsum 'ncvl,vw->ncwl' at `model.py:13`). fp32 accumulation,
    result in the activation dtype."""
    return jnp.einsum("btvc,vw->btwc", x, A.astype(x.dtype),
                      preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype)


def nconv_batched(x: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
    """Per-sample-support diffusion step
    (reference einsum 'ncvl,nvw->ncwl' at `model.py:21`)."""
    return jnp.einsum("btvc,bvw->btwc", x, A.astype(x.dtype),
                      preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype)


def diffusion_hops(x: jnp.ndarray, supports: list[jnp.ndarray],
                   order: int) -> list[jnp.ndarray]:
    """[x, A1 x, A1^2 x, ..., AS x, ..., AS^order x] in reference concat
    order. Supports may be (N, N) or batched (B, N, N)."""
    hops = [x]
    for a in supports:
        if hasattr(a, "mix_2d"):          # ELL or block-sparse support
            step = nconv_sparse
        else:
            step = nconv_batched if a.ndim == 3 else nconv
        xk = x
        for _ in range(order):
            xk = step(xk, a)
            hops.append(xk)
    return hops


def support_powers(a: jnp.ndarray, order: int) -> jnp.ndarray:
    """Stack ``[A, A^2, ..., A^order]`` along a leading hop axis.

    a: (N, N) or batched (B, N, N); returns (order, N, N) / (B, order, N, N).
    Computed in the support's own dtype (fp32 for parity paths); the per-hop
    result then matches the chain form to accumulation rounding.
    """
    powers = [a]
    for _ in range(order - 1):
        powers.append(powers[-1] @ a)
    return jnp.stack(powers, axis=-3)


def _stacked_hops_project(x: jnp.ndarray, pw: jnp.ndarray, wk: jnp.ndarray,
                          order: int) -> jnp.ndarray:
    """All ``order`` hops of one support as one wide matmul, projected with
    one (hop, channel) contraction. pw: a precomputed power stack
    (order, N, N) or batched (B, order, N, N) — hoist ``support_powers`` out
    of the layer loop, its O(N^3) cost is per-forward, not per-layer.
    wk: (order*C, F) — this support's projection rows in concat order."""
    acc = accum_dtype(x.dtype)
    pw = pw.astype(x.dtype)
    c_in, f = x.shape[-1], wk.shape[-1]
    wk = wk.reshape(order, c_in, f)
    if pw.ndim == 4:
        hops = jnp.einsum("btvc,bkvw->btkwc", x, pw,
                          preferred_element_type=acc).astype(x.dtype)
    else:
        hops = jnp.einsum("btvc,kvw->btkwc", x, pw,
                          preferred_element_type=acc).astype(x.dtype)
    return jnp.einsum("btkwc,kcf->btwf", hops, wk.astype(x.dtype),
                      preferred_element_type=acc)


def dropout_scale(rng, dropout: float, shape, dtype) -> jnp.ndarray:
    """Inverted-dropout mask as a {0, 1/(1-p)} tensor in the activation
    dtype. Multiplying by this (instead of ``where`` over the raw bernoulli
    bits) makes the residual saved for the backward pass this small tensor —
    XLA otherwise keeps the u32 RNG output (4 bytes/element) live across
    fwd->bwd. Same draw as ``jax.random.bernoulli`` (uniform < p)."""
    keep = jax.random.bernoulli(rng, 1.0 - dropout, shape)
    return keep.astype(dtype) / jnp.asarray(1.0 - dropout, dtype)


def _gcn_apply_sparse(params: dict, x: jnp.ndarray,
                      supports: list, order: int, dropout: float,
                      rng, train: bool) -> jnp.ndarray:
    """Diffusion conv over ELL sparse supports, node-leading layout.

    The node axis moves to the front ONCE for the whole hop block; every
    hop is a scatter-free ``_ell_mix`` (custom VJP) and every projection
    slice contracts channels in place. Output matches the dense modes to
    accumulation rounding.
    """
    b, t, n, c_in = x.shape
    w, bias = params["w"].astype(x.dtype), params["b"]
    n_hops = len(supports) * order + 1
    assert w.shape[0] == n_hops * c_in, (
        f"gcn weight expects {w.shape[0] // c_in} hops, got {n_hops}: "
        "n_supports passed at init must match the supports list")
    acc = accum_dtype(x.dtype)
    xn = jnp.transpose(x, (2, 0, 1, 3)).reshape(n, b * t * c_in)

    def project(xk, k):
        wk = jax.lax.dynamic_slice_in_dim(w, k * c_in, c_in, axis=0)
        return jnp.einsum("nrc,cf->nrf", xk.reshape(n, b * t, c_in), wk,
                          preferred_element_type=acc)

    h = project(xn, 0)
    k = 1
    for sp in supports:
        if order == 2 and hasattr(sp, "mix2_2d"):
            # fused order-2 hop chain (ops.block_sparse.Fused2FlatSupport):
            # both hops in one kernel pass, hop 2's gathered HBM re-read
            # of the intermediate never exists
            x1, x2h = sp.mix2_2d(xn)
            h = h + project(x1, k) + project(x2h, k + 1)
            k += 2
            continue
        xk = xn
        for _ in range(order):
            xk = sp.mix_2d(xk)
            h = h + project(xk, k)
            k += 1
    h = (h + bias).astype(x.dtype)                 # (N, B*T, F)
    f = h.shape[-1]
    h = jnp.transpose(h.reshape(n, b, t, f), (1, 2, 0, 3))
    if train and dropout > 0.0:
        assert rng is not None, "dropout in train mode needs an rng"
        h = h * dropout_scale(rng, dropout, h.shape, h.dtype)
    return h


def gcn_init(key, c_in: int, c_out: int, n_supports: int, order: int = 2,
             dtype=jnp.float32) -> dict:
    """Projection params over the concatenated hops
    (`model.py:36-37`: c_in_total = (order*n_supports+1)*c_in)."""
    return linear_init(key, (order * n_supports + 1) * c_in, c_out, dtype)


def gcn_apply(params: dict, x: jnp.ndarray, supports: list[jnp.ndarray],
              order: int = 2, dropout: float = 0.0,
              rng: jax.Array | None = None, train: bool = False,
              mode: str = "fused",
              stacks: list[jnp.ndarray] | None = None) -> jnp.ndarray:
    """Diffusion graph conv: hops -> projection -> dropout.

    dropout follows torch ``F.dropout`` semantics (`model.py:54`): active only
    in training, inverted scaling by 1/(1-p).

    stacks: optional precomputed ``support_powers`` stacks for ``stacked``
    mode — pass when the same supports feed several layers so the O(N^3)
    squaring happens once per forward.
    """
    c_in = x.shape[-1]
    w, b = params["w"].astype(x.dtype), params["b"]
    if supports and all(hasattr(a, "mix_2d") for a in supports):
        # all-sparse fast path: one node-leading transpose for the WHOLE
        # hop block instead of two per hop (the transposes, not the
        # gathers, dominate the naive per-hop form — BENCH_NOTES.md)
        return _gcn_apply_sparse(params, x, supports, order, dropout, rng,
                                 train)
    if mode == "stacked" and any(hasattr(a, "mix_2d") for a in supports):
        # power stacks are a dense-support construct; mixed sparse/dense
        # support lists run the hop chain (each sparse hop O(N*D))
        mode = "fused"
    n_hops = len(supports) * order + 1
    assert w.shape[0] == n_hops * c_in, (
        f"gcn weight expects {w.shape[0] // c_in} hops, got {n_hops}: "
        "n_supports passed at init must match the supports list")
    if mode == "stacked":
        acc = accum_dtype(x.dtype)
        if stacks is None:
            stacks = [support_powers(a, order) for a in supports]
        h = jnp.einsum("btnc,cf->btnf", x, w[:c_in],
                       preferred_element_type=acc)
        for s, pw in enumerate(stacks):
            wk = jax.lax.dynamic_slice_in_dim(
                w, (1 + s * order) * c_in, order * c_in, axis=0)
            h = h + _stacked_hops_project(x, pw, wk, order)
        h = (h + b).astype(x.dtype)
        if train and dropout > 0.0:
            assert rng is not None, "dropout in train mode needs an rng"
            h = h * dropout_scale(rng, dropout, h.shape, h.dtype)
        return h
    hops = diffusion_hops(x, supports, order)
    if mode == "concat":
        h = jnp.concatenate(hops, axis=-1)
        h = (jnp.einsum("btnc,cf->btnf", h, w,
                        preferred_element_type=accum_dtype(x.dtype)) + b
             ).astype(x.dtype)
    else:
        h = jnp.zeros((), jnp.float32)
        for k, hop in enumerate(hops):
            wk = jax.lax.dynamic_slice_in_dim(w, k * c_in, c_in, axis=0)
            h = h + jnp.einsum("btnc,cf->btnf", hop, wk,
                               preferred_element_type=accum_dtype(x.dtype))
        h = (h + b).astype(x.dtype)
    if train and dropout > 0.0:
        assert rng is not None, "dropout in train mode needs an rng"
        h = h * dropout_scale(rng, dropout, h.shape, h.dtype)
    return h
