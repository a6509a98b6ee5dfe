"""Per-sample-graph Graph WaveNet variant.

Semantics-parity target: ``gwnet_diff_G`` (`/root/reference/model.py:244-407`)
— every training sample carries its own adjacency, so the fixed supports are
passed per batch as ``(B, N, N)`` stacks and the diffusion uses the batched
einsum. Differences from the shared-graph model, all mirrored here:

- supports are a ``forward`` argument, not model state (`model.py:315`);
- dilations start at 4 per block instead of 1 (`model.py:273`). The
  reference's *stored* receptive field keeps the shared-graph formula and
  understates the true conv reach (quirk #8 of SURVEY.md §7.4) — here
  inputs are padded to the TRUE ``cfg.receptive_field`` computed from the
  actual dilations; ``cfg.compat_receptive_field`` records the reference's
  understated number for auditing only;
- adaptive node embeddings carry a batch dimension and, in the reference, are
  drawn fresh at random on EVERY forward so they never train
  (`model.py:324-329`). That quirk is reproduced behind
  ``cfg.fresh_nodevec=True``; the default (False) makes them trainable
  shared-across-batch embeddings broadcast to the batch — the deliberate fix
  (quirk #2, SURVEY.md §7.4);
- the batched-aptinit SVD branch is unfinished upstream
  (``ipdb.set_trace()`` at `model.py:332`); here it is implemented: per-sample
  SVD on host via :func:`svd_nodevecs_batched`.

Use ``ModelConfig(start_dilation=4, fresh_nodevec=...)`` for this variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graph_wavenet_tpu.config import ModelConfig
from graph_wavenet_tpu.models.gwnet import (
    Params,
    State,
    _wavenet_stack,
    init_gwnet,
)
from graph_wavenet_tpu.ops.adaptive import (
    adaptive_adjacency_batched,
    svd_nodevecs,
)
from graph_wavenet_tpu.ops.linear import linear_apply
from graph_wavenet_tpu.ops.temporal import left_pad_time


def init_gwnet_diff_g(key: jax.Array,
                      cfg: ModelConfig) -> tuple[Params, State]:
    """Same param tree as the shared-graph model; with ``fresh_nodevec`` the
    nodevec params are simply absent (they are drawn per forward)."""
    return init_gwnet(key, cfg, aptinit=None)


def svd_nodevecs_batched(aptinit: np.ndarray, rank: int = 10):
    """Per-sample SVD init for batched (B, N, N) aptinit — completes the
    reference's unfinished branch (`model.py:331-337`)."""
    e1s, e2s = [], []
    for a in np.asarray(aptinit):
        e1, e2 = svd_nodevecs(a, rank)
        e1s.append(e1)
        e2s.append(e2)
    return np.stack(e1s), np.stack(e2s)


def apply_gwnet_diff_g(cfg: ModelConfig, params: Params, state: State,
                       x: jnp.ndarray,
                       supports: list[jnp.ndarray] | None,
                       aptinit_nodevecs=None, *, train: bool = False,
                       rng: jax.Array | None = None
                       ) -> tuple[jnp.ndarray, State]:
    """Forward pass with per-sample supports.

    x: (B, T, N, in_dim); supports: list of (B, N, N) batched supports (or
    None / [] as in the shared-graph model). ``aptinit_nodevecs``: optional
    precomputed ``(e1 (B,N,r), e2 (B,r,N))`` from
    :func:`svd_nodevecs_batched`.
    """
    batch = x.shape[0]
    # same gate as the shared-graph model (gwnet.py): supports=None means
    # temporal-only — no graph convs and no adaptive adjacency; pass [] with
    # addaptadj for the adaptive-only (aptonly) model
    use_adapt = cfg.gcn_bool and cfg.addaptadj and supports is not None
    new_supports = supports
    if use_adapt:
        if aptinit_nodevecs is not None:
            nv1, nv2 = aptinit_nodevecs
        elif cfg.fresh_nodevec:
            # reference quirk: fresh N(0,1) embeddings every forward — the
            # adaptive adjacency never learns (`model.py:324-329`).
            assert rng is not None, "fresh_nodevec needs an rng"
            k1, k2 = jax.random.split(jax.random.fold_in(rng, 0x5eed))
            nv1 = jax.random.normal(
                k1, (batch, cfg.num_nodes, cfg.adapt_rank), x.dtype)
            nv2 = jax.random.normal(
                k2, (batch, cfg.adapt_rank, cfg.num_nodes), x.dtype)
        else:
            # fixed variant: trainable shared embeddings broadcast per sample
            nv1 = jnp.broadcast_to(
                params["nodevec1"],
                (batch,) + params["nodevec1"].shape)
            nv2 = jnp.broadcast_to(
                params["nodevec2"],
                (batch,) + params["nodevec2"].shape)
        adp = adaptive_adjacency_batched(nv1, nv2)
        new_supports = list(supports) + [adp]

    # true receptive field, not the reference's understated bookkeeping —
    # see the comment in apply_gwnet (quirk #8, SURVEY.md §7.4)
    x = left_pad_time(x, cfg.receptive_field)
    x = x.astype(jnp.dtype(cfg.dtype))   # mixed precision (see apply_gwnet)
    x = linear_apply(params["start_conv"], x)
    return _wavenet_stack(cfg, params, state, x, new_supports,
                          use_gcn=cfg.gcn_bool and supports is not None,
                          train=train, rng=rng)
