"""Graph WaveNet — functional, TPU-first implementation.

Semantics-parity target: the reference ``gwnet`` module
(`/root/reference/model.py:82-241`) — gated dilated causal temporal convs
interleaved with diffusion graph convs over fixed supports plus a learned
adaptive adjacency, skip accumulation into an output head. Design differences
(deliberate, SURVEY.md §7.1):

- Pure functions over param/state pytrees instead of ``nn.Module``; BatchNorm
  state and dropout RNG are explicit.
- Channels-last ``(B, T, N, C)`` activations; every conv is a channel matmul
  (MXU-shaped), the static 8-layer Python loop unrolls under ``jit``.
- The per-layer time shrinkage is static (dilations known at trace time), so
  all shapes are static — no dynamic control flow under jit.

The model returns ``(B, T_out, N, out_dim)`` — for the canonical 13-step
input this is ``(B, 1, N, 12)``, which equals the reference's post-transpose
``output.transpose(1, 3)`` layout (`engine.py:46`), so no transpose is needed
downstream.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from graph_wavenet_tpu.config import ModelConfig
from graph_wavenet_tpu.ops.adaptive import (
    adaptive_adjacency,
    random_nodevecs,
    svd_nodevecs,
)
from graph_wavenet_tpu.ops.diffusion import (
    gcn_apply,
    gcn_init,
    support_powers,
)
from graph_wavenet_tpu.ops.linear import linear_apply, linear_init
from graph_wavenet_tpu.ops.normalization import (
    batch_norm_apply,
    batch_norm_init,
)
from graph_wavenet_tpu.ops.temporal import (
    causal_conv_init,
    gated_tcn_apply,
    left_pad_time,
)

Params = dict[str, Any]
State = dict[str, Any]


def _dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.param_dtype)


def init_gwnet(key: jax.Array, cfg: ModelConfig,
               aptinit=None) -> tuple[Params, State]:
    """Initialize params and BN state.

    ``aptinit``: optional adjacency for SVD-initialized adaptive embeddings
    (`/root/reference/model.py:120-127`); None = random init (``--randomadj``).
    """
    dt = _dtype(cfg)
    n_layers = cfg.blocks * cfg.layers
    keys = iter(jax.random.split(key, 6 * n_layers + 8))

    params: Params = {
        "start_conv": linear_init(next(keys), cfg.in_dim,
                                  cfg.residual_channels, dt),
        "end1": linear_init(next(keys), cfg.skip_channels,
                            cfg.end_channels, dt),
        "end2": linear_init(next(keys), cfg.end_channels, cfg.out_dim, dt),
    }

    if cfg.gcn_bool and cfg.addaptadj and not cfg.fresh_nodevec:
        if aptinit is None:
            nv1, nv2 = random_nodevecs(next(keys), cfg.num_nodes,
                                       cfg.adapt_rank, dt)
        else:
            e1, e2 = svd_nodevecs(aptinit, cfg.adapt_rank)
            nv1, nv2 = jnp.asarray(e1, dt), jnp.asarray(e2, dt)
        params["nodevec1"], params["nodevec2"] = nv1, nv2

    layers = []
    bn_state = []
    for _ in range(n_layers):
        layer = {
            "filter": causal_conv_init(next(keys), cfg.residual_channels,
                                       cfg.dilation_channels,
                                       cfg.kernel_size, dt),
            "gate": causal_conv_init(next(keys), cfg.residual_channels,
                                     cfg.dilation_channels,
                                     cfg.kernel_size, dt),
            "skip": linear_init(next(keys), cfg.dilation_channels,
                                cfg.skip_channels, dt),
            # residual 1x1 exists in the reference even when gcn is on
            # (`model.py:144-146`); kept for checkpoint-surface parity.
            "residual": linear_init(next(keys), cfg.dilation_channels,
                                    cfg.residual_channels, dt),
        }
        if cfg.gcn_bool:
            layer["gcn"] = gcn_init(next(keys), cfg.dilation_channels,
                                    cfg.residual_channels, cfg.supports_len,
                                    cfg.diffusion_order, dt)
        bn_p, bn_s = batch_norm_init(cfg.residual_channels, dt)
        layer["bn"] = bn_p
        layers.append(layer)
        bn_state.append(bn_s)

    params["layers"] = layers
    return params, {"bn": bn_state}


def apply_gwnet(cfg: ModelConfig, params: Params, state: State,
                x: jnp.ndarray, supports: list[jnp.ndarray] | None,
                *, train: bool = False,
                rng: jax.Array | None = None) -> tuple[jnp.ndarray, State]:
    """Forward pass.

    x: (B, T, N, in_dim). supports: list of (N, N) fixed supports — or None
    to disable graph convs entirely (temporal-only model, reference
    ``gcn_bool and self.supports is not None`` gate at `model.py:225`);
    pass ``[]`` with ``addaptadj`` for the adaptive-only (aptonly) model.
    """
    # Pad to the TRUE receptive field. The reference pads to its *stored*
    # receptive field (`model.py:176-180`), which understates true reach for
    # diff-G configs (quirk #8, SURVEY.md §7.4) — inputs shorter than true
    # reach crash it with negative conv lengths. For every input the
    # reference handles, true rf == stored rf or the input already covers
    # it, so this is parity-preserving; shorter inputs become valid.
    x = left_pad_time(x, cfg.receptive_field)
    # mixed precision: activations in cfg.dtype (params stay fp32; every op
    # casts weights per-use and accumulates fp32)
    x = x.astype(jnp.dtype(cfg.dtype))
    x = linear_apply(params["start_conv"], x)

    new_supports = supports
    use_adapt = cfg.gcn_bool and cfg.addaptadj and supports is not None
    # duck-typed mask detection (BlockAdaptiveMask and its node-TP
    # counterpart ShardedBlockAdaptiveMask both carry the marker)
    masks = [s for s in (supports or [])
             if getattr(s, "adaptive_mask", False)]
    if masks and not use_adapt:
        raise ValueError(
            "supports contain a BlockAdaptiveMask but the adaptive "
            "adjacency is off (gcn_bool and addaptadj must both be set "
            "to materialize it)")
    if use_adapt:
        if cfg.fresh_nodevec:
            # the quirk flag belongs to the diff-G variant only
            # (`model.py:324-329`); the shared-graph model's embeddings are
            # always trained params, and init_gwnet skipped creating them
            raise ValueError(
                "fresh_nodevec=True reproduces the diff-G per-forward "
                "random embeddings (apply_gwnet_diff_g); the shared-graph "
                "model has no such mode — unset fresh_nodevec")
        fixed = [s for s in supports
                 if not getattr(s, "adaptive_mask", False)]
        if masks:
            if len(masks) > 1:
                # silently materializing only masks[0] would surface much
                # later as a confusing gcn weight-shape assert (ADVICE r3)
                raise ValueError(
                    f"supports contain {len(masks)} BlockAdaptiveMasks; "
                    "the model materializes exactly one learned adjacency "
                    "— pass a single mask (union the patterns upstream if "
                    "needed)")
            # block-masked adaptive adjacency: materialize a flat
            # block-sparse support on the mask's live pattern — the full
            # reference model (learned graph included) at city scale,
            # where the dense (N, N) adp cannot exist
            # materialize in the ACTIVATION dtype: the mix op would cast
            # the blocks per use anyway, so the exit-cast is forward-
            # bitwise-identical while the resident learned support halves
            # under bf16 (1.07 -> 0.53 GiB at 327k — the full-model
            # frontier enabler, BENCH_NOTES round 5); fp32 models are
            # untouched (same-dtype astype is a no-op)
            adp = masks[0].materialize(params["nodevec1"],
                                       params["nodevec2"],
                                       out_dtype=jnp.dtype(cfg.dtype))
        else:
            if cfg.num_nodes >= 16384:
                # at city scale the O(N^2) dense materialization (>= 1 GB
                # fp32) is always a mistake whatever the fixed supports
                # (sparse, dense, or none/aptonly — ADVICE r3) — demand
                # the masked form instead
                raise ValueError(
                    "addaptadj without a BlockAdaptiveMask at "
                    f"num_nodes={cfg.num_nodes} would materialize the "
                    "dense O(N^2) adaptive adjacency; put a mask in the "
                    "supports list (ops.adaptive_block."
                    "mask_from_supports(fixed), or mask_from_pairs with a "
                    "chosen pattern for aptonly)")
            adp = adaptive_adjacency(params["nodevec1"],
                                     params["nodevec2"])
        new_supports = fixed + [adp]

    return _wavenet_stack(cfg, params, state, x, new_supports,
                          use_gcn=cfg.gcn_bool and supports is not None,
                          train=train, rng=rng)


def _wavenet_stack(cfg: ModelConfig, params: Params, state: State,
                   x: jnp.ndarray, supports, *, use_gcn: bool, train: bool,
                   rng: jax.Array | None) -> tuple[jnp.ndarray, State]:
    """Shared block/layer stack + output head for both model variants
    (`/root/reference/model.py:192-241` and `:355-407`)."""
    skip = None
    new_bn = []
    # The reference crops the skip accumulator to each new contribution's
    # time length (`model.py:216-222`), so only the last T_final timesteps of
    # every layer's skip projection ever reach the head (T_final = time length
    # after ALL gated convs — 1 for canonical configs). Slicing the activation
    # BEFORE the 1x1 skip projection is bitwise-identical (the projection is
    # time-independent) and deletes the largest tensors in the step: the
    # (B, T, N, skip_channels) projections shrink to (B, T_final, N, C).
    t_final = x.shape[1] - (cfg.kernel_size - 1) * sum(cfg.dilations())
    dropout_keys = None
    if train and cfg.dropout > 0.0 and use_gcn:
        assert rng is not None, "training with dropout needs an rng"
        dropout_keys = jax.random.split(rng, len(params["layers"]))

    def make_layer_fn(dilation: int):
        """One WaveNet layer as a pure function (remat-able)."""

        def layer_fn(layer, bn_state_i, residual, skip, supports_t, stacks_t,
                     dropout_key):
            x = gated_tcn_apply(layer["filter"], layer["gate"],
                                residual, dilation)
            s = linear_apply(layer["skip"], x[:, -t_final:])
            # every contribution is pre-cropped to T_final, so the reference's
            # running crop (`model.py:216-222`) collapses to a plain add
            skip = s if skip is None else s + skip

            if use_gcn:
                x = gcn_apply(layer["gcn"], x, list(supports_t),
                              order=cfg.diffusion_order,
                              dropout=cfg.dropout, rng=dropout_key,
                              train=train, mode=cfg.resolved_gcn_mode,
                              stacks=list(stacks_t) or None)
            else:
                x = linear_apply(layer["residual"], x)

            x = x + residual[:, -x.shape[1]:]
            x, bn_s = batch_norm_apply(layer["bn"], bn_state_i, x,
                                       train=train)
            return x, skip, bn_s

        return layer_fn

    supports_t = tuple(supports) if supports is not None else ()
    # hoisted power stacks: the same supports feed every layer, so the
    # O(N^3) squaring in "stacked" mode happens once per forward here —
    # XLA CSE does not merge them across jax.checkpoint boundaries, so
    # hoisting (not per-layer recompute) is load-bearing under remat too
    stacks_t = ()
    if (use_gcn and cfg.resolved_gcn_mode == "stacked"
            and all(getattr(a, "ndim", None) in (2, 3)
                    for a in supports_t)):
        stacks_t = tuple(support_powers(a, cfg.diffusion_order)
                         for a in supports_t)
    for i, (layer, dilation) in enumerate(
            zip(params["layers"], cfg.dilations())):
        layer_fn = make_layer_fn(dilation)
        if cfg.remat and skip is not None:
            # first layer stays un-rematted (skip is None, a static arg)
            layer_fn = jax.checkpoint(layer_fn)
        x, skip, bn_s = layer_fn(
            layer, state["bn"][i], x, skip, supports_t, stacks_t,
            None if dropout_keys is None else dropout_keys[i])
        new_bn.append(bn_s)

    out = jax.nn.relu(skip)
    out = jax.nn.relu(linear_apply(params["end1"], out))
    out = linear_apply(params["end2"], out)
    # predictions leave the model in fp32 whatever the compute dtype
    return out.astype(jnp.float32), {"bn": new_bn}
