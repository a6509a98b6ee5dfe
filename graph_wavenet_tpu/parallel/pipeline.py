"""GPipe-style pipeline parallelism over the WaveNet block stack.

The reference is single-device; SURVEY.md §2.8 lists pipeline parallelism as
the one strategy with no reference counterpart beyond "optional
layer-pipelining over blocks". This module builds it TPU-native:

- the layer stack is cut into ``n_stages`` groups of WHOLE blocks (every
  block repeats the same dilation schedule, `/root/reference/model.py:130-155`,
  so every stage runs an identical program — the SPMD requirement);
- stages live on a ``pipe`` mesh axis; micro-batches flow through a
  ``lax.scan`` over ``n_micro + n_stages - 1`` ticks with activations (and
  the running skip accumulator) handed to the next stage by
  ``lax.ppermute`` over ICI each tick;
- the scan + ppermute construction is differentiable: ``jax.grad`` reverses
  it into the backward pipeline automatically (cotangents ppermute the
  opposite direction), so one ``value_and_grad`` gives GPipe
  forward-then-backward with no hand-written schedule;
- the ``pipe`` axis is *manual* (``shard_map``) while every other mesh axis
  stays auto/GSPMD — batch-dim data parallelism composes freely and
  BatchNorm batch statistics remain global over the data axis.

Shape trick: the per-layer valid convs shrink time, so stages would have
different activation shapes — illegal under SPMD. Instead every stage's
output is re-padded on the left to the stage-input width and handed on; the
zeros land in the causal prefix that later stages' valid tails never read
(the valid tail shrinks by exactly the stage's receptive-field growth), so
results are bit-identical to the unsharded stack.

Semantics match :meth:`Engine.train_step_accum` with the same ``n_micro``
(micro-batch BatchNorm statistics, per-micro-batch dropout streams via the
same ``fold_in`` schedule, mean-of-micro-batch-losses objective) — pinned by
``tests/test_pipeline.py``.

This is the capability/correctness implementation: micro-batch inputs are
replicated along ``pipe`` and outputs are collected with a per-tick masked
``psum`` — fine for the model sizes this framework targets (params and
activations are small; PP exists for composition and as the scheduling
skeleton), not tuned for pipelines where stage weights dominate HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from graph_wavenet_tpu.config import ModelConfig
from graph_wavenet_tpu.models.gwnet import Params, State
from graph_wavenet_tpu.ops.adaptive import adaptive_adjacency
from graph_wavenet_tpu.ops.diffusion import (
    dropout_scale,
    gcn_apply,
    support_powers,
)
from graph_wavenet_tpu.ops.linear import linear_apply
from graph_wavenet_tpu.ops.normalization import masked_batch_norm_apply
from graph_wavenet_tpu.ops.temporal import gated_tcn_apply, left_pad_time
from graph_wavenet_tpu.parallel.mesh import DATA

PIPE = "pipe"


def make_pipeline_mesh(n_stages: int, devices=None) -> Mesh:
    """A (data, pipe) mesh: ``n_stages`` devices on the pipe axis, the rest
    absorbed by data parallelism."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % n_stages == 0, (
        f"{n} devices not divisible by n_stages={n_stages}")
    dev = np.asarray(devices).reshape(n // n_stages, n_stages)
    return Mesh(dev, (DATA, PIPE))


def stack_stages(per_layer: list, n_stages: int):
    """Stack a per-layer list of pytrees (params or BN state) into one pytree
    whose leaves lead with (n_stages, layers_per_stage)."""
    n_layers = len(per_layer)
    assert n_layers % n_stages == 0
    lps = n_layers // n_stages
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)
    return jax.tree_util.tree_map(
        lambda a: a.reshape(n_stages, lps, *a.shape[1:]), stacked)


def unstack_stages(stacked, n_layers: int) -> list:
    """Inverse of :func:`stack_stages`: back to the per-layer list."""
    flat = jax.tree_util.tree_map(
        lambda a: a.reshape(n_layers, *a.shape[2:]), stacked)
    return [jax.tree_util.tree_map(lambda a: a[i], flat)
            for i in range(n_layers)]


def _stage_dilations(cfg: ModelConfig, n_stages: int) -> list[int]:
    """Per-stage dilation schedule. Stages are whole blocks, and every block
    repeats the same schedule (`model.py:130-155`), so stage s's layer j has
    the same dilation for every s — checked here."""
    dils = cfg.dilations()
    lps = len(dils) // n_stages
    for s in range(n_stages):
        assert dils[s * lps:(s + 1) * lps] == dils[:lps], (
            "stage dilation schedules differ — stages must align with "
            "block boundaries")
    return dils[:lps]


def pipeline_apply(cfg: ModelConfig, params: Params, state: State,
                   x: jnp.ndarray, supports, *, mesh: Mesh, n_micro: int,
                   train: bool = False, rng: jax.Array | None = None,
                   ) -> tuple[jnp.ndarray, State]:
    """Pipeline-parallel forward of the shared-graph Graph WaveNet.

    Same contract as :func:`models.gwnet.apply_gwnet` (x (B, T, N, in_dim),
    shared dense supports or None), except the batch is processed as
    ``n_micro`` sequential micro-batches — in eval mode the output is
    bit-identical to ``apply_gwnet``; in train mode BatchNorm uses
    per-micro-batch statistics and the running stats keep the LAST
    micro-batch's update, exactly the ``train_step_accum`` semantics.
    """
    n_stages = mesh.shape[PIPE]
    n_layers = cfg.blocks * cfg.layers
    assert cfg.blocks % n_stages == 0, (
        f"blocks={cfg.blocks} must divide by n_stages={n_stages} (stages "
        "are whole blocks)")
    b = x.shape[0]
    assert b % n_micro == 0, (
        f"batch {b} must divide by n_micro={n_micro}")
    bm = b // n_micro
    lps = n_layers // n_stages
    stage_dils = _stage_dilations(cfg, n_stages)
    use_gcn = cfg.gcn_bool and supports is not None

    # --- pre-stack work, replicated along pipe / GSPMD along data ---
    x = left_pad_time(x, cfg.receptive_field)
    x = x.astype(jnp.dtype(cfg.dtype))
    x = linear_apply(params["start_conv"], x)
    t0 = x.shape[1]
    delta = (cfg.kernel_size - 1) * sum(stage_dils)      # per-stage shrink
    t_final = t0 - n_stages * delta
    assert t_final >= 1

    new_supports = list(supports) if supports is not None else None
    if use_gcn and cfg.addaptadj:
        if cfg.fresh_nodevec:
            raise ValueError(
                "fresh_nodevec=True is the diff-G per-forward-embeddings "
                "quirk; the pipelined shared-graph model has no such mode "
                "— unset fresh_nodevec")   # same guard as apply_gwnet
        adp = adaptive_adjacency(params["nodevec1"], params["nodevec2"])
        new_supports = new_supports + [adp]
    supports_t = tuple(new_supports) if new_supports is not None else ()
    mode = cfg.resolved_gcn_mode
    stacks_t = ()
    # dense supports only, like _wavenet_stack: sparse/block-sparse support
    # objects have no matmul-power form (gcn_apply downgrades them to the
    # fused chain internally)
    if (use_gcn and mode == "stacked"
            and all(getattr(a, "ndim", None) in (2, 3)
                    for a in supports_t)):
        stacks_t = tuple(support_powers(a, cfg.diffusion_order)
                         for a in supports_t)

    stacked_layers = stack_stages(params["layers"], n_stages)
    stacked_bn = stack_stages(state["bn"], n_stages)

    # Dropout masks are drawn OUTSIDE the pipeline at each layer's GLOBAL
    # activation shape — inside, the re-pad trick gives later stages wider
    # (stage-local) buffers, and a bernoulli draw over a different shape is
    # a different mask. Drawing at the global shape with the exact
    # train_step_accum key stream (fold_in(rng, micro) -> per-layer split)
    # keeps the pipeline step bit-comparable to the accumulation step,
    # dropout included. Masks are left-padded to the stage-uniform width
    # (the pad lands in the garbage prefix) and passed in per layer slot.
    use_dropout = train and cfg.dropout > 0.0 and use_gcn
    masks = ()
    if use_dropout:
        assert rng is not None, "training with dropout needs an rng"
        n = x.shape[2]
        f = cfg.residual_channels
        dils = cfg.dilations()
        masks_by_slot = [[] for _ in range(lps)]
        for i in range(n_micro):
            rng_i = jax.random.fold_in(rng, i)
            layer_keys = jax.random.split(rng_i, n_layers)
            shrink = 0
            for g in range(n_layers):
                shrink += dils[g] * (cfg.kernel_size - 1)
                s, j = divmod(g, lps)
                w_local = t0 - (shrink - s * delta)
                m = dropout_scale(layer_keys[g], cfg.dropout,
                                  (bm, t0 - shrink, n, f), x.dtype)
                m = jnp.pad(m, ((0, 0), (s * delta, 0), (0, 0), (0, 0)))
                assert m.shape[1] == w_local
                masks_by_slot[j].append((s, m))
        # slot j: (n_micro, n_stages, bm, W_j, n, f), stage-sharded on axis 1
        masks = tuple(
            jnp.stack([jnp.stack(
                [m for _, m in ms[i * n_stages:(i + 1) * n_stages]])
                for i in range(n_micro)])
            for ms in masks_by_slot)

    xm = x.reshape(n_micro, bm, *x.shape[1:])
    # bubble ticks at the tail feed zeros into stage 0
    xm = jnp.concatenate(
        [xm, jnp.zeros((n_stages - 1, *xm.shape[1:]), xm.dtype)])
    n_ticks = n_micro + n_stages - 1

    def run(stage_layers, stage_bn, xm_in, masks_in, supports_in, stacks_in):
        s_idx = jax.lax.axis_index(PIPE)
        # local slices carry a leading (1,) stage axis
        layer_j = lambda j: jax.tree_util.tree_map(
            lambda a: a[0, j], stage_layers)
        bn_j = lambda j: jax.tree_util.tree_map(
            lambda a: a[0, j], stage_bn)
        fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

        def stage_fwd(act, skip, mb, t_valid_in):
            """The stage's layer chain for one tick; factored out so
            ``cfg.remat`` can rematerialize it in the backward pipeline
            (activations recomputed per tick instead of kept live across
            the whole scan — the same memory trade as apply_gwnet's
            per-layer ``jax.checkpoint``)."""
            h = act
            new_bn = []
            t_valid = t_valid_in
            for j in range(lps):
                lp = layer_j(j)
                hg = gated_tcn_apply(lp["filter"], lp["gate"], h,
                                     stage_dils[j])
                skip = skip + linear_apply(lp["skip"], hg[:, -t_final:])
                if use_gcn:
                    ho = gcn_apply(lp["gcn"], hg, list(supports_in),
                                   order=cfg.diffusion_order,
                                   mode=mode,
                                   stacks=list(stacks_in) or None)
                    if use_dropout:
                        ho = ho * jax.lax.dynamic_index_in_dim(
                            masks_in[j], mb, axis=0, keepdims=False)[0]
                else:
                    ho = linear_apply(lp["residual"], hg)
                ho = ho + h[:, -ho.shape[1]:]
                t_valid = t_valid - stage_dils[j] * (cfg.kernel_size - 1)
                # BN always starts from the ORIGINAL running stats; the
                # keep-last select below implements train_step_accum's
                # "last micro-batch's update wins"
                ho, bn_upd = masked_batch_norm_apply(lp["bn"], bn_j(j), ho,
                                                     t_valid, train=train)
                new_bn.append(bn_upd)
                h = ho
            # re-pad to the stage-input width: the zeros live in the causal
            # prefix that later stages' valid tails never read
            h = jnp.pad(h, ((0, 0), (t0 - h.shape[1], 0), (0, 0), (0, 0)))
            return h, skip, new_bn

        if cfg.remat:
            stage_fwd = jax.checkpoint(stage_fwd)

        def tick(carry, inp):
            t, act, skip, bn_carry = carry
            act = jnp.where(s_idx == 0, inp, act)
            mb = jnp.clip(t - s_idx, 0, n_micro - 1)
            # valid tail width entering this stage: the re-pad trick keeps
            # shapes uniform but leaves garbage in the causal prefix, so BN
            # statistics must be restricted to the valid steps (the
            # unsharded stack's BN reduces over exactly that region)
            h, skip, new_bn = stage_fwd(act, skip, mb, t0 - s_idx * delta)
            take = t == s_idx + n_micro - 1
            bn_new = stack_stages(new_bn, 1)
            bn_carry = jax.tree_util.tree_map(
                lambda c, u: jnp.where(take, u, c), bn_carry, bn_new)
            out = jax.lax.psum(
                jnp.where(s_idx == n_stages - 1, skip, 0), PIPE)
            act_nxt = jax.lax.ppermute(h, PIPE, fwd_perm)
            skip_nxt = jax.lax.ppermute(skip, PIPE, fwd_perm)
            return (t + 1, act_nxt, skip_nxt, bn_carry), out

        varying = lambda a: jax.lax.pcast(a, (PIPE,), to="varying")
        init = (jnp.int32(0),
                varying(jnp.zeros((bm, t0, *x.shape[2:]), x.dtype)),
                varying(jnp.zeros((bm, t_final, x.shape[2],
                                   cfg.skip_channels), x.dtype)),
                stage_bn)
        (_, _, _, bn_final), outs = jax.lax.scan(tick, init, xm_in)
        return outs[n_stages - 1:], bn_final

    skips, bn_final = jax.shard_map(
        run, mesh=mesh,
        in_specs=(P(PIPE), P(PIPE), P(),
                  tuple(P(None, PIPE) for _ in masks),
                  tuple(P() for _ in supports_t),
                  tuple(P() for _ in stacks_t)),
        out_specs=(P(), P(PIPE)),
        axis_names={PIPE},
    )(stacked_layers, stacked_bn, xm, masks, supports_t, stacks_t)

    # head on the re-assembled full batch (micro order == batch order)
    skip = skips.reshape(b, t_final, x.shape[2], cfg.skip_channels)
    out = jax.nn.relu(skip)
    out = jax.nn.relu(linear_apply(params["end1"], out))
    out = linear_apply(params["end2"], out)
    new_state = {"bn": unstack_stages(bn_final, n_layers)} if train \
        else state
    return out.astype(jnp.float32), new_state


def make_pipeline_train_step(engine, mesh: Mesh, n_micro: int):
    """A jitted pipeline-parallel training step for an :class:`Engine`.

    Same optimizer/loss plumbing as ``Engine.train_step_accum`` (mean of
    per-micro-batch masked-MAE losses -> one clip + Adam update); the
    forward/backward runs as a GPipe pipeline over ``mesh``'s ``pipe`` axis.
    State pytrees keep the engine's canonical (per-layer list) layout, so
    checkpointing, eval, and serving are unchanged.
    """
    from graph_wavenet_tpu.train.engine import horizon_target
    from graph_wavenet_tpu.train.metrics import masked_mae

    cfg = engine.model_cfg
    scaler = engine.scaler
    assert not engine.diff_g, (
        "pipeline parallelism supports the shared-graph gwnet only — the "
        "diff-G variant's per-sample supports and param layout are not "
        "wired into the pipelined stage")

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state, x, y, supports):
        if supports is not None and any(
                getattr(a, "ndim", None) not in (2, 3) for a in supports):
            # the ELL/block-sparse custom VJPs produce pipe-axis-varying
            # weight cotangents for a replicated primal, which shard_map's
            # manual-axes check rejects; forward/eval (pipeline_apply)
            # works. Training big sparse graphs is node-TP's job
            # (parallel/mesh.py), not the pipeline's.
            raise ValueError(
                "pipeline training supports dense (N, N) supports only — "
                "sparse/block-sparse support gradients are not defined "
                "under the manual pipe axis; use dense supports here or "
                "node tensor parallelism for large sparse graphs")
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            # engine-level left pad by one step (`engine.py:44`)
            xp = jnp.pad(x, ((0, 0), (1, 0), (0, 0), (0, 0)))
            out, new_ms = pipeline_apply(
                cfg, params, state.model_state, xp, supports, mesh=mesh,
                n_micro=n_micro, train=True, rng=rng)
            predict = out * scaler.std + scaler.mean
            real = horizon_target(y)
            pm = predict.reshape(n_micro, -1, *predict.shape[1:])
            rm = real.reshape(n_micro, -1, *real.shape[1:])
            losses = jax.vmap(lambda p, r: masked_mae(p, r, 0.0))(pm, rm)
            return losses.mean(), (pm, rm, new_ms)

        (loss, (pm, rm, new_ms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = engine._update(state, grads, new_ms)
        # per-micro metrics through the shared Engine helper, then the mean
        # over micro-batches — train_step_accum's exact construction
        per_micro = jax.vmap(
            lambda p, r: engine._train_metrics(masked_mae(p, r, 0.0), p, r)
        )(pm, rm)
        return new_state, jax.tree_util.tree_map(jnp.mean, per_micro)

    return step
