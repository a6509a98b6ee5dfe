"""Jitted training engine.

Parity target: the reference ``trainer`` (`/root/reference/engine.py:9-181`)
— Adam with L2 weight decay, global-norm gradient clipping at 5, masked-MAE
on inverse-standardized predictions with ``null_val=0.0`` — re-designed for
XLA:

- one ``train_step`` = forward + grad + clip + Adam update, jitted with
  donated state so params update in place on device;
- metrics (loss/MAPE/RMSE) are returned as on-device scalars and accumulated
  by the caller — no per-step ``.item()`` host syncs (the reference syncs
  3x per step, `engine.py:56-58`);
- the optimizer is an optax chain ordered exactly like torch's
  ``clip_grad_norm_`` + ``Adam(weight_decay=...)``: clip first, then add
  ``wd * p`` to the clipped gradient, then Adam moments on the sum.

Variants:
- :meth:`Engine.train_step` / :meth:`Engine.eval_step` — real datasets
  (`engine.py:41-58,119-130`); note the reference's ``eval`` runs without
  ``no_grad`` (quirk #1, SURVEY.md §7.4) — here eval is a separate pure
  function, fixed by construction.
- :meth:`Engine.train_step_syn` / :meth:`Engine.eval_step_syn` — synthetic
  two-modality supervision (`engine.py:64-117,132-181`): the predicted fine
  sequence is pooled into a temporally-coarse F̂ (block mean over F_t windows,
  repeated back) and a spatially-coarse Ê (community-mean via a cluster-mean
  projector matrix — the reference's in-place ragged scatter loop
  (`engine.py:93-105`) becomes one diffusion matmul).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graph_wavenet_tpu.config import ModelConfig, TrainConfig
from graph_wavenet_tpu.data.scaler import StandardScaler
from graph_wavenet_tpu.models.gwnet import apply_gwnet, init_gwnet
from graph_wavenet_tpu.models.gwnet_diff_g import (
    apply_gwnet_diff_g,
    init_gwnet_diff_g,
)
from graph_wavenet_tpu.ops.diffusion import nconv, nconv_batched
from graph_wavenet_tpu.train.metrics import (
    masked_mae,
    masked_mape,
    masked_rmse,
)


def make_optimizer(cfg: TrainConfig,
                   steps_per_epoch: int = 0) -> optax.GradientTransformation:
    """clip -> +wd*p -> adam moments -> -lr, matching torch semantics
    (`/root/reference/engine.py:33,53-55`).

    Optional step-decay schedule (the reference's commented-out
    lr*0.1^(epoch//10) at `train.py:146-149`): requires ``steps_per_epoch``
    (the schedule counts optimizer steps) — configuring ``lr_decay`` without
    it is an error rather than a silently constant learning rate.
    """
    if cfg.lr_decay < 1.0 and steps_per_epoch <= 0:
        raise ValueError(
            f"TrainConfig.lr_decay={cfg.lr_decay} < 1 needs steps_per_epoch "
            "to convert epochs to optimizer steps — pass "
            "Engine(..., steps_per_epoch=train_loader.num_batch)")
    if cfg.lr_decay < 1.0:
        def schedule(step):
            epoch = step // steps_per_epoch
            lr = cfg.learning_rate * cfg.lr_decay ** (
                epoch // cfg.lr_decay_every)
            return jnp.maximum(lr, cfg.min_lr)
    else:
        def schedule(step):
            return cfg.learning_rate
    # always scale_by_schedule (constant schedule when lr_decay is off) so
    # the opt_state STRUCTURE is invariant to the decay config — a
    # checkpoint written with decay on resumes into an engine with it off
    # and vice versa (optax.scale is stateless; mixing the two made resume
    # fail on the pytree mismatch)
    lr_term = optax.scale_by_schedule(lambda s: -schedule(s))
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        lr_term,
    )


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Any
    opt_state: Any
    model_state: Any          # BN running stats
    step: jnp.ndarray
    rng: jax.Array


def gather_window_rows(src: jnp.ndarray, starts: jnp.ndarray,
                       length: int) -> jnp.ndarray:
    """(T, ...) resident series + (B,) start rows -> (B, length, ...)
    window gather — the on-device equivalent of the native loader's
    ``gather_windows`` (used by the fused windows-on-demand scans)."""
    idx = starts[:, None] + jnp.arange(length)[None, :]
    return jnp.take(src, idx, axis=0)


def _constrain(a, sharding):
    """Pin a batch gathered from mesh-replicated resident data to the
    mesh's batch layout (fused multi-chip feed): without the constraint
    GSPMD keeps the gather output replicated and every device computes
    the FULL batch. Rank-adapts the spec like ``loader.sharded_iterator``
    (a (B, N, N) per-sample support under a 4-D batch spec takes the
    leading prefix). No-op without a sharding (single-chip paths)."""
    if sharding is None:
        return a
    spec = sharding.spec
    if a.ndim < len(spec):
        from jax.sharding import NamedSharding, PartitionSpec
        sharding = NamedSharding(sharding.mesh, PartitionSpec(*spec[:a.ndim]))
    return jax.lax.with_sharding_constraint(a, sharding)


def horizon_target(y: jnp.ndarray) -> jnp.ndarray:
    """y (B, H, N, F) -> (B, 1, N, H) speed-channel target, the layout the
    reference compares against (`engine.py:46-48`)."""
    return jnp.transpose(y[..., 0], (0, 2, 1))[:, None]


def modality_target(y: jnp.ndarray) -> jnp.ndarray:
    """y (B, K, N, 2) -> (B, 2, N, K): channel 0 = F target, 1 = E target
    (`engine.py:110` vs the data layout of `dataTools.py:137`)."""
    return jnp.transpose(y, (0, 3, 2, 1))


def pool_F(predict: jnp.ndarray, F_t: int) -> jnp.ndarray:
    """Temporal block-mean over windows of F_t, repeated back to full rate
    (`engine.py:87-92`). predict: (B, 1, N, K)."""
    b, c, n, k = predict.shape
    if k % F_t != 0:
        raise ValueError(
            f"F-modality pooling needs seq_length K={k} divisible by "
            f"F_t={F_t} (the reference picks F_t = K//12, util.py:234)")
    f = predict.reshape(b, c, n, k // F_t, F_t).mean(-1)
    return jnp.repeat(f, F_t, axis=-1)


def cluster_mean_projector(labels: np.ndarray,
                           n_communities: int) -> np.ndarray:
    """(N,) int labels -> (N, N) projector P with P[n, v] = 1/|c(n)| iff
    v is in n's community: ``P @ x`` replaces the reference's in-place
    per-cluster mean scatter (`engine.py:93-105`). Host-side, built once."""
    labels = np.asarray(labels)
    onehot = (labels[:, None] == np.arange(n_communities)[None, :]).astype(
        np.float32)
    counts = onehot.sum(0)
    return (onehot / np.maximum(counts, 1.0)[None, :]) @ onehot.T


def pool_E(predict: jnp.ndarray, projector: jnp.ndarray) -> jnp.ndarray:
    """Community-mean pooling via the projector; shared (N, N) or per-sample
    (B, N, N). predict: (B, 1, N, K) -> same shape."""
    # projector mixes the node axis; reuse the diffusion einsum with P^T
    # (nconv contracts x[..., v, :] with A[v, w]: out_w = sum_v x_v P[w, v]).
    x = jnp.transpose(predict, (0, 3, 2, 1))        # (B, K, N, 1)
    if projector.ndim == 3:
        out = nconv_batched(x, jnp.swapaxes(projector, 1, 2))
    else:
        out = nconv(x, projector.T)
    return jnp.transpose(out, (0, 3, 2, 1))


class Engine:
    """Builds jitted train/eval steps for either model variant.

    Model selection mirrors the reference's type-dispatch
    (`engine.py:14-31`): per-sample supports (diff_g=True) select the batched
    variant. ``supports`` for the shared-graph model are captured as constants
    of the jitted step.
    """

    def __init__(self, model_cfg: ModelConfig, train_cfg: TrainConfig,
                 scaler: StandardScaler | None, diff_g: bool = False,
                 seed: int | None = None, steps_per_epoch: int = 0):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.scaler = scaler or StandardScaler(0.0, 1.0)
        self.diff_g = diff_g
        self.optimizer = make_optimizer(train_cfg, steps_per_epoch)
        seed = train_cfg.seed if seed is None else seed
        key = jax.random.key(seed, impl=train_cfg.rng_impl)

        init = init_gwnet_diff_g if diff_g else init_gwnet
        kp, kr = jax.random.split(key)
        params, model_state = init(kp, model_cfg)
        self.state = TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            model_state=model_state,
            step=jnp.zeros((), jnp.int32),
            rng=kr,
        )

    # ------------------------------------------------------------------
    # forward plumbing shared by all steps
    # ------------------------------------------------------------------

    def _forward(self, params, model_state, x, supports, train, rng):
        # engine-level left pad by one step (`engine.py:44,69,121,135`)
        x = jnp.pad(x, ((0, 0), (1, 0), (0, 0), (0, 0)))
        if self.diff_g:
            out, new_ms = apply_gwnet_diff_g(
                self.model_cfg, params, model_state, x, supports,
                train=train, rng=rng)
        else:
            out, new_ms = apply_gwnet(
                self.model_cfg, params, model_state, x, supports,
                train=train, rng=rng)
        predict = out * self.scaler.std + self.scaler.mean
        return predict, new_ms

    def _loss_real(self, params, model_state, x, y, supports, rng):
        predict, new_ms = self._forward(params, model_state, x, supports,
                                        True, rng)
        real = horizon_target(y)
        loss = masked_mae(predict, real, 0.0)
        return loss, (predict, real, new_ms)

    def _check_syn_collapse(self, predict):
        """The F/E modality supervision (`engine.py:87-110`) needs the
        dilated stack to collapse time to ONE output step; with a too-short
        receptive field the reference fails with an opaque broadcast error —
        fail with the fix instead."""
        if predict.shape[1] != 1:
            k = predict.shape[-1]
            raise ValueError(
                f"modality (F/E) supervision requires the dilated conv "
                f"stack to collapse time to one step, but the model "
                f"produced {predict.shape[1]} output steps for seq_length "
                f"K={k} (receptive_field={self.model_cfg.receptive_field}, "
                f"input K+1={k + 1}). Choose blocks/layers/start_dilation "
                f"so receptive_field == K+1, or reduce seq_length.")

    def _loss_syn(self, params, model_state, x, y, supports, projector,
                  F_t, rng):
        predict, new_ms = self._forward(params, model_state, x, supports,
                                        True, rng)
        self._check_syn_collapse(predict)
        real = modality_target(y)
        f_hat = pool_F(predict, F_t)
        e_hat = pool_E(predict, projector)
        loss = masked_mae(jnp.concatenate([f_hat, e_hat], axis=1), real, 0.0)
        return loss, (e_hat, real, new_ms)

    def _update(self, state: TrainState, grads, new_ms) -> TrainState:
        updates, new_opt = self.optimizer.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(params=new_params, opt_state=new_opt,
                          model_state=new_ms, step=state.step + 1,
                          rng=state.rng)

    # ------------------------------------------------------------------
    # real-dataset steps (`engine.py:41-58,119-130`)
    # ------------------------------------------------------------------

    @staticmethod
    def _train_metrics(loss, predict, real) -> dict:
        return {
            "loss": loss,
            "mape": masked_mape(predict, real, 0.0),
            "rmse": masked_rmse(predict, real, 0.0),
        }

    def _train_step_core(self, state: TrainState, x, y, supports):
        rng = jax.random.fold_in(state.rng, state.step)
        (loss, (predict, real, new_ms)), grads = jax.value_and_grad(
            self._loss_real, has_aux=True)(
                state.params, state.model_state, x, y, supports, rng)
        new_state = self._update(state, grads, new_ms)
        return new_state, self._train_metrics(loss, predict, real)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, x, y, supports):
        return self._train_step_core(state, x, y, supports)

    @functools.partial(jax.jit, static_argnums=(0, 5), donate_argnums=1)
    def train_step_accum(self, state: TrainState, x, y, supports,
                         n_micro: int):
        """One optimizer step over ``n_micro`` sequential micro-batches:
        grads (and the loss-weighted metrics) averaged across micro-batches
        before the single clip+Adam update. Peak activation memory drops
        ~n_micro-fold — the TPU-native answer to the reference's
        memory-limited chunking (`/root/reference/Utils/util.py:352-356`).

        x/y: (B, ...) with B divisible by n_micro. NOT bit-identical to a
        full-batch step (the standard accumulation semantics): BatchNorm
        normalizes each micro-batch with its OWN statistics (and the
        running stats keep the last micro-batch's update), and the loss is
        a mean of micro-batch masked means. Differences are O(BN batch
        noise) — shrink with micro-batch size.
        """
        b = x.shape[0]
        assert b % n_micro == 0, (
            f"batch {b} must divide by n_micro={n_micro}")
        mb = b // n_micro
        xm = x.reshape(n_micro, mb, *x.shape[1:])
        ym = y.reshape(n_micro, mb, *y.shape[1:])
        rng = jax.random.fold_in(state.rng, state.step)
        grad_fn = jax.value_and_grad(self._loss_real, has_aux=True)

        def body(carry, xyi):
            acc, _ = carry
            xi, yi, i = xyi
            # fresh dropout stream per micro-batch (identical masks across
            # micro-batches would correlate the regularization noise)
            rng_i = jax.random.fold_in(rng, i)
            (loss, (predict, real, ms)), grads = grad_fn(
                state.params, state.model_state, xi, yi, supports, rng_i)
            acc = jax.tree_util.tree_map(jnp.add, acc, grads)
            return (acc, ms), self._train_metrics(loss, predict, real)

        zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (gsum, new_ms), metrics = jax.lax.scan(
            body, (zero, state.model_state),
            (xm, ym, jnp.arange(n_micro, dtype=jnp.int32)))
        grads = jax.tree_util.tree_map(lambda g: g / n_micro, gsum)
        new_state = self._update(state, grads, new_ms)
        return new_state, jax.tree_util.tree_map(jnp.mean, metrics)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1,
                       static_argnames=("batch_sharding",))
    def train_steps_resident(self, state: TrainState, xs, ys, idx,
                             supports, *, batch_sharding=None):
        """S optimizer steps in ONE dispatch: gather each step's batch from
        the device-resident sample arrays and run the step inside a
        ``lax.scan``. Amortizes per-dispatch overhead (which dominates the
        epoch through slow transports — BENCH_NOTES.md) S-fold.

        xs/ys: (n_samples, T, N, C) resident arrays; idx: (S, B) int32
        sample indices (one row per step). Returns (new_state, metrics) with
        each metric of shape (S,). Identical math to S ``train_step`` calls
        on the gathered batches — the per-step dropout stream is
        ``fold_in(rng, step)`` either way.

        ``batch_sharding``: mesh layout for the gathered batches (a
        ``NamedSharding``, static) — the multi-chip fused feed: resident
        arrays stay mesh-replicated, each scanned step's batch is
        constrained to the DP/TP/SP layout so the step computes sharded
        exactly like the per-step mesh path.
        """
        def body(st, sel):
            x = _constrain(jnp.take(xs, sel, axis=0), batch_sharding)
            y = _constrain(jnp.take(ys, sel, axis=0), batch_sharding)
            return self._train_step_core(st, x, y, supports)

        return jax.lax.scan(body, state, idx)

    @functools.partial(jax.jit, static_argnums=(0, 4, 5, 6),
                       donate_argnums=1,
                       static_argnames=("batch_sharding",))
    def train_steps_windows(self, state: TrainState, series, anchors,
                            window: int, horizon: int, y_start: int,
                            supports, y_series=None, *,
                            batch_sharding=None):
        """Windows-on-demand variant of :meth:`train_steps_resident`: the
        scan body gathers each step's x/y windows from the resident raw
        series (x from ``series`` — standardized — and y from ``y_series``,
        raw units). anchors: (S, B) int32 last-observed-step indices.
        ``horizon`` is the LAST y offset, so y windows have length
        horizon - y_start + 1 (the reference y_offsets convention; ==
        horizon for the canonical y_start=1). ``batch_sharding``: see
        :meth:`train_steps_resident`."""
        ys_src = series if y_series is None else y_series

        def body(st, a):
            x = _constrain(gather_window_rows(series, a - (window - 1),
                                              window), batch_sharding)
            y = _constrain(gather_window_rows(ys_src, a + y_start,
                                              horizon - y_start + 1),
                           batch_sharding)
            return self._train_step_core(st, x, y, supports)

        return jax.lax.scan(body, state, anchors)

    @functools.partial(jax.jit, static_argnums=(0, 4, 5, 6),
                       static_argnames=("batch_sharding",))
    def eval_steps_windows(self, state: TrainState, series, anchors,
                           window: int, horizon: int, y_start: int,
                           supports, y_series=None, *,
                           batch_sharding=None):
        """Whole-eval-set scan: anchors (C, B) -> metrics dicts of (C,).
        Windows gathered on device per chunk (see train_steps_windows)."""
        ys_src = series if y_series is None else y_series

        def body(_, a):
            x = _constrain(gather_window_rows(series, a - (window - 1),
                                              window), batch_sharding)
            y = _constrain(gather_window_rows(ys_src, a + y_start,
                                              horizon - y_start + 1),
                           batch_sharding)
            return None, self._eval_metrics(state, x, y, supports)

        _, ms = jax.lax.scan(body, None, anchors)
        return ms

    @functools.partial(jax.jit, static_argnums=0,
                       static_argnames=("batch_sharding",))
    def eval_steps_resident(self, state: TrainState, xs, ys, idx, supports,
                            *, batch_sharding=None):
        """Whole-eval-set scan over resident sample arrays: idx (C, B)."""
        def body(_, sel):
            x = _constrain(jnp.take(xs, sel, axis=0), batch_sharding)
            y = _constrain(jnp.take(ys, sel, axis=0), batch_sharding)
            return None, self._eval_metrics(state, x, y, supports)

        _, ms = jax.lax.scan(body, None, idx)
        return ms

    def _eval_metrics(self, state: TrainState, x, y, supports):
        predict, _ = self._forward(state.params, state.model_state, x,
                                   supports, False, state.rng)
        real = horizon_target(y)
        return self._train_metrics(masked_mae(predict, real, 0.0),
                                   predict, real)

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, state: TrainState, x, y, supports):
        return self._eval_metrics(state, x, y, supports)

    @functools.partial(jax.jit, static_argnums=0)
    def predict_step(self, state: TrainState, x, supports):
        """Raw (un-inverse-transformed) forward for the per-horizon test loop.

        NB: the reference test loop calls the model with NO engine-level
        1-step pad (`train.py:382-386`), unlike train/eval — the model's own
        receptive-field pad covers the missing step. Replicated exactly.
        """
        apply = apply_gwnet_diff_g if self.diff_g else apply_gwnet
        out, _ = apply(self.model_cfg, state.params, state.model_state, x,
                       supports, train=False, rng=state.rng)
        return out

    # ------------------------------------------------------------------
    # synthetic two-modality steps (`engine.py:64-117,132-181`)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 6), donate_argnums=1)
    def train_step_syn(self, state: TrainState, x, y, supports, projector,
                       F_t: int):
        return self._train_step_syn_core(state, x, y, supports, projector,
                                         F_t)

    def _train_step_syn_core(self, state: TrainState, x, y, supports,
                             projector, F_t: int):
        rng = jax.random.fold_in(state.rng, state.step)
        (loss, (e_hat, real, new_ms)), grads = jax.value_and_grad(
            self._loss_syn, has_aux=True)(
                state.params, state.model_state, x, y, supports, projector,
                F_t, rng)
        new_state = self._update(state, grads, new_ms)
        # reference reports mape/rmse of the E-pooled prediction vs the full
        # 2-channel target (`engine.py:115-116` uses `predict` post-pooling)
        metrics = {
            "loss": loss,
            "mape": masked_mape(e_hat, real, 0.0),
            "rmse": masked_rmse(e_hat, real, 0.0),
        }
        return new_state, metrics

    @functools.partial(jax.jit, static_argnums=(0, 6, 7), donate_argnums=1)
    def train_step_syn_accum(self, state: TrainState, x, y, supports,
                             projector, F_t: int, n_micro: int):
        """One optimizer step over ``n_micro`` sequential micro-batches of
        the modality-supervised (syn / CRASH) step: grads and metrics
        averaged before a single clip+Adam update, ~n_micro-fold lower
        activation memory. CRASH at K = int(F_t*5) ≈ 2912
        (`/root/reference/Utils/util.py:416-417`) is exactly the workload
        the reference chunks by hand "due to memory limit" (`util.py:
        352-356`) — this is the TPU-native knob for it.

        Per-sample supports (B, N, N) and cluster projectors (B, N, N) are
        micro-sliced alongside the batch; shared (N, N) ones are closed
        over. Same BN caveat as :meth:`train_step_accum`: micro-batches
        normalize with their own statistics.
        """
        b = x.shape[0]
        assert b % n_micro == 0, (
            f"batch {b} must divide by n_micro={n_micro}")
        mb = b // n_micro

        def _micro(a):
            return a.reshape(n_micro, mb, *a.shape[1:])

        supports = list(supports or [])
        sup_scan = [_micro(s) if (s.ndim == 3 and s.shape[0] == b) else None
                    for s in supports]
        proj_scan = (_micro(projector)
                     if projector.ndim == 3 and projector.shape[0] == b
                     else None)
        rng = jax.random.fold_in(state.rng, state.step)
        grad_fn = jax.value_and_grad(self._loss_syn, has_aux=True)

        def body(carry, inp):
            acc, _ = carry
            xi, yi, i, sup_i_scan, proj_i = inp
            sup_i = [a if a is not None else supports[j]
                     for j, a in enumerate(sup_i_scan)]
            proj_i = proj_i if proj_i is not None else projector
            rng_i = jax.random.fold_in(rng, i)
            (loss, (e_hat, real, ms)), grads = grad_fn(
                state.params, state.model_state, xi, yi, sup_i, proj_i,
                F_t, rng_i)
            acc = jax.tree_util.tree_map(jnp.add, acc, grads)
            metrics = {
                "loss": loss,
                "mape": masked_mape(e_hat, real, 0.0),
                "rmse": masked_rmse(e_hat, real, 0.0),
            }
            return (acc, ms), metrics

        zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (gsum, new_ms), metrics = jax.lax.scan(
            body, (zero, state.model_state),
            (_micro(x), _micro(y), jnp.arange(n_micro, dtype=jnp.int32),
             sup_scan, proj_scan))
        grads = jax.tree_util.tree_map(lambda g: g / n_micro, gsum)
        new_state = self._update(state, grads, new_ms)
        return new_state, jax.tree_util.tree_map(jnp.mean, metrics)

    @functools.partial(jax.jit, static_argnums=(0, 8), donate_argnums=1,
                       static_argnames=("batch_sharding",
                                        "batched_sharding"))
    def train_steps_syn_resident(self, state: TrainState, xs, ys, idx,
                                 adj_of_sample, sup_stack, proj_stack,
                                 F_t: int, *, batch_sharding=None,
                                 batched_sharding=None):
        """Fused diff-G training: S steps per dispatch. The scan body
        gathers each step's samples AND their per-sample supports/cluster
        projectors from resident stacks.

        xs/ys: (n_samples, ...) resident; idx: (S, B) sample indices;
        adj_of_sample: (n_samples,) graph index per sample; sup_stack: list
        of (n_graphs, N, N); proj_stack: (n_graphs, N, N) cluster-mean
        projectors (see :func:`cluster_mean_projector`).

        ``batch_sharding``/``batched_sharding``: mesh layouts for the
        gathered (B, T, N, C) batches and the (B, N, N) per-sample
        support/projector gathers respectively (static NamedShardings;
        see :meth:`train_steps_resident` and
        ``parallel.mesh.support_sharding(batched=True)``).
        """
        def body(st, sel):
            x = _constrain(jnp.take(xs, sel, axis=0), batch_sharding)
            y = _constrain(jnp.take(ys, sel, axis=0), batch_sharding)
            gids = jnp.take(adj_of_sample, sel)
            sup = [_constrain(jnp.take(s, gids, axis=0), batched_sharding)
                   for s in sup_stack]
            proj = _constrain(jnp.take(proj_stack, gids, axis=0),
                              batched_sharding)
            return self._train_step_syn_core(st, x, y, sup, proj, F_t)

        return jax.lax.scan(body, state, idx)

    @functools.partial(jax.jit, static_argnums=(0, 6))
    def eval_step_syn(self, state: TrainState, x, y, supports, projector,
                      F_t: int):
        predict, _ = self._forward(state.params, state.model_state, x,
                                   supports, False, state.rng)
        self._check_syn_collapse(predict)
        real = modality_target(y)
        f_hat = pool_F(predict, F_t)
        e_hat = pool_E(predict, projector)
        loss = masked_mae(jnp.concatenate([f_hat, e_hat], axis=1), real, 0.0)
        return {
            "loss": loss,
            "mape": masked_mape(e_hat, real, 0.0),
            "rmse": masked_rmse(e_hat, real, 0.0),
            "pred_F": f_hat,
            "pred_E": e_hat,
        }
