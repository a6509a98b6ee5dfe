"""Experiment runner: epoch loops, checkpoint-per-epoch, best-model
selection, per-horizon test evaluation.

Parity target: the epoch loops that live in the reference CLI
(`/root/reference/train.py:145-208,233-297`) and its test blocks
(`train.py:300-404`). Differences (deliberate):

- per-step metrics stay on device; host sync happens once per epoch
  (the reference `.item()`s three scalars every step);
- checkpoints carry full train state (see ``train.checkpoint``);
- the diff-G test loop evaluates with the *test* graphs — the reference
  evaluates state='test' against ``G['val']`` supports (quirk #3,
  SURVEY.md §7.4), which we fix.
"""

from __future__ import annotations

import contextlib
import json
import os
import signal
import threading
import time
from dataclasses import dataclass, field
import jax
import jax.numpy as jnp
import numpy as np

from graph_wavenet_tpu.config import TrainConfig
from graph_wavenet_tpu.data.prefetch import prefetch_to_device
from graph_wavenet_tpu.train import checkpoint as ckpt
from graph_wavenet_tpu.train.engine import Engine, cluster_mean_projector
from graph_wavenet_tpu.train.metrics import metric


def _as_support(s):
    """Device-coerce a support: dense arrays via jnp.asarray; ELL /
    block-sparse support objects (duck-typed by mix_2d) and adaptive
    masks pass through — their leaves are already jax arrays."""
    if hasattr(s, "mix_2d") or getattr(s, "adaptive_mask", False):
        return s
    return jnp.asarray(s)


class DeviceWedgedError(RuntimeError):
    """An epoch exceeded ``TrainConfig.epoch_timeout_s`` — through remote or
    tunneled device transports the typical cause is a wedged dispatch that
    will never return (observed in practice, bench.py watchdog). The runner
    writes diagnostics before raising; restart with ``resume_from=`` the
    last epoch checkpoint to continue (full train state is checkpointed)."""


@contextlib.contextmanager
def _epoch_watchdog(timeout_s: float, epoch: int):
    """SIGALRM-based stall detector around one epoch.

    Failure detection the reference lacks entirely (SURVEY.md §5). Only
    armable from the main thread with a real signal module; silently a
    no-op elsewhere. Mechanism limitation: CPython delivers signal
    handlers between bytecodes, so the alarm fires whenever the epoch loop
    re-enters the interpreter (dispatch loops, host-side work, fetches
    that poll) — but a single C-level wait that never returns control
    cannot be interrupted in-process. For hard wedges of that kind use an
    external supervisor on the process plus ``resume_from=``; this
    watchdog turns the common soft-wedge/slowdown cases into a diagnosed
    failure instead of a silent hang.
    """
    usable = (timeout_s > 0 and hasattr(signal, "setitimer")
              and threading.current_thread() is threading.main_thread())
    if not usable:
        yield
        return

    def fire(signum, frame):
        # re-arm before raising: if this raise lands inside C code or a GC
        # callback and gets swallowed, the next fire retries; once the
        # exception propagates, the finally below disarms. The retry
        # period is >= 1 s so exception handling itself is not interrupted.
        signal.setitimer(signal.ITIMER_REAL, max(timeout_s, 1.0))
        raise DeviceWedgedError(
            f"epoch {epoch} exceeded {timeout_s}s — device transport "
            "appears wedged; restart with resume_from= the last epoch "
            "checkpoint")

    prev = signal.signal(signal.SIGALRM, fire)
    signal.setitimer(signal.ITIMER_REAL, timeout_s)
    try:
        yield
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0.0)
        signal.signal(signal.SIGALRM, prev)


def _epoch_mean(steps: list[dict]) -> dict:
    """Average a list of on-device step-metric dicts with one host sync.
    Entries may be scalars (one step) or (S,) vectors (a fused scan of S
    steps); every step weighs equally."""
    if not steps:
        return {}
    stacked = {k: jnp.concatenate([jnp.atleast_1d(s[k]) for s in steps])
               for k in steps[0] if jnp.ndim(steps[0][k]) <= 1}
    host = jax.device_get(stacked)
    return {k: float(np.mean(v)) for k, v in host.items()}


@dataclass
class EpochLog:
    epoch: int
    train: dict
    valid: dict
    train_time: float
    valid_time: float


@dataclass
class RunResult:
    history: list[EpochLog] = field(default_factory=list)
    best_epoch: int = -1
    best_val_loss: float = float("inf")
    best_checkpoint: str = ""
    test_metrics: dict = field(default_factory=dict)
    per_horizon: list[tuple[float, float, float]] = field(
        default_factory=list)


def _print_flush(*args, **kwargs):
    print(*args, flush=True, **kwargs)   # reference prints flush=True too


class Runner:
    """Drives an Engine over a dataset dict from the data layer."""

    def __init__(self, engine: Engine, train_cfg: TrainConfig,
                 log_fn=_print_flush, mesh=None, mesh_cfg=None,
                 extra_meta: dict | None = None):
        """``mesh``/``mesh_cfg`` (optional): a `jax.sharding.Mesh` +
        `MeshConfig` from ``parallel.mesh`` — the loop then replicates the
        train state, shards every batch with ``batch_sharding`` and the
        supports with ``support_sharding``, and GSPMD partitions the jitted
        steps (DP / node-TP / time-SP per the MeshConfig). Multi-chip runs
        get the full production loop (watchdog, checkpoints, history.jsonl,
        early stopping) unchanged — including the device-resident fused
        feed: with ``scan_steps>1`` and a device-resident loader built
        with ``sharding=parallel.mesh.batch_sharding(mesh, mesh_cfg)``,
        the resident data is mesh-replicated and each scanned step's
        batch gather is constrained to the mesh layout (VERDICT r3 #2).
        The one remaining exclusion is ``prefetch``, whose host-side
        pipeline device_puts to a single device."""
        self.engine = engine
        self.cfg = train_cfg
        self.log = log_fn
        self.mesh = mesh
        if mesh is not None:
            from graph_wavenet_tpu.config import MeshConfig
            from graph_wavenet_tpu.parallel import mesh as M
            self.mesh_cfg = mesh_cfg or MeshConfig()
            if train_cfg.prefetch > 0:
                raise ValueError(
                    "Runner(mesh=...) does not compose with prefetch>0 — "
                    "the prefetch pipeline device_puts to a single "
                    "device; use a device-resident loader built with "
                    "sharding=parallel.mesh.batch_sharding(mesh, cfg) "
                    "instead")
            self._batched_sharding = M.support_sharding(
                mesh, self.mesh_cfg, batched=True)
            # emulated (CPU-device) meshes need step serialization; see
            # _throttle. Keyed off the mesh's own devices, not the default
            # backend — a CPU test mesh on a TPU/GPU host still deadlocks.
            self._emulated = mesh.devices.flat[0].platform == "cpu"
        # extra_meta: JSON-serializable records merged into every
        # checkpoint sidecar's "extra" (e.g. the city-scale node layout
        # from graphs.city.build_city_supports — gwt-test/serving read it
        # back to map predictions out of model node space)
        self.extra_meta = extra_meta or {}
        self._ckpt_scores: dict[str, float] = {}
        self._ckpt_writer = (ckpt.AsyncCheckpointer()
                             if train_cfg.async_checkpoint else None)

    def _shard_xy(self, x, y):
        """Lay a host batch out over the mesh (no-op without one)."""
        if self.mesh is None:
            return jnp.asarray(x), jnp.asarray(y)
        from graph_wavenet_tpu.parallel import mesh as M
        return M.shard_batch(self.mesh, self.mesh_cfg, x, y)

    def _throttle(self, metrics):
        """Serialize steps on an EMULATED (CPU) mesh: XLA:CPU's in-process
        collectives rendezvous over a shared device thread pool, and two
        overlapping executions of a collective program can each capture only
        part of the pool — a deadlock that aborts the process (observed at
        ~100 async steps). Real TPU meshes order executions in the runtime;
        no sync is inserted there."""
        if self.mesh is not None and self._emulated:
            jax.block_until_ready(metrics)
        return metrics

    def _shard_batched(self, array):
        """Shard a per-sample (B, N, N) support/projector stack along the
        batch axis of the mesh (no-op without one)."""
        if self.mesh is None:
            return array
        return jax.device_put(array, self._batched_sharding)

    def _place_for_mesh(self, state, supports):
        """Replicate the train state and shard the supports over the mesh."""
        if self.mesh is None:
            return state, supports
        from graph_wavenet_tpu.parallel import mesh as M
        state = M.shard_state(self.mesh, state)
        if supports is not None:
            ssh = M.support_sharding(self.mesh, self.mesh_cfg)
            # sparse supports (mix_2d) and adaptive masks place their own
            # leaves through shard_map specs / replication under jit —
            # forcing a layout here would fight parallel.sparse_tp
            supports = [s if (hasattr(s, "mix_2d")
                              or getattr(s, "adaptive_mask", False))
                        else jax.device_put(s, ssh)
                        if getattr(s, "ndim", None) == 2
                        else jax.device_put(s, M.replicated(self.mesh))
                        for s in supports]
        return state, supports

    def _feed(self, loader):
        """Batch iterator, prefetched to device ``cfg.prefetch`` steps ahead
        (see ``data.prefetch``); serial numpy iteration when disabled."""
        if self.cfg.prefetch > 0:
            return prefetch_to_device(loader.get_iterator(),
                                      size=self.cfg.prefetch)
        return loader.get_iterator()

    def _fused_mesh_args(self, resident_array):
        """(batch_sharding, put_sel) for the fused scan paths: without a
        mesh the index matrices go up with a plain jnp.asarray; with one
        they are replicated over the mesh and the engine constrains each
        scanned gather to the batch layout. Verifies the loader's
        resident arrays actually live on the mesh (they must be built
        with ``sharding=parallel.mesh.batch_sharding(mesh, mesh_cfg)``) —
        the raw jit error for the mismatch is opaque."""
        if self.mesh is None:
            return None, jnp.asarray
        from graph_wavenet_tpu.parallel import mesh as M
        if set(resident_array.devices()) != set(self.mesh.devices.flat):
            raise ValueError(
                "scan_steps>1 under a mesh needs the device-resident "
                "loader's arrays mesh-replicated — build the loader (or "
                "dataset) with sharding=parallel.mesh.batch_sharding("
                "mesh, mesh_cfg); its resident arrays live on "
                f"{len(resident_array.devices())} device(s), the mesh "
                f"has {self.mesh.devices.size}")
        rep = M.replicated(self.mesh)
        bsh = M.batch_sharding(self.mesh, self.mesh_cfg)
        return bsh, lambda a: jax.device_put(np.asarray(a), rep)

    def _eval_split(self, engine, state, loader, supports) -> list[dict]:
        """Eval metrics over a split; with scan fusion + a device-resident
        loader the WHOLE split runs in one dispatch."""
        if self.cfg.scan_steps > 1 and hasattr(loader, "resident_series"):
            sx, sy = loader.resident_series()
            bsh, put_sel = self._fused_mesh_args(sx)
            sel = next(loader.superbatches(loader.num_batch))
            return [self._throttle(engine.eval_steps_windows(
                state, sx, put_sel(sel), loader.window, loader.horizon,
                loader.y_start, supports, y_series=sy,
                batch_sharding=bsh))]
        if self.cfg.scan_steps > 1 and hasattr(loader, "resident_arrays"):
            xs, ys = loader.resident_arrays()
            bsh, put_sel = self._fused_mesh_args(xs)
            sel = next(loader.superbatches(loader.num_batch))
            return [self._throttle(engine.eval_steps_resident(
                state, xs, ys, put_sel(sel), supports,
                batch_sharding=bsh))]
        return [self._throttle(
            engine.eval_step(state, *self._shard_xy(x, y), supports))
                for x, y in self._feed(loader)]

    # ------------------------------------------------------------------
    # shared-graph datasets (METR-LA / PEMS-BAY / same-G synthetic)
    # ------------------------------------------------------------------

    def fit(self, data: dict, supports,
            resume_from: str | None = None) -> RunResult:
        """Epoch loop over ``train_loader``/``val_loader``
        (`train.py:233-297`).

        ``resume_from``: checkpoint path — restores the FULL train state
        (params + optimizer + BN + step + RNG) and continues from the next
        epoch. The reference cannot resume (state_dict only, SURVEY.md §5).
        """
        result = RunResult()
        engine = self.engine
        if (self.cfg.grad_accum > 1 and self.cfg.scan_steps > 1
                and hasattr(data["train_loader"], "superbatches")):
            raise ValueError(
                "grad_accum > 1 is not supported together with the fused "
                "multi-step path (scan_steps > 1 on a device-resident "
                "loader) — set scan_steps=1 to accumulate")
        start_epoch = self._resume(resume_from)
        state = engine.state
        supports = None if supports is None else [_as_support(s)
                                                  for s in supports]
        state, supports = self._place_for_mesh(state, supports)
        for epoch in range(start_epoch, self.cfg.epochs + 1):
            try:
                with _epoch_watchdog(self.cfg.epoch_timeout_s,
                                     epoch):
                    t1 = time.time()
                    loader = data["train_loader"]
                    loader.shuffle()
                    steps = []
                    scan = self.cfg.scan_steps
                    if scan > 1 and hasattr(loader, "resident_series"):
                        # fused path, windows-on-demand: gather inside the scan
                        sx, sy = loader.resident_series()
                        bsh, put_sel = self._fused_mesh_args(sx)
                        for sel in loader.superbatches(scan):
                            state, m = engine.train_steps_windows(
                                state, sx, put_sel(sel), loader.window,
                                loader.horizon, loader.y_start, supports,
                                y_series=sy, batch_sharding=bsh)
                            steps.append(self._throttle(m))
                        for x, y in loader.remainder_batches(scan):
                            state, m = engine.train_step(state, x, y, supports)
                            steps.append(self._throttle(m))
                    elif scan > 1 and hasattr(loader, "superbatches"):
                        # fused path: scan_steps optimizer steps per dispatch
                        xs, ys = loader.resident_arrays()
                        bsh, put_sel = self._fused_mesh_args(xs)
                        for sel in loader.superbatches(scan):
                            state, m = engine.train_steps_resident(
                                state, xs, ys, put_sel(sel), supports,
                                batch_sharding=bsh)
                            steps.append(self._throttle(m))
                        for x, y in loader.remainder_batches(scan):
                            state, m = engine.train_step(state, x, y, supports)
                            steps.append(self._throttle(m))
                    else:
                        accum = self.cfg.grad_accum
                        for it, (x, y) in enumerate(self._feed(loader)):
                            xs, ys = self._shard_xy(x, y)
                            if accum > 1:
                                state, m = engine.train_step_accum(
                                    state, xs, ys, supports, accum)
                            else:
                                state, m = engine.train_step(
                                    state, xs, ys, supports)
                            steps.append(self._throttle(m))
                            if it % self.cfg.print_every == 0:
                                mm = _epoch_mean([m])
                                self.log(f"Iter: {it:03d}, Train Loss: "
                                         f"{mm['loss']:.4f}, Train MAPE: "
                                         f"{mm['mape']:.4f}, Train RMSE: "
                                         f"{mm['rmse']:.4f}")
                    train_m = _epoch_mean(steps)   # device sync: epoch time is
                    t2 = time.time()               # honest, not dispatch-only

                    s1 = time.time()
                    vsteps = self._eval_split(engine, state, data["val_loader"],
                                              supports)
                    valid_m = _epoch_mean(vsteps)
                    s2 = time.time()

                    log = EpochLog(epoch, train_m, valid_m, t2 - t1, s2 - s1)
                    result.history.append(log)
                    self._log_epoch_jsonl(log)
                    self.log(
                        f"Epoch: {epoch:03d}, Train Loss: {train_m['loss']:.4f}, "
                        f"Valid Loss: {valid_m['loss']:.4f}, Training Time: "
                        f"{log.train_time:.4f}/epoch")
                    self._save_epoch(state, epoch, valid_m["loss"], result)
                    patience = self.cfg.early_stop_patience
                    if (patience > 0 and result.best_epoch > 0
                            and epoch - result.best_epoch >= patience):
                        self.log(f"early stop at epoch {epoch}: no val "
                                 f"improvement for {patience} epochs "
                                 f"(best epoch {result.best_epoch})")
                        break
            except DeviceWedgedError as e:
                self._emergency_dump(result, epoch, str(e))
                raise

        engine.state = state
        self._finalize_best(result)
        return result

    def test(self, data: dict, supports, result: RunResult | None = None,
             scaler=None, return_predictions: bool = False) -> RunResult:
        """Per-horizon test evaluation (`train.py:377-404`): predictions are
        truncated to the real (unpadded) test count, then inverse-transformed
        and scored per horizon step.

        ``return_predictions``: additionally store the raw (standardized)
        prediction array as ``test_metrics["yhat"]`` (n, N, H) so callers
        exporting per-node series don't run a second full forward pass."""
        result = result or RunResult()
        engine = self.engine
        scaler = scaler or engine.scaler
        supports = None if supports is None else [_as_support(s)
                                                  for s in supports]
        outputs = []
        for batch in self._feed(data["test_loader"]):
            x = batch[0]
            preds = engine.predict_step(engine.state, jnp.asarray(x),
                                        supports)
            outputs.append(preds[:, 0])          # (B, N, H)
        yhat = jnp.concatenate(outputs, axis=0)
        realy = jnp.asarray(
            np.transpose(data["y_test"][..., 0], (0, 2, 1)))  # (n, N, H)
        yhat = yhat[:realy.shape[0]]

        horizon = yhat.shape[-1]
        per_h = []
        for h in range(horizon):
            pred = scaler.inverse_transform(yhat[:, :, h])
            real = realy[:, :, h]
            mae, mape, rmse = jax.device_get(metric(pred, real))
            per_h.append((float(mae), float(mape), float(rmse)))
            self.log(f"Evaluate best model on test data for horizon "
                     f"{h + 1:d}, Test MAE: {per_h[-1][0]:.4f}, Test MAPE: "
                     f"{per_h[-1][1]:.4f}, Test RMSE: {per_h[-1][2]:.4f}")
        result.per_horizon = per_h
        result.test_metrics = {
            "mae": float(np.mean([m[0] for m in per_h])),
            "mape": float(np.mean([m[1] for m in per_h])),
            "rmse": float(np.mean([m[2] for m in per_h])),
        }
        if return_predictions:
            result.test_metrics["yhat"] = np.asarray(yhat)
        self.log("On average over seq_length horizons, Test MAE: "
                 f"{result.test_metrics['mae']:.4f}, Test MAPE: "
                 f"{result.test_metrics['mape']:.4f}, Test RMSE: "
                 f"{result.test_metrics['rmse']:.4f}")
        return result

    # ------------------------------------------------------------------
    # shared-graph synthetic dataset (same_G=True)
    # ------------------------------------------------------------------

    def fit_syn_shared(self, data: dict, supports, G, F_t: int,
                       n_communities: int,
                       resume_from: str | None = None) -> RunResult:
        """Epoch loop for the shared-graph synthetic task: the reference
        drives `train_syn`/`eval_syn` with the single graph's cluster map
        (`/root/reference/train.py:248-249,272-273`)."""
        result = RunResult()
        engine = self.engine
        start_epoch = self._resume(resume_from)
        state = engine.state
        sup = None if supports is None else [_as_support(s)
                                             for s in supports]
        proj = jnp.asarray(cluster_mean_projector(G.community_labels,
                                                  n_communities))
        state, sup = self._place_for_mesh(state, sup)
        if self.mesh is not None:
            from graph_wavenet_tpu.parallel import mesh as M
            proj = jax.device_put(proj, M.replicated(self.mesh))
        for epoch in range(start_epoch, self.cfg.epochs + 1):
            t1 = time.time()
            data["train_loader"].shuffle()
            steps = []
            accum = self.cfg.grad_accum
            for x, y in self._feed(data["train_loader"]):
                xs, ys = self._shard_xy(x, y)
                if accum > 1:
                    state, m = engine.train_step_syn_accum(
                        state, xs, ys, sup, proj, F_t, accum)
                else:
                    state, m = engine.train_step_syn(state, xs, ys, sup,
                                                     proj, F_t)
                steps.append(self._throttle(m))
            train_m = _epoch_mean(steps)   # device sync before stopping
            t2 = time.time()
            s1 = time.time()
            vsteps = []
            for x, y in self._feed(data["val_loader"]):
                ev = engine.eval_step_syn(state, *self._shard_xy(x, y),
                                          sup, proj, F_t)
                vsteps.append(self._throttle(
                    {k: ev[k] for k in ("loss", "mape", "rmse")}))
            valid_m = _epoch_mean(vsteps)
            s2 = time.time()
            log = EpochLog(epoch, train_m, valid_m, t2 - t1, s2 - s1)
            result.history.append(log)
            self._log_epoch_jsonl(log)
            self.log(
                f"Epoch: {epoch:03d}, Train Loss: {train_m['loss']:.4f}, "
                f"Valid Loss: {valid_m['loss']:.4f}, Training Time: "
                f"{log.train_time:.4f}/epoch")
            self._save_epoch(state, epoch, valid_m["loss"], result)
            patience = self.cfg.early_stop_patience
            if (patience > 0 and result.best_epoch > 0
                    and epoch - result.best_epoch >= patience):
                self.log(f"early stop at epoch {epoch}: no val improvement "
                         f"for {patience} epochs "
                         f"(best epoch {result.best_epoch})")
                break
        engine.state = state
        self._finalize_best(result)
        return result

    def test_syn_shared(self, data: dict, supports, G, F_t: int,
                        n_communities: int,
                        result: RunResult | None = None) -> RunResult:
        """Shared-graph synthetic test loop (`train.py:316-327`)."""
        result = result or RunResult()
        engine = self.engine
        sup = None if supports is None else [_as_support(s)
                                             for s in supports]
        proj = jnp.asarray(cluster_mean_projector(G.community_labels,
                                                  n_communities))
        steps = []
        for x, y in self._feed(data["test_loader"]):
            ev = engine.eval_step_syn(engine.state, jnp.asarray(x),
                                      jnp.asarray(y), sup, proj, F_t)
            steps.append({k: ev[k] for k in ("loss", "mape", "rmse")})
        result.test_metrics = _epoch_mean(steps)
        self.log("On average over seq_length horizons, Test MAE: "
                 f"{result.test_metrics['loss']:.4f}, Test MAPE: "
                 f"{result.test_metrics['mape']:.4f}, Test RMSE: "
                 f"{result.test_metrics['rmse']:.4f}")
        return result

    # ------------------------------------------------------------------
    # per-sample-graph synthetic datasets (diff-G)
    # ------------------------------------------------------------------

    def fit_syn(self, data: dict, supports_by_split: dict,
                graphs_by_split: dict, F_t: int,
                n_communities: int,
                resume_from: str | None = None) -> RunResult:
        """Epoch loop for the diff-G synthetic task (`train.py:145-208`):
        per-batch gather of each sample's supports and cluster projector."""
        if self.cfg.grad_accum > 1 and self.cfg.scan_steps > 1:
            raise ValueError(
                "grad_accum > 1 is not supported together with the fused "
                "multi-step path (scan_steps > 1) — set scan_steps=1 to "
                "accumulate")
        result = RunResult()
        engine = self.engine
        start_epoch = self._resume(resume_from)
        state = engine.state
        state, _ = self._place_for_mesh(state, None)
        sup = {k: [jnp.asarray(s) for s in v]
               for k, v in supports_by_split.items()}
        proj = {k: jnp.asarray(np.stack(
            [cluster_mean_projector(g.community_labels, n_communities)
             for g in v])) for k, v in graphs_by_split.items()}
        if self.mesh is not None:
            # place the full per-split stacks on the mesh ONCE: the per-step
            # s[idx] gather then runs replicated on every device instead of
            # funneling (B, N, N) gathers through device 0's queue, and
            # _shard_batched's reshard to batch-sharded is a local slice
            from graph_wavenet_tpu.parallel import mesh as M
            rep = M.replicated(self.mesh)
            sup = {k: [jax.device_put(s, rep) for s in v]
                   for k, v in sup.items()}
            proj = {k: jax.device_put(p, rep) for k, p in proj.items()}

        for epoch in range(start_epoch, self.cfg.epochs + 1):
            t1 = time.time()
            loader = data["train_loader"]
            loader.shuffle()
            steps = []
            scan = self.cfg.scan_steps
            if scan > 1 and hasattr(loader, "resident_arrays"):
                # fused diff-G path: supports/projectors gathered in-scan
                xs, ys = loader.resident_arrays()
                bsh, put_sel = self._fused_mesh_args(xs)
                batched_sh = self._batched_sharding if bsh is not None \
                    else None
                adj_arr = put_sel(loader.adj_idx)
                for sel in loader.superbatches(scan):
                    state, m = engine.train_steps_syn_resident(
                        state, xs, ys, put_sel(sel), adj_arr,
                        sup["train"], proj["train"], F_t,
                        batch_sharding=bsh, batched_sharding=batched_sh)
                    steps.append(self._throttle(m))
                batches = loader.remainder_batches(scan)
            else:
                batches = self._feed(loader)
            accum = self.cfg.grad_accum
            for x, y, adj_idx in batches:
                idx = jnp.asarray(adj_idx)
                batch_sup = [self._shard_batched(s[idx])
                             for s in sup["train"]]
                batch_proj = self._shard_batched(proj["train"][idx])
                if accum > 1:
                    state, m = engine.train_step_syn_accum(
                        state, *self._shard_xy(x, y), batch_sup,
                        batch_proj, F_t, accum)
                else:
                    state, m = engine.train_step_syn(
                        state, *self._shard_xy(x, y), batch_sup,
                        batch_proj, F_t)
                steps.append(self._throttle(m))
            train_m = _epoch_mean(steps)   # device sync before stopping
            t2 = time.time()

            s1 = time.time()
            vsteps = []
            for x, y, adj_idx in self._feed(data["val_loader"]):
                idx = jnp.asarray(adj_idx)
                batch_sup = [self._shard_batched(s[idx])
                             for s in sup["val"]]
                ev = engine.eval_step_syn(
                    state, *self._shard_xy(x, y), batch_sup,
                    self._shard_batched(proj["val"][idx]), F_t)
                # keep only the scalar metrics: retaining pred_F/pred_E
                # would pin O(val split) prediction buffers in HBM all epoch
                vsteps.append(self._throttle(
                    {k: ev[k] for k in ("loss", "mape", "rmse")}))
            valid_m = _epoch_mean(vsteps)
            s2 = time.time()

            log = EpochLog(epoch, train_m, valid_m, t2 - t1, s2 - s1)
            result.history.append(log)
            self._log_epoch_jsonl(log)
            self.log(
                f"Epoch: {epoch:03d}, Train Loss: {train_m['loss']:.4f}, "
                f"Valid Loss: {valid_m['loss']:.4f}, Training Time: "
                f"{log.train_time:.4f}/epoch")
            self._save_epoch(state, epoch, valid_m["loss"], result)
            patience = self.cfg.early_stop_patience
            if (patience > 0 and result.best_epoch > 0
                    and epoch - result.best_epoch >= patience):
                self.log(f"early stop at epoch {epoch}: no val improvement "
                         f"for {patience} epochs "
                         f"(best epoch {result.best_epoch})")
                break

        engine.state = state
        self._finalize_best(result)
        return result

    def test_syn(self, data: dict, supports_by_split: dict,
                 graphs_by_split: dict, F_t: int, n_communities: int,
                 result: RunResult | None = None) -> RunResult:
        """diff-G test loop (`train.py:329-361`), evaluated against the TEST
        split's graphs (reference bug used val's — fixed). Returns pooled
        predictions for sequence reconstruction."""
        result = result or RunResult()
        engine = self.engine
        sup = [_as_support(s) for s in supports_by_split["test"]]
        proj = jnp.asarray(np.stack(
            [cluster_mean_projector(g.community_labels, n_communities)
             for g in graphs_by_split["test"]]))
        steps, reals, pred_fs, pred_es = [], [], [], []
        for x, y, adj_idx in self._feed(data["test_loader"]):
            idx = jnp.asarray(adj_idx)
            batch_sup = [s[idx] for s in sup]
            ev = engine.eval_step_syn(engine.state, jnp.asarray(x),
                                      jnp.asarray(y), batch_sup,
                                      proj[idx], F_t)
            steps.append({k: ev[k] for k in ("loss", "mape", "rmse")})
            reals.append(np.asarray(y))
            pred_fs.append(np.asarray(ev["pred_F"])[:, 0])
            pred_es.append(np.asarray(ev["pred_E"])[:, 0])
        result.test_metrics = _epoch_mean(steps)
        result.test_metrics["pred_F"] = np.concatenate(pred_fs)
        result.test_metrics["pred_E"] = np.concatenate(pred_es)
        result.test_metrics["reals"] = np.concatenate(reals)
        self.log("On average over seq_length horizons, Test MAE: "
                 f"{result.test_metrics['loss']:.4f}")
        return result

    # ------------------------------------------------------------------

    def _emergency_dump(self, result: RunResult, epoch: int,
                        reason: str) -> None:
        """Diagnostics for a wedged run: epoch history + the last usable
        checkpoint, written WITHOUT touching the (stuck) device."""
        if self._ckpt_writer is not None:
            try:
                # drain in-flight writes so the checkpoint the diagnostics
                # point to is complete (states were already fetched to host
                # at enqueue time — this never touches the wedged device)
                self._ckpt_writer.wait()
            except Exception:
                pass
        os.makedirs(self.cfg.save_dir, exist_ok=True)
        path = os.path.join(self.cfg.save_dir, "emergency.json")
        info = {
            "reason": reason,
            "epoch": epoch,
            "best_checkpoint": result.best_checkpoint,
            "best_val_loss": (result.best_val_loss
                              if np.isfinite(result.best_val_loss)
                              else None),
            "epochs_completed": len(result.history),
            "history_val_loss": [h.valid["loss"] for h in result.history],
        }
        with open(path, "w") as f:
            json.dump(info, f, indent=2)
        self.log(f"device wedged at epoch {epoch}; diagnostics -> {path}")

    def _resume(self, resume_from: str | None) -> int:
        """Restore the FULL train state from a checkpoint (params +
        optimizer + BN + step + RNG) and return the epoch to continue from;
        writes the run-start marker either way. Shared by fit / fit_syn /
        fit_syn_shared — the reference cannot resume at all (state_dict
        only, SURVEY.md §5)."""
        start_epoch = 1
        if resume_from:
            self.engine.state = ckpt.load_checkpoint(resume_from,
                                                     self.engine.state)
            meta = ckpt.load_metadata(resume_from)
            start_epoch = int(meta.get("extra", {}).get("epoch", 0)) + 1
            self.log(f"resumed from {resume_from} at epoch {start_epoch}")
        self._log_run_start(start_epoch, resume_from)
        return start_epoch

    def _log_run_start(self, start_epoch: int,
                       resume_from: str | None) -> None:
        """Segment marker in history.jsonl so resumed/re-run histories in
        the same save_dir can be told apart by consumers."""
        os.makedirs(self.cfg.save_dir, exist_ok=True)
        with open(os.path.join(self.cfg.save_dir, "history.jsonl"),
                  "a") as f:
            f.write(json.dumps({"run_start": time.time(),
                                "start_epoch": start_epoch,
                                "resumed_from": resume_from}) + "\n")

    def _log_epoch_jsonl(self, log: EpochLog) -> None:
        """Append one machine-readable line per epoch to
        save_dir/history.jsonl — durable observability beyond stdout (the
        reference only prints, SURVEY.md §5)."""
        os.makedirs(self.cfg.save_dir, exist_ok=True)
        path = os.path.join(self.cfg.save_dir, "history.jsonl")
        rec = {"epoch": log.epoch, "train": log.train, "valid": log.valid,
               "train_time_s": log.train_time,
               "valid_time_s": log.valid_time, "ts": time.time()}
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def _save_epoch(self, state, epoch: int, val_loss: float,
                    result: RunResult):
        os.makedirs(self.cfg.save_dir, exist_ok=True)
        path = os.path.join(
            self.cfg.save_dir,
            f"exp{self.cfg.expid}_epoch_{epoch}_{round(val_loss, 2)}"
            ".msgpack")
        meta = dict(model_cfg=self.engine.model_cfg, train_cfg=self.cfg,
                    scaler=self.engine.scaler,
                    extra={"epoch": epoch, "val_loss": val_loss,
                           # model-family marker: gwt-serve/gwt-export
                           # auto-select the DiffGForecaster for
                           # per-sample-graph checkpoints
                           "diff_g": self.engine.diff_g,
                           **self.extra_meta})
        if self._ckpt_writer is not None:
            self._ckpt_writer.save(path, state, **meta)
        else:
            ckpt.save_checkpoint(path, state, **meta)
        self._ckpt_scores[path] = val_loss
        # keep_checkpoints <= 0 = keep all (the reference keeps every
        # epoch). Pruning ranks the just-saved path too — if its async
        # write hasn't landed yet the file is simply still tracked and a
        # later prune (or the final one in _finalize_best) removes it;
        # checkpoints publish atomically, so a prune never races a write.
        if self.cfg.keep_checkpoints > 0:
            ckpt.prune_checkpoints(self.cfg.keep_checkpoints,
                                   self._ckpt_scores)
        if val_loss < result.best_val_loss:
            result.best_val_loss = val_loss
            result.best_epoch = epoch
            result.best_checkpoint = path

    def _finalize_best(self, result: RunResult):
        """Reload the best-val checkpoint before testing
        (`train.py:302-309`)."""
        if self._ckpt_writer is not None:
            self._ckpt_writer.wait()     # drain in-flight epoch writes
            # final prune: paths whose writes were still queued when their
            # epoch's prune ran are on disk now
            if self.cfg.keep_checkpoints > 0:
                ckpt.prune_checkpoints(self.cfg.keep_checkpoints,
                                       self._ckpt_scores)
        if result.best_checkpoint and os.path.exists(result.best_checkpoint):
            self.engine.state = ckpt.load_checkpoint(result.best_checkpoint,
                                                     self.engine.state)
            self.log(f"The valid loss on best model is "
                     f"{round(result.best_val_loss, 4)}")
