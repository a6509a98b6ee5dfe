"""Serving / streaming inference.

The reference has no serving path — inference is the test loop's batched
forward (`/root/reference/train.py:377-390`). TPU-native serving utilities:

- :class:`Forecaster` — a frozen (params, supports, scaler) bundle with a
  jitted batch predictor;
- :func:`rolling_forecast` — streaming inference over a long history: a
  ``lax.scan`` slides the K-step window over the sequence entirely on
  device, one compiled program for any number of forecast origins (the
  "blockwise scan for streaming inference" of SURVEY.md §5);
- :func:`autoregressive_forecast` — closed-loop rollout past the trained
  horizon by feeding predictions back as inputs;
- :func:`reconstruct_sequence` — averages overlapping rolling forecasts back
  to one sequence (device-side counterpart of
  ``reverse_sliding_window``, `/root/reference/Utils/util.py:486-508`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from graph_wavenet_tpu.config import ModelConfig
from graph_wavenet_tpu.data.scaler import StandardScaler
from graph_wavenet_tpu.models.gwnet import apply_gwnet


@dataclass(eq=False)
class Forecaster:
    """Inference bundle around a trained shared-graph model.

    ``supports`` may be dense (N, N) arrays, ELL/block-sparse support
    objects (duck-typed by ``mix_2d`` — city-scale checkpoints), or a
    ``BlockAdaptiveMask`` for the block-masked adaptive adjacency; all
    pass straight into :func:`apply_gwnet`.

    ``node_layout`` (city-scale checkpoints, ``graphs.city``): when set,
    :meth:`predict` speaks ORIGINAL node ids — inputs are permuted+padded
    into model node space on device and predictions mapped back, so a
    consumer never sees the training-time ordering."""

    cfg: ModelConfig
    params: Any
    model_state: Any
    supports: list | None
    scaler: StandardScaler = field(
        default_factory=lambda: StandardScaler(0.0, 1.0))
    node_layout: dict | None = None

    @classmethod
    def from_checkpoint(cls, path: str, supports) -> "Forecaster":
        import dataclasses

        from graph_wavenet_tpu.train import checkpoint as ckpt
        from graph_wavenet_tpu.train.engine import Engine

        meta = ckpt.load_metadata(path)
        # inference never steps the optimizer: neutralize the lr schedule,
        # which would otherwise demand steps_per_epoch (unknown and
        # irrelevant here) for decay-trained checkpoints
        tcfg = meta["train_cfg"]
        if tcfg.lr_decay < 1.0:
            tcfg = dataclasses.replace(tcfg, lr_decay=1.0)
        engine = Engine(meta["model_cfg"], tcfg, meta.get("scaler"))
        state = ckpt.load_checkpoint(path, engine.state)
        return cls(meta["model_cfg"], state.params, state.model_state,
                   supports, meta.get("scaler") or StandardScaler(0.0, 1.0))

    @classmethod
    def from_city_checkpoint(cls, path: str, graph_npz: str,
                             aptonly: bool = False) -> "Forecaster":
        """City-scale checkpoint (trained via ``gwt-train --graph_npz``):
        verifies the sidecar's graph fingerprint against ``graph_npz``,
        rebuilds the block-sparse supports under the PERSISTED node
        permutation (+ the adaptive mask when the model trained one), and
        returns a Forecaster that predicts in ORIGINAL node order."""
        from graph_wavenet_tpu.graphs import city
        from graph_wavenet_tpu.graphs.spatial import (
            doubletransition_block_supports,
        )
        from graph_wavenet_tpu.train import checkpoint as ckpt

        meta = ckpt.load_metadata(path)
        layout = (meta.get("extra") or {}).get("graph_layout")
        if layout is None:
            raise ValueError(
                f"{path} has no graph_layout sidecar record — it was not "
                "trained with --graph_npz; use from_checkpoint")
        g = city.load_graph_npz(graph_npz)
        fp = city.graph_fingerprint(g["src"], g["dst"], g["weight"],
                                    g["n_nodes"])
        if fp != layout["fingerprint"]:
            raise ValueError(
                f"graph fingerprint mismatch: checkpoint trained on "
                f"{layout['fingerprint']}, {graph_npz} is {fp}")
        supports = doubletransition_block_supports(
            g["src"], g["dst"], g["weight"], layout["n_pad"],
            perm=np.asarray(layout["perm"], np.int64),
            form=layout["form"], block_size=layout["block_size"])
        mcfg = meta["model_cfg"]
        if mcfg.addaptadj:
            from graph_wavenet_tpu.ops.adaptive_block import (
                mask_from_supports,
            )

            supports = list(supports) + [mask_from_supports(
                supports, hops=int(layout.get("adaptive_hops", 1)))]
        if aptonly:
            supports = supports[-1:] if mcfg.addaptadj else []
        fc = cls.from_checkpoint(path, supports)
        fc.node_layout = layout
        return fc

    def _jit(self, key: tuple, build):
        """Per-instance jit cache: compiled executables live on the
        Forecaster and are GC'd with it. A module/global jit cache keyed
        on a static self would pin every Forecaster ever used — a leak
        for long-running servers that reload checkpoints periodically.
        Weights/supports ride as call ARGUMENTS (see _predict_pure);
        only export_forecaster bakes them in as constants."""
        cache = self.__dict__.setdefault("_jit_cache", {})
        if key not in cache:
            cache[key] = jax.jit(build())
        return cache[key]

    @property
    def input_nodes(self) -> int:
        """Node count :meth:`predict` expects (original ids under a city
        layout, the model's padded count otherwise)."""
        if self.node_layout is not None:
            return self.node_layout["n_raw"]
        return self.cfg.num_nodes

    def _layout_maps(self):
        """Static gather indices for the node-layout roundtrip: model
        position j reads input row src_idx[j] (a zero pad row for pad
        positions); output row r is model position perm[r]."""
        layout = self.node_layout
        perm = np.asarray(layout["perm"], np.int64)
        n_raw, n_pad = layout["n_raw"], layout["n_pad"]
        src_idx = np.full(n_pad, n_raw, np.int64)
        src_idx[perm[:n_raw]] = np.arange(n_raw)
        return src_idx, perm[:n_raw]

    def _sup_arg(self):
        """Supports normalized for passing as JIT ARGUMENTS (cached)."""
        if self.supports is None:
            return None
        if "_sup_cache" not in self.__dict__:
            self.__dict__["_sup_cache"] = [
                s if (hasattr(s, "mix_2d")
                      or getattr(s, "adaptive_mask", False))
                else jnp.asarray(s) for s in self.supports]
        return self.__dict__["_sup_cache"]

    def _predict_pure(self, params, model_state, sup,
                      x: jnp.ndarray) -> jnp.ndarray:
        """Predict with weights/supports as FUNCTION ARGUMENTS. The live
        serving path must not close over them: closed-over arrays embed
        as program constants, and at city scale the supports alone are
        hundreds of MB — the serialized program then exceeds remote-
        compile transport limits (HTTP 413 at 41k through the tunneled
        backend; same lesson as the r3 training path). Only the layout
        gather indices and scaler floats stay closure constants."""
        if self.node_layout is not None:
            src_idx, out_idx = self._layout_maps()
            xz = jnp.concatenate(
                [x, jnp.zeros_like(x[:, :, :1])], axis=2)
            x = jnp.take(xz, jnp.asarray(src_idx), axis=2)
        out, _ = apply_gwnet(self.cfg, params, model_state, x,
                             sup, train=False)
        # (B, 1, N, H) -> (B, H, N), inverse-standardized
        pred = jnp.transpose(out[:, -1], (0, 2, 1))
        if self.node_layout is not None:
            pred = jnp.take(pred, jnp.asarray(out_idx), axis=2)
        return pred * self.scaler.std + self.scaler.mean

    def _predict_impl(self, x: jnp.ndarray) -> jnp.ndarray:
        """Closure form — weights/supports baked as constants. ONLY for
        :func:`export_forecaster`, where baking them into the artifact is
        the point; the live path is :meth:`predict` via
        :meth:`_predict_pure`."""
        return self._predict_pure(self.params, self.model_state,
                                  self._sup_arg(), x)

    def predict(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, K, N, F) standardized features -> (B, H, N) forecasts in
        raw units (horizon-major). N = :attr:`input_nodes` — original
        node order under a city layout."""
        return self._jit(("predict",), lambda: self._predict_pure)(
            self.params, self.model_state, self._sup_arg(), x)


@dataclass(eq=False)
class DiffGForecaster:
    """Inference bundle for the per-sample-graph (diff-G) model family —
    the serving path the reference's diff-G eval loop approximates
    (`/root/reference/train.py:330-370`, ``eval_syn`` at
    `engine.py:132-181`): per-sample supports in, the fine-grained signal
    and/or the pooled F/E modality estimates out."""

    cfg: ModelConfig
    params: Any
    model_state: Any
    scaler: StandardScaler = field(
        default_factory=lambda: StandardScaler(0.0, 1.0))

    @classmethod
    def from_checkpoint(cls, path: str) -> "DiffGForecaster":
        import dataclasses

        from graph_wavenet_tpu.train import checkpoint as ckpt
        from graph_wavenet_tpu.train.engine import Engine

        meta = ckpt.load_metadata(path)
        tcfg = meta["train_cfg"]
        if tcfg.lr_decay < 1.0:
            tcfg = dataclasses.replace(tcfg, lr_decay=1.0)
        engine = Engine(meta["model_cfg"], tcfg, meta.get("scaler"),
                        diff_g=True)
        state = ckpt.load_checkpoint(path, engine.state)
        return cls(meta["model_cfg"], state.params, state.model_state,
                   meta.get("scaler") or StandardScaler(0.0, 1.0))

    def _jit(self, key: tuple, build):
        cache = self.__dict__.setdefault("_jit_cache", {})
        if key not in cache:
            cache[key] = jax.jit(build())
        return cache[key]

    def _forward(self, x, supports):
        from graph_wavenet_tpu.models.gwnet_diff_g import apply_gwnet_diff_g

        # fresh_nodevec checkpoints (reference quirk #2 replica) draw the
        # adaptive embeddings inside every forward; serving uses a fixed
        # key — deterministic per deployment, like the quirk's untrained
        # draws are per process
        rng = (jax.random.key(0)
               if getattr(self.cfg, "fresh_nodevec", False) else None)
        out, _ = apply_gwnet_diff_g(self.cfg, self.params,
                                    self.model_state, x, supports,
                                    train=False, rng=rng)
        return out * self.scaler.std + self.scaler.mean   # (B, 1, N, K)

    def predict(self, x: jnp.ndarray,
                supports: list | None) -> jnp.ndarray:
        """Fine-grained signal estimate.

        x: (B, K, N, F) standardized; supports: list of per-sample
        (B, N, N) batched supports (or []/None like training). Returns
        (B, K, N) in raw units.
        """
        has_sup = supports is not None
        def build():
            def run(x, supports):
                out = self._forward(x, supports if has_sup else None)
                return jnp.transpose(out[:, -1], (0, 2, 1))
            return run

        return self._jit(("predict", has_sup, len(supports or [])),
                         build)(x, supports)

    def predict_modalities(self, x: jnp.ndarray, supports: list | None,
                           projector: jnp.ndarray, F_t: int):
        """Pooled modality estimates, the quantities the diff-G task is
        supervised on (`engine.py:87-105` semantics via the projector
        matmul): returns ``(pred_F, pred_E)``, each (B, K, N) raw units.

        projector: (N, N) shared or (B, N, N) per-sample cluster-mean
        projector (``train.engine.cluster_mean_projector``); F_t: the
        temporal pool factor (K must divide by it)."""
        from graph_wavenet_tpu.train.engine import pool_E, pool_F

        has_sup = supports is not None

        def build():
            def run(x, supports, projector):
                out = self._forward(x, supports if has_sup else None)
                f_hat = pool_F(out, F_t)
                e_hat = pool_E(out, projector)
                squeeze = lambda p: jnp.transpose(p[:, -1], (0, 2, 1))
                return squeeze(f_hat), squeeze(e_hat)
            return run

        return self._jit(("modalities", has_sup, len(supports or []), F_t),
                         build)(x, supports, projector)

    # -- graph-bank serving (the gwt-serve/gwt-export surface) ---------

    def bind_bank(self, bank: dict,
                  adjtype: str = "doubletransition") -> "DiffGForecaster":
        """Attach a deployment graph bank (:func:`load_graph_bank`):
        normalizes every graph's adjacency into the model's support list
        (``mod_adj`` semantics, `/root/reference/Utils/util.py:178-194`)
        and stacks them device-resident, so requests carry only an
        ``adj_idx`` — the per-deployment-bank serving contract of
        VERDICT r3 #3. With community ``labels`` in the bank the pooled
        F/E modality estimates (:meth:`predict_modalities_indexed`) are
        also available."""
        from graph_wavenet_tpu.graphs.normalize import mod_adj
        from graph_wavenet_tpu.train.engine import cluster_mean_projector

        W = np.asarray(bank["W"], np.float32)
        per_graph = [mod_adj(w, adjtype) for w in W]
        n_sup = len(per_graph[0])
        if n_sup != self.cfg.n_supports:
            raise ValueError(
                f"bank graphs normalize to {n_sup} supports under "
                f"adjtype={adjtype!r} but the checkpoint was trained "
                f"with n_supports={self.cfg.n_supports}")
        self.sup_stack = [
            jnp.asarray(np.stack([g[j] for g in per_graph]))
            for j in range(n_sup)]                       # each (G, N, N)
        self.proj_stack = None
        self.F_t = int(bank["F_t"]) if bank.get("F_t") else None
        if bank.get("labels") is not None:
            labels = np.asarray(bank["labels"])
            n_comm = int(labels.max()) + 1
            self.proj_stack = jnp.asarray(np.stack(
                [cluster_mean_projector(l, n_comm) for l in labels]))
        return self

    def _require_bank(self):
        if getattr(self, "sup_stack", None) is None:
            raise ValueError(
                "no graph bank bound — call bind_bank(load_graph_bank("
                "path)) (gwt-serve --graph_bank) before indexed "
                "prediction")

    def _predict_indexed_impl(self, x, adj_idx):
        """(B, K, N, F) standardized + (B,) graph ids -> (B, K, N) raw
        units. The jax.export target for diff-G artifacts (bank baked
        in)."""
        sup = [jnp.take(s, adj_idx, axis=0) for s in self.sup_stack]
        out = self._forward(x, sup)
        return jnp.transpose(out[:, -1], (0, 2, 1))

    def predict_indexed(self, x: jnp.ndarray,
                        adj_idx: jnp.ndarray) -> jnp.ndarray:
        """Fine-signal forecast against bank graph ``adj_idx[i]`` per
        sample (the per-request supports contract: requests name their
        graph, the bank supplies the supports)."""
        self._require_bank()
        return self._jit(("predict_indexed",),
                         lambda: self._predict_indexed_impl)(
            x, jnp.asarray(adj_idx, jnp.int32))

    def predict_modalities_indexed(self, x: jnp.ndarray,
                                   adj_idx: jnp.ndarray):
        """Pooled (pred_F, pred_E) against bank graphs — the quantities
        the reference's diff-G eval loop plots
        (`/root/reference/train.py:330-370`). Needs ``labels`` and
        ``F_t`` in the bank."""
        from graph_wavenet_tpu.train.engine import pool_E, pool_F

        self._require_bank()
        if getattr(self, "proj_stack", None) is None or self.F_t is None:
            raise ValueError(
                "modality prediction needs community labels and F_t in "
                "the graph bank (save_graph_bank(..., labels=, F_t=))")
        F_t = self.F_t

        def build():
            def run(x, adj_idx):
                sup = [jnp.take(s, adj_idx, axis=0)
                       for s in self.sup_stack]
                proj = jnp.take(self.proj_stack, adj_idx, axis=0)
                out = self._forward(x, sup)
                f_hat = pool_F(out, F_t)
                e_hat = pool_E(out, proj)
                squeeze = lambda p: jnp.transpose(p[:, -1], (0, 2, 1))
                return squeeze(f_hat), squeeze(e_hat)
            return run

        return self._jit(("modalities_indexed", F_t), build)(
            x, jnp.asarray(adj_idx, jnp.int32))


def save_graph_bank(path: str, W: np.ndarray, labels=None,
                    F_t: int | None = None) -> None:
    """Write a deployment graph bank: ``W`` (G, N, N) RAW adjacencies
    (normalization happens at bind time so one bank serves any adjtype),
    optional ``labels`` (G, N) int community labels and ``F_t`` for the
    modality-pooled outputs."""
    W = np.asarray(W, np.float32)
    assert W.ndim == 3 and W.shape[1] == W.shape[2], (
        f"W must be (G, N, N), got {W.shape}")
    arrays = dict(W=W)
    if labels is not None:
        labels = np.asarray(labels, np.int32)
        assert labels.shape == W.shape[:2], (
            f"labels must be (G, N) = {W.shape[:2]}, got {labels.shape}")
        arrays["labels"] = labels
    if F_t is not None:
        arrays["F_t"] = np.int64(F_t)
    np.savez(path, **arrays)


def load_graph_bank(path: str) -> dict:
    with np.load(path) as z:
        bank = {"W": z["W"].astype(np.float32),
                "labels": (z["labels"].astype(np.int32)
                           if "labels" in z else None),
                "F_t": int(z["F_t"]) if "F_t" in z else None}
    return bank


def export_diffg_forecaster(forecaster: DiffGForecaster, path: str,
                            batch_size: int, seq_len: int | None = None,
                            platforms: list[str] | None = None) -> str:
    """AOT artifact for a diff-G checkpoint: weights AND the bound graph
    bank baked in; the artifact's call signature is ``(x, adj_idx)``
    ((B, K, N, F) float32 + (B,) int32). Loads via
    :func:`load_exported_forecaster` like the shared-graph artifacts."""
    from jax import export as jexport

    forecaster._require_bank()
    cfg = forecaster.cfg
    if seq_len is None:
        seq_len = cfg.receptive_field - 1   # the trained K (rf == K+1)
    spec_x = jax.ShapeDtypeStruct(
        (batch_size, seq_len, cfg.num_nodes, cfg.in_dim), jnp.float32)
    spec_i = jax.ShapeDtypeStruct((batch_size,), jnp.int32)
    exp = jexport.export(jax.jit(forecaster._predict_indexed_impl),
                         platforms=platforms)(spec_x, spec_i)
    with open(path, "wb") as f:
        f.write(bytes(exp.serialize()))
    return path


def rolling_forecast(forecaster: Forecaster, history: jnp.ndarray,
                     window: int) -> jnp.ndarray:
    """Streaming forecasts at every origin of a long history.

    history: (T_total, N, F) standardized features. Returns
    (T_total - window + 1, H, N): the H-step forecast issued at each origin.
    One jitted scan — no per-origin dispatch; compiled once per
    (forecaster, window) via the instance cache, NOT per call (a fresh
    ``@jax.jit`` closure per invocation would retrace every time).
    """
    def build():
        def run(params, model_state, sup, history):
            n_origins = history.shape[0] - window + 1

            def step(carry, start):
                x = jax.lax.dynamic_slice_in_dim(history, start, window,
                                                 axis=0)
                # loop-invariant args, not closure constants (city-scale
                # supports as constants overflow compile transports)
                pred = forecaster._predict_pure(params, model_state, sup,
                                                x[None])[0]     # (H, N)
                return carry, pred

            _, preds = jax.lax.scan(step, None, jnp.arange(n_origins))
            return preds
        return run

    return forecaster._jit(("rolling", window), build)(
        forecaster.params, forecaster.model_state, forecaster._sup_arg(),
        history)


def autoregressive_forecast(forecaster: Forecaster, x: jnp.ndarray,
                            n_rounds: int,
                            future_aux: jnp.ndarray | None = None
                            ) -> jnp.ndarray:
    """Closed-loop rollout: forecast H steps, feed them back as the signal
    channel, repeat.

    x: (B, K, N, F); returns (B, n_rounds * H, N) raw-unit forecasts.
    Compiled once per (forecaster, n_rounds, shape) via the instance cache.

    ``future_aux`` (B, n_rounds*H, N, F-1): the auxiliary feature channels
    for the forecast horizon. Calendar features like time-of-day ARE known
    for the future — pass them here to condition every round correctly.
    Without it the last window's aux tail is repeated, which only matches
    the true calendar when the aux pattern's period divides H (e.g. H = one
    full day); otherwise rounds >= 2 are conditioned on stale values.
    """
    horizon = forecaster.cfg.out_dim
    if future_aux is not None and x.shape[-1] > 1:
        b, n = x.shape[0], x.shape[2]
        # (B, rounds*H, N, F-1) -> (rounds, B, H, N, F-1) scan chunks
        chunks = jnp.transpose(
            future_aux.reshape(b, n_rounds, horizon, n, -1),
            (1, 0, 2, 3, 4))
    else:
        chunks = None

    def build():
        def run(params, model_state, sup, x, chunks):
            def step(x, aux_chunk):
                pred_raw = forecaster._predict_pure(
                    params, model_state, sup, x)          # (B, H, N)
                pred_std = (pred_raw - forecaster.scaler.mean
                            ) / forecaster.scaler.std
                feats = [pred_std[..., None]]
                if x.shape[-1] > 1:
                    aux = (aux_chunk if aux_chunk is not None
                           else x[:, -horizon:, :, 1:])  # tail-repeat
                    feats.append(aux)
                new_steps = jnp.concatenate(feats, axis=-1)  # (B, H, N, F)
                x = jnp.concatenate([x[:, horizon:], new_steps], axis=1)
                return x, pred_raw

            _, preds = jax.lax.scan(step, x, chunks, length=n_rounds)
            # (rounds, B, H, N) -> (B, rounds*H, N)
            return jnp.transpose(preds, (1, 0, 2, 3)).reshape(
                x.shape[0], n_rounds * horizon, x.shape[2])
        return run

    return forecaster._jit(("ar", n_rounds, chunks is not None), build)(
        forecaster.params, forecaster.model_state, forecaster._sup_arg(),
        x, chunks)


def export_forecaster(forecaster: Forecaster, path: str, batch_size: int,
                      seq_len: int | None = None,
                      platforms: list[str] | None = None) -> str:
    """Serialize the compiled predictor to a deployment artifact.

    ``jax.export`` lowers :meth:`Forecaster.predict` to versioned StableHLO
    with the weights baked in as constants — the artifact loads and runs
    (:func:`load_exported_forecaster`) WITHOUT the model code, config, or
    checkpoint, the production-serving story the reference lacks entirely
    (its deployment unit is a pickled state_dict plus the whole repo,
    `/root/reference/test.py:48-50`).

    seq_len: input window baked into the artifact (default: the model's
    receptive field — the smallest window the model reads in full; NB the
    canonical test-loop window, e.g. K=12 for METR-LA, is rf-1). The
    loaded artifact left-zero-pads SHORTER inputs up to the baked window
    (bitwise-identical to the model's own receptive-field padding), so a
    default export still serves canonical K-step windows. platforms:
    lowering targets, e.g. ``["tpu", "cpu"]`` — a CPU host can export for
    TPU serving; default is the current backend only.
    """
    from jax import export as jexport

    cfg = forecaster.cfg
    if seq_len is None:
        seq_len = cfg.receptive_field
    spec = jax.ShapeDtypeStruct(
        (batch_size, seq_len, forecaster.input_nodes, cfg.in_dim),
        jnp.float32)
    exp = jexport.export(jax.jit(forecaster._predict_impl),
                         platforms=platforms)(spec)
    with open(path, "wb") as f:
        f.write(bytes(exp.serialize()))
    return path


def load_exported_forecaster(path: str):
    """Load an :func:`export_forecaster` artifact; returns an object with
    ``.predict(x)`` — no model code or checkpoint needed. Inputs with fewer
    timesteps than the baked window are left-zero-padded to it, exactly the
    model's own receptive-field padding (`/root/reference/model.py:176-180`
    semantics), so canonical K-step windows feed an rf-window artifact
    bit-identically."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))

    class _ExportedForecaster:
        in_shape = exp.in_avals[0].shape
        platforms = exp.platforms
        # diff-G artifacts (export_diffg_forecaster) take (x, adj_idx);
        # shared-graph ones take x alone
        n_inputs = len(exp.in_avals)

        @staticmethod
        def predict(x: jnp.ndarray, *rest) -> jnp.ndarray:
            if len(rest) + 1 != _ExportedForecaster.n_inputs:
                raise TypeError(
                    f"artifact takes {_ExportedForecaster.n_inputs} "
                    f"input(s) {[a.shape for a in exp.in_avals]}, got "
                    f"{len(rest) + 1}")
            t = _ExportedForecaster.in_shape[1]
            if x.shape[1] < t:
                pad = [(0, 0)] * x.ndim
                pad[1] = (t - x.shape[1], 0)
                x = jnp.pad(x, pad)
            return exp.call(x, *rest)

    return _ExportedForecaster


class MicroBatcher:
    """Dynamic request batching for a batch predictor.

    Concurrent single-example ``submit(x)`` calls coalesce into one device
    call: the worker thread drains requests arriving within ``window_ms``
    of the first (up to ``max_batch``), pads the stack to a FIXED set of
    batch shapes, runs ``predict_fn`` once, and scatters results back to
    the waiting callers. One MXU-shaped dispatch instead of B latency-bound
    singletons — the serving-concurrency component the reference lacks
    entirely (its inference is the test loop, `train.py:377-390`).

    Padding policy: ``fixed_batch`` pins every device call to exactly that
    batch size (AOT artifacts from :func:`export_forecaster` bake one batch
    size); otherwise batches pad up to the next power-of-two bucket
    <= ``max_batch``, so the predictor compiles once per bucket rather than
    once per occupancy. Pad rows repeat the last real example and are
    discarded after the call.

    Thread-safe; use as a context manager or call :meth:`stop`.
    """

    def __init__(self, predict_fn, max_batch: int = 64,
                 window_ms: float = 2.0, fixed_batch: int | None = None):
        import queue
        import threading

        if fixed_batch is not None:
            max_batch = fixed_batch
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self._predict = predict_fn
        self.max_batch = max_batch
        self.window_s = window_ms / 1e3
        self.fixed_batch = fixed_batch
        self._q: "queue.Queue" = queue.Queue()
        self._stats_lock = threading.Lock()
        self.stats = {"requests": 0, "device_calls": 0,
                      "batch_histogram": {}}
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="gwt-microbatcher")
        self._worker.start()

    def _bucket(self, n: int) -> int:
        if self.fixed_batch is not None:
            return self.fixed_batch
        b = 1
        while b < n:
            b *= 2
        return min(b, self.max_batch)

    def _run(self):
        import queue
        import time as _time

        while True:
            item = self._q.get()
            if item is None:
                return
            batch = [item]
            deadline = _time.monotonic() + self.window_s
            while len(batch) < self.max_batch:
                timeout = deadline - _time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    self._flush(batch)
                    return
                batch.append(nxt)
            self._flush(batch)

    def _flush(self, batch):
        import numpy as np

        n = len(batch)
        bucket = self._bucket(n)

        def stack(parts):
            xs = np.stack(parts)
            if n < bucket:
                xs = np.concatenate(
                    [xs, np.repeat(xs[-1:], bucket - n, axis=0)])
            return jnp.asarray(xs)

        # tuple payloads (e.g. diff-G's (x, adj_idx)) batch component-wise
        # and call the predictor with one stacked argument per component
        first = batch[0][0]
        if isinstance(first, tuple):
            args = tuple(stack([b[0][i] for b in batch])
                         for i in range(len(first)))
        else:
            args = (stack([b[0] for b in batch]),)
        try:
            out = np.asarray(self._predict(*args))
        except Exception as e:              # deliver, don't kill the worker
            for _, fut in batch:
                fut.set_exception(e)
            return
        with self._stats_lock:
            self.stats["requests"] += n
            self.stats["device_calls"] += 1
            h = self.stats["batch_histogram"]
            h[n] = h.get(n, 0) + 1
        for i, (_, fut) in enumerate(batch):
            fut.set_result(out[i])

    def submit(self, x) -> "Any":
        """Enqueue one example (no batch dim); blocks until its result."""
        import concurrent.futures

        if getattr(self, "_stopped", False):
            raise RuntimeError("MicroBatcher is stopped")
        fut: concurrent.futures.Future = concurrent.futures.Future()
        self._q.put((x, fut))
        return fut.result()

    def stop(self):
        self._stopped = True
        self._q.put(None)
        self._worker.join(timeout=10.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()


@jax.jit
def reconstruct_sequence(rolling: jnp.ndarray) -> jnp.ndarray:
    """Average overlapping rolling forecasts into one sequence.

    rolling: (n_origins, H, N) stride-1 forecasts -> (n_origins + H - 1, N).
    Jitted at module level — compiled once per shape, not per call.
    """
    n_origins, h, n = rolling.shape
    total = jnp.zeros((n_origins + h - 1, n))
    count = jnp.zeros((n_origins + h - 1, 1))

    def body(i, acc):
        total, count = acc
        total = jax.lax.dynamic_update_slice_in_dim(
            total, jax.lax.dynamic_slice_in_dim(total, i, h, 0)
            + rolling[i], i, axis=0)
        count = jax.lax.dynamic_update_slice_in_dim(
            count, jax.lax.dynamic_slice_in_dim(count, i, h, 0) + 1.0,
            i, axis=0)
        return total, count

    total, count = jax.lax.fori_loop(0, n_origins, body, (total, count))
    return total / count
