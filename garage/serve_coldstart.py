"""Serving cold-start at city scale (VERDICT r4 #7).

``gwt-serve --graph_npz`` rebuilds the block-sparse supports (+ adaptive
mask) at startup under the checkpoint's persisted node permutation
(`train/serving.py:from_city_checkpoint`), then jit-compiles the predict
program on the first request. The recorded 0.36 ms serve latency row is
flagship-only (N=207); this measures the 40,960-node production path:

  t_ready   process start -> /healthz 200   (python + jax/TPU client init
            + checkpoint load + support/mask rebuild)
  t_first   first /predict round-trip        (jit compile + run + JSON)
  t_warm    median of --warm_reqs more round-trips (run + JSON; at 41k the
            request body is ~25 MB of JSON either way, so
            compile_s := t_first - t_warm cancels the transport/encode cost)

Variants: no compile cache; --compile_cache cold (populates); the same
cache warm (hits). A `jax_init` baseline row (python -c "import jax;
jax.devices()") isolates the interpreter + tunnel-client share of t_ready.

The checkpoint is an UNTRAINED Engine state saved with the production
graph_layout sidecar (weights do not affect startup latency; the bytes,
layout record, and rebuild path match a trained one exactly — same recipe
as tests/test_serve.py:test_serve_city_checkpoint_end_to_end).

Usage:  python garage/serve_coldstart.py [--nodes 40960] [--workdir D]
        (the build phase runs in a JAX_PLATFORMS=cpu subprocess; the
        serve variants need the real chip)
Writes fig/serve_coldstart.json and prints a BENCH_NOTES table.
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import pathlib
import statistics
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_phase(args) -> None:
    """CPU subprocess: graph npz + city checkpoint with layout sidecar."""
    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.graphs import city
    from graph_wavenet_tpu.graphs.spatial import knn_graph_edges
    from graph_wavenet_tpu.train import checkpoint as ckpt
    from graph_wavenet_tpu.train.engine import Engine

    wd = args.workdir
    gpath = os.path.join(wd, "g.npz")
    cpath = os.path.join(wd, "city.msgpack")
    if os.path.exists(gpath) and os.path.exists(cpath):
        print("build: cached", flush=True)
        return
    n = args.nodes
    rng = np.random.default_rng(11)
    pos = rng.random((n, 2)).astype(np.float64)
    src, dst, w = knn_graph_edges(pos, 8)
    city.save_graph_npz(gpath, src, dst, w, pos=pos, n_nodes=n)
    t0 = time.perf_counter()
    _, _, layout = city.build_city_supports(
        src, dst, w, n, pos=pos, ordering="best", form="flat",
        block_size=128, addaptadj=True, adaptive_hops=1)
    print(f"build: supports + ordering {time.perf_counter() - t0:.1f}s; "
          f"{layout['n_blocks']} live blocks", flush=True)
    nhid = 32
    cfg = ModelConfig(num_nodes=layout["n_pad"], in_dim=2, out_dim=12,
                      residual_channels=nhid, dilation_channels=nhid,
                      skip_channels=nhid * 8, end_channels=nhid * 16,
                      blocks=4, layers=2, gcn_bool=True, addaptadj=True,
                      n_supports=2, dtype="bfloat16")
    engine = Engine(cfg, TrainConfig(), StandardScaler(54.0, 20.0), seed=0)
    ckpt.save_checkpoint(cpath, engine.state, model_cfg=cfg,
                         train_cfg=TrainConfig(),
                         scaler=StandardScaler(54.0, 20.0),
                         extra={"graph_layout": layout})
    print(f"build: checkpoint {os.path.getsize(cpath) / 1e6:.1f} MB",
          flush=True)


def _post_predict(port: int, body: bytes, timeout: float) -> float:
    t0 = time.perf_counter()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", "/predict", body,
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    payload = resp.read()
    conn.close()
    if resp.status != 200:
        raise RuntimeError(f"/predict {resp.status}: {payload[:300]!r}")
    return time.perf_counter() - t0


def run_variant(args, name: str, extra_flags: list[str],
                body: bytes) -> dict:
    wd = args.workdir
    port = args.port
    cmd = [sys.executable, "-m", "graph_wavenet_tpu.cli.serve",
           "--checkpoint", os.path.join(wd, "city.msgpack"),
           "--graph_npz", os.path.join(wd, "g.npz"),
           "--port", str(port), "--window_ms", "1"] + extra_flags
    t_start = time.perf_counter()
    proc = subprocess.Popen(cmd, cwd=str(REPO))
    try:
        t_ready = None
        deadline = t_start + args.ready_timeout
        while time.perf_counter() < deadline:
            if proc.poll() is not None:
                raise RuntimeError(f"{name}: server exited rc "
                                   f"{proc.returncode}")
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=2)
                conn.request("GET", "/healthz")
                if conn.getresponse().status == 200:
                    t_ready = time.perf_counter() - t_start
                    conn.close()
                    break
                conn.close()
            except OSError:
                time.sleep(0.25)
        if t_ready is None:
            raise RuntimeError(f"{name}: not ready in "
                               f"{args.ready_timeout}s")
        t_first = _post_predict(port, body, args.predict_timeout)
        warms = [_post_predict(port, body, args.predict_timeout)
                 for _ in range(args.warm_reqs)]
        t_warm = statistics.median(warms)
        rec = {"variant": name, "t_ready_s": round(t_ready, 2),
               "t_first_predict_s": round(t_first, 2),
               "t_warm_predict_s": round(t_warm, 3),
               "compile_s": round(t_first - t_warm, 2)}
        print(f"  {name}: ready {t_ready:.1f}s, first predict "
              f"{t_first:.1f}s, warm {t_warm:.2f}s "
              f"(compile ~{t_first - t_warm:.1f}s)", flush=True)
        return rec
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=40960)
    ap.add_argument("--workdir", default="/tmp/serve_coldstart")
    ap.add_argument("--port", type=int, default=8971)
    ap.add_argument("--seq", type=int, default=13)
    ap.add_argument("--warm_reqs", type=int, default=5)
    ap.add_argument("--ready_timeout", type=float, default=600.0)
    ap.add_argument("--predict_timeout", type=float, default=900.0)
    ap.add_argument("--build", action="store_true",
                    help="internal: run the CPU build phase in-process")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    if args.build:
        build_phase(args)
        return

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, __file__, "--build",
                        "--nodes", str(args.nodes),
                        "--workdir", args.workdir], env=env)
    if r.returncode:
        raise SystemExit(f"build phase failed rc {r.returncode}")

    rng = np.random.default_rng(3)
    x = (rng.normal(size=(args.seq, args.nodes, 2)) * 10 + 50).astype(
        np.float32)
    body = json.dumps({"x": x.tolist()}).encode()
    print(f"request body: {len(body) / 1e6:.1f} MB JSON "
          f"(x = ({args.seq}, {args.nodes}, 2))", flush=True)

    t0 = time.perf_counter()
    subprocess.run([sys.executable, "-c",
                    "import jax; jax.devices()"], check=True)
    jax_init = time.perf_counter() - t0

    cache = os.path.join(args.workdir, "compile_cache")
    rows = [run_variant(args, "nocache", [], body),
            run_variant(args, "cache-cold", ["--compile_cache", cache],
                        body),
            run_variant(args, "cache-warm", ["--compile_cache", cache],
                        body)]

    out = {"nodes": args.nodes, "seq": args.seq,
           "request_mb": round(len(body) / 1e6, 1),
           "jax_init_s": round(jax_init, 2), "variants": rows}
    out_path = REPO / "fig" / "serve_coldstart.json"
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nbaseline: python + jax + TPU client init = {jax_init:.1f}s")
    print("\n| variant | ready (load+supports) | first /predict | "
          "warm /predict | compile |")
    print("|---|---|---|---|---|")
    for r_ in rows:
        print(f"| {r_['variant']} | {r_['t_ready_s']:.1f} s | "
              f"{r_['t_first_predict_s']:.1f} s | "
              f"{r_['t_warm_predict_s']:.2f} s | "
              f"~{r_['compile_s']:.1f} s |")
    print(f"results -> {out_path}")


if __name__ == "__main__":
    main()
