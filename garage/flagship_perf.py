"""Flagship-step perf exploration (VERDICT r1 #3): where the remaining
time is, and whether the scan-fused production path beats per-dispatch
stepping.

Usage: python garage/flagship_perf.py
"""

from __future__ import annotations

import time
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from graph_wavenet_tpu.benchmarks import (
    FLAGSHIP,
    _differential_time,
    bench_train_step,
)
from graph_wavenet_tpu.config import TrainConfig
from graph_wavenet_tpu.data.scaler import StandardScaler
from graph_wavenet_tpu.train.engine import Engine

BF16 = replace(FLAGSHIP, dtype="bfloat16")
BATCH, SEQ = 64, 12


def bench_scan_fused(cfg, s_steps: int = 16, steps: int = 6) -> dict:
    """Per-step time through ``train_steps_resident`` (S optimizer steps in
    one dispatch over a device-resident sample pool) — the production epoch
    path for datasets that fit HBM."""
    engine = Engine(cfg, TrainConfig(), StandardScaler(54.0, 20.0))
    rng = np.random.default_rng(0)
    a = rng.random((2, cfg.num_nodes, cfg.num_nodes)).astype(np.float32)
    supports = [jnp.asarray(s / s.sum(-1, keepdims=True)) for s in a]
    n_pool = 256
    xs = jnp.asarray(rng.normal(
        size=(n_pool, SEQ, cfg.num_nodes, 2)).astype(np.float32))
    ys = jnp.asarray(rng.normal(
        size=(n_pool, SEQ, cfg.num_nodes, 2)).astype(np.float32) + 50.0)
    idx = jnp.asarray(rng.integers(0, n_pool, size=(s_steps, BATCH)),
                      jnp.int32)
    state = engine.state
    for _ in range(2):
        state, m = engine.train_steps_resident(state, xs, ys, idx, supports)
    float(m["loss"][-1])
    holder = {"s": state}

    def run(n):
        s = holder["s"]
        t0 = time.perf_counter()
        for _ in range(n):
            s, m = engine.train_steps_resident(s, xs, ys, idx, supports)
        holder["s"] = s
        float(m["loss"][-1])
        return time.perf_counter() - t0

    per_dispatch = _differential_time(run, max(steps // 3, 1), steps)
    per_step = per_dispatch / s_steps
    return {"step_ms": per_step * 1e3,
            "node_timesteps_per_s": BATCH * cfg.num_nodes * SEQ / per_step}


def main() -> None:
    cases = [
        ("per-dispatch bf16 (bench.py)", lambda: bench_train_step(
            BF16, batch=BATCH, seq=SEQ, steps=60)),
        ("scan-fused x16 bf16", lambda: bench_scan_fused(BF16)),
        ("per-dispatch bf16 gcn_mode=fused", lambda: bench_train_step(
            replace(BF16, gcn_mode="fused"), batch=BATCH, seq=SEQ,
            steps=60)),
        ("per-dispatch bf16 gcn_mode=stacked", lambda: bench_train_step(
            replace(BF16, gcn_mode="stacked"), batch=BATCH, seq=SEQ,
            steps=60)),
        ("per-dispatch bf16 no dropout", lambda: bench_train_step(
            replace(BF16, dropout=0.0), batch=BATCH, seq=SEQ, steps=60)),
        ("scan-fused x16 bf16 no dropout", lambda: bench_scan_fused(
            replace(BF16, dropout=0.0))),
    ]
    for name, fn in cases:
        r = fn()
        print(f"{name:36s} {r['step_ms']:7.3f} ms/step  "
              f"{r['node_timesteps_per_s'] / 1e6:7.1f} M node-ts/s",
              flush=True)


if __name__ == "__main__":
    main()
