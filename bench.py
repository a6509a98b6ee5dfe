"""Benchmark: full-model training-step throughput on the flagship METR-LA
configuration (207 nodes, batch 64, 12-step horizon, diffusion GCN +
adaptive adjacency — BASELINE.json config #3).

Metric: node-timesteps/s through the jitted train step
(batch * num_nodes * seq_len per step). The reference publishes no timing
(BASELINE.md); ``REF_BASELINE`` is an estimate of the reference PyTorch
implementation's throughput on its GTX 1080 Ti (≈6.5 steps/s at batch 64 —
~55 s/epoch over 375 iterations, consistent with community-reported epoch
times for Graph WaveNet on METR-LA), i.e. ≈1.0e6 node-timesteps/s.
``vs_baseline`` is measured/REF_BASELINE.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

REF_BASELINE = 1.0e6  # node-timesteps/s, estimated reference 1080 Ti

WATCHDOG_S = 1500  # tunneled-device transports can wedge; never hang forever


def _watchdog(signum, frame):
    print("bench watchdog: device unresponsive after "
          f"{WATCHDOG_S}s, reporting failure", file=sys.stderr, flush=True)
    print(json.dumps({"metric": "train_step_node_timesteps_per_s",
                      "value": 0.0, "unit": "node-timesteps/s",
                      "vs_baseline": 0.0}), flush=True)
    os._exit(2)


def main() -> None:
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(WATCHDOG_S)
    import jax
    import jax.numpy as jnp

    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.train.engine import Engine

    # bf16 activations / fp32 params+accum+BN: the production mixed-precision
    # TPU configuration (BENCH_NOTES.md; fp32 parity covered by the test
    # suite, bf16 path by test_e2e/test_model_parity bf16 cases)
    cfg = ModelConfig(num_nodes=207, in_dim=2, out_dim=12,
                      residual_channels=32, dilation_channels=32,
                      skip_channels=256, end_channels=512, blocks=4,
                      layers=2, gcn_bool=True, addaptadj=True, n_supports=2,
                      dtype="bfloat16")
    batch, seq = 64, 12
    engine = Engine(cfg, TrainConfig(), StandardScaler(54.0, 20.0))

    rng = np.random.default_rng(0)
    a = rng.random((2, cfg.num_nodes, cfg.num_nodes)).astype(np.float32)
    supports = [jnp.asarray(s / s.sum(-1, keepdims=True)) for s in a]
    x = jnp.asarray(rng.normal(
        size=(batch, seq, cfg.num_nodes, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(
        size=(batch, seq, cfg.num_nodes, 2)).astype(np.float32) + 50.0)

    from graph_wavenet_tpu.benchmarks import _compile_step, _rate_fields

    state = engine.state
    # one AOT compile; XLA's own cost model supplies the FLOP count (incl.
    # Pallas kernels' CostEstimates) for the MFU context fields
    step, flops = _compile_step(engine.train_step, engine, state, x, y, supports)
    for _ in range(3):
        state, metrics = step(state, x, y, supports)
    float(metrics["loss"])  # full sync (block_until_ready alone can return
    #                         early through tunneled device transports)

    def timed(n_steps: int) -> float:
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, x, y, supports)
        float(metrics["loss"])  # fetch forces real completion
        return time.perf_counter() - t0

    # differential timing cancels the fixed dispatch/fetch overhead
    n1, n2 = 40, 120
    dt = timed(n2) - timed(n1)
    n_steps = n2 - n1

    node_timesteps = batch * cfg.num_nodes * seq * n_steps / dt
    rates = _rate_fields(dt / n_steps, flops)
    signal.alarm(0)
    print(json.dumps({
        "metric": "train_step_node_timesteps_per_s",
        "value": round(node_timesteps, 1),
        "unit": "node-timesteps/s",
        "vs_baseline": round(node_timesteps / REF_BASELINE, 3),
        # MFU/roofline context (VERDICT r3 weak #3): machine-captured, same
        # methodology as fig/perf_table.json
        "step_ms": round(rates["step_ms"], 3),
        "flops_per_step": rates["flops_per_step"],
        "eff_tflops": rates["eff_tflops"],
        "peak_tflops_bf16": rates["peak_tflops_bf16"],
        "mfu": rates["mfu"],
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
