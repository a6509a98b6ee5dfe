"""Same-host measured perf anchor (VERDICT r1 #8).

``bench.py``'s ``vs_baseline`` denominator is an *estimate* of the
reference PyTorch implementation on its GTX 1080 Ti (the reference
publishes no timing — BASELINE.md). This script produces the one
*measured* point we can get in this environment: the imported reference
trainer (`/root/reference/engine.py:41-58`, torch CPU) and our Engine
(JAX CPU) timed on the SAME host, same flagship configuration, same
data, so the ratio has no estimated term.

Run: JAX_PLATFORMS=cpu python garage/same_host_anchor.py
(the script forces CPU itself if the var is unset).

Results are recorded in BENCH_NOTES.md ("Same-host measured anchor").
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tests"))

# the session environment may pre-import jax with a TPU platform selected
# (site customization) — the env var alone is too late; force via config
# before any backend init (same pattern as tests/conftest.py)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    import torch

    import reference_harness as rh

    if not rh.reference_available():
        print("reference not available; nothing to anchor")
        return

    assert jax.default_backend() == "cpu", jax.default_backend()
    import jax.numpy as jnp

    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.train.engine import Engine

    # Flagship model shape (BASELINE.json config #3) at batch 16, fp32 both
    # sides: CPU has no bf16 fast path and the reference runs fp32, so
    # fp32-vs-fp32 is the apples-to-apples same-host comparison. Batch is
    # reduced from the flagship 64 so the torch side finishes on this
    # 2-vCPU host; the ratio is what matters, not the absolute rate.
    cfg = ModelConfig(num_nodes=207, in_dim=2, out_dim=12,
                      residual_channels=32, dilation_channels=32,
                      skip_channels=256, end_channels=512, blocks=4,
                      layers=2, gcn_bool=True, addaptadj=True, n_supports=2,
                      dtype="float32")
    batch, seq = 16, 12
    scaler = StandardScaler(54.0, 20.0)

    rng = np.random.default_rng(0)
    a = rng.random((2, cfg.num_nodes, cfg.num_nodes)).astype(np.float32)
    supports_np = [s / s.sum(-1, keepdims=True) for s in a]
    x_np = rng.normal(size=(batch, seq, cfg.num_nodes, 2)).astype(np.float32)
    y_np = (rng.normal(size=(batch, seq, cfg.num_nodes, 2))
            .astype(np.float32) + 50.0)

    # --- reference trainer, torch CPU -----------------------------------
    ref = rh.import_reference()
    t = rh.build_ref_trainer(ref, cfg, scaler, supports_np)
    tx = torch.tensor(x_np.transpose(0, 3, 2, 1))
    ty = torch.tensor(y_np.transpose(0, 3, 2, 1))[:, 0]
    t.train(tx, ty)  # warmup
    print("reference warmup done", flush=True)
    n_ref = 5
    t0 = time.perf_counter()
    for _ in range(n_ref):
        t.train(tx, ty)
    ref_dt = (time.perf_counter() - t0) / n_ref
    print(f"reference: {ref_dt * 1e3:.1f} ms/step", flush=True)

    # --- our engine, JAX CPU --------------------------------------------
    engine = Engine(cfg, TrainConfig(), scaler)
    supports = [jnp.asarray(s) for s in supports_np]
    x = jnp.asarray(x_np)
    y = jnp.asarray(y_np)
    state = engine.state
    for _ in range(3):  # compile + warmup
        state, metrics = engine.train_step(state, x, y, supports)
    float(metrics["loss"])
    print("ours compiled", flush=True)
    n_ours = 20
    t0 = time.perf_counter()
    for _ in range(n_ours):
        state, metrics = engine.train_step(state, x, y, supports)
    float(metrics["loss"])
    ours_dt = (time.perf_counter() - t0) / n_ours

    nts = batch * cfg.num_nodes * seq
    out = {
        "host_cpus": os.cpu_count(),
        "torch_threads": torch.get_num_threads(),
        "config": f"flagship N=207 batch={batch} seq={seq} fp32",
        "reference_ms_per_step": round(ref_dt * 1e3, 1),
        "ours_ms_per_step": round(ours_dt * 1e3, 1),
        "reference_node_ts_per_s": round(nts / ref_dt, 1),
        "ours_node_ts_per_s": round(nts / ours_dt, 1),
        "same_host_speedup": round(ref_dt / ours_dt, 2),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
