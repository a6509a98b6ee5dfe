"""Co-located serving measurement (VERDICT r1 weak #4): the round-1
787-vs-40 req/s MicroBatcher numbers were measured over the tunneled HTTP
transport, so they mostly amortized ~25 ms of RTT. This measures the same
comparison IN PROCESS (no HTTP, no tunnel): threads submit single
examples straight to the batcher vs issuing sequential direct
``Forecaster.predict`` singleton calls — the device-behavior-only
version of the claim.

Run on the TPU host: python garage/serving_colocated.py
Recorded in BENCH_NOTES.md ("Dynamic request batching").
"""

from __future__ import annotations

import pathlib
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax.numpy as jnp

    from graph_wavenet_tpu.config import ModelConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.models.gwnet import init_gwnet
    from graph_wavenet_tpu.train.serving import Forecaster, MicroBatcher

    import jax

    cfg = ModelConfig(num_nodes=207, in_dim=2, out_dim=12,
                      residual_channels=32, dilation_channels=32,
                      skip_channels=256, end_channels=512, blocks=4,
                      layers=2, gcn_bool=True, addaptadj=True, n_supports=2,
                      dtype="bfloat16")
    rng = np.random.default_rng(0)
    a = rng.random((2, cfg.num_nodes, cfg.num_nodes)).astype(np.float32)
    supports = [jnp.asarray(s / s.sum(-1, keepdims=True)) for s in a]
    params, state = init_gwnet(jax.random.key(0), cfg)
    fc = Forecaster(cfg, params, state, supports, StandardScaler(54., 20.))

    n_req = 512
    xs = [jnp.asarray(rng.normal(size=(1, 13, cfg.num_nodes, 2))
                      .astype(np.float32)) for _ in range(64)]

    # warm every power-of-two bucket the batcher can emit (it compiles
    # once per bucket; steady-state serving is what we're measuring)
    for b in (1, 2, 4, 8, 16, 32, 64):
        np.asarray(fc.predict(jnp.concatenate(xs[:b], 0)))
        print(f"warmed bucket {b}", flush=True)

    # sequential direct singletons (the no-batcher co-located baseline)
    t0 = time.perf_counter()
    for i in range(n_req):
        np.asarray(fc.predict(xs[i % 64]))
    seq_dt = time.perf_counter() - t0
    print(f"sequential singletons: {n_req / seq_dt:.0f} req/s "
          f"(p50 ~{seq_dt / n_req * 1e3:.2f} ms)", flush=True)

    # concurrent submits through the MicroBatcher
    calls = {"n": 0}
    real_predict = fc.predict

    def counting_predict(x):
        calls["n"] += 1
        return real_predict(x)

    # clients hand the batcher HOST arrays (an HTTP server decodes json to
    # numpy; a co-located client does the same) — submitting device rows
    # would make the worker's np.stack do B tunneled fetches per flush
    xs_host = [np.asarray(x[0]) for x in xs]
    with MicroBatcher(counting_predict, max_batch=64,
                      window_ms=2.0) as mb:
        np.asarray(mb.submit(xs_host[0]))           # warmup path
        calls["n"] = 0
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=64) as pool:
            futs = [pool.submit(lambda i=i: mb.submit(xs_host[i % 64]))
                    for i in range(n_req)]
            for f in futs:
                np.asarray(f.result())
        mb_dt = time.perf_counter() - t0
    print(f"MicroBatcher (in-process): {n_req / mb_dt:.0f} req/s, "
          f"{calls['n']} device calls for {n_req} requests "
          f"({n_req / seq_dt:.0f} -> {n_req / mb_dt:.0f} = "
          f"{seq_dt / mb_dt:.1f}x)", flush=True)


if __name__ == "__main__":
    main()
