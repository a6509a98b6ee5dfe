"""City-scale training demo: 40,960-node degree-8 road network with ELL
sparse diffusion supports — a graph whose dense (N, N) supports (6.7 GB
each, O(N^2) hops) are infeasible on one chip.

Data is a genuinely graph-coupled AR process generated ON DEVICE with the
same sparse mix op the model uses, so the forecasting task is learnable and
the graph structure matters. A short run demonstrating the loss descends;
~756 ms/step (BENCH_NOTES.md).

Usage: python garage/city_scale_demo.py [--nodes 40960] [--steps 60]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=40960)
    ap.add_argument("--degree", type=int, default=8)
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.ops import sparse
    from graph_wavenet_tpu.train.engine import Engine

    n = args.nodes
    rng = np.random.default_rng(0)
    print(f"building degree-{args.degree} supports for {n} nodes ...",
          flush=True)
    sup = [sparse.random_sparse_support(n, args.degree,
                                        np.random.default_rng(s))
           for s in (1, 2)]

    # graph-coupled AR rollout on device: x_{t+1} = 0.7 * A-mix(x_t) +
    # 0.25 * x_t + noise — the model must use the graph to predict it
    T_total = 40
    print("rolling out the diffusion process on device ...", flush=True)

    @jax.jit
    def rollout(key):
        def step(x, k):
            mixed = sparse.nconv_sparse(x[None, None, :, None],
                                        sup[0])[0, 0, :, 0]
            nxt = 0.7 * mixed + 0.25 * x + 0.1 * jax.random.normal(k, (n,))
            return nxt, nxt
        keys = jax.random.split(key, T_total)
        x0 = jax.random.normal(keys[0], (n,))
        _, xs = jax.lax.scan(step, x0, keys)
        return xs                                   # (T_total, N)

    series = np.asarray(rollout(jax.random.key(7)))
    scaler = StandardScaler(float(series.mean()), float(series.std()))
    std = scaler.transform(series)

    K, H = 12, 12
    cfg = ModelConfig(num_nodes=n, in_dim=2, out_dim=H,
                      residual_channels=32, dilation_channels=32,
                      skip_channels=256, end_channels=512, blocks=4,
                      layers=2, gcn_bool=True, addaptadj=False,
                      n_supports=2, dtype="bfloat16")
    engine = Engine(cfg, TrainConfig(learning_rate=3e-3), scaler)

    def batch(step_i):
        r = np.random.default_rng(step_i)
        anchors = r.integers(K - 1, T_total - H, size=args.batch)
        x = np.stack([std[a - K + 1:a + 1] for a in anchors])[..., None]
        tod = np.zeros_like(x)
        x = np.concatenate([x, tod], -1)            # (B, K, N, 2)
        y = np.stack([series[a + 1:a + 1 + H] for a in anchors])[..., None]
        y = np.concatenate([y, np.zeros_like(y)], -1)
        return jnp.asarray(x.astype(np.float32)), jnp.asarray(
            y.astype(np.float32))

    # context baselines: predicting the training mean, and persistence
    # (repeat the last observed value for all H horizons)
    anchors = np.arange(K - 1, T_total - H)
    errs = []
    for a in anchors:
        pred = series[a]                       # (N,)
        errs.append(np.abs(series[a + 1:a + 1 + H] - pred[None]).mean())
    print(f"persistence baseline MAE: {np.mean(errs):.4f}; "
          f"mean-prediction MAE: "
          f"{np.abs(series - series.mean()).mean():.4f}", flush=True)
    print(f"training {args.steps} steps ...", flush=True)
    state = engine.state
    t0 = time.time()
    first = last = None
    for i in range(args.steps):
        x, y = batch(i)
        state, m = engine.train_step(state, x, y, sup)
        if i % 25 == 0 or i == args.steps - 1:
            loss = float(m["loss"])
            first = loss if first is None else first
            last = loss
            print(f"step {i:3d}  masked-MAE {loss:.4f}", flush=True)
    wall = time.time() - t0
    print(f"\n{args.steps} steps in {wall:.1f}s "
          f"({wall / args.steps * 1e3:.0f} ms/step incl. host feed, "
          f"{args.batch * n * K / (wall / args.steps) / 1e6:.1f}M "
          f"node-ts/s); loss {first:.4f} -> {last:.4f}", flush=True)


if __name__ == "__main__":
    main()
