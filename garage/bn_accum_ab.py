"""Accuracy A/B of gradient-accumulation BatchNorm semantics (VERDICT r1
weak #3): ``train_step_syn_accum`` normalizes each micro-batch with its
OWN statistics (engine.py documents it — the standard accumulation
semantics), so ``--grad_accum`` is not a bit-drop-in for a full-batch
run. This measures whether that matters at CRASH-like scale: same
learnable diffusion task, same data order, full-batch vs accum=4, loss
curves compared.

Run on the TPU host:
  python garage/bn_accum_ab.py [--steps 60] [--K 364] [--num_region 200]

Result recorded in BENCH_NOTES.md ("grad-accum BN semantics").
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from garage.crash_scale_demo import pick_arch  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--K", type=int, default=364)
    ap.add_argument("--num_region", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--accum", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.train.engine import Engine, cluster_mean_projector

    blocks, layers, d0 = pick_arch(args.K)
    N, K, B = args.num_region, args.K, args.batch
    print(f"arch: {blocks}x{layers} d0={d0}, N={N}, K={K}, batch {B}, "
          f"accum A/B 1 vs {args.accum}", flush=True)

    rng = np.random.default_rng(0)
    sc = rng.random((N, N)).astype(np.float32)
    A = sc / sc.sum(-1, keepdims=True)

    # learnable graph-coupled AR process (same construction as the city
    # demo): the model must use the graph to predict the next-K window.
    # Anchors sample with replacement, so a short series suffices.
    T_total = 2 * K + 64
    Aj = jnp.asarray(A)

    @jax.jit
    def rollout(key):
        def step(x, k):
            nxt = (0.7 * (x @ Aj) + 0.25 * x
                   + 0.1 * jax.random.normal(k, (N,)))
            return nxt, nxt
        keys = jax.random.split(key, T_total + 1)
        x0 = jax.random.normal(keys[0], (N,))
        _, xs = jax.lax.scan(step, x0, keys[1:])
        return xs

    series = np.asarray(rollout(jax.random.key(7)))    # (T, N)
    scaler = StandardScaler(float(series.mean()), float(series.std()))
    std = scaler.transform(series)

    # diff-G-shaped batches: x (B,K,N,1); y (B,K,N,2) = (F-pooled,
    # E-pooled) next-K signal (the syn modality supervision shape)
    F_t = 4
    labels = rng.integers(0, 64, size=N)
    projs = jnp.asarray(np.tile(cluster_mean_projector(labels, 64),
                                (B, 1, 1)))
    sup = jnp.asarray(np.tile(A, (B, 1, 1)))

    def make_batch(r):
        anchors = r.integers(0, T_total - 2 * K, size=B)
        x = np.stack([std[a:a + K] for a in anchors])[..., None]
        nxt = np.stack([series[a + K:a + 2 * K] for a in anchors])
        F = nxt.reshape(B, K // F_t, F_t, N).mean(2)
        F = np.repeat(F, F_t, axis=1)
        # E modality: per-cluster mean written back per node (the same
        # projector the engine pools predictions with)
        P = np.asarray(projs[0])                     # (N, N)
        E = np.einsum("bkn,nm->bkm", nxt, P.T)
        y = np.stack([F, E], axis=-1)
        return (jnp.asarray(x.astype(np.float32)),
                jnp.asarray(y.astype(np.float32)))

    cfg = ModelConfig(num_nodes=N, in_dim=1, out_dim=K,
                      residual_channels=16, dilation_channels=16,
                      skip_channels=128, end_channels=256, blocks=blocks,
                      layers=layers, start_dilation=d0, dropout=0.0,
                      gcn_bool=True, addaptadj=False, n_supports=1,
                      dtype="bfloat16")

    results = {}
    for name, accum in (("full", 1), (f"accum{args.accum}", args.accum)):
        engine = Engine(cfg, TrainConfig(learning_rate=1e-3,
                                         rng_impl="rbg"),
                        scaler, seed=0, diff_g=True)
        state = engine.state
        r = np.random.default_rng(123)               # same batch sequence
        losses = []
        t0 = time.time()
        for i in range(args.steps):
            x, y = make_batch(r)
            if accum > 1:
                state, m = engine.train_step_syn_accum(
                    state, x, y, [sup], projs, F_t, accum)
            else:
                state, m = engine.train_step_syn(state, x, y, [sup],
                                                 projs, F_t)
            losses.append(float(m["loss"]))
            if i % 10 == 0:
                print(f"  {name} step {i}: loss {losses[-1]:.4f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        results[name] = losses
        print(f"{name:8s}: loss {losses[0]:.4f} -> "
              f"{np.mean(losses[-8:]):.4f} (mean of last 8), "
              f"{time.time() - t0:.0f}s", flush=True)

    a = np.mean(results["full"][-8:])
    b = np.mean(results[f"accum{args.accum}"][-8:])
    print(f"\nfinal-loss ratio accum/full: {b / a:.4f} "
          f"({abs(b - a) / a * 100:.2f}% difference)", flush=True)


if __name__ == "__main__":
    main()
