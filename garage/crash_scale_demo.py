"""CRASH-scale single-chip training with gradient accumulation.

The reference's CRASH configuration — 200 Schaefer regions, windows of
K = int(582.4 * 5) = 2912 EEG-rate steps (`/root/reference/Utils/
util.py:416-417`) — is the workload it chunks by hand "due to memory
limit" (`util.py:352-356`) and never finishes. This demo trains it on ONE
chip end-to-end: a dilated stack that actually collapses K+1 steps
(13 blocks x 3 layers, start_dilation 32 -> receptive field 2913), bf16
activations, and ``--grad_accum`` micro-batching (engine
``train_step_syn_accum``) for the ~accum-fold activation-memory cut. At
batch 4 the full-batch step needs more HBM than a 16 GB v5e has;
accum=4 fits. Prints measured device memory per configuration.

Usage: python garage/crash_scale_demo.py [--steps 8] [--batch 4]
       [--grad_accum 4] [--num_region 200] [--K 2912]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def pick_arch(K: int):
    """blocks/layers/start_dilation with receptive_field == K + 1 (the
    modality supervision's collapse requirement), preferring few layers."""
    for layers in (3, 4, 5, 2):
        span = 2 ** layers - 1
        if K % span:
            continue
        rest = K // span
        for d0 in (32, 16, 64, 8, 128, 4, 2, 1):
            if rest % d0 == 0 and rest // d0 <= 16:
                return rest // d0, layers, d0
    raise SystemExit(f"no (blocks, layers, start_dilation) collapses K={K}; "
                     "pick K = blocks * d0 * (2^layers - 1)")


def device_mem_gb() -> float:
    import jax

    stats = jax.local_devices()[0].memory_stats() or {}
    return stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / 2**30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--grad_accum", type=int, default=4)
    ap.add_argument("--num_region", type=int, default=200)
    ap.add_argument("--K", type=int, default=2912)
    ap.add_argument("--nhid", type=int, default=32)
    ap.add_argument("--remat", action="store_true",
                    help="additionally rematerialize each layer")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.train.engine import Engine, cluster_mean_projector

    blocks, layers, d0 = pick_arch(args.K)
    N, K, B = args.num_region, args.K, args.batch
    print(f"arch: {blocks} blocks x {layers} layers, start_dilation {d0} "
          f"(receptive field {1 + blocks * d0 * (2**layers - 1)} = K+1 = "
          f"{K + 1}); N={N}, batch {B}, accum {args.grad_accum}",
          flush=True)

    cfg = ModelConfig(num_nodes=N, in_dim=1, out_dim=K,
                      residual_channels=args.nhid,
                      dilation_channels=args.nhid,
                      skip_channels=args.nhid * 8,
                      end_channels=args.nhid * 16, blocks=blocks,
                      layers=layers, start_dilation=d0, dropout=0.3,
                      gcn_bool=True, addaptadj=False, n_supports=1,
                      dtype="bfloat16", remat=args.remat)
    engine = Engine(cfg, TrainConfig(learning_rate=1e-3, rng_impl="rbg"),
                    StandardScaler(0.0, 1.0), diff_g=True)

    rng = np.random.default_rng(0)
    # CRASH-shaped batch: channel 0 fMRI-extended, channel 1 EEG-expanded
    x = jnp.asarray(rng.normal(size=(B, K, N, 1)).astype(np.float32))
    y = jnp.asarray((rng.normal(size=(B, K, N, 2)) + 3).astype(np.float32))
    sc = rng.random((B, N, N)).astype(np.float32)
    sup = [jnp.asarray(sc / sc.sum(-1, keepdims=True))]
    labels = rng.integers(0, 64, size=(B, N))
    proj = jnp.asarray(np.stack(
        [cluster_mean_projector(l, 64) for l in labels]))
    F_t = 4                        # divides 2912; stands in for ceil ratio

    state = engine.state
    accum = args.grad_accum
    print("compiling ...", flush=True)
    t0 = time.time()
    if accum > 1:
        state, m = engine.train_step_syn_accum(state, x, y, sup, proj, F_t,
                                               accum)
    else:
        state, m = engine.train_step_syn(state, x, y, sup, proj, F_t)
    first_loss = float(m["loss"])
    print(f"first step (incl. compile): {time.time() - t0:.1f}s, "
          f"loss {first_loss:.4f}, peak HBM {device_mem_gb():.2f} GiB",
          flush=True)

    t0 = time.time()
    for _ in range(args.steps - 1):
        if accum > 1:
            state, m = engine.train_step_syn_accum(state, x, y, sup, proj,
                                                   F_t, accum)
        else:
            state, m = engine.train_step_syn(state, x, y, sup, proj, F_t)
    last = float(m["loss"])
    dt = time.time() - t0
    per = dt / max(args.steps - 1, 1)
    print(f"{args.steps - 1} steps in {dt:.1f}s ({per * 1e3:.0f} ms/step, "
          f"{B * N * K / per / 1e6:.1f}M node-ts/s); "
          f"loss {first_loss:.4f} -> {last:.4f}; "
          f"peak HBM {device_mem_gb():.2f} GiB", flush=True)


if __name__ == "__main__":
    main()
