"""Long-K x wide-N single-chip probe (VERDICT r4 #5 / r3 #7a): CRASH-length
sequences meet city-width graphs in ONE measured train step.

The reference caps fMRI windows at 51 frames "due to memory limit"
(`/root/reference/Utils/util.py:352-356`) and its CRASH windows are
K = int(582.4 * 5) = 2912 EEG-rate steps (`util.py:416-417`) on 200
regions; its city-scale analogue does not exist. Here: K=2912 history on
a 40,960-node spatial road graph with BLOCK-SPARSE diffusion supports,
12-step horizon, bf16 activations, `ModelConfig.remat` for the
activation wall. The dilated stack is chosen to consume exactly K+1
steps (receptive field 2913 = K+1, real-path +1 engine pad included):
2 blocks x 3 layers, start_dilation 208 (1 + 2*208*(2^3-1) = 2913) — a
CRASH-class receptive field with few enough layers that the remat
boundary activations fit one chip at city width (the reference's
13x3x32 CRASH arch keeps ~5x the boundary activations and cannot fit
41k nodes on 16 GB).

Data is the same graph-coupled on-device AR rollout as
garage/city_scale_demo.py, so the loss must descend if the step is
actually learning. Windows are gathered ON DEVICE from int32 anchors
(`Engine.train_steps_windows`): the host never materializes a
(B, 2912, 40960, 2) batch.

Usage: python garage/longk_city_demo.py [--nodes 40960] [--K 2912]
       [--steps 16] [--batch 1] [--nhid 8] [--remat/--no-remat]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def pick_arch(K: int):
    """(blocks, layers, start_dilation) with receptive_field == K + 1,
    preferring the FEWEST total layers (remat stores one boundary
    activation per layer, each ~T_l x N x C — at city width the layer
    count, not the recompute, is the memory wall)."""
    cands = []
    for layers in (3, 4, 2, 5):
        span = 2 ** layers - 1
        if K % span:
            continue
        rest = K // span
        for blocks in range(1, 9):
            if rest % blocks:
                continue
            cands.append((blocks, layers, rest // blocks,
                          blocks * layers))
    if not cands:
        raise SystemExit(f"no (blocks, layers, d0) collapses K={K}")
    # fewest layers that still make a non-degenerate stack (>= 6)
    deep = [c for c in cands if c[3] >= 6]
    return min(deep or cands, key=lambda c: c[3])[:3]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=40960)
    ap.add_argument("--K", type=int, default=2912)
    ap.add_argument("--horizon", type=int, default=12)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--nhid", type=int, default=8)
    ap.add_argument("--knn", type=int, default=8)
    ap.add_argument("--remat", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--gcn", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="--no-gcn = temporal-only stack (compile-crash "
                         "bisection aid)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.graphs import ordering as ordering_mod
    from graph_wavenet_tpu.graphs import spatial
    from graph_wavenet_tpu.ops import block_sparse
    from graph_wavenet_tpu.train.engine import Engine

    n, K, H, B = args.nodes, args.K, args.horizon, args.batch
    blocks, layers, d0 = pick_arch(K)
    rf = 1 + blocks * d0 * (2 ** layers - 1)
    print(f"arch: {blocks} blocks x {layers} layers, start_dilation {d0} "
          f"(receptive field {rf} = K+1 = {K + 1}); N={n}, K={K}, "
          f"batch {B}, nhid {args.nhid}, remat {args.remat}", flush=True)

    rng = np.random.default_rng(0)
    print("building block-sparse supports ...", flush=True)
    pos = rng.random((n, 2))
    src, dst, w = spatial.knn_graph_edges(pos, args.knn)
    perm, chosen, _ = ordering_mod.best_block_ordering(src, dst, n, pos=pos)
    on_tpu = jax.default_backend() == "tpu"
    sup = spatial.doubletransition_block_supports(
        src, dst, w, n, perm=perm, form="flat" if on_tpu else "block")
    if on_tpu:
        sup = [block_sparse.as_fused2(s) for s in sup]
    print(f"  ordering {chosen}; "
          f"{sum(s.blocks_flat.shape[0] - 1 if hasattr(s, 'blocks_flat') else 0 for s in sup)}"
          " live blocks total", flush=True)

    T_total = K + H + 16
    print(f"rolling out {T_total} steps of the graph-coupled AR process "
          "on device ...", flush=True)

    @jax.jit
    def rollout(key, sup0):
        def step(x, k):
            mixed = block_sparse.nconv_block_sparse(
                x[None, None, :, None], sup0)[0, 0, :, 0]
            nxt = 0.7 * mixed + 0.25 * x + 0.1 * jax.random.normal(k, (n,))
            return nxt, nxt
        keys = jax.random.split(key, T_total + 1)
        x0 = jax.random.normal(keys[0], (n,))
        _, xs = jax.lax.scan(step, x0, keys[1:])
        return xs

    series = np.asarray(rollout(jax.random.key(7), sup[0]))
    scaler = StandardScaler(float(series.mean()), float(series.std()))
    std = scaler.transform(series)

    cfg = ModelConfig(num_nodes=n, in_dim=2, out_dim=H,
                      residual_channels=args.nhid,
                      dilation_channels=args.nhid,
                      skip_channels=args.nhid * 8,
                      end_channels=args.nhid * 16, blocks=blocks,
                      layers=layers, start_dilation=d0, dropout=0.3,
                      gcn_bool=args.gcn, addaptadj=False, n_supports=2,
                      dtype="bfloat16", remat=args.remat)
    assert cfg.receptive_field == K + 1
    engine = Engine(cfg, TrainConfig(learning_rate=3e-3, rng_impl="rbg"),
                    scaler)

    feat = np.stack([std, np.zeros_like(std)], -1).astype(np.float32)
    yfeat = np.stack([series, np.zeros_like(series)], -1).astype(np.float32)
    dev_x = jnp.asarray(feat)
    dev_y = jnp.asarray(yfeat)
    r = np.random.default_rng(123)

    if not args.gcn:
        sup = None
    state = engine.state
    print("compiling the K=2912 train step ...", flush=True)
    t0 = time.time()
    anchors = r.integers(K - 1, T_total - H, size=(1, B)).astype(np.int32)
    try:
        state, m = engine.train_steps_windows(
            state, dev_x, jnp.asarray(anchors), K, H, 1, sup,
            y_series=dev_y)
        first = float(np.asarray(m["loss"])[0])
    except Exception as e:
        # the compiler's OOM line ("Used X of Y hbm") is the recorded
        # memory budget when a config does not fit — print head and exit
        print("COMPILE/RUN FAILED:\n" + "\n".join(
            str(e).splitlines()[:12]), flush=True)
        raise SystemExit(2)
    print(f"first step (incl. compile): {time.time() - t0:.1f}s, "
          f"loss {first:.4f}", flush=True)

    t0 = time.time()
    last = first
    for i in range(args.steps - 1):
        anchors = r.integers(K - 1, T_total - H,
                             size=(1, B)).astype(np.int32)
        state, m = engine.train_steps_windows(
            state, dev_x, jnp.asarray(anchors), K, H, 1, sup,
            y_series=dev_y)
        last = float(np.asarray(m["loss"])[0])
        if (i + 1) % 4 == 0:
            print(f"  step {i + 2:3d}  masked-MAE {last:.4f}", flush=True)
    dt = time.time() - t0
    per = dt / max(args.steps - 1, 1)
    print(f"\n{args.steps - 1} steps in {dt:.1f}s ({per * 1e3:.0f} ms/step"
          f", {B * n * K / per / 1e6:.1f}M node-ts/s); "
          f"loss {first:.4f} -> {last:.4f}", flush=True)


if __name__ == "__main__":
    main()
