"""City-scale training demo: a 40,960-node clustered road network with
BLOCK-SPARSE diffusion supports (128x128 nonzero blocks = batched MXU
matmuls, 3.2x the ELL form's speed) — a graph whose dense (N, N) supports
(6.7 GB each, O(N^2) hops) are infeasible on one chip.

Data is a genuinely graph-coupled AR process generated ON DEVICE with the
same sparse mix op the model uses, so the forecasting task is learnable and
the graph structure matters. A short run demonstrating the loss descends;
~477 ms/step wall, 234 ms device (BENCH_NOTES.md).

Graph families (--graph):
- ``spatial`` (default): a k-NN road-network graph on random 2D points
  (Gaussian kernel weights, doubletransition normalization on the edge
  list), reordered with reverse Cuthill-McKee (``--ordering rcm``) so each
  destination block-row draws from few adjacent source blocks — the
  block-sparse hop's HBM traffic is linear in that count. ``--ordering
  identity`` A/Bs the unordered layout.
- ``random``: the round-1 synthetic block structure (uniform random
  source blocks, fixed --blocks_per_row) — no locality to exploit, kept
  as the worst-case baseline.

Usage: python garage/city_scale_demo.py [--nodes 40960] [--steps 100]
       [--graph spatial|random] [--ordering rcm|identity]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def build_spatial_supports(n, rng, ordering: str, ordering_mod, k: int = 8,
                           form: str = "block"):
    """doubletransition supports of a spatial k-NN graph in block-sparse
    form under the chosen node ordering; prints the locality stats."""
    from graph_wavenet_tpu.graphs import spatial

    pos = rng.random((n, 2))
    src, dst, w = spatial.knn_graph_edges(pos, k)
    if ordering == "best":
        perm, chosen, _ = ordering_mod.best_block_ordering(src, dst, n,
                                                           pos=pos)
    elif ordering == "rcm":
        perm, chosen = ordering_mod.rcm_order_edges(src, dst, n), "rcm"
    elif ordering == "hilbert":
        perm, chosen = ordering_mod.hilbert_order_points(pos), "hilbert"
    else:
        perm, chosen = None, "identity"
    shown = [("identity", None)] + ([(chosen, perm)] if perm is not None
                                    else [])
    for name, p in shown:
        stats = ordering_mod.block_locality_stats(src, dst, n, p)
        print(f"  {name:8s}: {stats['n_blocks']} nonzero blocks, "
              f"{stats['blocks_per_row_mean']:.1f} mean / "
              f"{stats['blocks_per_row_max']} max per block-row", flush=True)
    return spatial.doubletransition_block_supports(
        src, dst, w, n, perm=perm, form=form)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=40960)
    ap.add_argument("--graph", choices=("spatial", "random"),
                    default="spatial")
    ap.add_argument("--ordering",
                    choices=("best", "rcm", "hilbert", "identity"),
                    default="best", help="node ordering for --graph spatial")
    ap.add_argument("--knn", type=int, default=8,
                    help="spatial graph: neighbors per node")
    ap.add_argument("--blocks_per_row", type=int, default=4,
                    help="random graph density: 128-wide nonzero blocks "
                         "per block-row (incl. the diagonal block)")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--fuse2", choices=("on", "off"), default="on",
                    help="fused order-2 hop-chain kernel for banded "
                         "flat supports (ops/block_sparse.as_fused2); "
                         "off = the two-call chain, for A/B")
    ap.add_argument("--addaptadj", action="store_true",
                    help="train the block-masked adaptive adjacency on "
                         "the supports' union pattern — the FULL "
                         "reference model (learned graph included) at "
                         "city scale (ops/adaptive_block.py)")
    ap.add_argument("--adaptive_hops", type=int, default=1,
                    help="widen the adaptive mask to the k-hop block "
                         "closure (the dense-fidelity dial; cost scales "
                         "with the widened live-block count)")
    ap.add_argument("--support_dtype", choices=("float32", "bfloat16"),
                    default="bfloat16",
                    help="storage dtype of the fixed support blocks. The "
                         "model casts blocks to its bf16 activation "
                         "dtype per use either way, so bfloat16 storage "
                         "is numerically identical while halving the "
                         "supports' resident HBM and deleting the "
                         "per-step cast copies (327k full-model "
                         "enabler); float32 = the pre-r5 layout for A/B")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize WaveNet layers in the backward "
                         "pass (ModelConfig.remat) — trades recompute "
                         "for the temporal-conv activation memory that "
                         "blocks large batches at 163k+ nodes")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.graphs import ordering as ordering_mod
    from graph_wavenet_tpu.ops import block_sparse
    from graph_wavenet_tpu.train.engine import Engine

    n = args.nodes
    if n < 128 or n % 128:
        raise SystemExit(f"--nodes must be a positive multiple of the "
                         f"128-block size (got {n})")
    rng = np.random.default_rng(0)
    print(f"building block-sparse supports for {n} nodes "
          f"({args.graph} graph) ...", flush=True)
    on_tpu = jax.default_backend() == "tpu"
    if args.graph == "spatial":
        # flat live-block Pallas kernels on TPU: work scales with the MEAN
        # blocks per row the ordering achieves, not the max
        sup = build_spatial_supports(n, rng, args.ordering, ordering_mod,
                                     k=args.knn,
                                     form="flat" if on_tpu else "block")
    else:
        sup = [block_sparse.random_block_support(
            n // 128, args.blocks_per_row, 128, np.random.default_rng(s))
            for s in (1, 2)]
        if on_tpu:
            sup = [block_sparse.as_flat_pallas(s) for s in sup]

    # graph-coupled AR rollout on device: x_{t+1} = 0.7 * A-mix(x_t) +
    # 0.25 * x_t + noise — the model must use the graph to predict it
    T_total = 40
    print("rolling out the diffusion process on device ...", flush=True)

    @jax.jit
    def rollout(key, sup0):
        # sup0 rides as an ARGUMENT: a closed-over support's blocks would
        # embed as program constants, and above ~64k nodes the serialized
        # program exceeds remote-compile transport limits (HTTP 413)
        def step(x, k):
            mixed = block_sparse.nconv_block_sparse(
                x[None, None, :, None], sup0)[0, 0, :, 0]
            nxt = 0.7 * mixed + 0.25 * x + 0.1 * jax.random.normal(k, (n,))
            return nxt, nxt
        keys = jax.random.split(key, T_total + 1)
        x0 = jax.random.normal(keys[0], (n,))      # keys[0] only for x0:
        _, xs = jax.lax.scan(step, x0, keys[1:])   # noise keys independent
        return xs                                   # (T_total, N)

    series = np.asarray(rollout(jax.random.key(7), sup[0]))
    scaler = StandardScaler(float(series.mean()), float(series.std()))
    std = scaler.transform(series)

    if args.fuse2 == "off":
        # A/B: downgrade the (auto-fused) flat supports to the chain
        sup = [block_sparse.as_unfused(s)
               if isinstance(s, block_sparse.FlatBlockSparseSupport)
               else s for s in sup]
    else:
        sup = [block_sparse.as_fused2(s)
               if isinstance(s, block_sparse.FlatBlockSparseSupport)
               else s for s in sup]
        n_fused = sum(isinstance(s, block_sparse.Fused2FlatSupport)
                      for s in sup)
        print(f"fused order-2 hop chain: {n_fused}/{len(sup)} supports "
              "qualify", flush=True)

    if args.support_dtype != "float32":
        # AFTER the rollout (data generation stays fp32), BEFORE the mask
        # (pattern-only; the materialized learned support follows the
        # model's activation dtype via gwnet's out_dtype exit-cast)
        sup = [s.astype(args.support_dtype) for s in sup]
        print(f"support blocks stored as {args.support_dtype}", flush=True)

    if args.addaptadj:
        from graph_wavenet_tpu.ops.adaptive_block import mask_from_supports

        mask = mask_from_supports(sup, hops=args.adaptive_hops)
        print(f"adaptive mask: {mask.n_live} live blocks "
              f"(union of supports + diagonal, hops={args.adaptive_hops})",
              flush=True)
        sup = list(sup) + [mask]

    K, H = 12, 12
    cfg = ModelConfig(num_nodes=n, in_dim=2, out_dim=H,
                      residual_channels=32, dilation_channels=32,
                      skip_channels=256, end_channels=512, blocks=4,
                      layers=2, gcn_bool=True, addaptadj=args.addaptadj,
                      n_supports=2, dtype="bfloat16", remat=args.remat)
    engine = Engine(cfg, TrainConfig(learning_rate=3e-3), scaler)

    # device-resident feed: the standardized series lives in HBM once;
    # every dispatch runs `scan` fused steps whose windows are gathered on
    # device from int32 anchors (engine.train_steps_windows)
    feat = np.stack([std, np.zeros_like(std)], -1).astype(np.float32)
    yfeat = np.stack([series, np.zeros_like(series)], -1).astype(np.float32)
    dev_x = jnp.asarray(feat)
    dev_y = jnp.asarray(yfeat)
    scan = 10
    r = np.random.default_rng(123)

    print(f"training {args.steps} steps ({scan} per dispatch) ...",
          flush=True)
    state = engine.state
    t0 = time.time()
    first = last = None
    done = 0
    while done < args.steps:
        anchors = r.integers(K - 1, T_total - H,
                             size=(scan, args.batch)).astype(np.int32)
        state, m = engine.train_steps_windows(
            state, dev_x, jnp.asarray(anchors), K, H, 1, sup,
            y_series=dev_y)
        losses = np.asarray(m["loss"])
        if first is None:
            first = float(losses[0])
        last = float(losses[-1])
        done += scan
        print(f"steps {done:3d}  masked-MAE {last:.4f}", flush=True)
    wall = time.time() - t0
    # `done` (a multiple of the scan width) is the actual step count — the
    # loop rounds --steps up to whole dispatches
    print(f"\n{done} steps in {wall:.1f}s "
          f"({wall / done * 1e3:.0f} ms/step incl. host feed, "
          f"{args.batch * n * K / (wall / done) / 1e6:.1f}M "
          f"node-ts/s); loss {first:.4f} -> {last:.4f}", flush=True)
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        gib = 1024 ** 3
        if "peak_bytes_in_use" in ms:
            print(f"HBM: peak {ms['peak_bytes_in_use'] / gib:.2f} GiB, "
                  f"in use {ms.get('bytes_in_use', 0) / gib:.2f} GiB, "
                  f"limit {ms.get('bytes_limit', 0) / gib:.2f} GiB",
                  flush=True)
        else:
            # the tunneled axon transport reports no memory stats; the
            # analytic budget lives in BENCH_NOTES' scale-probe sections
            print("HBM stats: not reported by this backend", flush=True)
    except Exception as e:   # memory_stats is optional on some backends
        print(f"HBM stats unavailable: {e}", flush=True)


if __name__ == "__main__":
    main()
