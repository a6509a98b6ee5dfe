"""Dense-vs-masked adaptive adjacency convergence A/B (VERDICT r3 #1).

The at-scale model constrains the learned adjacency to the union-of-
supports(+diagonal) block pattern (`ops/adaptive_block.py`); the reference
softmaxes over ALL destinations (`/root/reference/model.py:117-127,
184-189`). This script measures what that constraint costs in accuracy at
an N where the dense path fits comfortably: train the FULL model (fixed
doubletransition supports + learned adjacency) from matched inits in
three arms on the same synthetic spatial-traffic dataset:

  dense    — (N, N) dense adaptive adjacency, reference semantics
             (`ops/adaptive.py:adaptive_adjacency`);
  mask-h1  — block-masked adaptive on the union-of-supports(+diag) mask
             (the production city-scale path, hops=1);
  mask-h2  — the 2-hop block closure of that mask (the widening knob,
             `ops/adaptive_block.py:widen_block_pairs`).

The node layout is permuted ONCE up front (``best_block_ordering`` on
the spatial graph) and every arm — including dense — trains the SAME
permuted dataset in identity order. A permutation leaves the dense arm's
semantics untouched, but it is what makes the union mask genuinely
SPARSE (under a random layout a k-NN graph touches every 128x128 block
pair and the "masked" arm degenerates to all-live: measured in round 4,
where that degenerate run doubled as a full-training-run proof that the
all-live masked path == the dense path, test MAE within 3e-4). Arms
share seeds and hyperparameters, so with node ids aligned the inits are
matched parameter-for-parameter; the dense-arm seed spread is the noise
floor.

Each (arm, seed) trains in its OWN SUBPROCESS: one in-process sweep
accumulates host mirrors of device state across runs and OOMs a 128 GB
host (round-4 lesson).

Writes fig/adaptive_mask_ab.json + .png and prints a PARITY.md table.

Usage: python garage/adaptive_mask_ab.py [--num_nodes 2048] [--epochs 15]
       [--seeds 0 1 2]  (runs on whatever jax.default_backend() is)
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def build_workdir(args) -> dict:
    """Dataset + permuted graph, shared by every arm subprocess."""
    from reference_harness import load_flagship_demo

    from graph_wavenet_tpu.data.traffic_etl import generate_train_val_test
    from graph_wavenet_tpu.graphs import ordering as O

    wd = args.workdir
    if all(os.path.exists(os.path.join(wd, f)) for f in
           ("adj_perm.npy", "train.npz", "val.npz", "test.npz")):
        print("workdir already built: reusing dataset + layout", flush=True)
        return {"ordering": "cached"}
    fd = load_flagship_demo()
    rng = np.random.default_rng(7)
    n = args.num_nodes
    adj, pos = fd.make_sensor_graph(n, rng)
    values = fd.synth_traffic(n, args.timesteps, adj, rng)
    # permute the LAYOUT once: spatially-close nodes land in the same
    # 128-block, so the union mask is sparse; dense semantics unchanged
    src, dst = np.nonzero(adj)
    perm, chosen, _ = O.best_block_ordering(src, dst, n, pos=pos)
    inv = np.argsort(perm)
    values = values[:, inv]                    # column i <- old node inv[i]
    adj = adj[np.ix_(inv, inv)]
    index = (np.datetime64("2012-03-01T00:00")
             + np.arange(args.timesteps) * np.timedelta64(5, "m"))
    generate_train_val_test(values, wd, index=index)
    np.save(os.path.join(wd, "adj_perm.npy"), adj)
    stats = O.block_locality_stats(*np.nonzero(adj), n, None, 128)
    print(f"layout: {chosen}; {stats['n_blocks']} live blocks, "
          f"{stats['blocks_per_row_mean']:.1f} mean per block-row",
          flush=True)
    return {"ordering": chosen}


def run_worker(args) -> None:
    """One (arm, seed) training run; writes <workdir>/<arm>_s<seed>.json."""
    import jax

    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data import metr
    from graph_wavenet_tpu.graphs.city import build_city_supports
    from graph_wavenet_tpu.graphs.normalize import mod_adj
    from graph_wavenet_tpu.train.engine import Engine
    from graph_wavenet_tpu.train.runner import Runner

    wd, arm, seed = args.workdir, args.arm, args.seed
    adj = np.load(os.path.join(wd, "adj_perm.npy"))
    n = adj.shape[0]
    nb = n // 128
    if arm == "dense":
        supports = [np.asarray(a) for a in mod_adj(adj, "doubletransition")]
        coverage = 1.0
    else:
        hops = int(arm.split("-h")[1])
        src, dst = np.nonzero(adj)
        w = adj[src, dst].astype(np.float32)
        form = "flat" if jax.default_backend() == "tpu" else "block"
        sups, mask, _ = build_city_supports(
            src, dst, w, n, ordering="identity", form=form,
            addaptadj=True, adaptive_hops=hops)
        coverage = mask.n_live / (nb * nb)
        supports = list(sups) + [mask]

    nhid = args.nhid
    cfg = ModelConfig(num_nodes=n, in_dim=2, out_dim=12,
                      residual_channels=nhid, dilation_channels=nhid,
                      skip_channels=nhid * 8, end_channels=nhid * 16,
                      blocks=4, layers=2, dropout=args.dropout,
                      gcn_bool=True, addaptadj=True, n_supports=2,
                      remat=args.remat, dtype=args.dtype)
    tcfg = TrainConfig(seed=seed, epochs=args.epochs,
                       batch_size=args.batch_size, print_every=10 ** 9,
                       keep_checkpoints=1, scan_steps=args.scan_steps,
                       rng_impl="rbg" if args.dtype == "bfloat16"
                       else "threefry",
                       save_dir=tempfile.mkdtemp(prefix=f"ab_{arm}_"))
    data = metr.load_dataset(wd, args.batch_size, seed=seed,
                             resident=args.resident)
    engine = Engine(cfg, tcfg, data["scaler"], seed=seed)
    runner = Runner(engine, tcfg)
    t0 = time.time()
    result = runner.fit(data, supports)
    wall = time.time() - t0
    result = runner.test(data, supports, result)
    rec = {
        "arm": arm, "seed": seed, "coverage": coverage, "wall_s": wall,
        "history": [{"epoch": e.epoch, "train_loss": e.train["loss"],
                     "valid_loss": e.valid["loss"]} for e in result.history],
        "best_val": result.best_val_loss,
        "test_mae": result.test_metrics["mae"],
        "test_rmse": result.test_metrics["rmse"],
        "test_mape": result.test_metrics["mape"],
        "per_horizon": [list(map(float, m)) for m in result.per_horizon],
    }
    with open(os.path.join(wd, f"{arm}_s{seed}.json"), "w") as f:
        json.dump(rec, f)
    print(f"  {arm} seed={seed}: cover {coverage:.1%}  best_val "
          f"{rec['best_val']:.4f}  test MAE {rec['test_mae']:.4f}  "
          f"RMSE {rec['test_rmse']:.4f}  ({wall:.0f}s)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_nodes", type=int, default=2048)
    ap.add_argument("--timesteps", type=int, default=4608)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--nhid", type=int, default=32)
    ap.add_argument("--dropout", type=float, default=0.3)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--h2_seeds", type=int, nargs="+", default=None,
                    help="seeds for the mask-h2 arm; defaults to --seeds "
                         "so a default rerun reproduces the recorded "
                         "3-seeds-per-arm experiment (VERDICT r4 #6)")
    ap.add_argument("--dtype", default="float32",
                    help="activation dtype for EVERY arm (bfloat16 = the "
                         "production mixed-precision setting; fp32 "
                         "params/accum either way)")
    ap.add_argument("--resident", default="host",
                    choices=("host", "device"),
                    help="feed: device = splits live in HBM, batches "
                         "gathered on device (tunnel-feed cost gone)")
    ap.add_argument("--scan_steps", type=int, default=1,
                    help="fuse this many optimizer steps per dispatch "
                         "(device-resident feed only)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize layers in every arm (semantics-"
                         "preserving; required at N=8192 where the dense "
                         "arm's saved fp32 activations exceed HBM at "
                         "batch 32 — applied to ALL arms so step math "
                         "and memory treatment stay matched)")
    ap.add_argument("--out", default=None)
    # worker-mode internals
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--arm", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.h2_seeds is None:
        args.h2_seeds = list(args.seeds)
    assert args.num_nodes % 128 == 0, "block layout needs N % 128 == 0"

    if args.worker:
        run_worker(args)
        return

    import jax

    print(f"backend: {jax.default_backend()} ({jax.devices()})", flush=True)
    args.workdir = args.workdir or tempfile.mkdtemp(prefix="ab_mask_")
    print(f"workdir: {args.workdir}", flush=True)
    build_workdir(args)

    # seed-major interleave: an interrupted sweep still yields an
    # all-arms comparison at however many seeds completed
    jobs = []
    for i, s in enumerate(args.seeds):
        jobs.append(("dense", s))
        jobs.append(("mask-h1", s))
        if i < len(args.h2_seeds):
            jobs.append(("mask-h2", args.h2_seeds[i]))
    jobs += [("mask-h2", s) for s in args.h2_seeds[len(args.seeds):]]
    for arm, seed in jobs:
        res_path = os.path.join(args.workdir, f"{arm}_s{seed}.json")
        if os.path.exists(res_path):
            print(f"  {arm} seed={seed}: cached", flush=True)
            continue
        cmd = [sys.executable, __file__, "--worker",
               "--workdir", args.workdir, "--arm", arm,
               "--seed", str(seed)]
        for k in ("num_nodes", "timesteps", "epochs", "batch_size",
                  "nhid"):
            cmd += [f"--{k}", str(getattr(args, k))]
        cmd += ["--dropout", str(args.dropout), "--dtype", args.dtype,
                "--resident", args.resident,
                "--scan_steps", str(args.scan_steps)]
        if args.remat:
            cmd += ["--remat"]
        r = subprocess.run(cmd)
        if r.returncode:
            raise SystemExit(f"worker {arm} s{seed} failed "
                             f"(rc {r.returncode})")

    arms = {}
    for arm, seed in jobs:
        with open(os.path.join(args.workdir, f"{arm}_s{seed}.json")) as f:
            arms.setdefault(arm, []).append(json.load(f))

    def stat(label, key):
        v = [r[key] for r in arms[label]]
        return float(np.mean(v)), float(np.min(v)), float(np.max(v))

    print("\n| arm | mask coverage | test MAE (mean [min..max]) | "
          "test RMSE | best val |")
    print("|---|---|---|---|---|")
    summary = {}
    for label in ("dense", "mask-h1", "mask-h2"):
        cov = arms[label][0]["coverage"]
        mae = stat(label, "test_mae")
        rmse = stat(label, "test_rmse")
        bv = stat(label, "best_val")
        summary[label] = {"coverage": cov, "test_mae": mae,
                          "test_rmse": rmse, "best_val": bv,
                          "n_seeds": len(arms[label])}
        print(f"| {label} | {cov:.1%} | {mae[0]:.4f} "
              f"[{mae[1]:.4f}..{mae[2]:.4f}] | {rmse[0]:.4f} | "
              f"{bv[0]:.4f} |")

    gap = summary["mask-h1"]["test_mae"][0] - summary["dense"]["test_mae"][0]
    spread = (summary["dense"]["test_mae"][2]
              - summary["dense"]["test_mae"][1])
    print(f"\nmask-h1 minus dense test-MAE gap: {gap:+.4f} "
          f"(dense seed spread {spread:.4f})")

    out = {"config": {k: v for k, v in vars(args).items()
                      if k not in ("worker", "arm", "seed")},
           "backend": jax.default_backend(),
           "arms": arms, "summary": summary,
           "gap_mask_h1_vs_dense": gap, "dense_seed_spread": spread}
    fig_dir = REPO / "fig"
    fig_dir.mkdir(exist_ok=True)
    out_json = args.out or str(fig_dir / "adaptive_mask_ab.json")
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"results -> {out_json}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        for label, c in (("dense", "C0"), ("mask-h1", "C1"),
                         ("mask-h2", "C2")):
            for i, r in enumerate(arms[label]):
                axes[0].plot([h["epoch"] for h in r["history"]],
                             [h["valid_loss"] for h in r["history"]],
                             color=c, alpha=0.8, lw=1.2,
                             label=label if i == 0 else None)
        axes[0].set_xlabel("epoch")
        axes[0].set_ylabel("val masked MAE")
        axes[0].legend()
        axes[0].set_title("validation loss (all seeds)")
        labels = list(summary)
        means = [summary[k]["test_mae"][0] for k in labels]
        lo = [summary[k]["test_mae"][0] - summary[k]["test_mae"][1]
              for k in labels]
        hi = [summary[k]["test_mae"][2] - summary[k]["test_mae"][0]
              for k in labels]
        axes[1].bar(labels, means, yerr=[lo, hi], capsize=4,
                    color=["C0", "C1", "C2"])
        axes[1].set_ylabel("test MAE (mean, err = seed min/max)")
        axes[1].set_title("final accuracy by learned-graph constraint")
        fig.suptitle(f"Dense vs block-masked adaptive adjacency "
                     f"(N={args.num_nodes}, {args.epochs} epochs, "
                     f"{len(args.seeds)} seeds)")
        fig.tight_layout()
        png = os.path.splitext(out_json)[0] + ".png"
        fig.savefig(png, dpi=120)
        print(f"figure -> {png}")
    except Exception as e:
        print(f"figure skipped: {e}")
    return out


if __name__ == "__main__":
    main()
