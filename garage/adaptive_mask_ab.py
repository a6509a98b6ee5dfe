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

Arms share the dataset, node ordering (identity — no permutation, so
parameter seeds align node-for-node), seeds, and hyperparameters; dense
vs mask-h* differ ONLY in the learned graph's support set (fixed supports
are the same matrices in dense vs flat block-sparse form, pinned equal by
the parity suite). Multiple seeds per arm turn "within noise" into a
measured statement: the seed spread IS the noise floor.

Writes fig/adaptive_mask_ab.json + .png and prints a PARITY.md table.

Usage: python garage/adaptive_mask_ab.py [--num_nodes 2048] [--epochs 15]
       [--seeds 0 1 2]  (runs on whatever jax.default_backend() is)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def run_arm(name, cfg, tcfg_kw, data, supports, seed):
    from graph_wavenet_tpu.config import TrainConfig
    from graph_wavenet_tpu.train.engine import Engine
    from graph_wavenet_tpu.train.runner import Runner

    tcfg = TrainConfig(seed=seed, save_dir=tempfile.mkdtemp(
        prefix=f"ab_{name}_s{seed}_"), **tcfg_kw)
    engine = Engine(cfg, tcfg, data["scaler"], seed=seed)
    runner = Runner(engine, tcfg)
    t0 = time.time()
    result = runner.fit(data, supports)
    wall = time.time() - t0
    result = runner.test(data, supports, result)
    rec = {
        "seed": seed,
        "wall_s": wall,
        "history": [{"epoch": e.epoch, "train_loss": e.train["loss"],
                     "valid_loss": e.valid["loss"]} for e in result.history],
        "best_val": result.best_val_loss,
        "test_mae": result.test_metrics["mae"],
        "test_rmse": result.test_metrics["rmse"],
        "test_mape": result.test_metrics["mape"],
        "per_horizon": [list(map(float, m)) for m in result.per_horizon],
    }
    print(f"  {name} seed={seed}: best_val {rec['best_val']:.4f}  "
          f"test MAE {rec['test_mae']:.4f}  RMSE {rec['test_rmse']:.4f}  "
          f"({wall:.0f}s)", flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_nodes", type=int, default=2048)
    ap.add_argument("--timesteps", type=int, default=4608)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--nhid", type=int, default=32)
    ap.add_argument("--dropout", type=float, default=0.3)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--h2_seeds", type=int, nargs="+", default=[0],
                    help="seeds for the mask-h2 arm (widening datapoint)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    assert args.num_nodes % 128 == 0, "identity ordering needs N % 128 == 0"

    import jax

    from reference_harness import make_ab_dataset

    from graph_wavenet_tpu.config import ModelConfig
    from graph_wavenet_tpu.data import metr
    from graph_wavenet_tpu.graphs.city import build_city_supports
    from graph_wavenet_tpu.graphs.normalize import mod_adj

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()})", flush=True)

    data_dir = tempfile.mkdtemp(prefix="ab_mask_data_")
    print(f"dataset: N={args.num_nodes} T={args.timesteps}", flush=True)
    adj = make_ab_dataset(data_dir, args.num_nodes, args.timesteps, seed=7)

    # dense fixed supports (reference path)
    dense_supports = [np.asarray(a) for a in mod_adj(adj, "doubletransition")]

    # flat block-sparse fixed supports + union mask (production city path);
    # identity ordering keeps node ids (and therefore seeded params and the
    # dataset) aligned with the dense arm
    src, dst = np.nonzero(adj)
    w = adj[src, dst].astype(np.float32)
    form = "flat" if backend == "tpu" else "block"
    sparse_arms = {}
    nb = args.num_nodes // 128
    for hops, label in ((1, "mask-h1"), (2, "mask-h2")):
        supports, mask, layout = build_city_supports(
            src, dst, w, args.num_nodes, ordering="identity", form=form,
            addaptadj=True, adaptive_hops=hops)
        cov = mask.n_live / (nb * nb)
        sparse_arms[label] = (supports + [mask], cov)
        print(f"{label}: {mask.n_live}/{nb * nb} live blocks "
              f"({cov:.1%} of dense)", flush=True)

    nhid = args.nhid
    cfg = ModelConfig(num_nodes=args.num_nodes, in_dim=2, out_dim=12,
                      residual_channels=nhid, dilation_channels=nhid,
                      skip_channels=nhid * 8, end_channels=nhid * 16,
                      blocks=4, layers=2, dropout=args.dropout,
                      gcn_bool=True, addaptadj=True, n_supports=2)
    tcfg_kw = dict(epochs=args.epochs, batch_size=args.batch_size,
                   print_every=10 ** 9, keep_checkpoints=1)

    arms = {}
    for label, sup, seeds in (
            ("dense", dense_supports, args.seeds),
            ("mask-h1", sparse_arms["mask-h1"][0], args.seeds),
            ("mask-h2", sparse_arms["mask-h2"][0], args.h2_seeds)):
        print(f"== arm {label} ==", flush=True)
        runs = []
        for s in seeds:
            data = metr.load_dataset(data_dir, args.batch_size, seed=s)
            runs.append(run_arm(label, cfg, tcfg_kw, data, sup, s))
        arms[label] = runs

    def stat(label, key):
        v = [r[key] for r in arms[label]]
        return float(np.mean(v)), float(np.min(v)), float(np.max(v))

    print("\n| arm | live blocks | test MAE (mean [min..max]) | "
          "test RMSE | best val |")
    print("|---|---|---|---|---|")
    summary = {}
    for label in ("dense", "mask-h1", "mask-h2"):
        cov = 1.0 if label == "dense" else sparse_arms[label][1]
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

    out = {"config": vars(args), "backend": backend,
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
        png = str(fig_dir / "adaptive_mask_ab.png")
        fig.savefig(png, dpi=120)
        print(f"figure -> {png}")
    except Exception as e:
        print(f"figure skipped: {e}")
    return out


if __name__ == "__main__":
    main()
