"""Full-size convergence A/B: reference PyTorch trainer vs Runner.fit on a
shared METR-shaped dataset (VERDICT r1 #1 — turns step-trajectory parity
into convergence parity).

Canonical-config A/B (nhid 32, blocks 4, dropout 0.3, adaptive adjacency,
doubletransition supports): both frameworks train the same npz splits from
matched initial weights for --epochs epochs — dropout streams and data
order are framework-independent randomness, so this is a CONVERGENCE
comparison (final accuracy within noise), not a trajectory one. Writes
fig/convergence_ab.png (both loss curves + per-horizon MAE) and prints a
PARITY.md-ready table. Runs on CPU (the reference has no TPU path);
~reference-epoch-bound.

Usage: python garage/convergence_ab.py [--epochs 20] [--num_nodes 80]
       [--timesteps 4608]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import tempfile
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--num_nodes", type=int, default=80)
    ap.add_argument("--timesteps", type=int, default=4608)  # 16 days, 5-min
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--nhid", type=int, default=32)
    ap.add_argument("--dropout", type=float, default=0.3)
    ap.add_argument("--out", default=None,
                    help="JSON results path (default: fig/convergence_ab.json)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_enable_async_dispatch", False)

    from reference_harness import (
        build_ref_trainer,
        engine_from_state_dict,
        import_reference,
        make_ab_dataset,
        run_reference_training,
    )

    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data import metr
    from graph_wavenet_tpu.graphs.normalize import mod_adj
    from graph_wavenet_tpu.train.runner import Runner

    ref = import_reference()
    data_dir = tempfile.mkdtemp(prefix="ab_data_")
    print(f"building dataset: N={args.num_nodes}, T={args.timesteps}",
          flush=True)
    adj = make_ab_dataset(data_dir, args.num_nodes, args.timesteps, seed=7)
    supports = [np.asarray(a) for a in mod_adj(adj, "doubletransition")]

    nhid = args.nhid
    cfg = ModelConfig(num_nodes=args.num_nodes, in_dim=2, out_dim=12,
                      residual_channels=nhid, dilation_channels=nhid,
                      skip_channels=nhid * 8, end_channels=nhid * 16,
                      blocks=4, layers=2, dropout=args.dropout,
                      gcn_bool=True, addaptadj=True, n_supports=2)

    # reference side
    ref_data = metr.load_dataset(data_dir, args.batch_size, seed=0)
    t = build_ref_trainer(ref, cfg, ref_data["scaler"], supports, seed=3)
    init_sd = {k: v.clone() for k, v in t.model.state_dict().items()}
    t0 = time.time()
    ref_out = run_reference_training(ref, t, ref_data, args.epochs)
    ref_s = time.time() - t0
    print(f"reference: {ref_s:.1f}s ({ref_s / args.epochs:.1f}s/epoch), "
          f"test MAE {ref_out['test_mae']:.4f}", flush=True)

    # our side, same initial weights
    data = metr.load_dataset(data_dir, args.batch_size, seed=0)
    tcfg = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                       print_every=10000, keep_checkpoints=2,
                       save_dir=tempfile.mkdtemp(prefix="ab_ckpt_"))
    engine = engine_from_state_dict(init_sd, cfg, tcfg, data["scaler"])
    runner = Runner(engine, tcfg)
    t0 = time.time()
    result = runner.fit(data, supports)
    ours_s = time.time() - t0
    result = runner.test(data, supports, result)
    print(f"ours: {ours_s:.1f}s ({ours_s / args.epochs:.1f}s/epoch), "
          f"test MAE {result.test_metrics['mae']:.4f}", flush=True)

    # ---- report
    rows = []
    for h in (2, 5, 11):
        o = result.per_horizon[h]
        r = ref_out["per_horizon"][h]
        rows.append((h + 1, r[0], o[0], r[2], o[2]))
    print("\n| horizon | ref MAE | ours MAE | ref RMSE | ours RMSE |")
    print("|---|---|---|---|---|")
    for h, rm, om, rr, orr in rows:
        print(f"| {h * 5} min | {rm:.4f} | {om:.4f} | {rr:.4f} | "
              f"{orr:.4f} |")
    print(f"| avg | {ref_out['test_mae']:.4f} | "
          f"{result.test_metrics['mae']:.4f} | "
          f"{ref_out['test_rmse']:.4f} | "
          f"{result.test_metrics['rmse']:.4f} |")
    print(f"\nsame-host CPU wall: reference {ref_s:.1f}s vs ours "
          f"{ours_s:.1f}s ({ref_s / max(ours_s, 1e-9):.2f}x)")

    out = {
        "config": vars(args),
        "reference": {k: ref_out[k] for k in
                      ("history", "per_horizon", "test_mae", "test_mape",
                       "test_rmse", "best_val")},
        "ours": {
            "history": [
                {"epoch": e.epoch, "train_loss": e.train["loss"],
                 "valid_loss": e.valid["loss"]} for e in result.history],
            "per_horizon": result.per_horizon,
            "test_mae": result.test_metrics["mae"],
            "test_mape": result.test_metrics["mape"],
            "test_rmse": result.test_metrics["rmse"],
            "best_val": result.best_val_loss,
        },
        "wall_s": {"reference": ref_s, "ours": ours_s},
    }
    fig_dir = REPO / "fig"
    fig_dir.mkdir(exist_ok=True)
    out_json = args.out or str(fig_dir / "convergence_ab.json")
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"results -> {out_json}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        ep = [h["epoch"] for h in ref_out["history"]]
        axes[0].plot(ep, [h["valid_loss"] for h in ref_out["history"]],
                     label="reference (torch)", marker="o", ms=3)
        axes[0].plot([e.epoch for e in result.history],
                     [e.valid["loss"] for e in result.history],
                     label="ours (jax/tpu-native)", marker="s", ms=3)
        axes[0].set_xlabel("epoch")
        axes[0].set_ylabel("val masked MAE")
        axes[0].legend()
        axes[0].set_title("validation loss")
        hs = np.arange(1, len(result.per_horizon) + 1) * 5
        axes[1].plot(hs, [m[0] for m in ref_out["per_horizon"]],
                     label="reference", marker="o", ms=3)
        axes[1].plot(hs, [m[0] for m in result.per_horizon],
                     label="ours", marker="s", ms=3)
        axes[1].set_xlabel("horizon (min)")
        axes[1].set_ylabel("test MAE")
        axes[1].legend()
        axes[1].set_title("per-horizon test MAE (best model)")
        fig.suptitle("Convergence A/B on shared synthetic traffic "
                     f"(N={args.num_nodes}, {args.epochs} epochs, "
                     "matched init)")
        fig.tight_layout()
        png = str(fig_dir / "convergence_ab.png")
        fig.savefig(png, dpi=120)
        print(f"figure -> {png}")
    except Exception as e:  # matplotlib optional
        print(f"figure skipped: {e}")
    return out


if __name__ == "__main__":
    main()
