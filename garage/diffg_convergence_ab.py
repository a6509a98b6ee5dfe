"""Diff-G convergence A/B: reference PyTorch trainer vs Runner.fit_syn on
the per-sample-graph multi-modality task (VERDICT r2 #4 — the companion
to garage/convergence_ab.py, which covers the shared-graph traffic
config).

Task: per-sample SBM graphs, K=48 windows, F/E modality supervision
(`/root/reference/train.py:145-208`, `engine.py:64-117`). Both frameworks
train the SAME dataset (our load_dataset_syn, pinned against the imported
reference generator by the parity suite) from MATCHED initial weights
(the reference gwnet_diff_G init imported into our pytree). Dropout
streams and shuffle orders are framework-independent randomness, so this
is a CONVERGENCE comparison: final val/test metrics within noise.

addaptadj stays False on both sides — the reference diff-G draws fresh
unseedable nodevecs every forward (quirk #2 SURVEY.md §7.4), which cannot
be matched; our trainable variant of that path is covered by its own
tests. Writes fig/diffg_convergence_ab.{json,png} and prints a
PARITY.md-ready table. CPU (the reference has no TPU path).

Usage: python garage/diffg_convergence_ab.py [--epochs 18]
       [--num_nodes 80] [--seq_length 48] [--n_train 20]
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
    ap.add_argument("--epochs", type=int, default=18)
    ap.add_argument("--num_nodes", type=int, default=80)
    ap.add_argument("--seq_length", type=int, default=48)
    ap.add_argument("--n_train", type=int, default=20)
    ap.add_argument("--n_valid", type=int, default=5)
    ap.add_argument("--n_test", type=int, default=4)
    ap.add_argument("--num_timestep", type=int, default=500)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--nhid", type=int, default=32)
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--dropout", type=float, default=0.3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_enable_async_dispatch", False)

    from reference_harness import (
        build_ref_trainer_syn,
        engine_from_state_dict_diff_g,
        import_reference,
        run_reference_training_syn,
    )

    from graph_wavenet_tpu.config import DataConfig, ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.synthetic import (
        load_dataset_syn,
        stack_support_splits,
    )
    from graph_wavenet_tpu.train.runner import Runner

    K = args.seq_length
    nhid = args.nhid
    data_cfg = DataConfig(
        dataset="syn", num_nodes=args.num_nodes, seq_length=K,
        same_g=False, n_train=args.n_train, n_valid=args.n_valid,
        n_test=args.n_test, num_timestep=args.num_timestep)
    print(f"building per-sample-graph dataset: N={args.num_nodes}, K={K}, "
          f"{args.n_train}/{args.n_valid}/{args.n_test} subjects x "
          f"{args.num_timestep} steps", flush=True)
    data, adjs, F_t, G = load_dataset_syn(data_cfg, args.batch_size,
                                          seed=11)
    supports = stack_support_splits(adjs, data_cfg.n_train,
                                    data_cfg.n_test)
    print(f"F_t={F_t}, {data['x_train'].shape[0]} train samples", flush=True)

    cfg = ModelConfig(num_nodes=args.num_nodes, in_dim=2, out_dim=K,
                      residual_channels=nhid, dilation_channels=nhid,
                      skip_channels=nhid * 8, end_channels=nhid * 16,
                      blocks=args.blocks, layers=args.layers,
                      dropout=args.dropout,
                      gcn_bool=True, addaptadj=False, n_supports=2,
                      start_dilation=4)

    ref = import_reference()
    t = build_ref_trainer_syn(ref, cfg, data["scaler"], supports, seed=3)
    init_sd = {k: v.clone() for k, v in t.model.state_dict().items()}
    t0 = time.time()
    ref_out = run_reference_training_syn(ref, t, data, G, F_t, args.epochs)
    ref_s = time.time() - t0
    print(f"reference: {ref_s:.1f}s ({ref_s / args.epochs:.1f}s/epoch)",
          flush=True)

    # our side, same dataset + loaders (fresh seed for shuffle state) and
    # the SAME initial weights
    data2, adjs2, F_t2, G2 = load_dataset_syn(data_cfg, args.batch_size,
                                              seed=11)
    assert F_t2 == F_t
    supports2 = stack_support_splits(adjs2, data_cfg.n_train,
                                     data_cfg.n_test)
    tcfg = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                       print_every=10000, keep_checkpoints=2,
                       save_dir=tempfile.mkdtemp(prefix="ab_diffg_"))
    engine = engine_from_state_dict_diff_g(init_sd, cfg, tcfg,
                                           data2["scaler"])
    runner = Runner(engine, tcfg)
    t0 = time.time()
    result = runner.fit_syn(data2, supports2, G2, F_t,
                            data_cfg.n_communities)
    ours_s = time.time() - t0
    result = runner.test_syn(data2, supports2, G2, F_t,
                             data_cfg.n_communities, result)
    print(f"ours: {ours_s:.1f}s ({ours_s / args.epochs:.1f}s/epoch)",
          flush=True)

    tm = result.test_metrics
    print("\n| metric | reference | ours | rel diff |")
    print("|---|---|---|---|")
    rows = [("best val loss", ref_out["best_val"], result.best_val_loss),
            ("test loss (F+E)", ref_out["test_loss"], tm["loss"]),
            ("test MAPE (E)", ref_out["test_mape"], tm["mape"]),
            ("test RMSE (E)", ref_out["test_rmse"], tm["rmse"])]
    for name, r, o in rows:
        print(f"| {name} | {r:.4f} | {o:.4f} | "
              f"{abs(o - r) / max(abs(r), 1e-9) * 100:.2f}% |")
    print(f"\nsame-host CPU wall: reference {ref_s:.1f}s vs ours "
          f"{ours_s:.1f}s ({ref_s / max(ours_s, 1e-9):.2f}x)")

    out = {
        "config": vars(args),
        "reference": ref_out,
        "ours": {
            "history": [
                {"epoch": e.epoch, "train_loss": e.train["loss"],
                 "valid_loss": e.valid["loss"]} for e in result.history],
            "best_val": result.best_val_loss,
            "test_loss": tm["loss"],
            "test_mape": tm["mape"],
            "test_rmse": tm["rmse"],
        },
        "wall_s": {"reference": ref_s, "ours": ours_s},
    }
    fig_dir = REPO / "fig"
    fig_dir.mkdir(exist_ok=True)
    out_json = args.out or str(fig_dir / "diffg_convergence_ab.json")
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"results -> {out_json}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6.5, 4))
        ep = [h["epoch"] for h in ref_out["history"]]
        ax.plot(ep, [h["valid_loss"] for h in ref_out["history"]],
                label="reference (torch)", marker="o", ms=3)
        ax.plot([e.epoch for e in result.history],
                [e.valid["loss"] for e in result.history],
                label="ours (jax/tpu-native)", marker="s", ms=3)
        ax.set_xlabel("epoch")
        ax.set_ylabel("val masked MAE (F+E)")
        ax.legend()
        ax.set_title("diff-G convergence A/B "
                     f"(N={args.num_nodes}, K={K}, per-sample graphs, "
                     "matched init)")
        fig.tight_layout()
        png = str(fig_dir / "diffg_convergence_ab.png")
        fig.savefig(png, dpi=120)
        print(f"figure -> {png}")
    except Exception as e:
        print(f"figure skipped: {e}")
    return out


if __name__ == "__main__":
    main()
