"""Seed-ensemble statistical parity for the diff-G FRESH-NODEVEC quirk
mode (VERDICT r3 #6).

The reference ``gwnet_diff_G`` with ``addaptadj=True, aptinit=None``
draws NEW random nodevecs inside every forward
(`/root/reference/model.py:320-329` — quirk #2, SURVEY.md §7.4), so the
learned adjacency is pure per-call noise and pointwise A/B matching is
impossible by design. Our replica of the quirk is
``ModelConfig(fresh_nodevec=True)`` (`models/gwnet_diff_g.py:89-96`,
drawn from the jitted rng stream).

This script compares the two DISTRIBUTIONALLY: train each framework from
``--n_seeds`` independent seeds on the same per-sample-graph synthetic
dataset and compare the final-metric spreads. Pass criterion (recorded
in PARITY.md): each framework's mean best-val / test loss lies inside
the other's [min, max] seed range.

Writes fig/diffg_fresh_ensemble.json. CPU (the reference has no TPU
path); sized well below the full-size A/B so 2 x n_seeds runs stay
tractable — this measures the QUIRK MODE's statistics, not headline
accuracy (that's fig/diffg_convergence_ab.json).

Usage: python garage/diffg_fresh_ensemble.py [--n_seeds 6] [--epochs 10]
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
    ap.add_argument("--n_seeds", type=int, default=6)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--num_nodes", type=int, default=40)
    ap.add_argument("--seq_length", type=int, default=48)
    ap.add_argument("--n_train", type=int, default=6)
    ap.add_argument("--n_valid", type=int, default=3)
    ap.add_argument("--n_test", type=int, default=3)
    ap.add_argument("--num_timestep", type=int, default=200)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--nhid", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_enable_async_dispatch", False)

    from reference_harness import (
        build_ref_trainer_syn,
        import_reference,
        run_reference_training_syn,
    )

    from graph_wavenet_tpu.config import DataConfig, ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.synthetic import (
        load_dataset_syn,
        stack_support_splits,
    )
    from graph_wavenet_tpu.train.engine import Engine
    from graph_wavenet_tpu.train.runner import Runner

    K = args.seq_length
    nhid = args.nhid
    data_cfg = DataConfig(
        dataset="syn", num_nodes=args.num_nodes, seq_length=K,
        same_g=False, n_train=args.n_train, n_valid=args.n_valid,
        n_test=args.n_test, num_timestep=args.num_timestep)
    print(f"dataset: N={args.num_nodes}, K={K}, "
          f"{args.n_train}/{args.n_valid}/{args.n_test} subjects",
          flush=True)
    data, adjs, F_t, G = load_dataset_syn(data_cfg, args.batch_size,
                                          seed=11)
    supports = stack_support_splits(adjs, data_cfg.n_train,
                                    data_cfg.n_test)

    cfg = ModelConfig(num_nodes=args.num_nodes, in_dim=2, out_dim=K,
                      residual_channels=nhid, dilation_channels=nhid,
                      skip_channels=nhid * 8, end_channels=nhid * 16,
                      blocks=4, layers=2, dropout=0.3,
                      gcn_bool=True, addaptadj=True, n_supports=2,
                      start_dilation=4, fresh_nodevec=True)

    ref = import_reference()
    seeds = list(range(args.n_seeds))
    ref_runs, our_runs = [], []
    for s in seeds:
        t0 = time.time()
        t = build_ref_trainer_syn(ref, cfg, data["scaler"], supports,
                                  seed=100 + s, addaptadj=True)
        ref_out = run_reference_training_syn(ref, t, data, G, F_t,
                                             args.epochs,
                                             log=lambda *a, **k: None)
        rec = {"seed": 100 + s, "best_val": ref_out["best_val"],
               "test_loss": ref_out["test_loss"],
               "test_rmse": ref_out["test_rmse"],
               "wall_s": time.time() - t0}
        ref_runs.append(rec)
        print(f"  reference seed {rec['seed']}: best_val "
              f"{rec['best_val']:.4f} test {rec['test_loss']:.4f} "
              f"({rec['wall_s']:.0f}s)", flush=True)
    for s in seeds:
        t0 = time.time()
        tcfg = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                           print_every=10 ** 9, keep_checkpoints=1,
                           seed=200 + s,
                           save_dir=tempfile.mkdtemp(prefix="ens_"))
        engine = Engine(cfg, tcfg, data["scaler"], diff_g=True,
                        seed=200 + s)
        runner = Runner(engine, tcfg)
        result = runner.fit_syn(data, supports, G, F_t,
                                data_cfg.n_communities)
        result = runner.test_syn(data, supports, G, F_t,
                                 data_cfg.n_communities, result)
        rec = {"seed": 200 + s, "best_val": result.best_val_loss,
               "test_loss": result.test_metrics["loss"],
               "test_rmse": result.test_metrics["rmse"],
               "wall_s": time.time() - t0}
        our_runs.append(rec)
        print(f"  ours seed {rec['seed']}: best_val "
              f"{rec['best_val']:.4f} test {rec['test_loss']:.4f} "
              f"({rec['wall_s']:.0f}s)", flush=True)

    def stats(runs, key):
        v = np.array([r[key] for r in runs])
        return {"mean": float(v.mean()), "std": float(v.std()),
                "min": float(v.min()), "max": float(v.max())}

    summary, ok = {}, {}
    print(f"\n| metric | reference mean±std [min..max] | "
          f"ours mean±std [min..max] | means in each other's range |")
    print("|---|---|---|---|")
    for key in ("best_val", "test_loss", "test_rmse"):
        r, o = stats(ref_runs, key), stats(our_runs, key)
        # each mean inside the other's seed range = distributions overlap
        ok[key] = bool(r["min"] <= o["mean"] <= r["max"]
                       and o["min"] <= r["mean"] <= o["max"])
        summary[key] = {"reference": r, "ours": o, "overlap": ok[key]}
        print(f"| {key} | {r['mean']:.4f}±{r['std']:.4f} "
              f"[{r['min']:.4f}..{r['max']:.4f}] | "
              f"{o['mean']:.4f}±{o['std']:.4f} "
              f"[{o['min']:.4f}..{o['max']:.4f}] | "
              f"{'yes' if ok[key] else 'NO'} |")

    out = {"config": vars(args), "reference_runs": ref_runs,
           "our_runs": our_runs, "summary": summary,
           "all_overlap": all(ok.values())}
    fig_dir = REPO / "fig"
    fig_dir.mkdir(exist_ok=True)
    out_json = args.out or str(fig_dir / "diffg_fresh_ensemble.json")
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nall metrics overlap: {out['all_overlap']}")
    print(f"results -> {out_json}")
    return out


if __name__ == "__main__":
    main()
