"""Standalone evaluation CLI.

Parity surface: `/root/reference/test.py` — rebuild the model from a
checkpoint, per-horizon test metrics, adaptive-adjacency heatmap export, and
a predictions CSV for one node — minus its quirks (stale imports and the
``load_dataset`` call that can't run, quirk #4 SURVEY.md §7.4). The model,
scaler and configs come from the checkpoint's metadata sidecar, so flags
can't drift from training (the reference re-specifies the architecture on
the command line).

Usage:
  python -m graph_wavenet_tpu.cli.test --checkpoint garage/exp1_epoch_3_0.5.msgpack \
      --data data/METR-LA --adjdata data/sensor_graph/adj_mx.pkl
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--data", type=str, default="data/METR-LA")
    p.add_argument("--adjdata", type=str,
                   default="data/sensor_graph/adj_mx.pkl")
    p.add_argument("--adjtype", type=str, default="doubletransition")
    p.add_argument("--graph_npz", type=str, default=None,
                   help="edge-list graph the checkpoint was trained on "
                        "(required for city-scale checkpoints — the "
                        "sidecar's graph fingerprint is verified and the "
                        "persisted node layout maps data in and "
                        "predictions back out of model node space)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--aptonly", action="store_true")
    p.add_argument("--plotheatmap", type=str, default="True")
    p.add_argument("--heatmap_out", type=str, default="emb.pdf")
    p.add_argument("--csv_out", type=str, default="wave.csv")
    p.add_argument("--csv_node", type=int, default=99,
                   help="node whose horizon-3/12 predictions go to the CSV "
                        "(reference exports node 99, `test.py:100-107`)")
    p.add_argument("--compile_cache", type=str, default=None,
                   help="persistent XLA compilation-cache directory")
    return p


def block_space_heatmap(fixed_supports, nodevec1, nodevec2, hops=1):
    """(nb, nb) block-space mass of the learned masked adaptive
    adjacency: per live block, the summed learned weight. The city-scale
    stand-in for the reference's dense adaptive heatmap
    (`/root/reference/test.py:90-98`), whose (N, N) matrix cannot
    materialize at 41k+ nodes. ``hops`` must match the trained mask
    (layout["adaptive_hops"]). Returns ``(grid, mask)``."""
    from graph_wavenet_tpu.ops.adaptive_block import mask_from_supports

    amask = mask_from_supports(fixed_supports, hops=hops)
    sp = amask.materialize(nodevec1, nodevec2)
    nb = amask.n_src_blocks
    grid = np.zeros((nb, nb), np.float32)
    bl = np.asarray(sp.blocks_flat, np.float32)
    grid[np.asarray(amask.live_src),
         np.asarray(amask.live_dst)] = bl[:amask.n_live].sum((1, 2))
    return grid, amask


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    if args.compile_cache:
        from graph_wavenet_tpu.utils.misc import enable_compilation_cache

        enable_compilation_cache(args.compile_cache)

    from graph_wavenet_tpu.data.metr import load_dataset
    from graph_wavenet_tpu.graphs.normalize import load_adj
    from graph_wavenet_tpu.ops.adaptive import adaptive_adjacency
    from graph_wavenet_tpu.train import checkpoint as ckpt
    from graph_wavenet_tpu.train.engine import Engine
    from graph_wavenet_tpu.train.runner import Runner

    meta = ckpt.load_metadata(args.checkpoint)
    model_cfg = meta["model_cfg"]
    train_cfg = meta["train_cfg"]
    # evaluation never steps the optimizer — neutralize the lr schedule,
    # which would otherwise demand steps_per_epoch for decay-trained
    # checkpoints (same fix as serving.Forecaster.from_checkpoint)
    if train_cfg.lr_decay < 1.0:
        import dataclasses

        train_cfg = dataclasses.replace(train_cfg, lr_decay=1.0)
    scaler = meta.get("scaler")

    engine = Engine(model_cfg, train_cfg, scaler)
    engine.state = ckpt.load_checkpoint(args.checkpoint, engine.state)

    layout = (meta.get("extra") or {}).get("graph_layout")
    if layout is not None:
        # city-scale checkpoint: rebuild the block-sparse supports from
        # the SAME graph under the PERSISTED permutation; never recompute
        # the ordering (a fresh RCM tie-break could silently disagree)
        from graph_wavenet_tpu.graphs import city
        from graph_wavenet_tpu.graphs.spatial import \
            doubletransition_block_supports

        if not args.graph_npz:
            raise SystemExit(
                "this checkpoint was trained on a city-scale graph "
                f"(fingerprint {layout['fingerprint']}); pass "
                "--graph_npz with the graph it was trained on")
        g = city.load_graph_npz(args.graph_npz)
        fp = city.graph_fingerprint(g["src"], g["dst"], g["weight"],
                                    g["n_nodes"])
        if fp != layout["fingerprint"]:
            raise SystemExit(
                f"graph fingerprint mismatch: checkpoint was trained on "
                f"{layout['fingerprint']}, --graph_npz is {fp} — "
                "evaluating against a different graph would be silently "
                "wrong")
        perm = np.asarray(layout["perm"], np.int64)
        supports = doubletransition_block_supports(
            g["src"], g["dst"], g["weight"], layout["n_pad"], perm=perm,
            form=layout["form"], block_size=layout["block_size"])
        if model_cfg.addaptadj:
            from graph_wavenet_tpu.ops.adaptive_block import \
                mask_from_supports

            supports = list(supports) + [mask_from_supports(
                supports, hops=int(layout.get("adaptive_hops", 1)))]
        if args.aptonly:
            supports = supports[len(supports) - 1:] \
                if model_cfg.addaptadj else []
    else:
        _, _, adj = load_adj(args.adjdata, args.adjtype)
        # [] (not None) for aptonly: the adaptive adjacency stays active
        # with no fixed supports — None would disable the graph convs
        # entirely (the reference converts None to [], model.py:112-115)
        supports = [] if args.aptonly else adj
    # standardize the INPUTS with the checkpoint's training-time scaler too
    # (when the sidecar has one): fitting fresh on this directory while
    # inverse-transforming with the sidecar silently skewed metrics whenever
    # the eval data differs from the training data
    data = load_dataset(args.data, args.batch_size,
                        scaler=meta.get("scaler"), node_layout=layout)
    scaler = scaler if meta.get("scaler") is not None else data["scaler"]

    runner = Runner(engine, train_cfg)
    result = runner.test(data, supports, scaler=scaler,
                         return_predictions=bool(args.csv_out))

    out: dict = {"per_horizon": result.per_horizon,
                 "test_metrics": result.test_metrics}

    if (args.plotheatmap == "True" and "nodevec1" in engine.state.params
            and layout is not None and layout["n_pad"] > 4096):
        # the dense (N, N) heatmap would materialize O(N^2) at city
        # scale; plot the BLOCK-space view instead — per live block of
        # the masked adaptive support, its summed learned weight
        try:
            from graph_wavenet_tpu.ops.adaptive_block import (
                mask_from_supports,
            )

            grid, amask = block_space_heatmap(
                [s for s in supports
                 if not getattr(s, "adaptive_mask", False)],
                engine.state.params["nodevec1"],
                engine.state.params["nodevec2"],
                hops=int((layout or {}).get("adaptive_hops", 1)))
            nb = amask.n_src_blocks
            out["adaptive_adjacency_blocks"] = grid
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(6, 5))
            im = ax.imshow(grid, cmap="RdYlBu", aspect="auto")
            fig.colorbar(im, ax=ax)
            ax.set_title(
                f"learned adaptive adjacency, block-space mass "
                f"({amask.bs_src}-node blocks, model node order)")
            fig.savefig(args.heatmap_out, bbox_inches="tight")
            plt.close(fig)
            print(f"saved block-space heatmap to {args.heatmap_out} "
                  f"({nb}x{nb} blocks; the dense (N, N) view would "
                  "materialize O(N^2) at this scale)")
        except Exception as e:
            print(f"heatmap skipped: {e}")
    elif args.plotheatmap == "True" and "nodevec1" in engine.state.params:
        adp = np.asarray(adaptive_adjacency(
            engine.state.params["nodevec1"],
            engine.state.params["nodevec2"]))
        out["adaptive_adjacency"] = adp
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(6, 5))
            im = ax.imshow(adp, cmap="RdYlBu", aspect="auto")
            fig.colorbar(im, ax=ax)
            ax.set_title("adaptive adjacency softmax(relu(E1·E2ᵀ))")
            fig.savefig(args.heatmap_out, bbox_inches="tight")
            plt.close(fig)
            print(f"saved heatmap to {args.heatmap_out}")
        except Exception as e:  # headless/mpl-less environments
            print(f"heatmap skipped: {e}")

    # node predictions CSV — the reference's wave.csv schema: real12,
    # pred12, real3, pred3 for one node (`test.py:100-107`); predictions
    # reused from the test pass above (no second forward sweep)
    if args.csv_out:
        yhat = result.test_metrics.pop("yhat")
        real = np.transpose(data["y_test"][..., 0], (0, 2, 1))
        if layout is not None:
            # --csv_node is an ORIGINAL graph node id; map it through the
            # persisted permutation into model node space (the layout
            # roundtrip VERDICT r2 #2 asked for)
            node = int(np.asarray(layout["perm"])[
                min(args.csv_node, layout["n_raw"] - 1)])
        else:
            node = min(args.csv_node, real.shape[1] - 1)
        horizon = yhat.shape[-1]
        cols = {"real12": real[:, node, min(11, horizon - 1)],
                "pred12": scaler.inverse_transform(
                    yhat[:, node, min(11, horizon - 1)]),
                "real3": real[:, node, min(2, horizon - 1)],
                "pred3": scaler.inverse_transform(
                    yhat[:, node, min(2, horizon - 1)])}
        header = ",".join(cols)
        table = np.stack(list(cols.values()), axis=1)
        np.savetxt(args.csv_out, table, delimiter=",", header=header,
                   comments="")
        print(f"saved predictions to {args.csv_out}")

    return out


def cli() -> None:
    """Console-script entry (see generate_training_data.cli): swallow the
    dict return value so the script exits 0 on success."""
    main()


if __name__ == "__main__":
    main()
