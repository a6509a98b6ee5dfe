"""Training CLI.

Flag surface mirrors `/root/reference/train.py:18-44` (data path, adjtype,
gcn/aptonly/addaptadj/randomadj, seq_length, nhid, blocks/layers, batch size,
lr, dropout, weight decay, epochs, save, expid) with the engine's channel
multipliers (skip = nhid*8, end = nhid*16, `engine.py:24,30`). Unlike the
reference ``__main__`` (which defaults to loading a pretrained pickle,
quirk #5 SURVEY.md §7.4), this CLI trains by default.

Usage examples (reference README parity):
  python -m graph_wavenet_tpu.cli.train --gcn_bool --adjtype doubletransition \
      --addaptadj --randomadj --num_nodes 207 --seq_length 12 --data data/METR-LA
  python -m graph_wavenet_tpu.cli.train --gcn_bool --adjtype doubletransition \
      --addaptadj --randomadj --num_nodes 80 --data syn --blocks 5
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", type=str, default="data/METR-LA",
                   help="data path, or 'syn' / 'crash'")
    p.add_argument("--adjdata", type=str,
                   default="data/sensor_graph/adj_mx.pkl")
    p.add_argument("--adjtype", type=str, default="doubletransition")
    p.add_argument("--graph_npz", type=str, default=None,
                   help="city-scale graph: an edge-list .npz (src, dst, "
                        "weight[, pos, n_nodes] — graphs.city) replacing "
                        "--adjdata; builds ordered block-sparse "
                        "doubletransition supports, permutes+pads the "
                        "data's node axis to match, and records the node "
                        "layout + graph fingerprint in every checkpoint "
                        "sidecar (gwt-test maps predictions back)")
    p.add_argument("--ordering", type=str, default="best",
                   choices=("best", "rcm", "hilbert", "identity"),
                   help="node ordering for --graph_npz (best = fewest "
                        "live blocks among RCM/Hilbert)")
    p.add_argument("--sparse", type=str, default="auto",
                   choices=("auto", "flat", "block", "pallas"),
                   help="block-sparse support form for --graph_npz "
                        "(auto = flat live-block Pallas kernels on TPU, "
                        "padded XLA blocks elsewhere)")
    p.add_argument("--block_size", type=int, default=128,
                   help="node block size for --graph_npz supports (TPU "
                        "Pallas kernels need multiples of 128)")
    p.add_argument("--support_dtype", type=str, default="auto",
                   choices=("auto", "float32", "bfloat16"),
                   help="storage dtype of the --graph_npz support "
                        "blocks (auto = follow --dtype). Blocks are "
                        "cast to the activation dtype per use either "
                        "way, so matching storage is numerically "
                        "identical while halving the supports' "
                        "resident HBM (BENCH_NOTES round 5)")
    p.add_argument("--adaptive_hops", type=int, default=1,
                   help="--graph_npz + --addaptadj: widen the learned-"
                        "adjacency mask to the k-hop block closure of "
                        "the supports' pattern (1 = the union mask; "
                        "higher = closer to the reference's dense "
                        "softmax, more live blocks). Persisted in the "
                        "layout so gwt-test/serving rebuild the same "
                        "pattern")
    p.add_argument("--gcn_bool", action="store_true")
    p.add_argument("--aptonly", action="store_true")
    p.add_argument("--addaptadj", action="store_true")
    p.add_argument("--randomadj", action="store_true")
    p.add_argument("--seq_length", type=int, default=48)
    p.add_argument("--nhid", type=int, default=32)
    p.add_argument("--in_dim", type=int, default=2)
    p.add_argument("--num_nodes", type=int, default=80)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--blocks", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--lr_decay", type=float, default=1.0,
                   help="per-interval learning-rate decay factor; 1.0 = "
                        "constant (the reference ships a commented-out "
                        "0.1-per-10-epochs schedule, train.py:146-149)")
    p.add_argument("--lr_decay_every", type=int, default=10,
                   help="epochs between lr decay steps")
    p.add_argument("--dropout", type=float, default=0.3)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--print_every", type=int, default=50)
    p.add_argument("--save", type=str, default="./garage")
    p.add_argument("--expid", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--same_g", action="store_true",
                   help="synthetic: one shared graph instead of per-sample")
    p.add_argument("--n_train", type=int, default=80,
                   help="synthetic: number of training subjects")
    p.add_argument("--n_valid", type=int, default=20)
    p.add_argument("--n_test", type=int, default=4)
    p.add_argument("--num_timestep", type=int, default=1000)
    p.add_argument("--fresh_nodevec", action="store_true",
                   help="replicate the reference diff-G quirk of fresh "
                        "random node embeddings every forward")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="activation compute dtype (params/accum stay fp32)")
    p.add_argument("--rng_impl", type=str, default="rbg",
                   choices=["rbg", "threefry2x32"],
                   help="dropout PRNG; rbg = TPU hardware RNG (fast)")
    p.add_argument("--scan_steps", type=int, default=1,
                   help="fused multi-step training: optimizer steps per "
                        "dispatch (device-resident loaders only)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="micro-batches per optimizer step (averaged grads; "
                        "~n-fold lower activation memory)")
    p.add_argument("--early_stop", type=int, default=0,
                   help="stop after this many epochs without val "
                        "improvement; 0 = train all epochs")
    p.add_argument("--epoch_timeout", type=float, default=0.0,
                   help="failure detection: abort (with diagnostics) if an "
                        "epoch exceeds this many seconds; 0 disables")
    p.add_argument("--resident", type=str, default="device",
                   choices=["device", "host"],
                   help="dataset residency: device = in HBM with on-device "
                        "batch gathers (~7.5x faster epochs, default), "
                        "host = numpy batches copied per step")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="node-dim tensor-parallel mesh axis size "
                        "(implies a multi-device mesh)")
    p.add_argument("--mesh_time", type=int, default=1,
                   help="time-dim sequence-parallel mesh axis size")
    p.add_argument("--mesh_dp", action="store_true",
                   help="enable the device mesh with pure data "
                        "parallelism over all devices")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint to resume training from (full state)")
    p.add_argument("--profile", type=str, default=None,
                   help="write a jax.profiler trace of the whole run to "
                        "this directory (inspect with TensorBoard / xprof; "
                        "SURVEY.md §5 tracing)")
    p.add_argument("--plot", type=str, default=None,
                   help="diff-G: write the reconstructed real-vs-predicted "
                        "F/E sequence figure to this path "
                        "(reference train.py:363-370)")
    p.add_argument("--crash_dir", type=str, default=None,
                   help="CRASH data root. With --crash_format mat, the "
                        "reference's raw export layout (eeg/, "
                        "fmri/matfiles/, sc/ — CRASH_loader.py semantics "
                        "with the base dir made configurable); with npz, "
                        "<subject>/<session>.npz records. Omit for the "
                        "synthetic stand-in records")
    p.add_argument("--crash_format", type=str, default="mat",
                   choices=("mat", "npz"),
                   help="on-disk layout under --crash_dir")
    p.add_argument("--crash_num_region", type=int, default=200,
                   help="Schaefer parcel count for the raw .mat layout "
                        "(200 or 400, CRASH_loader.py:355)")
    p.add_argument("--crash_K", type=int, default=None,
                   help="CRASH window length. Default: ceil(F_t)*5 for raw "
                        ".mat data — a multiple of the integer F-pool "
                        "factor, unlike the reference's int(F_t*5)=2912 "
                        "(util.py:417) whose largest divisor near "
                        "ceil(582.4)=583 is 448, silently coarsening the "
                        "F supervision ~23%; int(F_t*5) otherwise")
    p.add_argument("--fmri_time_res", type=float, default=None,
                   help="seconds per fMRI frame; defaults to 0.910 for raw "
                        ".mat CRASH data, else 2.0")
    p.add_argument("--eeg_time_res", type=float, default=None,
                   help="seconds per EEG sample; defaults to 1/640 for raw "
                        ".mat CRASH data, else 0.5")
    p.add_argument("--compile_cache", type=str, default=None,
                   help="persistent XLA compilation-cache directory: "
                        "restarts/resumes of an already-seen configuration "
                        "skip the 20-40 s TPU compile")
    return p


def plot_diffg_reconstruction(result, out_path: str, node: int = 0):
    """Reverse the stride-1 test windows and plot real vs predicted F/E for
    one node (`/root/reference/train.py:356-370`)."""
    import numpy as np

    from graph_wavenet_tpu.data.windows import reverse_sliding_window

    tm = result.test_metrics
    reals = tm["reals"]                       # (n, K, N, 2)
    real_f = np.transpose(reals[..., 0], (0, 2, 1))   # (n, N, K)
    real_e = np.transpose(reals[..., 1], (0, 2, 1))
    rec = reverse_sliding_window(
        [real_f, real_e, tm["pred_F"], tm["pred_E"]])
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(10, 4))
        for series, label in zip(rec, ("real F", "real E", "pred F",
                                       "pred E")):
            plt.plot(series[node], label=label)
        plt.legend()
        plt.title(f"diff-G test reconstruction, node {node}")
        plt.savefig(out_path, bbox_inches="tight")
        plt.close()
        print(f"saved reconstruction figure to {out_path}")
    except Exception as e:
        print(f"plot skipped: {e}")
    return rec


def model_config(args, diff_g: bool):
    from graph_wavenet_tpu.config import ModelConfig

    return ModelConfig(
        num_nodes=args.num_nodes, in_dim=args.in_dim,
        out_dim=args.seq_length, residual_channels=args.nhid,
        dilation_channels=args.nhid, skip_channels=args.nhid * 8,
        end_channels=args.nhid * 16, blocks=args.blocks, layers=args.layers,
        dropout=args.dropout, gcn_bool=args.gcn_bool,
        addaptadj=args.addaptadj,
        n_supports=0 if args.aptonly else 2,
        start_dilation=4 if diff_g else 1,
        fresh_nodevec=args.fresh_nodevec and diff_g,
        dtype=args.dtype)


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    if args.compile_cache:
        from graph_wavenet_tpu.utils.misc import enable_compilation_cache

        enable_compilation_cache(args.compile_cache)
    if args.profile:
        from graph_wavenet_tpu.train.profiling import trace

        with trace(args.profile):
            out = _run(args)
        print(f"profiler trace written to {args.profile}", flush=True)
        return out
    return _run(args)


def _run(args) -> dict:
    from graph_wavenet_tpu.config import DataConfig, TrainConfig
    from graph_wavenet_tpu.train.engine import Engine
    from graph_wavenet_tpu.train.runner import Runner

    train_cfg = TrainConfig(
        batch_size=args.batch_size, learning_rate=args.learning_rate,
        weight_decay=args.weight_decay, epochs=args.epochs,
        print_every=args.print_every, seed=args.seed, save_dir=args.save,
        expid=args.expid, rng_impl=args.rng_impl,
        lr_decay=args.lr_decay, lr_decay_every=args.lr_decay_every,
        scan_steps=args.scan_steps, epoch_timeout_s=args.epoch_timeout,
        grad_accum=args.grad_accum, early_stop_patience=args.early_stop)

    mesh = mesh_cfg = None
    feed_sharding = None
    if args.mesh_dp or args.mesh_model > 1 or args.mesh_time > 1:
        from graph_wavenet_tpu.config import MeshConfig
        from graph_wavenet_tpu.parallel import mesh as M

        mesh_cfg = MeshConfig(model_axis=args.mesh_model,
                              time_axis=args.mesh_time,
                              shard_nodes=args.mesh_model > 1,
                              shard_time=args.mesh_time > 1)
        mesh = M.make_mesh(mesh_cfg)
        print(f"mesh: {dict(mesh.shape)}", flush=True)
        if args.resident == "device":
            # device-resident multi-chip feed (VERDICT r3 #2): splits
            # replicate over the mesh, batch gathers come out in the
            # mesh layout, and scan_steps keeps working (the engine
            # constrains each in-scan gather to the same layout)
            feed_sharding = M.batch_sharding(mesh, mesh_cfg)

    t1 = time.time()
    if args.data == "syn":
        from graph_wavenet_tpu.data.synthetic import (
            load_dataset_syn,
            stack_support_splits,
        )

        data_cfg = DataConfig(
            dataset="syn", adjtype=args.adjtype, num_nodes=args.num_nodes,
            seq_length=args.seq_length, same_g=args.same_g,
            n_train=args.n_train, n_valid=args.n_valid, n_test=args.n_test,
            num_timestep=args.num_timestep)
        data, adjs, F_t, G = load_dataset_syn(
            data_cfg, args.batch_size, seed=args.seed,
            resident=args.resident, sharding=feed_sharding)

        spe = data["train_loader"].num_batch
        if args.same_g:
            cfg = model_config(args, diff_g=False)
            engine = Engine(cfg, train_cfg, data["scaler"],
                            steps_per_epoch=spe)
            runner = Runner(engine, train_cfg, mesh=mesh, mesh_cfg=mesh_cfg)
            supports = [] if args.aptonly else adjs
            result = runner.fit_syn_shared(data, supports, G, F_t,
                                           data_cfg.n_communities,
                                           resume_from=args.resume)
            runner.test_syn_shared(data, supports, G, F_t,
                                   data_cfg.n_communities, result)
        else:
            cfg = model_config(args, diff_g=True)
            engine = Engine(cfg, train_cfg, data["scaler"], diff_g=True,
                            steps_per_epoch=spe)
            runner = Runner(engine, train_cfg, mesh=mesh, mesh_cfg=mesh_cfg)
            supports = stack_support_splits(adjs, data_cfg.n_train,
                                            data_cfg.n_test)
            if args.aptonly:
                supports = {k: [] for k in supports}
            result = runner.fit_syn(data, supports, G, F_t,
                                    data_cfg.n_communities,
                                    resume_from=args.resume)
            runner.test_syn(data, supports, G, F_t,
                            data_cfg.n_communities, result)
            if args.plot:
                plot_diffg_reconstruction(result, args.plot)
    elif args.data == "crash":
        from graph_wavenet_tpu.data.crash import load_dataset_crash

        records = None
        assignment = None
        raw_mat = args.crash_dir is not None and args.crash_format == "mat"
        if args.crash_dir is not None:
            if raw_mat:
                from graph_wavenet_tpu.data import crash_raw

                records = crash_raw.collect_records(
                    args.crash_dir, num_region=args.crash_num_region)
                # real electrode->region geometry when the export tree
                # carries the coordinate files (parcellation text +
                # ny_x_z); the loader's ring-layout stand-in is for
                # synthetic records only (ADVICE r1: without this the EEG
                # spatial extension and community structure were
                # fabricated for real data)
                try:
                    e2r = crash_raw.get_region_assignment(
                        args.crash_dir, args.crash_num_region)
                    assignment = crash_raw.invert_assignment(
                        e2r, args.crash_num_region)
                    print("CRASH: using electrode-region assignment from "
                          "coordinate files", flush=True)
                except OSError:
                    print("CRASH: coordinate files missing under "
                          f"{args.crash_dir} (sc/Parcellations/MNI, "
                          "utils/eeg_coor_conv/ny_x_z) — falling back to "
                          "the synthetic ring-layout assignment",
                          flush=True)
            else:
                from graph_wavenet_tpu.data.crash import \
                    load_records_from_dir

                records = load_records_from_dir(args.crash_dir)
            if not records:
                raise SystemExit(
                    f"no complete CRASH records under {args.crash_dir} "
                    f"(format={args.crash_format})")
        # real CRASH rates: 0.910 s BOLD bins, 640 Hz EEG
        # (CRASH_loader.py:131,190) -> F_t ≈ 582.4; the synthetic
        # stand-ins keep the small test-friendly defaults
        fmri_res = args.fmri_time_res if args.fmri_time_res is not None \
            else (0.910 if raw_mat else 2.0)
        eeg_res = args.eeg_time_res if args.eeg_time_res is not None \
            else (1.0 / 640.0 if raw_mat else 0.5)
        K = args.crash_K
        if K is None and raw_mat:
            # ceil(F_t)*5, not the reference's int(F_t*5) (util.py:417):
            # K must be a multiple of the integer F-pool factor or the
            # loader degrades pooling to K's largest divisor (583 -> 448
            # for K=2912, a silent ~23% coarsening)
            K = int(np.ceil(fmri_res / eeg_res)) * 5
        data, supports, F_t, G = load_dataset_crash(
            batch_size=args.batch_size, records=records,
            adjtype=args.adjtype, fmri_time_res=fmri_res,
            eeg_time_res=eeg_res, K=K, seed=args.seed,
            assignment=assignment, resident=args.resident,
            sharding=feed_sharding)
        import dataclasses

        cfg = dataclasses.replace(
            model_config(args, diff_g=True),
            out_dim=data["K"], num_nodes=data["x_train"].shape[2])
        if args.aptonly:
            # same train==eval convention as the syn and metr branches:
            # empty per-split support lists keep the adaptive path active
            supports = {k: [] for k in supports}
        engine = Engine(cfg, train_cfg, data["scaler"], diff_g=True,
                        steps_per_epoch=data["train_loader"].num_batch)
        runner = Runner(engine, train_cfg, mesh=mesh, mesh_cfg=mesh_cfg)
        result = runner.fit_syn(data, supports, G, F_t,
                                data["n_communities"],
                                resume_from=args.resume)
        runner.test_syn(data, supports, G, F_t, data["n_communities"],
                        result)
    elif args.graph_npz:
        result = _run_city(args, train_cfg, mesh, mesh_cfg, feed_sharding)
    else:
        from graph_wavenet_tpu.data.metr import load_dataset
        from graph_wavenet_tpu.graphs.normalize import load_adj

        _, _, adj = load_adj(args.adjdata, args.adjtype)
        data = load_dataset(args.data, args.batch_size, seed=args.seed,
                            resident=args.resident,
                            sharding=feed_sharding)
        horizon = int(data["y_train"].shape[1])
        if args.seq_length != horizon:
            # the reference inherits the same incompatible defaults
            # (train.py:27 seq_length=48 vs its 12-step ETL) and dies in a
            # broadcast error at the first step; name the fix instead
            raise SystemExit(
                f"--seq_length {args.seq_length} does not match the "
                f"dataset's target horizon {horizon} ({args.data} npz was "
                f"built with seq_length_y={horizon}); pass --seq_length "
                f"{horizon}")
        cfg = model_config(args, diff_g=False)
        aptinit = None if args.randomadj else adj[0]
        # [] (not None) for aptonly: adaptive adjacency stays active with no
        # fixed supports — None would train temporal-only while gwt-test
        # evaluates the adaptive path (the reference converts None to [],
        # model.py:112-118); same convention as cli/test.py and the syn path
        supports = [] if args.aptonly else adj

        from graph_wavenet_tpu.models.gwnet import init_gwnet
        import jax

        engine = Engine(cfg, train_cfg, data["scaler"],
                        steps_per_epoch=data["train_loader"].num_batch)
        if aptinit is not None and cfg.gcn_bool and cfg.addaptadj:
            params, mstate = init_gwnet(jax.random.key(args.seed), cfg,
                                        aptinit=np.asarray(aptinit))
            engine.state = engine.state.__class__(
                params=params, opt_state=engine.optimizer.init(params),
                model_state=mstate, step=engine.state.step,
                rng=engine.state.rng)
        runner = Runner(engine, train_cfg, mesh=mesh, mesh_cfg=mesh_cfg)
        result = runner.fit(data, supports, resume_from=args.resume)
        runner.test(data, supports, result)

    print(f"Total time spent: {time.time() - t1:.4f}")
    return {"result": result}


def _run_city(args, train_cfg, mesh, mesh_cfg, feed_sharding=None):
    """--graph_npz branch: ordered block-sparse supports from an
    edge-list graph, data permuted+padded into model node space, node
    layout persisted in every checkpoint sidecar (VERDICT r2 #2)."""
    import dataclasses

    from graph_wavenet_tpu.data.metr import load_dataset
    from graph_wavenet_tpu.graphs import city
    from graph_wavenet_tpu.train.engine import Engine
    from graph_wavenet_tpu.train.runner import Runner

    g = city.load_graph_npz(args.graph_npz)
    supports, mask, layout = city.build_city_supports(
        g["src"], g["dst"], g["weight"], g["n_nodes"], pos=g["pos"],
        ordering=args.ordering, form=args.sparse,
        block_size=args.block_size, addaptadj=args.addaptadj,
        adaptive_hops=args.adaptive_hops)
    sup_dtype = (args.dtype if args.support_dtype == "auto"
                 else args.support_dtype)
    if sup_dtype != "float32":
        # numerically free when it matches --dtype (per-use cast moves to
        # storage); applied BEFORE any node-TP sharding below
        supports = [s.astype(sup_dtype) for s in supports]
    print(f"graph: {g['n_nodes']} nodes (+{layout['n_pad'] - g['n_nodes']}"
          f" pad), ordering={layout['ordering']}, form={layout['form']}, "
          f"{layout['n_blocks']} live blocks "
          f"({layout['blocks_per_row_mean']:.1f} mean / "
          f"{layout['blocks_per_row_max']} max per row)", flush=True)

    data = load_dataset(args.data, args.batch_size, seed=args.seed,
                        resident=args.resident, node_layout=layout,
                        sharding=feed_sharding)
    horizon = int(data["y_train"].shape[1])
    if args.seq_length != horizon:
        raise SystemExit(
            f"--seq_length {args.seq_length} does not match the dataset's "
            f"target horizon {horizon}; pass --seq_length {horizon}")
    if not args.gcn_bool:
        raise SystemExit("--graph_npz builds graph supports; pass "
                         "--gcn_bool (a temporal-only model has no use "
                         "for the graph)")
    cfg = dataclasses.replace(model_config(args, diff_g=False),
                              num_nodes=layout["n_pad"])
    sup_list = [] if args.aptonly else list(supports)
    if args.addaptadj:
        if mesh is not None and mesh_cfg.shard_nodes:
            from graph_wavenet_tpu.parallel.sparse_tp import \
                shard_adaptive_mask

            mask = shard_adaptive_mask(mask, mesh)
        sup_list = sup_list + [mask]
    if mesh is not None and mesh_cfg.shard_nodes and not args.aptonly:
        from graph_wavenet_tpu.ops.block_sparse import FlatBlockSparseSupport
        from graph_wavenet_tpu.parallel.sparse_tp import shard_flat_support

        if not all(isinstance(s, FlatBlockSparseSupport)
                   for s in supports):
            raise SystemExit(
                "--mesh_model > 1 with --graph_npz needs --sparse flat "
                "(node-TP shards the flat live-block form)")
        sup_list = ([shard_flat_support(s, mesh) for s in supports]
                    + sup_list[len(supports):])

    engine = Engine(cfg, train_cfg, data["scaler"],
                    steps_per_epoch=data["train_loader"].num_batch)
    runner = Runner(engine, train_cfg, mesh=mesh, mesh_cfg=mesh_cfg,
                    extra_meta={"graph_layout": layout})
    result = runner.fit(data, sup_list, resume_from=args.resume)
    runner.test(data, sup_list, result)
    return result


def cli() -> None:
    """Console-script entry (see generate_training_data.cli): swallow the
    dict return value so the script exits 0 on success."""
    main()


if __name__ == "__main__":
    main()
