"""Full-convergence A/B vs the imported reference trainer (VERDICT r1 #1).

The round-1 suite pinned single optimizer steps against the reference;
this trains BOTH frameworks to convergence on the SAME dataset — same npz
splits, same loader shuffle seed (identical batch order), matched initial
weights (the reference init imported into our pytree), dropout off — and
asserts the final per-horizon test MAE agrees within noise. The
full-size run (canonical config, dropout on, independent shuffles) is
``garage/convergence_ab.py``; its results are recorded in PARITY.md.
"""

import numpy as np
import pytest

from reference_harness import (
    build_ref_trainer,
    engine_from_state_dict,
    make_ab_dataset,
    import_reference,
    reference_available,
    run_reference_training,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(),
                       reason="reference checkout not present"),
]


def test_convergence_matches_reference(tmp_path):
    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data import metr
    from graph_wavenet_tpu.graphs.normalize import mod_adj
    from graph_wavenet_tpu.train.runner import Runner

    ref = import_reference()
    n_nodes, n_steps, epochs, batch = 24, 1100, 6, 16
    data_dir = str(tmp_path / "data")
    adj = make_ab_dataset(data_dir, n_nodes, n_steps, seed=7)
    supports = [np.asarray(a) for a in mod_adj(adj, "doubletransition")]

    nhid = 8
    cfg = ModelConfig(num_nodes=n_nodes, in_dim=2, out_dim=12,
                      residual_channels=nhid, dilation_channels=nhid,
                      skip_channels=nhid * 8, end_channels=nhid * 16,
                      blocks=4, layers=2, dropout=0.0, gcn_bool=True,
                      addaptadj=True, n_supports=2)

    # --- reference side, on its own loader dict (same seed => identical
    # shuffle order to ours)
    ref_data = metr.load_dataset(data_dir, batch, seed=0)
    t = build_ref_trainer(ref, cfg, ref_data["scaler"], supports, seed=3)
    init_sd = {k: v.clone() for k, v in t.model.state_dict().items()}
    ref_out = run_reference_training(ref, t, ref_data, epochs)

    # --- our side, from the SAME initial weights
    data = metr.load_dataset(data_dir, batch, seed=0)
    tcfg = TrainConfig(epochs=epochs, batch_size=batch, print_every=1000,
                       save_dir=str(tmp_path / "ckpt"))
    engine = engine_from_state_dict(init_sd, cfg, tcfg, data["scaler"])
    runner = Runner(engine, tcfg)
    result = runner.fit(data, supports)
    result = runner.test(data, supports, result)

    ours_mae = result.test_metrics["mae"]
    ref_mae = ref_out["test_mae"]
    print(f"A/B final test MAE: ours {ours_mae:.4f} vs reference "
          f"{ref_mae:.4f}")

    # sanity: both beat the persistence baseline (last observed value)
    x_last = data["x_test"][..., 0][:, -1:, :]
    x_last = data["scaler"].inverse_transform(x_last)
    y = data["y_test"][..., 0]
    mask = y != 0.0
    persistence = float(np.abs(np.broadcast_to(
        x_last, y.shape) - y)[mask].mean())
    assert ours_mae < persistence and ref_mae < persistence, (
        ours_mae, ref_mae, persistence)

    # convergence parity: identical data order + matched init + no dropout
    # leaves only accumulated fp differences between frameworks
    assert abs(ours_mae - ref_mae) / ref_mae < 0.05, (ours_mae, ref_mae)
    # and per-horizon curves track
    for h in (0, 5, 11):
        o = result.per_horizon[h][0]
        r = ref_out["per_horizon"][h][0]
        assert abs(o - r) / r < 0.08, (h, o, r)


def test_diffg_convergence_matches_reference(tmp_path):
    """Per-sample-graph (diff-G) convergence A/B (VERDICT r2 #4): both
    frameworks train the same SBM multi-modality dataset from matched
    inits; final val/test metrics agree within noise. Full-size run:
    garage/diffg_convergence_ab.py (results in PARITY.md)."""
    from reference_harness import (
        build_ref_trainer_syn,
        engine_from_state_dict_diff_g,
        run_reference_training_syn,
    )

    from graph_wavenet_tpu.config import (
        DataConfig,
        ModelConfig,
        TrainConfig,
    )
    from graph_wavenet_tpu.data.synthetic import (
        load_dataset_syn,
        stack_support_splits,
    )
    from graph_wavenet_tpu.train.runner import Runner

    ref = import_reference()
    n, K, epochs, batch = 20, 12, 3, 8
    data_cfg = DataConfig(dataset="syn", num_nodes=n, seq_length=K,
                          same_g=False, n_train=4, n_valid=2, n_test=2,
                          num_timestep=100)
    data, adjs, F_t, G = load_dataset_syn(data_cfg, batch, seed=11)
    supports = stack_support_splits(adjs, 4, 2)

    # blocks=1/layers=2/start_dilation=4 collapse K=12 (+1 pad) to one
    # step — the reference diff-G's structural requirement
    cfg = ModelConfig(num_nodes=n, in_dim=2, out_dim=K,
                      residual_channels=8, dilation_channels=8,
                      skip_channels=64, end_channels=128, blocks=1,
                      layers=2, dropout=0.0, gcn_bool=True,
                      addaptadj=False, n_supports=2, start_dilation=4)

    t = build_ref_trainer_syn(ref, cfg, data["scaler"], supports, seed=3)
    init_sd = {k: v.clone() for k, v in t.model.state_dict().items()}
    ref_out = run_reference_training_syn(ref, t, data, G, F_t, epochs)

    data2, adjs2, _, G2 = load_dataset_syn(data_cfg, batch, seed=11)
    supports2 = stack_support_splits(adjs2, 4, 2)
    tcfg = TrainConfig(epochs=epochs, batch_size=batch, print_every=1000,
                       save_dir=str(tmp_path / "ckpt"))
    engine = engine_from_state_dict_diff_g(init_sd, cfg, tcfg,
                                           data2["scaler"])
    runner = Runner(engine, tcfg)
    result = runner.fit_syn(data2, supports2, G2, F_t,
                            data_cfg.n_communities)
    result = runner.test_syn(data2, supports2, G2, F_t,
                             data_cfg.n_communities, result)

    # both descend...
    assert ref_out["history"][-1]["valid_loss"] < \
        ref_out["history"][0]["valid_loss"] * 1.02
    # ...and agree (no dropout; same data; only shuffle-order noise)
    assert abs(result.best_val_loss - ref_out["best_val"]) \
        / ref_out["best_val"] < 0.05, (result.best_val_loss, ref_out)
    assert abs(result.test_metrics["loss"] - ref_out["test_loss"]) \
        / ref_out["test_loss"] < 0.05
    assert abs(result.test_metrics["rmse"] - ref_out["test_rmse"]) \
        / ref_out["test_rmse"] < 0.06
