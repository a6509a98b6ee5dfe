"""End-to-end smoke tests through the CLI entry points: METR-style training
+ standalone eval, synthetic diff-G training, CRASH pipeline, misc utils."""

import os
import pickle

import numpy as np
import pytest

from graph_wavenet_tpu.utils import misc


pytestmark = pytest.mark.slow  # multi-epoch/mesh loops; fast tier skips (README)

@pytest.fixture
def metr_fixture(tmp_path, rng):
    """A tiny METR-shaped dataset + adjacency pickle on disk."""
    from graph_wavenet_tpu.data.traffic_etl import generate_train_val_test

    n_nodes = 12
    values = (rng.normal(size=(160, n_nodes)) * 5 + 60).astype(np.float32)
    # sprinkle zeros to exercise the masked metrics
    values[rng.random(values.shape) < 0.05] = 0.0
    index = (np.datetime64("2012-03-01T00:00") +
             np.arange(160) * np.timedelta64(5, "m"))
    data_dir = tmp_path / "DATA"
    generate_train_val_test(values, str(data_dir), index=index)

    adj = (rng.random((n_nodes, n_nodes)) < 0.4).astype(np.float32)
    np.fill_diagonal(adj, 1.0)
    adj_path = tmp_path / "adj_mx.pkl"
    with open(adj_path, "wb") as f:
        pickle.dump(([str(i) for i in range(n_nodes)],
                     {str(i): i for i in range(n_nodes)}, adj), f)
    return str(data_dir), str(adj_path), n_nodes


def test_cli_train_and_eval_metr(tmp_path, metr_fixture):
    from graph_wavenet_tpu.cli import test as test_cli
    from graph_wavenet_tpu.cli import train as train_cli

    data_dir, adj_path, n_nodes = metr_fixture
    save = str(tmp_path / "garage")
    out = train_cli.main([
        "--data", data_dir, "--adjdata", adj_path, "--gcn_bool",
        "--addaptadj", "--randomadj", "--adjtype", "doubletransition",
        "--num_nodes", str(n_nodes), "--seq_length", "12", "--nhid", "4",
        "--blocks", "2", "--layers", "2", "--batch_size", "8", "--epochs",
        "2", "--save", save])
    result = out["result"]
    assert len(result.history) == 2
    assert result.best_checkpoint and os.path.exists(result.best_checkpoint)
    assert len(result.per_horizon) == 12
    assert np.isfinite(result.test_metrics["mae"])

    ev = test_cli.main([
        "--checkpoint", result.best_checkpoint, "--data", data_dir,
        "--adjdata", adj_path, "--batch_size", "8",
        "--heatmap_out", str(tmp_path / "emb.pdf"),
        "--csv_out", str(tmp_path / "wave.csv")])
    assert len(ev["per_horizon"]) == 12
    # eval CLI reproduces the training-side test metrics from the checkpoint
    assert ev["test_metrics"]["mae"] == pytest.approx(
        result.test_metrics["mae"], rel=1e-4)
    assert "adaptive_adjacency" in ev
    # reference wave.csv schema (test.py:100-107): all four columns
    with open(tmp_path / "wave.csv") as f:
        header = f.readline().strip().split(",")
    assert header == ["real12", "pred12", "real3", "pred3"]

    # export CLI: checkpoint -> AOT artifact that predicts without model code
    from graph_wavenet_tpu.cli import export as export_cli
    from graph_wavenet_tpu.train import serving

    exp = export_cli.main([
        "--checkpoint", result.best_checkpoint, "--adjdata", adj_path,
        "--out", str(tmp_path / "m.jaxexp"), "--batch_size", "4",
        "--seq_len", "12"])
    loaded = serving.load_exported_forecaster(exp["path"])
    x = np.random.default_rng(0).normal(
        size=(4, 12, n_nodes, 2)).astype(np.float32)
    pred = np.asarray(loaded.predict(x))
    assert pred.shape == (4, 12, n_nodes) and np.isfinite(pred).all()


def test_cli_train_syn_diff_g(tmp_path):
    from graph_wavenet_tpu.cli import train as train_cli

    out = train_cli.main([
        "--data", "syn", "--gcn_bool", "--addaptadj", "--randomadj",
        "--num_nodes", "15", "--seq_length", "24", "--nhid", "4",
        "--blocks", "2", "--layers", "2", "--batch_size", "8",
        "--epochs", "1", "--n_train", "3", "--n_valid", "2", "--n_test",
        "2", "--num_timestep", "60", "--save", str(tmp_path / "g")])
    result = out["result"]
    assert len(result.history) == 1
    assert np.isfinite(result.test_metrics["loss"])
    assert result.test_metrics["pred_F"].shape[-1] == 24


def test_cli_train_syn_same_g(tmp_path):
    from graph_wavenet_tpu.cli import train as train_cli

    # blocks=4 so the receptive field (13) covers the 12+1-step input and
    # the stack collapses time to one step, as the modality loss requires
    out = train_cli.main([
        "--data", "syn", "--same_g", "--gcn_bool", "--addaptadj",
        "--randomadj", "--num_nodes", "15", "--seq_length", "12", "--nhid",
        "4", "--blocks", "4", "--layers", "2", "--batch_size", "8",
        "--epochs", "1", "--n_train", "4", "--n_valid", "2", "--n_test",
        "2", "--num_timestep", "60", "--save", str(tmp_path / "g")])
    # same_G trains with the F/E modality supervision (reference
    # train.py:248-249); metrics come from the syn eval loop
    assert np.isfinite(out["result"].test_metrics["loss"])
    assert np.isfinite(out["result"].test_metrics["rmse"])


def test_crash_pipeline(tmp_path):
    from graph_wavenet_tpu.data import crash

    data, sup, F_t, G = crash.load_dataset_crash(batch_size=4, seed=0)
    assert data["K"] % F_t == 0
    x, y, idx = next(iter(data["train_loader"].get_iterator()))
    K = data["K"]
    n_regions = x.shape[2]
    assert x.shape == (4, K, n_regions, 2)
    assert y.shape == x.shape
    assert sup["train"][0].shape[1:] == (n_regions, n_regions)
    assert len(G["train"]) == sup["train"][0].shape[0]
    assert data["n_communities"] >= 2
    # communities cover all regions
    total = sum(len(v) for v in G["train"][0].assign_dict.values())
    assert total == n_regions


def test_crash_temporal_extension_no_drift():
    from graph_wavenet_tpu.data.crash import temporal_extension

    fmri = np.arange(10, dtype=np.float64)[:, None]
    F_t = 582.4 / 150.0  # non-integer ratio
    target = 1 + int(9 * F_t)
    out = temporal_extension(fmri, F_t, target)
    assert out.shape == (target, 1)
    # each frame appears round((i+1)F_t)-round(iF_t) times; totals track iF_t
    for i in range(9):
        count = int((out[:, 0] == i).sum())
        assert count == round((i + 1) * F_t) - round(i * F_t)


def test_crash_cli(tmp_path):
    from graph_wavenet_tpu.cli import train as train_cli

    out = train_cli.main([
        "--data", "crash", "--gcn_bool", "--addaptadj", "--randomadj",
        "--nhid", "4", "--blocks", "2", "--layers", "2", "--batch_size",
        "4", "--epochs", "1", "--save", str(tmp_path / "g")])
    assert np.isfinite(out["result"].test_metrics["loss"])


def test_crash_cli_grad_accum(tmp_path):
    """--grad_accum on the CRASH (diff-G) path — the memory-limited
    workload the reference chunks by hand (util.py:352-356); round 1 raised
    NotImplementedError here."""
    from graph_wavenet_tpu.cli import train as train_cli

    out = train_cli.main([
        "--data", "crash", "--gcn_bool", "--addaptadj", "--randomadj",
        "--nhid", "4", "--blocks", "2", "--layers", "2", "--batch_size",
        "4", "--grad_accum", "2", "--resident", "host", "--epochs", "1",
        "--save", str(tmp_path / "g")])
    assert np.isfinite(out["result"].test_metrics["loss"])


def test_cli_train_syn_same_g_grad_accum(tmp_path):
    from graph_wavenet_tpu.cli import train as train_cli

    out = train_cli.main([
        "--data", "syn", "--same_g", "--gcn_bool", "--addaptadj",
        "--randomadj", "--num_nodes", "15", "--seq_length", "12", "--nhid",
        "4", "--blocks", "4", "--layers", "2", "--batch_size", "8",
        "--grad_accum", "4", "--resident", "host", "--epochs", "1",
        "--n_train", "4", "--n_valid", "2", "--n_test", "2",
        "--num_timestep", "60", "--save", str(tmp_path / "g")])
    assert np.isfinite(out["result"].test_metrics["loss"])


def test_misc_num2filename():
    assert misc.num2filename(2.0) == "2"
    assert misc.num2filename(0.1) == "0_1"
    assert misc.num2filename(0.25, "-") == "0-25"


def test_misc_seed_roundtrip(tmp_path):
    import jax

    gen = np.random.default_rng(42)
    gen.random(5)
    key = jax.random.key(7)
    misc.save_seed(str(tmp_path), [
        {"module": "numpy", "kind": "numpy", "state": gen},
        {"module": "jax", "kind": "jax", "state": key},
    ])
    states = misc.load_seed(str(tmp_path))
    want = gen.random(3)
    got = states[0]["state"].random(3)
    np.testing.assert_array_equal(got, want)
    k2 = states[1]["state"]
    np.testing.assert_array_equal(
        jax.random.normal(k2, (3,)), jax.random.normal(key, (3,)))


def test_misc_seed_roundtrip_rbg_key_and_mt19937(tmp_path):
    """Restore must honor the SAVED PRNG impl and BitGenerator type: 'rbg'
    jax keys (the TrainConfig default — key data shape (4,) fails under the
    default threefry wrap) and non-PCG64 numpy generators."""
    import jax

    gen = np.random.Generator(np.random.MT19937(3))
    gen.random(4)
    key = jax.random.key(9, impl="rbg")
    misc.save_seed(str(tmp_path), [
        {"module": "numpy", "kind": "numpy", "state": gen},
        {"module": "jax", "kind": "jax", "state": key},
    ])
    states = misc.load_seed(str(tmp_path))
    np.testing.assert_array_equal(states[0]["state"].random(3), gen.random(3))
    k2 = states[1]["state"]
    assert str(jax.random.key_impl(k2)) == str(jax.random.key_impl(key))
    np.testing.assert_array_equal(
        jax.random.normal(k2, (3,)), jax.random.normal(key, (3,)))


def test_misc_write_var_values(tmp_path):
    path = str(tmp_path / "vars.txt")
    misc.write_var_values(path, {"lr": 0.001, "epoch": 3})
    with open(path) as f:
        content = f.read()
    assert "lr = 0.001" in content and "epoch = 3" in content


def test_cli_train_on_mesh(tmp_path, metr_fixture):
    """--mesh_dp runs the whole train+test CLI on the virtual 8-device
    mesh with BOTH feeds — host and the sharded device-resident default
    (VERDICT r3 #2: the old `--resident host`-only restriction is gone)
    — and the two runs agree (same seed, same data order; step-level
    exactness is pinned in test_parallel.py)."""
    from graph_wavenet_tpu.cli import train as train_cli

    data_dir, adj_path, n_nodes = metr_fixture
    common = [
        "--data", data_dir, "--adjdata", adj_path, "--gcn_bool",
        "--addaptadj", "--randomadj", "--num_nodes", str(n_nodes),
        "--seq_length", "12", "--nhid", "4", "--blocks", "2", "--layers",
        "2", "--batch_size", "8", "--epochs", "1", "--mesh_dp"]
    out = train_cli.main(common + ["--resident", "host",
                                   "--save", str(tmp_path / "garage")])
    result = out["result"]
    assert len(result.history) == 1
    assert np.isfinite(result.test_metrics["mae"])

    out_dev = train_cli.main(common + ["--resident", "device",
                                       "--save", str(tmp_path / "garage2")])
    res_dev = out_dev["result"]
    assert len(res_dev.history) == 1
    np.testing.assert_allclose(res_dev.test_metrics["mae"],
                               result.test_metrics["mae"],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(res_dev.history[0].valid["loss"],
                               result.history[0].valid["loss"],
                               rtol=2e-5, atol=2e-5)


def test_cli_train_syn_on_mesh(tmp_path):
    """--mesh_dp is honored on the synthetic (diff-G) dataset too — the
    mesh used to be wired only into the real-dataset branch, silently
    training single-device for --data syn."""
    from graph_wavenet_tpu.cli import train as train_cli

    out = train_cli.main([
        "--data", "syn", "--gcn_bool", "--addaptadj", "--num_nodes", "10",
        "--n_train", "16", "--n_valid", "8", "--n_test", "8",
        "--num_timestep", "80", "--seq_length", "12", "--nhid", "4",
        "--blocks", "2", "--layers", "2", "--batch_size", "8",
        "--epochs", "1", "--resident", "host", "--mesh_dp",
        "--save", str(tmp_path / "garage")])
    result = out["result"]
    assert len(result.history) == 1
    assert np.isfinite(result.test_metrics["loss"])


def test_crash_split_holds_subjects_together():
    """With >= 3 subjects, the chronological split must cut at SUBJECT
    boundaries — a subject's SC graph (and dynamics) must never appear in
    two splits. Subject identity is encoded in a marker entry of each
    subject's SC and read back from the split graphs."""
    from graph_wavenet_tpu.data import crash

    rng = np.random.default_rng(0)
    records = []
    for s in range(5):
        sc = np.ones((8, 8)) - np.eye(8)
        sc[0, 1] = sc[1, 0] = 10.0 + s          # subject marker
        for e in range(2):
            fmri = rng.normal(size=(20, 8)).astype(np.float32)
            eeg = rng.normal(size=(4, 1 + 19 * 4)).astype(np.float32)
            records.append(crash.CrashRecord(f"sub{s}", f"ses{e}",
                                             eeg, fmri, sc))
    data, sup, F_t, G = crash.load_dataset_crash(batch_size=4,
                                                 records=records)
    subjects_by_split = {
        name: {float(g.W[0, 1]) for g in G[name]}
        for name in ("train", "val", "test")}
    for a in ("train", "val", "test"):
        for b in ("train", "val", "test"):
            if a != b:
                assert not (subjects_by_split[a] & subjects_by_split[b]), (
                    a, b, subjects_by_split)
    # every session is in exactly one split
    assert sum(len(G[n]) for n in ("train", "val", "test")) == len(records)
    # each subject's two sessions travel together
    for name in ("train", "val", "test"):
        markers = [float(g.W[0, 1]) for g in G[name]]
        assert all(markers.count(m) == 2 for m in markers), markers


def test_crash_split_rejects_empty_train():
    from graph_wavenet_tpu.data import crash

    with pytest.raises(ValueError, match="leave no training sessions"):
        crash.load_dataset_crash(batch_size=2, train_frac=0.05,
                                 val_frac=0.9,
                                 records=crash.synthetic_crash_records(
                                     n_subjects=1, sessions_per_subject=6))


def test_crash_cli_aptonly(tmp_path):
    """--aptonly on the CRASH branch: the per-split supports must become
    empty lists (the model is built with n_supports=0) — train and eval see
    the same adaptive-only network."""
    from graph_wavenet_tpu.cli import train as train_cli

    out = train_cli.main([
        "--data", "crash", "--gcn_bool", "--addaptadj", "--randomadj",
        "--aptonly", "--nhid", "4", "--blocks", "2", "--layers", "2",
        "--batch_size", "4", "--epochs", "1", "--save", str(tmp_path / "g")])
    assert np.isfinite(out["result"].test_metrics["loss"])


def test_cli_metr_rejects_mismatched_seq_length(tmp_path, metr_fixture):
    """Default --seq_length 48 against a 12-step npz must fail with the
    named message, not a broadcast error at the first step (the reference
    ships the same incompatible defaults, train.py:27)."""
    from graph_wavenet_tpu.cli import train as train_cli

    data_dir, adj_path, n_nodes = metr_fixture
    with pytest.raises(SystemExit, match="seq_length"):
        train_cli.main([
            "--data", data_dir, "--adjdata", adj_path, "--gcn_bool",
            "--addaptadj", "--randomadj", "--num_nodes", str(n_nodes),
            "--seq_length", "48", "--nhid", "4", "--blocks", "2",
            "--layers", "2", "--batch_size", "8", "--epochs", "1",
            "--save", str(tmp_path / "g")])


def test_cli_syn_resume(tmp_path):
    """--resume works on the syn branches (was silently ignored): the
    resumed run continues from the checkpoint's next epoch."""
    from graph_wavenet_tpu.cli import train as train_cli

    base = [
        "--data", "syn", "--same_g", "--gcn_bool", "--addaptadj",
        "--randomadj", "--num_nodes", "15", "--seq_length", "12", "--nhid",
        "4", "--blocks", "4", "--layers", "2", "--batch_size", "8",
        "--n_train", "4", "--n_valid", "2", "--n_test", "2",
        "--num_timestep", "60"]
    out1 = train_cli.main(base + ["--epochs", "1",
                                  "--save", str(tmp_path / "a")])
    ck = out1["result"].best_checkpoint
    assert ck and os.path.exists(ck)
    out2 = train_cli.main(base + ["--epochs", "2", "--resume", ck,
                                  "--save", str(tmp_path / "b")])
    assert [h.epoch for h in out2["result"].history] == [2]


def test_cli_train_profile_writes_trace(tmp_path):
    """--profile wraps the run in a jax.profiler trace (SURVEY.md §5)."""
    from graph_wavenet_tpu.cli import train as train_cli

    prof = tmp_path / "prof"
    out = train_cli.main([
        "--data", "syn", "--same_g", "--gcn_bool", "--addaptadj",
        "--randomadj", "--num_nodes", "15", "--seq_length", "12", "--nhid",
        "4", "--blocks", "4", "--layers", "2", "--batch_size", "8",
        "--epochs", "1", "--n_train", "4", "--n_valid", "2", "--n_test",
        "2", "--num_timestep", "60", "--save", str(tmp_path / "g"),
        "--profile", str(prof)])
    assert np.isfinite(out["result"].test_metrics["loss"])
    traces = list(prof.rglob("*.trace.json.gz")) + list(
        prof.rglob("*.xplane.pb"))
    assert traces, f"no trace files under {prof}"
