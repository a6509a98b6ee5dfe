"""Data-pipeline tests: batcher padding/shuffle parity, sliding windows,
traffic ETL offsets/splits, METR-style npz loading, synthetic generator."""

import numpy as np
import pytest

from graph_wavenet_tpu.config import DataConfig
from graph_wavenet_tpu.data import metr, synthetic, traffic_etl, windows
from graph_wavenet_tpu.data.loader import DataLoader
from graph_wavenet_tpu.data.scaler import StandardScaler


# ---------------------------------------------------------------------------
# DataLoader (`/root/reference/Utils/util.py:14-102`)
# ---------------------------------------------------------------------------

def test_loader_pads_with_last_sample(rng):
    xs = rng.normal(size=(10, 3)).astype(np.float32)
    ys = rng.normal(size=(10, 3)).astype(np.float32)
    dl = DataLoader(xs, ys, batch_size=4, rng=rng)
    assert dl.size == 12 and dl.num_batch == 3 and dl.num_real == 10
    np.testing.assert_array_equal(dl.xs[10], xs[9])
    np.testing.assert_array_equal(dl.xs[11], xs[9])
    batches = list(dl.get_iterator())
    assert len(batches) == 3
    assert all(b[0].shape == (4, 3) for b in batches)


def test_loader_no_pad_when_divisible(rng):
    xs = rng.normal(size=(8, 3))
    dl = DataLoader(xs, xs, batch_size=4, rng=rng)
    assert dl.size == 8


def test_loader_shuffle_keeps_pairs(rng):
    xs = np.arange(12, dtype=np.float32).reshape(12, 1)
    dl = DataLoader(xs, xs * 10, batch_size=4, rng=rng)
    dl.shuffle()
    assert not np.array_equal(dl.xs.ravel(), np.arange(12))
    np.testing.assert_array_equal(dl.ys, dl.xs * 10)


def test_loader_adj_idx_variant(rng):
    xs = rng.normal(size=(10, 3))
    adj = np.arange(10)
    dl = DataLoader(xs, xs, batch_size=4, adj_idx=adj, rng=rng)
    assert dl.adj_idx[-1] == 9  # padded with last
    x, y, a = next(iter(dl.get_iterator()))
    assert a.shape == (4,)
    dl.shuffle()
    np.testing.assert_array_equal(dl.xs[:, 0].astype(int) * 0 + dl.adj_idx,
                                  dl.adj_idx)


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------

def test_sliding_windows_matches_indexer(rng):
    data = rng.normal(size=(2, 20, 5))
    got = windows.sliding_windows(data, 4, axis=1)
    # reference idxer: arange(K)[None,:] + arange(T-K+1)[:,None]
    idxer = np.arange(4)[None, :] + np.arange(17)[:, None]
    want = data[:, idxer, :]
    np.testing.assert_array_equal(got, want)


def test_reverse_sliding_window_roundtrip(rng):
    # windows of a known sequence reconstruct it exactly
    seq = rng.normal(size=(3, 30))              # (nodes, T)
    w = windows.sliding_windows(seq, 5, axis=1)  # (3, 26, 5)
    w = np.transpose(w, (1, 0, 2))               # (num_window, nodes, width)
    [rec] = windows.reverse_sliding_window([w])
    np.testing.assert_allclose(rec, seq, atol=1e-10)


# ---------------------------------------------------------------------------
# traffic ETL (`/root/reference/generate_training_data.py`)
# ---------------------------------------------------------------------------

def test_make_windows_offsets(rng):
    data = rng.normal(size=(50, 4, 2))
    x_off = np.arange(-11, 1)
    y_off = np.arange(1, 13)
    x, y = traffic_etl.make_windows(data, x_off, y_off)
    assert x.shape == (50 - 11 - 12, 12, 4, 2)
    # x window t ends at anchor, y starts right after
    np.testing.assert_array_equal(x[0], data[0:12])
    np.testing.assert_array_equal(y[0], data[12:24])


def test_build_features_time_of_day(rng):
    values = rng.normal(size=(48, 3))
    index = (np.datetime64("2012-03-01T00:00") +
             np.arange(48) * np.timedelta64(30, "m"))
    feats = traffic_etl.build_features(values, index)
    assert feats.shape == (48, 3, 2)
    np.testing.assert_allclose(feats[..., 0], values)
    assert feats[0, 0, 1] == 0.0
    assert feats[1, 0, 1] == pytest.approx(30 / (24 * 60))
    assert feats[47, 0, 1] == pytest.approx(23.5 / 24)


def test_build_features_day_of_week_pandas_convention(rng):
    """Day-of-week must follow the reference's pandas dayofweek (Monday=0,
    `generate_training_data.py:36-38`) — the epoch-day formula was off by
    one (Sunday=0 convention) before."""
    values = rng.normal(size=(3, 2))
    # 2026-08-17 is a Monday; the next days follow
    index = (np.datetime64("2026-08-17T06:00") +
             np.arange(3) * np.timedelta64(1, "D"))
    feats = traffic_etl.build_features(values, index, add_time_in_day=True,
                                       add_day_in_week=True)
    np.testing.assert_array_equal(feats[:, 0, 2], [0.0, 1.0, 2.0])
    # and a Sunday maps to 6
    sun = traffic_etl.build_features(
        values[:1], np.asarray([np.datetime64("2026-08-16T00:00")]),
        add_time_in_day=False, add_day_in_week=True)
    assert sun[0, 0, 1] == 6.0


def test_generate_train_val_test_rejects_tiny_series(tmp_path, rng):
    values = rng.normal(size=(26, 3))   # 3 windowed samples -> num_test=1?
    index = (np.datetime64("2012-03-01") +
             np.arange(26) * np.timedelta64(5, "m"))
    with pytest.raises(ValueError, match="too few"):
        traffic_etl.generate_train_val_test(values[:25], str(tmp_path),
                                            index=index[:25])


def test_generate_and_load_roundtrip(tmp_path, rng):
    values = rng.normal(size=(200, 5)).astype(np.float32) + 60
    index = (np.datetime64("2012-03-01T00:00") +
             np.arange(200) * np.timedelta64(5, "m"))
    shapes = traffic_etl.generate_train_val_test(values, str(tmp_path),
                                                 index=index)
    n = 200 - 11 - 12
    assert shapes["train"][0] == round(n * 0.7)
    assert shapes["test"][0] == round(n * 0.2)

    data = metr.load_dataset(str(tmp_path), batch_size=8)
    assert isinstance(data["scaler"], StandardScaler)
    # feature 0 standardized, feature 1 (time) untouched, targets raw
    assert abs(data["x_train"][..., 0].mean()) < 1e-5
    assert data["y_train"][..., 0].mean() > 50
    x, y = next(iter(data["train_loader"].get_iterator()))
    assert x.shape == (8, 12, 5, 2) and y.shape == (8, 12, 5, 2)


# ---------------------------------------------------------------------------
# synthetic generator (`/root/reference/Utils/dataTools.py`)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sbm_graph():
    from graph_wavenet_tpu.graphs.generate import Graph
    return Graph("SBM", 20, {"nCommunities": 4, "probIntra": 0.9,
                             "probInter": 0.2},
                 rng=np.random.default_rng(3))


def test_pool_temporal_variants(rng):
    x = rng.normal(size=(2, 5, 12))              # (L, N, T)
    avg = synthetic.pool_temporal(x, 4, "avg")
    assert avg.shape == (2, 12, 5)
    want0 = x[:, :, 0:4].mean(-1)
    np.testing.assert_allclose(avg[:, 0, :], want0, atol=1e-12)
    np.testing.assert_allclose(avg[:, 3, :], want0, atol=1e-12)  # repeated
    sel = synthetic.pool_temporal(x, 4, "selectOne")
    np.testing.assert_allclose(sel[:, 0, :], x[:, :, 0])
    # reference quirk: weighted forces alpha=1 -> equals avg
    wgt = synthetic.pool_temporal(x, 4, "weighted", alpha=0.5)
    np.testing.assert_allclose(wgt, avg, atol=1e-12)


def test_pool_spatial_avg(sbm_graph, rng):
    x = rng.normal(size=(2, 20, 7))
    E = synthetic.pool_spatial(x, sbm_graph, "avg")
    assert E.shape == (2, 7, 20)
    for c, v in sbm_graph.assign_dict.items():
        v = np.asarray(v)
        want = x[:, v, :].mean(1)                # (L, T)
        for node in v:
            np.testing.assert_allclose(E[:, :, node], want, atol=1e-12)


def test_pool_spatial_weighted_and_selectone(sbm_graph, rng):
    x = rng.normal(size=(2, 20, 7))
    E_sel = synthetic.pool_spatial(x, sbm_graph, "selectOne")
    v0 = np.asarray(sbm_graph.assign_dict[0])
    np.testing.assert_allclose(E_sel[:, :, v0[0]], x[:, v0[len(v0) // 2], :])
    E_w = synthetic.pool_spatial(x, sbm_graph, "weighted", beta=0.5)
    assert E_w.shape == (2, 7, 20)
    assert np.isfinite(E_w).all()


def test_multimodality_samples(sbm_graph):
    gen = synthetic.MultiModalityPrediction(
        sbm_graph, K=12, n_train=3, n_valid=2, n_test=1, horizon=100,
        F_t=4, pooltype="avg", sigma_spatial=0.1, sigma_temporal=0.1,
        rng=np.random.default_rng(5))
    x, y = gen.get_samples("train")
    n_win_total = 100 - 12 + 1
    assert x.shape == (3 * (n_win_total - 12), 12, 20, 2)
    assert y.shape == x.shape
    # y is x shifted by K steps: window w's target equals window w+K's input
    np.testing.assert_allclose(x[12], y[0], atol=1e-12)
    # F channel is piecewise constant over F_t-aligned windows of the rollout
    xv, _ = gen.get_samples("val")
    assert xv.shape[0] == 2 * (n_win_total - 12)
    # evaluate = column-normalized batch-time RMSE (dataTools.py:287-292):
    # identical tensors -> 0, and the value matches the explicit formula
    assert float(gen.evaluate(x[:4], x[:4])) < 1e-7
    got = float(gen.evaluate(x[:4], y[:4]))
    # explicit reference formula on flattened (batch*time, N*F) columns
    a = x[:4].reshape(-1, 20 * 2)
    b = y[:4].reshape(-1, 20 * 2)
    want = np.mean(np.sqrt(((a - b) ** 2).sum(0)) /
                   np.linalg.norm(b, axis=0))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # astype casts all stored splits
    gen.astype(np.float32)
    assert gen.samples["train"]["x"].dtype == np.float32


def test_load_dataset_syn_same_g():
    cfg = DataConfig(dataset="syn", num_nodes=20, n_communities=4,
                     seq_length=12, n_train=3, n_valid=2, n_test=2,
                     num_timestep=60, same_g=True)
    data, adj, F_t, G = synthetic.load_dataset_syn(cfg, batch_size=8, seed=1)
    assert F_t == 1
    assert len(adj) == 2           # doubletransition
    assert adj[0].shape == (20, 20)
    x, y = next(iter(data["train_loader"].get_iterator()))
    assert x.shape == (8, 12, 20, 2)
    assert abs(float(data["x_train"][..., 0].mean())) < 1e-6


def test_load_dataset_syn_per_sample_graphs():
    cfg = DataConfig(dataset="syn", num_nodes=20, n_communities=4,
                     seq_length=12, n_train=3, n_valid=2, n_test=2,
                     num_timestep=40, same_g=False)
    data, adjs, F_t, G = synthetic.load_dataset_syn(cfg, batch_size=4,
                                                    seed=2)
    assert len(adjs) == 7 and len(G["train"]) == 3
    x, y, idx = next(iter(data["train_loader"].get_iterator()))
    assert idx.shape == (4,)
    # subject-major flattening: first windows all belong to graph 0
    assert idx.max() <= 2
    sup = synthetic.stack_support_splits(adjs, 3, 2)
    assert sup["train"][0].shape == (3, 20, 20)
    assert sup["val"][0].shape == (2, 20, 20)
    assert sup["test"][1].shape == (2, 20, 20)


def test_diffusion_rollout_stats(sbm_graph):
    x = synthetic.diffusion_rollout(sbm_graph, 4, 50, 0.1, 0.1, 0.0, 0.0,
                                    np.random.default_rng(0))
    assert x.shape == (4, 20, 50)
    assert np.isfinite(x).all()
    # normalized by lambda_max: trajectories stay bounded
    assert np.abs(x).max() < 50


def test_diffusion_rollout_zero_noise(sbm_graph):
    """sigma=0 / rho=0 are legitimate no-noise settings (the reference's
    multivariate_normal accepts singular covariance); the rollout must not
    crash on the Cholesky of a zero/rank-1 covariance — and the defaults
    MultiModalityPrediction ships (sigma_temporal=0) must construct."""
    x = synthetic.diffusion_rollout(sbm_graph, 2, 20, 0.0, 0.0, 0.0, 0.0,
                                    np.random.default_rng(0))
    want = [np.asarray(x[..., 0])]
    A = sbm_graph.W / sbm_graph.lambda_max()
    for _ in range(19):
        want.append(want[-1] @ A)
    np.testing.assert_allclose(x, np.stack(want, axis=-1), atol=1e-6)
    # rank-1 rho-only covariance (singular but nonzero) works too
    x2 = synthetic.diffusion_rollout(sbm_graph, 2, 8, 0.0, 0.0, 0.3, 0.2,
                                     np.random.default_rng(1))
    assert np.isfinite(x2).all()
    gen = synthetic.MultiModalityPrediction(
        sbm_graph, K=12, n_train=2, n_valid=1, n_test=1, horizon=60,
        F_t=4, rng=np.random.default_rng(5))   # ships sigma_temporal=0.0
    assert np.isfinite(gen.samples["train"]["x"]).all()


def test_stack_support_splits_empty_test():
    adjs = [[np.full((3, 3), i, np.float32)] for i in range(5)]
    sup = synthetic.stack_support_splits(adjs, 3, 0)
    assert sup["train"][0].shape == (3, 3, 3)
    assert sup["val"][0].shape == (2, 3, 3)      # was empty via [3:-0]
    assert sup["test"][0].shape == (0, 3, 3)     # was ALL samples via [-0:]
    np.testing.assert_array_equal(sup["val"][0][:, 0, 0], [3.0, 4.0])


def test_load_dataset_syn_short_seq_rejected():
    cfg = DataConfig(dataset="syn", num_nodes=10, seq_length=11,
                     n_train=2, n_valid=1, n_test=1, num_timestep=40)
    with pytest.raises(ValueError, match="seq_length >= 12"):
        synthetic.load_dataset_syn(cfg, batch_size=4, seed=0)


def test_metr_streaming_rejects_tiny_series(rng):
    from graph_wavenet_tpu.data import metr

    vals = rng.random((26, 4)).astype(np.float32)   # 3 valid anchors
    idx = (np.datetime64("2012-03-01")
           + np.arange(26) * np.timedelta64(5, "m"))
    with pytest.raises(ValueError, match="too few"):
        metr.load_dataset_streaming(vals, index=idx, batch_size=2,
                                    resident="host")


def test_multimodality_rejects_bad_horizon(sbm_graph):
    """Guards name the real constraints instead of the reference's opaque
    reshape/stack crashes (`dataTools.py:172-182,137`)."""
    with pytest.raises(ValueError, match="divisible.*F_t|F_t.*divisible"):
        synthetic.MultiModalityPrediction(
            sbm_graph, K=12, n_train=1, n_valid=1, n_test=1, horizon=100,
            F_t=3, rng=np.random.default_rng(0))
    with pytest.raises(ValueError, match=">= 2K"):
        synthetic.MultiModalityPrediction(
            sbm_graph, K=24, n_train=1, n_valid=1, n_test=1, horizon=40,
            F_t=4, rng=np.random.default_rng(0))


def test_pool_temporal_rejects_indivisible_length(rng):
    with pytest.raises(ValueError, match="divisible"):
        synthetic.pool_temporal(rng.normal(size=(2, 5, 10)), 3, "avg")
    with pytest.raises(ValueError, match="divisible"):
        synthetic.pool_temporal(rng.normal(size=(2, 5, 10)), 3, "selectOne")


def test_build_features_dow_needs_index(rng):
    from graph_wavenet_tpu.data.traffic_etl import build_features

    with pytest.raises(ValueError, match="datetime index"):
        build_features(rng.normal(size=(20, 4)), index=None,
                       add_time_in_day=False, add_day_in_week=True)


def test_load_dataset_honors_external_scaler(tmp_path, rng):
    """An externally supplied scaler (the checkpoint sidecar in gwt-test)
    must standardize the inputs — not a freshly fit one."""
    from graph_wavenet_tpu.data import metr
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.data.traffic_etl import generate_train_val_test

    values = (rng.random((60, 4)) * 70).astype(np.float32)
    index = np.arange("2012-03-01", 60 * 5, 5,
                      dtype="datetime64[m]")
    generate_train_val_test(values, str(tmp_path), index=index,
                            seq_length_x=6, seq_length_y=6)
    ext = StandardScaler(100.0, 50.0)
    data = metr.load_dataset(str(tmp_path), 4, scaler=ext)
    assert data["scaler"] is ext
    raw = np.load(tmp_path / "train.npz")["x"][..., 0]
    np.testing.assert_allclose(data["x_train"][..., 0],
                               (raw - 100.0) / 50.0, rtol=1e-5)
