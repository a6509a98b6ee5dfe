"""Auxiliary-surface tests: benchmarks harness (smoke on CPU mesh),
profiling utilities, multihost helpers, CRASH raw ingestion, sparsity
helper."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from graph_wavenet_tpu import benchmarks
from graph_wavenet_tpu.config import MeshConfig, ModelConfig
from graph_wavenet_tpu.data import crash
from graph_wavenet_tpu.graphs.generate import compute_nonzero_rows
from graph_wavenet_tpu.parallel import mesh as M, multihost
from graph_wavenet_tpu.train import profiling


SMALL = ModelConfig(num_nodes=12, out_dim=6, residual_channels=4,
                    dilation_channels=4, skip_channels=8, end_channels=8,
                    blocks=1, layers=2, dropout=0.0, n_supports=2)


pytestmark = pytest.mark.slow  # multi-epoch/mesh loops; fast tier skips (README)

def test_bench_train_step_smoke():
    r = benchmarks.bench_train_step(SMALL, batch=4, seq=6, steps=3,
                                    warmup=1)
    assert r["steps_per_s"] > 0
    assert r["node_timesteps_per_s"] > 0


def test_bench_sparse_train_step_smoke():
    for form in ("block", "ell"):
        r = benchmarks.bench_sparse_train_step(n_nodes=256, batch=2, seq=6,
                                               steps=3, form=form)
        assert r["node_timesteps_per_s"] > 0


def test_bench_sharded_train_step_smoke():
    mcfg = MeshConfig(model_axis=2, shard_nodes=True)
    r = benchmarks.bench_sharded_train_step(SMALL, mcfg, batch=4, seq=6,
                                            steps=2, warmup=1)
    assert r["devices"] == 8
    assert r["steps_per_s"] > 0


def test_weak_scaling_harness():
    r = benchmarks.weak_scaling(SMALL, per_device_batch=2, seq=6, steps=2)
    assert 1 in r and 8 in r
    assert r[1]["efficiency"] == 1.0
    for n, row in r.items():
        assert row["node_timesteps_per_s"] > 0


def test_step_timer():
    t = profiling.StepTimer()
    t.start()
    for _ in range(3):
        x = jnp.ones((8, 8)) * 2
        t.tick(x)
    s = t.summary()
    assert s["steps"] == 3 and s["mean_s"] > 0 and s["steps_per_s"] > 0


def test_log_compile_time():
    f = jax.jit(lambda x: x * 2 + 1)
    r = profiling.log_compile_time(f, jnp.ones((16, 16)))
    assert r["first_call_s"] >= r["steady_call_s"] >= 0


def test_trace_writes_profile(tmp_path):
    with profiling.trace(str(tmp_path)):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    import os
    found = any(files for _, _, files in os.walk(tmp_path))
    assert found


def test_multihost_single_process():
    info = multihost.initialize()
    assert info["process_count"] == 1
    mesh = M.make_mesh(MeshConfig())
    batch = np.ones((8, 6, 4, 3), np.float32)   # (B, T, N, F)
    arr = multihost.global_batch(batch, M.batch_sharding(mesh))
    assert arr.shape == (8, 6, 4, 3)
    v = multihost.replicated_host_value(np.ones((2, 2)), mesh)
    assert v.shape == (2, 2)


def test_compute_nonzero_rows():
    S = np.array([[0, 1.0, 0], [2.0, 0, 3.0], [0, 0, 0]])
    out = compute_nonzero_rows(S, n_layers=2)
    assert len(out) == 2
    assert out[0][0] == [1] and out[0][1] == [0, 2] and out[0][2] == []


def test_crash_loadmat_roundtrip(tmp_path):
    import scipy.io as sio

    sio.savemat(str(tmp_path / "t.mat"),
                {"a": np.arange(6).reshape(2, 3),
                 "s": {"x": 1.0, "y": np.ones(3)}})
    d = crash.loadmat(str(tmp_path / "t.mat"))
    np.testing.assert_array_equal(d["a"], np.arange(6).reshape(2, 3))
    assert d["s"]["x"] == 1.0
    np.testing.assert_array_equal(d["s"]["y"], np.ones(3))


def test_crash_load_records_from_dir(tmp_path, rng):
    d = tmp_path / "sub0"
    d.mkdir()
    np.savez(d / "ses0.npz", eeg=rng.normal(size=(5, 40)),
             fmri=rng.normal(size=(10, 20)), sc=rng.random((20, 20)))
    np.savez(d / "bad.npz", eeg=rng.normal(size=(5, 40)))  # incomplete
    recs = crash.load_records_from_dir(str(tmp_path))
    assert len(recs) == 1
    assert recs[0].subject == "sub0" and recs[0].session == "ses0"
    assert recs[0].fmri.shape == (10, 20)


def test_crash_pipeline_with_custom_records(rng):
    recs = crash.synthetic_crash_records(
        n_subjects=4, sessions_per_subject=1, n_regions=12, n_electrodes=4,
        fmri_len=20, fmri_time_res=1.5, eeg_time_res=0.5, rng=rng)
    data, sup, F_t, G = crash.load_dataset_crash(
        batch_size=2, records=recs, fmri_time_res=1.5, eeg_time_res=0.5)
    assert data["K"] % F_t == 0
    x, y, idx = next(iter(data["train_loader"].get_iterator()))
    assert x.shape[2] == 12


def test_crash_too_few_sessions_rejected(rng):
    """n_sessions <= 2 used to arithmetic its way to an EMPTY (or negative)
    train split and crash in np.stack; it must be a clear error."""
    recs = crash.synthetic_crash_records(
        n_subjects=2, sessions_per_subject=1, n_regions=8, n_electrodes=3,
        fmri_len=16, rng=rng)
    with pytest.raises(ValueError, match="3 aligned sessions"):
        crash.load_dataset_crash(batch_size=2, records=recs)


def test_bench_inference_smoke():
    r = benchmarks.bench_inference(SMALL, seq=6, batches=(2,), steps=3,
                                   horizon_steps=2)
    assert r["batch_2"]["latency_ms"] > 0
    assert r["autoregressive"]["rollout_ms"] > 0


def test_crash_misc_helpers(tmp_path, rng):
    # checkIsAP semantics (`CRASH_loader.py:79-88`)
    assert crash.check_arithmetic_progression([1, 3, 5, 7])
    assert crash.check_arithmetic_progression([4])
    assert not crash.check_arithmetic_progression([1, 2, 4])
    # closest_idx (`CRASH_loader.py:90-100`)
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]])
    assert crash.closest_idx(np.array([0.9, 0.1]), pts, k=2) == [1, 0]
    # show_slices renders and saves without blocking
    fig = crash.show_slices([rng.random((6, 5)), rng.random((6, 5))],
                            path=str(tmp_path / "s.png"))
    assert (tmp_path / "s.png").exists()


def test_weak_scaling_temporal_only():
    """Temporal-only configs return supports=None — the harness must not
    iterate it."""
    import dataclasses

    cfg = dataclasses.replace(SMALL, gcn_bool=False, addaptadj=False)
    r = benchmarks.weak_scaling(cfg, per_device_batch=2, seq=6, steps=2)
    assert r[1]["node_timesteps_per_s"] > 0


def test_enable_compilation_cache_persists_executables(tmp_path):
    from graph_wavenet_tpu.utils.misc import enable_compilation_cache

    old_dir = jax.config.jax_compilation_cache_dir
    old_min_time = jax.config.jax_persistent_cache_min_compile_time_secs
    old_min_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        path = enable_compilation_cache(str(tmp_path / "xla"), 0.0)
        assert os.path.isdir(path)

        @jax.jit
        def f(x):
            return x @ x + jnp.float32(41.0)

        f(jnp.ones((32, 32), jnp.float32)).block_until_ready()
        assert os.listdir(path), "no persisted executables"
        # idempotent re-enable keeps the same directory
        assert enable_compilation_cache(str(tmp_path / "xla"), 0.0) == path
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          old_min_time)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          old_min_size)
