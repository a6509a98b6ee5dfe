"""True multi-process distributed training test (SURVEY.md §2.8 backend).

Round 1 validated every distributed path on the in-process virtual
8-device mesh; this spawns 2 REAL OS processes x 4 CPU devices each with
``jax.distributed.initialize`` (coordinator on localhost) and runs DP
steps through ``multihost.global_batch`` — exercising the
process-coordination and cross-process-collective path a real pod uses.
Asserts: both processes converge to identical parameters, and those match
the single-process step on the same global batch.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"p{i}.npz") for i in range(2)]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo_root = os.path.dirname(os.path.dirname(WORKER))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), "2", outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            logs.append(out.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out; partial logs:\n"
                    + "\n".join(l[-2000:] for l in logs))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    a = np.load(outs[0])
    b = np.load(outs[1])
    assert set(a.files) == set(b.files)
    # replicated params must agree bitwise across processes (they executed
    # the same SPMD program on the same global data)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k])

    # and match the single-process run of the same steps in THIS process
    # (the conftest 8-device mesh): DP == single-device exactly is pinned
    # by test_parallel; here we pin multi-process == single-process
    import jax
    import jax.numpy as jnp

    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.train.engine import Engine

    B, T, N = 8, 12, 10
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, N, 2)).astype(np.float32)
    y = (rng.normal(size=(B, T, N, 2)) + 5).astype(np.float32)
    w = rng.random((N, N)).astype(np.float32)
    sup = [jnp.asarray(w / w.sum(-1, keepdims=True))]
    cfg = ModelConfig(num_nodes=N, in_dim=2, out_dim=T,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=16, blocks=2, layers=2,
                      dropout=0.0, gcn_bool=True, addaptadj=True,
                      n_supports=1)
    tc = TrainConfig(learning_rate=1e-3, rng_impl="threefry2x32")
    engine = Engine(cfg, tc, StandardScaler(5.0, 2.0), seed=0)
    state = engine.state
    for _ in range(3):
        state, m = engine.train_step(state, jnp.asarray(x), jnp.asarray(y),
                                     sup)
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    dist_leaves = [a[k] for k in a.files
                   if k not in ("loss", "sparse_loss",
                                "trainable_dblocks")]
    assert len(leaves) == len(dist_leaves)
    for ours, theirs in zip(leaves, dist_leaves):
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)
    np.testing.assert_allclose(float(m["loss"]), float(a["loss"]),
                               rtol=1e-4)

    # sparse node-TP across the process boundary (halo exchange): the
    # workers' cross-process step must match a plain single-process step
    # on the unsharded flat support
    from _multihost_worker import sparse_tp_case
    from graph_wavenet_tpu.ops import block_sparse

    sx, sy, sp = sparse_tp_case()
    scfg = ModelConfig(num_nodes=sx.shape[2], in_dim=1, out_dim=4,
                       residual_channels=4, dilation_channels=4,
                       skip_channels=8, end_channels=8, blocks=1,
                       layers=2, dropout=0.0, gcn_bool=True,
                       addaptadj=False, n_supports=1)
    seng = Engine(scfg, tc, StandardScaler(0.0, 1.0), seed=0)
    _, sm = seng.train_step(seng.state, jnp.asarray(sx), jnp.asarray(sy),
                            [block_sparse.as_flat_pallas(sp)])
    np.testing.assert_allclose(float(sm["loss"]), float(a["sparse_loss"]),
                               rtol=1e-4)

    # TRAINABLE sharded support weights across the process boundary: the
    # workers' global blocks gradient equals the single-chip flat
    # gradient (VERDICT r2 #5, now also pinned cross-process)
    import dataclasses

    flat = block_sparse.as_flat_pallas(sp)
    r3 = np.random.default_rng(4)
    x2 = jnp.asarray(r3.normal(size=(sx.shape[2], 8)), jnp.float32)

    def ref_loss(blocks):
        s2 = dataclasses.replace(flat, blocks_flat=blocks)
        return jnp.sum(jnp.sin(s2.mix_2d(x2)))

    ref_g = np.asarray(jax.grad(ref_loss)(flat.blocks_flat))
    for path in outs:
        with np.load(path) as z:
            np.testing.assert_allclose(z["trainable_dblocks"], ref_g,
                                       rtol=1e-4, atol=1e-6)
