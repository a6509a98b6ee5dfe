"""Subprocess worker for the true multi-process distributed test.

Each OS process owns 4 virtual CPU devices and joins a 2-process
``jax.distributed`` cluster (coordinator on localhost) — the actual
process-coordination path a real multi-host TPU pod uses (SURVEY.md §2.8),
which the in-process 8-device virtual mesh cannot exercise. Run by
``test_multiprocess.py``; not a pytest module.

Usage: python _multihost_worker.py <port> <process_id> <num_processes> <out.npz>
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_enable_async_dispatch", False)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from graph_wavenet_tpu.config import MeshConfig, ModelConfig, TrainConfig  # noqa: E402
from graph_wavenet_tpu.data.scaler import StandardScaler  # noqa: E402
from graph_wavenet_tpu.parallel import mesh as M  # noqa: E402
from graph_wavenet_tpu.parallel import multihost  # noqa: E402
from graph_wavenet_tpu.train.engine import Engine  # noqa: E402


def main(port: int, pid: int, nprocs: int, out_path: str) -> None:
    info = multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs, process_id=pid)
    assert info["process_count"] == nprocs, info
    assert info["local_devices"] == 4, info
    assert info["global_devices"] == 4 * nprocs, info

    # identical model/data in every process (same seeds); each process
    # feeds only ITS half of the global batch through global_batch
    B, T, N = 8, 12, 10
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, N, 2)).astype(np.float32)
    y = (rng.normal(size=(B, T, N, 2)) + 5).astype(np.float32)
    a = rng.random((N, N)).astype(np.float32)
    sup_host = a / a.sum(-1, keepdims=True)

    cfg = ModelConfig(num_nodes=N, in_dim=2, out_dim=T,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=16, blocks=2, layers=2,
                      dropout=0.0, gcn_bool=True, addaptadj=True,
                      n_supports=1)
    tc = TrainConfig(learning_rate=1e-3, rng_impl="threefry2x32")
    engine = Engine(cfg, tc, StandardScaler(5.0, 2.0), seed=0)

    mesh = M.make_mesh(MeshConfig())
    mcfg = MeshConfig()
    state = multihost.replicate_pytree(engine.state, mesh)
    sup = [multihost.replicated_host_value(jnp.asarray(sup_host), mesh)]

    rows = B // nprocs
    local_x = x[pid * rows:(pid + 1) * rows]
    local_y = y[pid * rows:(pid + 1) * rows]
    bs = M.batch_sharding(mesh, mcfg)
    for _ in range(3):
        gx = multihost.global_batch(local_x, bs)
        gy = multihost.global_batch(local_y, bs)
        state, m = engine.train_step(state, gx, gy, sup)

    # --- sparse node-TP across the process boundary --------------------
    # banded block-sparse support sharded over a cross-process model axis
    # (halo auto-selects); one train step must agree across processes and
    # with the single-process value the test computes.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from graph_wavenet_tpu.ops import block_sparse
    from graph_wavenet_tpu.parallel.sparse_tp import shard_flat_support

    sx, sy, sp = sparse_tp_case()
    mcfg2 = MeshConfig(model_axis=2, shard_nodes=True)
    mesh2 = M.make_mesh(mcfg2)
    ssup = shard_flat_support(block_sparse.as_flat_pallas(sp), mesh2)
    assert ssup.halo, "banded support should run the halo exchange"
    # every process holds the same host copy; place each field with its
    # leading shard axis over the (cross-process) model axis
    ssup = jax.tree_util.tree_map(
        lambda a: jax.device_put(np.asarray(a), NamedSharding(
            mesh2, P(M.MODEL, *[None] * (a.ndim - 1)))), ssup)
    scfg = ModelConfig(num_nodes=sx.shape[2], in_dim=1, out_dim=4,
                       residual_channels=4, dilation_channels=4,
                       skip_channels=8, end_channels=8, blocks=1,
                       layers=2, dropout=0.0, gcn_bool=True,
                       addaptadj=False, n_supports=1)
    seng = Engine(scfg, tc, StandardScaler(0.0, 1.0), seed=0)
    sstate = multihost.replicate_pytree(seng.state, mesh2)
    rows = sx.shape[0] // nprocs
    bs2 = M.batch_sharding(mesh2, mcfg2)
    gx = multihost.global_batch(sx[pid * rows:(pid + 1) * rows], bs2)
    gy = multihost.global_batch(sy[pid * rows:(pid + 1) * rows], bs2)
    _, sm = seng.train_step(sstate, gx, gy, [ssup])

    # --- TRAINABLE sharded support weights across the process boundary:
    # the global blocks gradient (exact dest-copy cotangents scattered
    # through the derived-view gathers) must agree across processes and
    # with the single-chip flat gradient the test computes.
    import dataclasses

    tsup = shard_flat_support(block_sparse.as_flat_pallas(sp), mesh2,
                              trainable=True)
    assert tsup.halo

    def place(a, spec):
        return jax.device_put(np.asarray(a), NamedSharding(mesh2, spec))

    tables = ("glob_f", "row_f", "src_f", "slot_f", "inv_f",
              "glob_b", "row_b", "src_b", "slot_b")
    tsup = dataclasses.replace(
        tsup, blocks=place(tsup.blocks, P()),
        **{f: place(getattr(tsup, f),
                    P(M.MODEL, *[None] * (getattr(tsup, f).ndim - 1)))
           for f in tables})
    r3 = np.random.default_rng(4)
    x2_host = r3.normal(size=(sx.shape[2], 8)).astype(np.float32)
    gx2 = place(x2_host, P(M.MODEL, None))

    def wloss(blocks):
        s2 = dataclasses.replace(tsup, blocks=blocks)
        return jnp.sum(jnp.sin(s2.mix_2d(gx2)))

    dblocks = jax.jit(jax.grad(wloss))(tsup.blocks)
    dblocks = np.asarray(jax.device_get(dblocks))

    # params are replicated -> every process holds full copies locally
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    np.savez(out_path, *[np.asarray(l) for l in leaves],
             loss=np.float64(m["loss"]),
             sparse_loss=np.float64(sm["loss"]),
             trainable_dblocks=dblocks)
    print(f"worker {pid} done", flush=True)


def sparse_tp_case():
    """Deterministic banded sparse-TP fixture shared by the worker and the
    single-process reference in test_multiprocess.py."""
    n_sp, bsz = 128, 32
    nb = n_sp // bsz
    band = np.zeros((n_sp, n_sp), np.float32)
    rb = np.random.default_rng(2)
    for i in range(nb):
        for j in (i - 1, i, i + 1):
            if 0 <= j < nb:
                band[j * bsz:(j + 1) * bsz, i * bsz:(i + 1) * bsz] = \
                    rb.random((bsz, bsz)) / (3 * bsz)
    from graph_wavenet_tpu.ops import block_sparse

    sp = block_sparse.from_dense(band, block_size=bsz)
    r2 = np.random.default_rng(3)
    sx = r2.normal(size=(4, 4, n_sp, 1)).astype(np.float32)
    sy = (r2.normal(size=(4, 4, n_sp, 1)) + 5).astype(np.float32)
    return sx, sy, sp


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
