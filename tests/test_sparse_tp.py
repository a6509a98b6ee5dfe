"""Node-TP for block-sparse supports (parallel/sparse_tp.py).

Exactness target: the single-chip flat form (itself pinned against the
dense path in test_pallas_block_sparse.py). Runs on the virtual 8-device
CPU mesh (conftest) with the kernels in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_wavenet_tpu.config import MeshConfig
from graph_wavenet_tpu.ops import block_sparse as B
from graph_wavenet_tpu.parallel.mesh import MODEL, make_mesh
from graph_wavenet_tpu.parallel.sparse_tp import (
    ShardedFlatSupport,
    shard_flat_support,
)


@pytest.fixture
def mesh():
    return make_mesh(MeshConfig(model_axis=4))


@pytest.fixture
def flat(rng):
    # 8 block-rows of 64 across 4 model shards; skewed + one empty row
    n = 8 * 64
    a = np.zeros((n, n), np.float32)
    a[:64, :64] = rng.random((64, 64))
    a[:320, 64:128] = rng.random((320, 64))      # col-block 1: 5 sources
    # col-block 2 empty; source row 7 unused
    a[:64, 192:256] = rng.random((64, 64))
    a[384:448, 256:448] = rng.random((64, 192))  # cross-shard sources
    return B.as_flat_pallas(B.from_dense(a, block_size=64))


def test_sharded_mix_matches_flat(rng, mesh, flat):
    sh = shard_flat_support(flat, mesh)
    n = flat.n_nodes
    x2 = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    ref = flat.mix_2d(x2)
    out = sh.mix_2d(x2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_mix_dx_matches_flat(rng, mesh, flat):
    sh = shard_flat_support(flat, mesh)
    n = flat.n_nodes
    x2 = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    gr = jax.grad(lambda v: jnp.sum(jnp.sin(flat.mix_2d(v))))(x2)
    gs = jax.grad(lambda v: jnp.sum(jnp.sin(sh.mix_2d(v))))(x2)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)


def test_sharded_mix_under_jit_with_sharded_input(rng, mesh, flat):
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = shard_flat_support(flat, mesh)
    n = flat.n_nodes
    x2 = jax.device_put(
        jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32)),
        NamedSharding(mesh, P(MODEL, None)))
    out = jax.jit(sh.mix_2d)(x2)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(flat.mix_2d(x2)),
                               rtol=1e-5, atol=1e-5)


def test_sharded_gcn_apply_matches_dense(rng, mesh, flat):
    """Full gcn block through the all-sparse fast path with node-TP
    supports == the single-chip flat supports."""
    from graph_wavenet_tpu.ops.diffusion import gcn_apply, gcn_init

    n = flat.n_nodes
    sh = shard_flat_support(flat, mesh)
    params = gcn_init(jax.random.key(0), 4, 8, n_supports=1, order=2)
    x = jnp.asarray(rng.normal(size=(2, 3, n, 4)).astype(np.float32))
    ref = gcn_apply(params, x, [flat], order=2)
    out = gcn_apply(params, x, [sh], order=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_sharded_model_train_step(rng, mesh, flat):
    """One full train step (DP x node-TP mesh) with sharded sparse
    supports: loss matches the single-device step on the same data."""
    from graph_wavenet_tpu.config import ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.train.engine import Engine

    n = flat.n_nodes
    cfg = ModelConfig(num_nodes=n, in_dim=1, out_dim=4,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=8, blocks=1, layers=2,
                      gcn_bool=True, addaptadj=False, n_supports=1,
                      dropout=0.0)
    engine = Engine(cfg, TrainConfig(), StandardScaler(0.0, 1.0), seed=0)
    x = jnp.asarray(rng.normal(size=(4, 4, n, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(4, 4, n, 1)).astype(np.float32) + 5.0)
    _, m_ref = engine.train_step(engine.state, x, y, [flat])
    engine2 = Engine(cfg, TrainConfig(), StandardScaler(0.0, 1.0), seed=0)
    sh = shard_flat_support(flat, mesh)
    _, m_sh = engine2.train_step(engine2.state, x, y, [sh])
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)


def test_shard_flat_support_requires_divisible_rows(mesh, flat):
    mesh3 = make_mesh(MeshConfig(model_axis=8))
    with pytest.raises(AssertionError, match="divide"):
        shard_flat_support(B.as_flat_pallas(
            B.random_block_support(6, 2, 64)), mesh3)


def test_sharded_support_pytree_roundtrip(mesh, flat):
    sh = shard_flat_support(flat, mesh)
    leaves, treedef = jax.tree_util.tree_flatten(sh)
    sh2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(sh2, ShardedFlatSupport)
    assert sh2.mesh is sh.mesh


def _banded_flat(rng, n_blocks=8, bs=64):
    """Tri-diagonal block support: every shard's sources lie in adjacent
    shards under any contiguous partition (the halo-eligible structure
    RCM/Hilbert produce)."""
    n = n_blocks * bs
    a = np.zeros((n, n), np.float32)
    for i in range(n_blocks):
        for j in (i - 1, i, i + 1):
            if 0 <= j < n_blocks:
                a[j * bs:(j + 1) * bs, i * bs:(i + 1) * bs] = \
                    rng.random((bs, bs))
    return B.as_flat_pallas(B.from_dense(a, block_size=bs))


def test_halo_mode_auto_selected_and_exact(rng, mesh):
    flat = _banded_flat(rng)
    sh = shard_flat_support(flat, mesh)          # halo="auto"
    assert sh.halo, "banded support should auto-select halo mode"
    n = flat.n_nodes
    x2 = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(sh.mix_2d(x2)),
                               np.asarray(flat.mix_2d(x2)),
                               rtol=1e-5, atol=1e-5)
    gr = jax.grad(lambda v: jnp.sum(jnp.sin(flat.mix_2d(v))))(x2)
    gs = jax.grad(lambda v: jnp.sum(jnp.sin(sh.mix_2d(v))))(x2)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)


def test_halo_mode_matches_all_gather_mode(rng, mesh):
    flat = _banded_flat(rng)
    n = flat.n_nodes
    x2 = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    h = shard_flat_support(flat, mesh, halo=True)
    g = shard_flat_support(flat, mesh, halo=False)
    np.testing.assert_allclose(np.asarray(h.mix_2d(x2)),
                               np.asarray(g.mix_2d(x2)),
                               rtol=1e-6, atol=1e-6)


def test_halo_rejected_for_long_range_support(rng, mesh, flat):
    # the shared fixture has a source 5 shards away from its dest range
    sh = shard_flat_support(flat, mesh)          # auto
    assert not sh.halo
    with pytest.raises(ValueError, match="adjacent"):
        shard_flat_support(flat, mesh, halo=True)


# ---------------------------------------------------------------------------
# Trainable sharded supports (VERDICT r2 #5): exact weight gradients
# ---------------------------------------------------------------------------


def test_trainable_sharded_mix_matches_flat(rng, mesh, flat):
    sh = shard_flat_support(flat, mesh, trainable=True)
    n = flat.n_nodes
    # global storage preserves the single-chip slot order
    np.testing.assert_array_equal(np.asarray(sh.blocks),
                                  np.asarray(flat.blocks_flat))
    x2 = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(sh.mix_2d(x2)),
                               np.asarray(flat.mix_2d(x2)),
                               rtol=1e-5, atol=1e-5)
    gr = jax.grad(lambda v: jnp.sum(jnp.sin(flat.mix_2d(v))))(x2)
    gs = jax.grad(lambda v: jnp.sum(jnp.sin(sh.mix_2d(v))))(x2)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("halo", [False, "auto"])
def test_trainable_dblocks_match_single_chip(rng, mesh, halo):
    """The global blocks gradient under node-TP equals the single-chip
    flat form's exact dblocks (both halo and all_gather modes)."""
    import dataclasses

    flat = _banded_flat(rng)
    sh = shard_flat_support(flat, mesh, halo=halo, trainable=True)
    if halo == "auto":
        assert sh.halo
    n = flat.n_nodes
    x2 = jnp.asarray(rng.normal(size=(n, 24)).astype(np.float32))

    def loss_single(blocks_flat):
        sp = dataclasses.replace(flat, blocks_flat=blocks_flat)
        return jnp.sum(jnp.sin(sp.mix_2d(x2)))

    def loss_sharded(blocks):
        sp = dataclasses.replace(sh, blocks=blocks)
        return jnp.sum(jnp.sin(sp.mix_2d(x2)))

    g_single = jax.grad(loss_single)(flat.blocks_flat)
    g_sharded = jax.grad(loss_sharded)(sh.blocks)
    np.testing.assert_allclose(np.asarray(g_sharded),
                               np.asarray(g_single),
                               rtol=1e-4, atol=1e-5)
    # the trailing zero block's gradient is pinned to zero in both
    assert np.abs(np.asarray(g_sharded[-1])).max() == 0
    assert np.abs(np.asarray(g_single[-1])).max() == 0
    assert np.abs(np.asarray(g_sharded[:-1])).max() > 0


def test_trainable_sharded_sgd_matches_single_chip(rng, mesh):
    """Three SGD steps updating the support weights under node-TP equal
    the single-chip trainable-support steps exactly (the VERDICT r2 #5
    acceptance)."""
    import dataclasses

    flat = _banded_flat(rng)
    sh = shard_flat_support(flat, mesh, trainable=True)
    n = flat.n_nodes
    x2 = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))

    def step(blocks, mix):
        def loss(b):
            return jnp.mean((mix(b) - y) ** 2)
        l, g = jax.value_and_grad(loss)(blocks)
        return blocks - 0.1 * g, l

    b_single = flat.blocks_flat
    b_shard = sh.blocks
    for _ in range(3):
        b_single, l1 = step(
            b_single,
            lambda b: dataclasses.replace(flat, blocks_flat=b).mix_2d(x2))
        b_shard, l2 = step(
            b_shard,
            lambda b: dataclasses.replace(sh, blocks=b).mix_2d(x2))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b_shard), np.asarray(b_single),
                               rtol=1e-5, atol=1e-6)


def test_sharded_adaptive_mask_matches_single_chip(rng, mesh):
    """Block-masked adaptive adjacency under node-TP: forward and
    nodevec gradients equal the single-chip masked path."""
    from graph_wavenet_tpu.ops import adaptive_block
    from graph_wavenet_tpu.parallel.sparse_tp import shard_adaptive_mask

    bs, nb = 64, 8
    n = bs * nb
    # banded mask (halo-eligible under 4 shards)
    d, s = [], []
    for i in range(nb):
        for j in (i - 1, i, i + 1):
            if 0 <= j < nb:
                d.append(i)
                s.append(j)
    mask = adaptive_block.mask_from_pairs(np.array(d), np.array(s), bs, nb)
    smask = shard_adaptive_mask(mask, mesh)
    assert smask.template.halo, "banded mask should auto-select halo"

    nv1 = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    nv2 = jnp.asarray(rng.normal(size=(6, n)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))

    def loss_single(nv1, nv2):
        return jnp.sum(jnp.sin(mask.materialize(nv1, nv2).mix_2d(x2)))

    def loss_sharded(nv1, nv2):
        return jnp.sum(jnp.sin(smask.materialize(nv1, nv2).mix_2d(x2)))

    np.testing.assert_allclose(float(loss_sharded(nv1, nv2)),
                               float(loss_single(nv1, nv2)), rtol=1e-5)
    g1 = jax.grad(loss_single, argnums=(0, 1))(nv1, nv2)
    g2 = jax.grad(loss_sharded, argnums=(0, 1))(nv1, nv2)
    for a, b in zip(g2, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
        assert np.abs(np.asarray(a)).max() > 0


def test_halo_traffic_pinned_in_hlo(rng, mesh):
    """The halo-exchange ICI claim as a compiled-HLO fact (VERDICT r2
    #6): the all_gather form moves one (N, R) all-gather per hop; halo
    mode replaces it with exactly two (N/S, R) collective-permutes —
    received off-chip bytes drop (S-1)/2-fold per hop."""
    import re

    flat = _banded_flat(rng)
    n = flat.n_nodes
    r = 32
    x2 = jnp.zeros((n, r), jnp.float32)
    s = mesh.shape[MODEL]

    def collectives(sh):
        txt = jax.jit(sh.mix_2d).lower(x2).compile().as_text()
        shapes = {}
        for kind in ("all-gather", "collective-permute"):
            pat = rf"f32\[(\d+),(\d+)\]\S* {kind}\("
            shapes[kind] = [(int(a), int(b))
                            for a, b in re.findall(pat, txt)]
        return shapes

    g = collectives(shard_flat_support(flat, mesh, halo=False))
    assert g["collective-permute"] == []
    assert g["all-gather"] == [(n, r)], g
    h = collectives(shard_flat_support(flat, mesh, halo=True))
    assert h["all-gather"] == []
    assert h["collective-permute"] == [(n // s, r)] * 2, h
    # received off-chip bytes per device per hop
    gather_recv = (s - 1) * (n // s) * r * 4
    halo_recv = 2 * (n // s) * r * 4
    assert gather_recv / halo_recv == (s - 1) / 2


def test_dp_mesh_with_fused_sparse_and_mask(rng):
    """Pure-DP mesh + UNSHARDED fused flat supports + adaptive mask (the
    CLI's --mesh_dp city case): GSPMD shards the batch around the Pallas
    custom calls; result equals the single-device step."""
    from graph_wavenet_tpu.config import MeshConfig, ModelConfig, TrainConfig
    from graph_wavenet_tpu.data.scaler import StandardScaler
    from graph_wavenet_tpu.graphs.spatial import (
        doubletransition_block_supports,
    )
    from graph_wavenet_tpu.ops.adaptive_block import mask_from_supports
    from graph_wavenet_tpu.parallel import mesh as M
    from graph_wavenet_tpu.train.engine import Engine

    n = 64
    src = rng.integers(0, n, 200)
    dst = np.clip(src + rng.integers(-8, 9, 200), 0, n - 1)
    w = rng.random(200).astype(np.float32) + 0.1
    sup = doubletransition_block_supports(src, dst, w, n, form="flat",
                                          block_size=16)
    assert all(isinstance(s, B.Fused2FlatSupport) for s in sup)
    supports = list(sup) + [mask_from_supports(sup)]
    cfg = ModelConfig(num_nodes=n, in_dim=2, out_dim=4,
                      residual_channels=4, dilation_channels=4,
                      skip_channels=8, end_channels=16, blocks=2,
                      layers=2, dropout=0.0, gcn_bool=True,
                      addaptadj=True, n_supports=2)
    mcfg = MeshConfig()
    dmesh = M.make_mesh(mcfg)
    eng = Engine(cfg, TrainConfig(), StandardScaler(0.0, 1.0))
    state = M.shard_state(dmesh, eng.state)
    x = rng.normal(size=(16, 12, n, 2)).astype(np.float32)
    y = (rng.normal(size=(16, 4, n, 2)) + 3).astype(np.float32)
    xb, yb = M.shard_batch(dmesh, mcfg, x, y)
    _, m = eng.train_step(state, xb, yb, supports)
    eng2 = Engine(cfg, TrainConfig(), StandardScaler(0.0, 1.0))
    _, m2 = eng2.train_step(eng2.state, jnp.asarray(x), jnp.asarray(y),
                            supports)
    np.testing.assert_allclose(float(m["loss"]), float(m2["loss"]),
                               rtol=1e-5)
