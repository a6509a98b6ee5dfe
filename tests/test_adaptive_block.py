"""Block-masked adaptive adjacency (ops/adaptive_block.py).

Acceptance (VERDICT r2 #1): exactness vs the dense adaptive path where
the mask is all-live; gradient flow to the nodevecs; the full model
(fixed sparse supports + learned adaptive graph) trains.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_wavenet_tpu.config import ModelConfig
from graph_wavenet_tpu.models.gwnet import apply_gwnet, init_gwnet
from graph_wavenet_tpu.ops import adaptive, adaptive_block, block_sparse

N, BS, RANK = 32, 8, 5


@pytest.fixture
def nodevecs(rng):
    nv1 = jnp.asarray(rng.normal(size=(N, RANK)), jnp.float32)
    nv2 = jnp.asarray(rng.normal(size=(RANK, N)), jnp.float32)
    return nv1, nv2


def _to_dense(mask, sp):
    """Reassemble the materialized flat support into its dense matrix."""
    bs = mask.bs_src
    rec = np.zeros((mask.n_nodes, mask.n_nodes), np.float32)
    bl = np.asarray(sp.blocks_flat)
    for i in range(mask.n_live):
        d, s = int(mask.live_dst[i]), int(mask.live_src[i])
        rec[s * bs:(s + 1) * bs, d * bs:(d + 1) * bs] = bl[i]
    return rec


def test_full_mask_equals_dense(nodevecs):
    nv1, nv2 = nodevecs
    mask = adaptive_block.full_mask(N, BS)
    rec = _to_dense(mask, mask.materialize(nv1, nv2))
    dense = np.asarray(adaptive.adaptive_adjacency(nv1, nv2))
    np.testing.assert_allclose(rec, dense, atol=1e-6)


def test_full_mask_grads_match_dense(nodevecs, rng):
    nv1, nv2 = nodevecs
    mask = adaptive_block.full_mask(N, BS)
    x = jnp.asarray(rng.normal(size=(N, 6)), jnp.float32)

    def loss_masked(nv1, nv2):
        return (mask.materialize(nv1, nv2).mix_2d(x) ** 2).sum()

    def loss_dense(nv1, nv2):
        a = adaptive.adaptive_adjacency(nv1, nv2)
        return ((x.T @ a).T ** 2).sum()

    g = jax.grad(loss_masked, argnums=(0, 1))(nv1, nv2)
    gd = jax.grad(loss_dense, argnums=(0, 1))(nv1, nv2)
    for a, b in zip(g, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4)
        assert np.abs(np.asarray(a)).max() > 0


def test_partial_mask_masked_softmax(nodevecs):
    """Partial mask = softmax over live entries only: each live source
    row sums to one; dead blocks stay exactly zero."""
    nv1, nv2 = nodevecs
    nb = N // BS
    mask = adaptive_block.mask_from_pairs(
        np.array([0, 1, 2, 3, 0]), np.array([0, 1, 2, 3, 1]), BS, nb)
    rec = _to_dense(mask, mask.materialize(nv1, nv2))
    np.testing.assert_allclose(rec.sum(1), 1.0, atol=1e-5)
    live = np.zeros((nb, nb), bool)
    live[np.asarray(mask.live_src), np.asarray(mask.live_dst)] = True
    for s in range(nb):
        for d in range(nb):
            blk = rec[s * BS:(s + 1) * BS, d * BS:(d + 1) * BS]
            if not live[s, d]:
                assert (blk == 0).all()


def test_mask_from_supports_union(rng):
    """Union pattern covers both supports' live blocks + the diagonal."""
    src, dst = np.array([0, 9, 17]), np.array([8, 2, 25])
    w = np.ones(3, np.float32)
    sups = [block_sparse.from_edges_flat(src, dst, w, N, BS, BS),
            block_sparse.from_edges_flat(dst, src, w, N, BS, BS)]
    mask = adaptive_block.mask_from_supports(sups)
    pairs = set(zip(np.asarray(mask.live_src).tolist(),
                    np.asarray(mask.live_dst).tolist()))
    for s, d in [(0, 1), (1, 0), (2, 3), (3, 2)]:
        assert (s, d) in pairs
    for i in range(N // BS):
        assert (i, i) in pairs


def _make_supports(rng, form, banded=False):
    if banded:
        # neighbors only within +-BS: a banded block pattern whose union
        # (plus diagonal) stays partial — the at-scale shape
        src = rng.integers(0, N, size=120)
        dst = np.clip(src + rng.integers(-BS, BS + 1, size=120), 0, N - 1)
    else:
        src = rng.integers(0, N, size=120)
        dst = rng.integers(0, N, size=120)
    w = rng.random(120).astype(np.float32) + 0.1
    from graph_wavenet_tpu.graphs.spatial import transition_edge_weights
    sups = []
    for s, d in ((src, dst), (dst, src)):
        wt = transition_edge_weights(s, d, w, N)
        if form == "flat":
            sups.append(block_sparse.from_edges_flat(s, d, wt, N, BS, BS))
        else:
            a = np.zeros((N, N), np.float32)
            np.add.at(a, (s, d), wt)
            sups.append(a)
    return sups


def _cfg(**kw):
    base = dict(num_nodes=N, in_dim=2, out_dim=4, residual_channels=4,
                dilation_channels=4, skip_channels=8, end_channels=16,
                blocks=2, layers=2, gcn_bool=True, addaptadj=True,
                n_supports=2, dropout=0.0)
    base.update(kw)
    return ModelConfig(**base)


def test_model_sparse_adaptive_matches_dense(rng):
    """Full model with flat sparse fixed supports + full-mask adaptive ==
    the dense-supports dense-adaptive model (same params)."""
    cfg = _cfg()
    params, state = init_gwnet(jax.random.key(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, 13, N, 2)), jnp.float32)

    sparse_sups = _make_supports(np.random.default_rng(1), "flat")
    dense_sups = [jnp.asarray(a) for a in
                  _make_supports(np.random.default_rng(1), "dense")]
    mask = adaptive_block.full_mask(N, BS)

    out_sp, _ = apply_gwnet(cfg, params, state, x,
                            list(sparse_sups) + [mask])
    out_dn, _ = apply_gwnet(cfg, params, state, x, dense_sups)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_dn),
                               atol=2e-4)


def test_model_nodevec_gradients_flow(rng):
    """Gradients reach the nodevecs through the masked adaptive support
    (with a PARTIAL mask — the at-scale configuration)."""
    cfg = _cfg()
    params, state = init_gwnet(jax.random.key(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, 13, N, 2)), jnp.float32)
    sups = _make_supports(np.random.default_rng(1), "flat", banded=True)
    mask = adaptive_block.mask_from_supports(sups)
    assert mask.n_live < (N // BS) ** 2, "mask should be partial here"

    def loss(params):
        out, _ = apply_gwnet(cfg, params, state, x, list(sups) + [mask])
        return (out ** 2).mean()

    g = jax.grad(loss)(params)
    for k in ("nodevec1", "nodevec2"):
        assert np.abs(np.asarray(g[k])).max() > 0, f"no grad to {k}"


def test_mask_without_addaptadj_raises(rng):
    cfg = _cfg(addaptadj=False, n_supports=2)
    params, state = init_gwnet(jax.random.key(0), cfg)
    x = jnp.zeros((1, 13, N, 2), jnp.float32)
    sups = _make_supports(np.random.default_rng(1), "flat")
    mask = adaptive_block.mask_from_supports(sups)
    with pytest.raises(ValueError, match="BlockAdaptiveMask"):
        apply_gwnet(cfg, params, state, x, list(sups) + [mask])


def test_sparse_fixed_without_mask_raises_at_scale():
    """At city scale (>= 16384 nodes) a dense adp materialization is
    always a mistake — the model demands the masked form. (At small N
    mixing sparse fixed supports with the dense adp stays allowed:
    tests/test_model_parity.py::test_gwnet_sparse_supports_match_dense.)
    Config-level check only — no forward runs at this size."""
    from graph_wavenet_tpu.ops.linear import linear_init

    big = 16384
    cfg = _cfg(num_nodes=big)
    params = {"start_conv": linear_init(jax.random.key(0), 2, 4),
              "nodevec1": jnp.zeros((big, RANK)),
              "nodevec2": jnp.zeros((RANK, big))}
    x = jnp.zeros((1, 13, big, 2), jnp.float32)

    class _FakeSparse:
        def mix_2d(self, x2):
            return x2

    with pytest.raises(ValueError,
                       match="would materialize the dense O"):
        apply_gwnet(cfg, params, {"bn": []}, x, [_FakeSparse()])


def test_aptonly_without_mask_raises_at_scale():
    """ADVICE r3: the guard must also fire for an aptonly city-scale
    config (addaptadj, empty supports, no mask) — previously only sparse
    FIXED supports tripped it and aptonly silently went dense O(N^2)."""
    from graph_wavenet_tpu.ops.linear import linear_init

    big = 16384
    cfg = _cfg(num_nodes=big, n_supports=0)
    params = {"start_conv": linear_init(jax.random.key(0), 2, 4),
              "nodevec1": jnp.zeros((big, RANK)),
              "nodevec2": jnp.zeros((RANK, big))}
    x = jnp.zeros((1, 13, big, 2), jnp.float32)
    with pytest.raises(ValueError, match="dense O"):
        apply_gwnet(cfg, params, {"bn": []}, x, [])


def test_multiple_masks_raise(rng):
    """ADVICE r3: >1 BlockAdaptiveMask in the supports must raise (the
    model materializes exactly one learned adjacency; silently dropping
    extras would only surface later as a gcn weight-shape assert)."""
    cfg = _cfg()
    params, state = init_gwnet(jax.random.key(0), cfg)
    x = jnp.zeros((1, 13, N, 2), jnp.float32)
    sups = _make_supports(np.random.default_rng(1), "flat")
    mask = adaptive_block.mask_from_supports(sups)
    with pytest.raises(ValueError, match="exactly one learned adjacency"):
        apply_gwnet(cfg, params, state, x, list(sups) + [mask, mask])


def test_train_step_learns_masked_adaptive(rng):
    """A few optimizer steps on the full sparse+adaptive model: loss
    descends and the nodevecs move."""
    from graph_wavenet_tpu.config import TrainConfig
    from graph_wavenet_tpu.train.engine import Engine

    cfg = _cfg(out_dim=4)
    engine = Engine(cfg, TrainConfig(learning_rate=1e-2, weight_decay=0.0),
                    None)
    sups = _make_supports(np.random.default_rng(1), "flat")
    mask = adaptive_block.mask_from_supports(sups)
    supports = list(sups) + [mask]
    x = jnp.asarray(rng.normal(size=(4, 12, N, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(4, 4, N, 2)) + 3.0, jnp.float32)

    state = engine.state
    nv0 = np.asarray(state.params["nodevec1"])
    losses = []
    for _ in range(8):
        state, m = engine.train_step(state, x, y, supports)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.abs(np.asarray(state.params["nodevec1"]) - nv0).max() > 1e-6


def test_widen_block_pairs_closure():
    """2-hop closure: a chain pattern 0<-1<-2 gains the composed pair
    0<-2; 3-hop on a 4-chain gains 0<-3."""
    # pairs (dst, src): 0<-1, 1<-2, 2<-3 plus diagonal
    dst = np.array([0, 1, 2, 0, 1, 2, 3])
    src = np.array([1, 2, 3, 0, 1, 2, 3])
    d2, s2 = adaptive_block.widen_block_pairs(dst, src, 4, 2)
    pairs2 = set(zip(d2.tolist(), s2.tolist()))
    assert (0, 2) in pairs2 and (1, 3) in pairs2
    assert (0, 3) not in pairs2
    d3, s3 = adaptive_block.widen_block_pairs(dst, src, 4, 3)
    assert (0, 3) in set(zip(d3.tolist(), s3.tolist()))
    # hops=1 is the identity
    d1, s1 = adaptive_block.widen_block_pairs(dst, src, 4, 1)
    assert set(zip(d1.tolist(), s1.tolist())) == \
        set(zip(dst.tolist(), src.tolist()))


def test_mask_hops_widens_and_converges_to_dense(nodevecs, rng):
    """hops=2 strictly widens a banded pattern; enough hops on a
    connected pattern reach the full mask, whose materialization equals
    the dense adaptive adjacency exactly."""
    nv1, nv2 = nodevecs
    sups = _make_supports(np.random.default_rng(1), "flat", banded=True)
    m1 = adaptive_block.mask_from_supports(sups, hops=1)
    m2 = adaptive_block.mask_from_supports(sups, hops=2)
    p1 = set(zip(np.asarray(m1.live_dst).tolist(),
                 np.asarray(m1.live_src).tolist()))
    p2 = set(zip(np.asarray(m2.live_dst).tolist(),
                 np.asarray(m2.live_src).tolist()))
    assert p1 < p2, "hops=2 must strictly widen the banded pattern"

    # a banded (connected) pattern saturates to all-live within nb hops
    nb = m1.n_src_blocks
    m_full = adaptive_block.mask_from_supports(sups, hops=nb)
    assert m_full.n_live == nb * nb
    rec = _to_dense(m_full, m_full.materialize(nv1, nv2))
    dense = np.asarray(adaptive.adaptive_adjacency(nv1, nv2))
    np.testing.assert_allclose(rec, dense, atol=1e-6)


def test_city_layout_persists_adaptive_hops(rng):
    """build_city_supports(adaptive_hops=2) records the knob in the
    layout and builds the widened mask, so every rebuild site
    (gwt-test, serving) reproduces the trained pattern."""
    from graph_wavenet_tpu.graphs import city
    from graph_wavenet_tpu.graphs.spatial import knn_graph_edges

    n = 48
    pos = rng.normal(size=(n, 2))
    src, dst, w = knn_graph_edges(pos, 3)
    sup1, mask1, lay1 = city.build_city_supports(
        src, dst, w, n, pos=pos, ordering="rcm", form="block",
        block_size=8, addaptadj=True, adaptive_hops=1)
    sup2, mask2, lay2 = city.build_city_supports(
        src, dst, w, n, pos=pos, ordering="rcm", form="block",
        block_size=8, addaptadj=True, adaptive_hops=2)
    assert lay1["adaptive_hops"] == 1 and lay2["adaptive_hops"] == 2
    assert mask2.n_live > mask1.n_live
    # rebuild from the persisted knob matches the built mask exactly
    rebuilt = adaptive_block.mask_from_supports(
        sup2, hops=int(lay2["adaptive_hops"]))
    np.testing.assert_array_equal(np.asarray(rebuilt.live_dst),
                                  np.asarray(mask2.live_dst))
    np.testing.assert_array_equal(np.asarray(rebuilt.live_src),
                                  np.asarray(mask2.live_src))


def test_materialize_out_dtype_is_exit_cast(nodevecs, rng):
    """materialize(out_dtype=bf16) == fp32 materialize then cast (the
    softmax always runs fp32): forward through the mix is bitwise what
    the per-use cast produced, and fp32 out_dtype is a no-op."""
    nv1, nv2 = nodevecs
    src, dst = np.array([0, 9, 17]), np.array([8, 2, 25])
    w = np.ones(3, np.float32)
    sups = [block_sparse.from_edges_flat(src, dst, w, N, BS, BS)]
    mask = adaptive_block.mask_from_supports(sups)
    ref = mask.materialize(nv1, nv2)
    got = mask.materialize(nv1, nv2, out_dtype=jnp.bfloat16)
    assert got.blocks_flat.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(ref.blocks_flat.astype(jnp.bfloat16).astype(
            jnp.float32)),
        np.asarray(got.blocks_flat.astype(jnp.float32)))
    same = mask.materialize(nv1, nv2, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref.blocks_flat),
                                  np.asarray(same.blocks_flat))
