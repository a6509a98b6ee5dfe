"""Full-model forward parity vs an independently-written torch Graph WaveNet.

The torch model below is built from torch primitives following the published
architecture (gated dilated TCN + diffusion GCN + adaptive adjacency + skip
head) in the reference's (B, C, N, T) layout; our params are copied into it
and eval-mode outputs compared. This is the forward-allclose gate of
SURVEY.md §7.2 step 5 / BASELINE.json.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from graph_wavenet_tpu.config import ModelConfig
from graph_wavenet_tpu.models.gwnet import apply_gwnet, init_gwnet
from graph_wavenet_tpu.models.gwnet_diff_g import (
    apply_gwnet_diff_g,
    init_gwnet_diff_g,
    svd_nodevecs_batched,
)

N_NODES = 20


def small_cfg(**kw) -> ModelConfig:
    base = dict(num_nodes=N_NODES, in_dim=2, out_dim=12,
                residual_channels=8, dilation_channels=8, skip_channels=16,
                end_channels=32, blocks=2, layers=2, dropout=0.0,
                n_supports=2)
    base.update(kw)
    return ModelConfig(**base)


class TorchGWNet(torch.nn.Module):
    """Independent torch build of the architecture, (B, C, N, T) layout."""

    def __init__(self, cfg: ModelConfig, batched_supports=False):
        super().__init__()
        self.cfg = cfg
        self.batched = batched_supports
        C = cfg.residual_channels
        self.start = torch.nn.Conv2d(cfg.in_dim, C, (1, 1))
        self.filters = torch.nn.ModuleList()
        self.gates = torch.nn.ModuleList()
        self.skips = torch.nn.ModuleList()
        self.residuals = torch.nn.ModuleList()
        self.gcn_mlps = torch.nn.ModuleList()
        self.bns = torch.nn.ModuleList()
        for d in cfg.dilations():
            self.filters.append(torch.nn.Conv2d(
                C, cfg.dilation_channels, (1, cfg.kernel_size), dilation=d))
            self.gates.append(torch.nn.Conv2d(
                C, cfg.dilation_channels, (1, cfg.kernel_size), dilation=d))
            self.skips.append(torch.nn.Conv2d(
                cfg.dilation_channels, cfg.skip_channels, (1, 1)))
            self.residuals.append(torch.nn.Conv2d(
                cfg.dilation_channels, C, (1, 1)))
            if cfg.gcn_bool:
                cin = (cfg.diffusion_order * cfg.supports_len + 1
                       ) * cfg.dilation_channels
                self.gcn_mlps.append(torch.nn.Conv2d(cin, C, (1, 1)))
            self.bns.append(torch.nn.BatchNorm2d(C))
        self.end1 = torch.nn.Conv2d(cfg.skip_channels, cfg.end_channels,
                                    (1, 1))
        self.end2 = torch.nn.Conv2d(cfg.end_channels, cfg.out_dim, (1, 1))
        self.nodevec1 = None
        self.nodevec2 = None

    def diffuse(self, x, a):
        if self.batched and a.dim() == 3:
            return torch.einsum("ncvl,nvw->ncwl", x, a)
        return torch.einsum("ncvl,vw->ncwl", x, a)

    def forward(self, x, supports):
        cfg = self.cfg
        rf = cfg.compat_receptive_field
        if x.size(3) < rf:
            x = F.pad(x, (rf - x.size(3), 0, 0, 0))
        x = self.start(x)
        if cfg.gcn_bool and cfg.addaptadj and supports is not None:
            if self.nodevec1.dim() == 3:
                adp = torch.softmax(
                    torch.relu(self.nodevec1 @ self.nodevec2), dim=2)
            else:
                adp = torch.softmax(
                    torch.relu(self.nodevec1 @ self.nodevec2), dim=1)
            supports = list(supports) + [adp]
        skip = None
        for i, d in enumerate(cfg.dilations()):
            residual = x
            x = torch.tanh(self.filters[i](residual)) * torch.sigmoid(
                self.gates[i](residual))
            s = self.skips[i](x)
            skip = s if skip is None else s + skip[:, :, :, -s.size(3):]
            if cfg.gcn_bool and supports is not None:
                hops = [x]
                for a in supports:
                    xk = x
                    for _ in range(cfg.diffusion_order):
                        xk = self.diffuse(xk, a)
                        hops.append(xk)
                x = self.gcn_mlps[i](torch.cat(hops, dim=1))
            else:
                x = self.residuals[i](x)
            x = x + residual[:, :, :, -x.size(3):]
            x = self.bns[i](x)
        out = torch.relu(skip)
        out = torch.relu(self.end1(out))
        return self.end2(out)


def copy_linear(conv: torch.nn.Conv2d, p: dict):
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(
            np.asarray(p["w"]).T[:, :, None, None]))
        conv.bias.copy_(torch.tensor(np.asarray(p["b"])))


def copy_causal(conv: torch.nn.Conv2d, p: dict):
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(
            np.asarray(p["w"]).transpose(2, 1, 0)[:, :, None, :]))
        conv.bias.copy_(torch.tensor(np.asarray(p["b"])))


def load_params_into_torch(model: TorchGWNet, params: dict, state: dict):
    cfg = model.cfg
    copy_linear(model.start, params["start_conv"])
    copy_linear(model.end1, params["end1"])
    copy_linear(model.end2, params["end2"])
    if "nodevec1" in params:
        model.nodevec1 = torch.tensor(np.asarray(params["nodevec1"]))
        model.nodevec2 = torch.tensor(np.asarray(params["nodevec2"]))
    for i, layer in enumerate(params["layers"]):
        copy_causal(model.filters[i], layer["filter"])
        copy_causal(model.gates[i], layer["gate"])
        copy_linear(model.skips[i], layer["skip"])
        copy_linear(model.residuals[i], layer["residual"])
        if cfg.gcn_bool:
            copy_linear(model.gcn_mlps[i], layer["gcn"])
        with torch.no_grad():
            model.bns[i].weight.copy_(torch.tensor(
                np.asarray(layer["bn"]["scale"])))
            model.bns[i].bias.copy_(torch.tensor(
                np.asarray(layer["bn"]["bias"])))
            model.bns[i].running_mean.copy_(torch.tensor(
                np.asarray(state["bn"][i]["mean"])))
            model.bns[i].running_var.copy_(torch.tensor(
                np.asarray(state["bn"][i]["var"])))


def make_supports(rng, n, batch=None):
    shape = (N_NODES, N_NODES) if batch is None else (batch, N_NODES, N_NODES)
    out = []
    for _ in range(n):
        a = rng.random(shape).astype(np.float32)
        a = a / a.sum(-1, keepdims=True)
        out.append(a)
    return out


@pytest.mark.parametrize("gcn_bool,addaptadj", [
    (True, True), (True, False), (False, False)])
@pytest.mark.slow
def test_gwnet_forward_parity(rng, gcn_bool, addaptadj):
    cfg = small_cfg(gcn_bool=gcn_bool, addaptadj=addaptadj)
    params, state = init_gwnet(jax.random.key(0), cfg)
    tm = TorchGWNet(cfg)
    load_params_into_torch(tm, params, state)
    tm.eval()

    supports = make_supports(rng, 2) if gcn_bool else None
    x = rng.normal(size=(4, 13, N_NODES, 2)).astype(np.float32)

    got, _ = apply_gwnet(cfg, params, state, jnp.asarray(x),
                         None if supports is None else
                         [jnp.asarray(a) for a in supports], train=False)
    with torch.no_grad():
        want = tm(torch.tensor(x.transpose(0, 3, 2, 1)),
                  None if supports is None else
                  [torch.tensor(a) for a in supports])
    # ours (B, T_out, N, out_dim) == torch (B, out_dim, N, T_out).transpose
    want = want.numpy().transpose(0, 3, 2, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_gwnet_aptonly_parity(rng):
    """supports=[] + addaptadj: the adaptive-only model (reference --aptonly,
    `train.py:221-222` + `model.py:115-119`)."""
    cfg = small_cfg(gcn_bool=True, addaptadj=True, n_supports=0)
    params, state = init_gwnet(jax.random.key(1), cfg)
    tm = TorchGWNet(cfg)
    load_params_into_torch(tm, params, state)
    tm.eval()
    x = rng.normal(size=(2, 13, N_NODES, 2)).astype(np.float32)
    got, _ = apply_gwnet(cfg, params, state, jnp.asarray(x), [], train=False)
    with torch.no_grad():
        want = tm(torch.tensor(x.transpose(0, 3, 2, 1)), [])
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(0, 3, 2, 1), atol=2e-4)


def test_gwnet_svd_aptinit_parity(rng):
    aptinit = rng.random((N_NODES, N_NODES)).astype(np.float64)
    cfg = small_cfg()
    params, state = init_gwnet(jax.random.key(2), cfg, aptinit=aptinit)
    tm = TorchGWNet(cfg)
    load_params_into_torch(tm, params, state)
    tm.eval()
    supports = make_supports(rng, 2)
    x = rng.normal(size=(2, 13, N_NODES, 2)).astype(np.float32)
    got, _ = apply_gwnet(cfg, params, state, jnp.asarray(x),
                         [jnp.asarray(a) for a in supports], train=False)
    with torch.no_grad():
        want = tm(torch.tensor(x.transpose(0, 3, 2, 1)),
                  [torch.tensor(a) for a in supports])
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(0, 3, 2, 1), atol=2e-4)


def test_short_input_gets_padded(rng):
    cfg = small_cfg()
    params, state = init_gwnet(jax.random.key(3), cfg)
    supports = [jnp.asarray(a) for a in make_supports(rng, 2)]
    x = jnp.asarray(rng.normal(size=(2, 5, N_NODES, 2)).astype(np.float32))
    out, _ = apply_gwnet(cfg, params, state, x, supports)
    assert out.shape == (2, 1, N_NODES, 12)


def test_diff_g_forward_parity(rng):
    """Per-sample supports, trainable broadcast nodevecs (the fixed variant).
    The torch twin gets the same broadcast nodevecs."""
    B = 3
    cfg = small_cfg(start_dilation=4, out_dim=8)
    params, state = init_gwnet_diff_g(jax.random.key(4), cfg)
    tm = TorchGWNet(cfg, batched_supports=True)
    load_params_into_torch(tm, params, state)
    tm.nodevec1 = torch.tensor(
        np.broadcast_to(np.asarray(params["nodevec1"]),
                        (B, N_NODES, cfg.adapt_rank)).copy())
    tm.nodevec2 = torch.tensor(
        np.broadcast_to(np.asarray(params["nodevec2"]),
                        (B, cfg.adapt_rank, N_NODES)).copy())
    tm.eval()

    supports = make_supports(rng, 2, batch=B)
    # true receptive field is 1 + blocks*(4+8) = 25 for these dilations
    assert cfg.receptive_field == 25
    x = rng.normal(size=(B, 25, N_NODES, 2)).astype(np.float32)
    got, _ = apply_gwnet_diff_g(cfg, params, state, jnp.asarray(x),
                                [jnp.asarray(a) for a in supports],
                                train=False)
    with torch.no_grad():
        want = tm(torch.tensor(x.transpose(0, 3, 2, 1)),
                  [torch.tensor(a) for a in supports])
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(0, 3, 2, 1), atol=2e-4)


def test_diff_g_supports_none_is_temporal_only(rng):
    """supports=None disables graph convs AND the adaptive adjacency, the
    same gate as the shared-graph model — it used to coerce None to [] and
    crash on the gcn hop-count assert with addaptadj on."""
    B = 2
    cfg = small_cfg(start_dilation=4, out_dim=8)
    assert cfg.gcn_bool and cfg.addaptadj
    params, state = init_gwnet_diff_g(jax.random.key(4), cfg)
    x = rng.normal(size=(B, 25, N_NODES, 2)).astype(np.float32)
    got, _ = apply_gwnet_diff_g(cfg, params, state, jnp.asarray(x), None,
                                train=False)
    assert np.isfinite(np.asarray(got)).all()


def test_diff_g_aptinit_batched(rng):
    B = 2
    cfg = small_cfg(start_dilation=4, out_dim=8)
    params, state = init_gwnet_diff_g(jax.random.key(5), cfg)
    aptinit = rng.random((B, N_NODES, N_NODES)).astype(np.float64)
    e1, e2 = svd_nodevecs_batched(aptinit, rank=cfg.adapt_rank)
    assert e1.shape == (B, N_NODES, cfg.adapt_rank)
    supports = make_supports(rng, 2, batch=B)
    x = rng.normal(size=(B, 25, N_NODES, 2)).astype(np.float32)
    out, _ = apply_gwnet_diff_g(
        cfg, params, state, jnp.asarray(x),
        [jnp.asarray(a) for a in supports],
        aptinit_nodevecs=(jnp.asarray(e1), jnp.asarray(e2)), train=False)
    assert out.shape == (B, 1, N_NODES, 8)

    tm = TorchGWNet(cfg, batched_supports=True)
    load_params_into_torch(tm, params, state)
    tm.nodevec1 = torch.tensor(e1)
    tm.nodevec2 = torch.tensor(e2)
    tm.eval()
    with torch.no_grad():
        want = tm(torch.tensor(x.transpose(0, 3, 2, 1)),
                  [torch.tensor(a) for a in supports])
    np.testing.assert_allclose(
        np.asarray(out), want.numpy().transpose(0, 3, 2, 1), atol=2e-4)


def test_diff_g_fresh_nodevec_quirk(rng):
    """fresh_nodevec=True: two forwards with different rngs give different
    outputs (the untrained-adaptive-adjacency reference quirk)."""
    B = 2
    cfg = small_cfg(start_dilation=4, out_dim=8, fresh_nodevec=True)
    params, state = init_gwnet_diff_g(jax.random.key(6), cfg)
    assert "nodevec1" not in params
    supports = [jnp.asarray(a) for a in make_supports(rng, 2, batch=B)]
    x = jnp.asarray(rng.normal(size=(B, 25, N_NODES, 2)).astype(np.float32))
    o1, _ = apply_gwnet_diff_g(cfg, params, state, x, supports,
                               rng=jax.random.key(1))
    o2, _ = apply_gwnet_diff_g(cfg, params, state, x, supports,
                               rng=jax.random.key(2))
    o1b, _ = apply_gwnet_diff_g(cfg, params, state, x, supports,
                                rng=jax.random.key(1))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o1b))


def test_train_mode_updates_bn_state(rng):
    cfg = small_cfg()
    params, state = init_gwnet(jax.random.key(7), cfg)
    supports = [jnp.asarray(a) for a in make_supports(rng, 2)]
    x = jnp.asarray(rng.normal(size=(4, 13, N_NODES, 2)).astype(np.float32))
    _, new_state = apply_gwnet(cfg, params, state, x, supports, train=True,
                               rng=jax.random.key(8))
    assert not np.allclose(np.asarray(new_state["bn"][0]["mean"]),
                           np.asarray(state["bn"][0]["mean"]))


def test_gwnet_sparse_supports_match_dense(rng):
    """Full model with ELL sparse fixed supports + dense learned adaptive
    adjacency equals the dense-support forward."""
    from graph_wavenet_tpu.ops import sparse

    cfg = small_cfg(gcn_bool=True, addaptadj=True)
    params, state = init_gwnet(jax.random.key(2), cfg)
    x = jnp.asarray(rng.normal(size=(2, 13, N_NODES, 2)).astype(np.float32))
    dense = []
    for _ in range(cfg.n_supports):
        a = np.zeros((N_NODES, N_NODES), np.float32)
        for c in range(N_NODES):
            rows = rng.choice(N_NODES, size=4, replace=False)
            a[rows, c] = rng.random(4).astype(np.float32)
        dense.append(a)
    want, _ = apply_gwnet(cfg, params, state, x,
                          [jnp.asarray(a) for a in dense])
    got, _ = apply_gwnet(cfg, params, state, x,
                         [sparse.from_dense(a) for a in dense])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_gwnet_block_sparse_supports_match_dense(rng):
    """Full model with block-sparse fixed supports equals dense forward."""
    from graph_wavenet_tpu.ops import block_sparse

    cfg = small_cfg(gcn_bool=True, addaptadj=False)
    params, state = init_gwnet(jax.random.key(3), cfg)
    x = jnp.asarray(rng.normal(size=(2, 13, N_NODES, 2)).astype(np.float32))
    dense = []
    for _ in range(cfg.n_supports):
        a = np.zeros((N_NODES, N_NODES), np.float32)
        for (sb, db) in ((0, 0), (1, 1), (2, 3), (3, 2), (0, 3)):
            a[sb * 5:(sb + 1) * 5, db * 5:(db + 1) * 5] = rng.random(
                (5, 5)).astype(np.float32)
        dense.append(a)
    want, _ = apply_gwnet(cfg, params, state, x,
                          [jnp.asarray(a) for a in dense])
    got, _ = apply_gwnet(cfg, params, state, x,
                         [block_sparse.from_dense(a, block_size=5)
                          for a in dense])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fresh_nodevec_rejected_on_shared_graph_model():
    """The diff-G quirk flag has no meaning on the shared-graph model
    (init skips the nodevec params) — apply must fail with the named
    error, not a KeyError mid-trace."""
    cfg = small_cfg(fresh_nodevec=True)
    params, state = init_gwnet(jax.random.key(0), ModelConfig(
        **{**cfg.__dict__, "fresh_nodevec": False}))
    x = jnp.zeros((2, cfg.receptive_field, N_NODES, 2))
    sup = [jnp.eye(N_NODES), jnp.eye(N_NODES)]
    with pytest.raises(ValueError, match="fresh_nodevec"):
        apply_gwnet(cfg, params, state, x, sup, train=False)
