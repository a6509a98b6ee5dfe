"""Reference-checkpoint interop tests: state_dict -> pytree -> state_dict
round trip, and forward equivalence through the torch twin."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from graph_wavenet_tpu.config import ModelConfig
from graph_wavenet_tpu.models.gwnet import apply_gwnet, init_gwnet
from graph_wavenet_tpu.utils import torch_import as TI

from tests.test_model_parity import (
    TorchGWNet,
    load_params_into_torch,
    make_supports,
    small_cfg,
    N_NODES,
)


def reference_named_state_dict(cfg: ModelConfig, seed: int = 0) -> dict:
    """A state dict with the reference's exact module names and torch
    layouts, filled with random tensors."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def conv(name, c_in, c_out, k=1):
        # 0.2 scale keeps activations O(1) through the stack so fp32
        # accumulation-order differences stay within test tolerance
        sd[f"{name}.weight"] = 0.2 * torch.randn(c_out, c_in, 1, k,
                                                 generator=g)
        sd[f"{name}.bias"] = 0.2 * torch.randn(c_out, generator=g)

    conv("start_conv", cfg.in_dim, cfg.residual_channels)
    conv("end_conv_1", cfg.skip_channels, cfg.end_channels)
    conv("end_conv_2", cfg.end_channels, cfg.out_dim)
    sd["nodevec1"] = torch.randn(cfg.num_nodes, cfg.adapt_rank, generator=g)
    sd["nodevec2"] = torch.randn(cfg.adapt_rank, cfg.num_nodes, generator=g)
    for i in range(cfg.blocks * cfg.layers):
        conv(f"filter_convs.{i}", cfg.residual_channels,
             cfg.dilation_channels, k=cfg.kernel_size)
        conv(f"gate_convs.{i}", cfg.residual_channels,
             cfg.dilation_channels, k=cfg.kernel_size)
        conv(f"skip_convs.{i}", cfg.dilation_channels, cfg.skip_channels)
        conv(f"residual_convs.{i}", cfg.dilation_channels,
             cfg.residual_channels)
        cin = (cfg.diffusion_order * cfg.supports_len + 1
               ) * cfg.dilation_channels
        conv(f"gconv.{i}.mlp.mlp", cin, cfg.residual_channels)
        sd[f"bn.{i}.weight"] = torch.randn(cfg.residual_channels,
                                           generator=g).abs() + 0.5
        sd[f"bn.{i}.bias"] = torch.randn(cfg.residual_channels, generator=g)
        sd[f"bn.{i}.running_mean"] = torch.randn(cfg.residual_channels,
                                                 generator=g) * 0.1
        sd[f"bn.{i}.running_var"] = torch.rand(cfg.residual_channels,
                                               generator=g) + 0.5
        sd[f"bn.{i}.num_batches_tracked"] = torch.tensor(0)
    return sd


def test_import_forward_matches_torch_twin(rng):
    """Import a reference-named state dict; our forward must equal the torch
    twin carrying the same weights."""
    cfg = small_cfg()
    sd = reference_named_state_dict(cfg)
    params, model_state = TI.import_state_dict(sd, cfg)

    tm = TorchGWNet(cfg)
    load_params_into_torch(tm, params, model_state)
    tm.eval()
    supports = make_supports(rng, 2)
    x = rng.normal(size=(3, 13, N_NODES, 2)).astype(np.float32)
    got, _ = apply_gwnet(cfg, params, model_state, jnp.asarray(x),
                         [jnp.asarray(a) for a in supports])
    with torch.no_grad():
        want = tm(torch.tensor(x.transpose(0, 3, 2, 1)),
                  [torch.tensor(a) for a in supports])
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(0, 3, 2, 1), atol=2e-4)


def test_state_dict_round_trip():
    cfg = small_cfg()
    sd = reference_named_state_dict(cfg, seed=1)
    params, model_state = TI.import_state_dict(sd, cfg)
    sd2 = TI.export_state_dict(params, model_state, cfg)
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(sd2[k], v.numpy(), atol=1e-7,
                                   err_msg=k)


def test_export_of_our_init_has_reference_keys():
    cfg = small_cfg()
    params, state = init_gwnet(jax.random.key(0), cfg)
    sd = TI.export_state_dict(params, state, cfg)
    assert "filter_convs.0.weight" in sd
    assert sd["filter_convs.0.weight"].shape == (8, 8, 1, 2)
    assert "gconv.3.mlp.mlp.weight" in sd
    assert sd["gconv.3.mlp.mlp.weight"].shape == (8, (2 * 3 + 1) * 8, 1, 1)
    assert sd["nodevec1"].shape == (N_NODES, 10)
    # and imports back losslessly
    p2, s2 = TI.import_state_dict(sd, cfg)
    np.testing.assert_allclose(p2["layers"][0]["filter"]["w"],
                               np.asarray(params["layers"][0]["filter"]["w"]))


def test_load_pth_file(tmp_path):
    cfg = small_cfg()
    sd = reference_named_state_dict(cfg, seed=2)
    path = tmp_path / "model.pth"
    torch.save(sd, str(path))
    params, state = TI.load_pth(str(path), cfg)
    np.testing.assert_allclose(
        params["start_conv"]["w"],
        sd["start_conv.weight"].numpy()[:, :, 0, 0].T)
