"""Reference-checkpoint interop: torch ``state_dict`` <-> our param pytree.

The forward-parity gate (SURVEY.md §7.2 step 5) requires loading reference
``.pth`` weights into this framework. The mapping below targets the exact
module names of `/root/reference/model.py` (``filter_convs.i``,
``gate_convs.i``, ``residual_convs.i``, ``skip_convs.i``, ``bn.i``,
``gconv.i.mlp.mlp``, ``start_conv``, ``end_conv_1``, ``end_conv_2``,
``nodevec1/2``) and converts layouts:

- 1x1 Conv2d weight (out, in, 1, 1)      -> dense w (in, out)
- (1, k) conv weight (out, in, 1, k)     -> tap-major w (k, in, out)
- BatchNorm2d weight/bias/running_{mean,var} -> bn scale/bias + state

Tensors may be torch tensors or numpy arrays (a ``.pth`` loaded with
``torch.load(map_location='cpu')`` works directly).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from graph_wavenet_tpu.config import ModelConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _dense(weight, bias) -> dict:
    w = _np(weight)
    assert w.ndim == 4 and w.shape[2] == 1 and w.shape[3] == 1, w.shape
    return {"w": w[:, :, 0, 0].T.copy(), "b": _np(bias).copy()}


def _tapped(weight, bias) -> dict:
    w = _np(weight)
    assert w.ndim == 4 and w.shape[2] == 1, w.shape
    return {"w": w[:, :, 0, :].transpose(2, 1, 0).copy(),
            "b": _np(bias).copy()}


def import_state_dict(state_dict: Mapping[str, Any], cfg: ModelConfig
                      ) -> tuple[dict, dict]:
    """Reference ``gwnet.state_dict()`` -> (params, model_state)."""
    sd = dict(state_dict)
    n_layers = cfg.blocks * cfg.layers
    params: dict = {
        "start_conv": _dense(sd["start_conv.weight"],
                             sd["start_conv.bias"]),
        "end1": _dense(sd["end_conv_1.weight"], sd["end_conv_1.bias"]),
        "end2": _dense(sd["end_conv_2.weight"], sd["end_conv_2.bias"]),
    }
    if "nodevec1" in sd:
        params["nodevec1"] = _np(sd["nodevec1"]).copy()
        params["nodevec2"] = _np(sd["nodevec2"]).copy()

    layers = []
    bn_state = []
    for i in range(n_layers):
        layer = {
            "filter": _tapped(sd[f"filter_convs.{i}.weight"],
                              sd[f"filter_convs.{i}.bias"]),
            "gate": _tapped(sd[f"gate_convs.{i}.weight"],
                            sd[f"gate_convs.{i}.bias"]),
            "skip": _dense(sd[f"skip_convs.{i}.weight"],
                           sd[f"skip_convs.{i}.bias"]),
            "residual": _dense(sd[f"residual_convs.{i}.weight"],
                               sd[f"residual_convs.{i}.bias"]),
            "bn": {"scale": _np(sd[f"bn.{i}.weight"]).copy(),
                   "bias": _np(sd[f"bn.{i}.bias"]).copy()},
        }
        if f"gconv.{i}.mlp.mlp.weight" in sd:
            layer["gcn"] = _dense(sd[f"gconv.{i}.mlp.mlp.weight"],
                                  sd[f"gconv.{i}.mlp.mlp.bias"])
        layers.append(layer)
        bn_state.append({
            "mean": _np(sd[f"bn.{i}.running_mean"]).copy(),
            "var": _np(sd[f"bn.{i}.running_var"]).copy(),
        })
    params["layers"] = layers
    return params, {"bn": bn_state}


def export_state_dict(params: dict, model_state: dict,
                      cfg: ModelConfig) -> dict:
    """Our pytree -> reference-named numpy state dict (for round-trip tests
    and for loading our weights into the reference implementation)."""
    def dense(p):
        return {"weight": np.asarray(p["w"]).T[:, :, None, None],
                "bias": np.asarray(p["b"])}

    def tapped(p):
        w = np.asarray(p["w"])  # (k, in, out)
        return {"weight": w.transpose(2, 1, 0)[:, :, None, :],
                "bias": np.asarray(p["b"])}

    sd: dict = {}
    for name, key in (("start_conv", "start_conv"), ("end_conv_1", "end1"),
                      ("end_conv_2", "end2")):
        for k, v in dense(params[key]).items():
            sd[f"{name}.{k}"] = v
    if "nodevec1" in params:
        sd["nodevec1"] = np.asarray(params["nodevec1"])
        sd["nodevec2"] = np.asarray(params["nodevec2"])
    for i, layer in enumerate(params["layers"]):
        for mod, key, conv in (("filter_convs", "filter", tapped),
                               ("gate_convs", "gate", tapped),
                               ("skip_convs", "skip", dense),
                               ("residual_convs", "residual", dense)):
            for k, v in conv(layer[key]).items():
                sd[f"{mod}.{i}.{k}"] = v
        if "gcn" in layer:
            for k, v in dense(layer["gcn"]).items():
                sd[f"gconv.{i}.mlp.mlp.{k}"] = v
        sd[f"bn.{i}.weight"] = np.asarray(layer["bn"]["scale"])
        sd[f"bn.{i}.bias"] = np.asarray(layer["bn"]["bias"])
        sd[f"bn.{i}.running_mean"] = np.asarray(
            model_state["bn"][i]["mean"])
        sd[f"bn.{i}.running_var"] = np.asarray(model_state["bn"][i]["var"])
        sd[f"bn.{i}.num_batches_tracked"] = np.asarray(0)
    return sd


def load_pth(path: str, cfg: ModelConfig) -> tuple[dict, dict]:
    """Load a reference ``.pth`` checkpoint into (params, model_state)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return import_state_dict(sd, cfg)
