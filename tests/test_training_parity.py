"""Multi-step TRAINING trajectory parity vs the independent torch twin.

Forward parity (test_model_parity) pins a single apply; this pins the whole
training semantics chain of the reference trainer (`/root/reference/
engine.py:41-58` + `train.py:244-251`): engine left-pad by one step, forward
with train-mode BatchNorm, scaler inverse-transform, masked MAE with
null_val=0.0, global-norm gradient clip at 5, Adam with L2 weight decay —
run for several optimizer steps from identical weights on identical batches,
comparing the per-step loss trajectory and final parameters.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from graph_wavenet_tpu.config import TrainConfig
from graph_wavenet_tpu.data.scaler import StandardScaler
from graph_wavenet_tpu.train.engine import Engine

from test_model_parity import (
    N_NODES,
    TorchGWNet,
    load_params_into_torch,
    make_supports,
    small_cfg,
)

N_STEPS = 10
BATCH = 8
SEQ = 12


def torch_masked_mae(preds, labels, null_val=0.0):
    """Reference masked MAE (`/root/reference/Utils/util.py:527-538`)."""
    mask = (labels != null_val).float()
    mask = mask / mask.mean()
    mask = torch.where(torch.isnan(mask), torch.zeros_like(mask), mask)
    loss = torch.abs(preds - labels) * mask
    loss = torch.where(torch.isnan(loss), torch.zeros_like(loss), loss)
    return loss.mean()


@pytest.mark.slow
def test_training_trajectory_matches_torch(rng):
    cfg = small_cfg(gcn_bool=True, addaptadj=True)
    scaler = StandardScaler(mean=31.0, std=9.5)
    tc = TrainConfig(learning_rate=1e-3, weight_decay=1e-4, grad_clip=5.0)

    # batches: standardized inputs, raw-unit targets with some exact zeros
    # (missing sensors) to exercise the null mask
    xs = rng.normal(size=(N_STEPS, BATCH, SEQ, N_NODES, 2)).astype(np.float32)
    ys = (rng.normal(size=(N_STEPS, BATCH, SEQ, N_NODES, 2)) * 9.5
          + 31.0).astype(np.float32)
    ys[:, :, :, :3, 0] = 0.0
    supports = make_supports(rng, cfg.n_supports)

    engine = Engine(cfg, tc, scaler, seed=3)
    state = engine.state
    # snapshot initial weights on host BEFORE training (train_step donates
    # its input state, so the initial device buffers are consumed)
    import jax
    init_params = jax.tree.map(np.asarray, state.params)
    init_ms = jax.tree.map(np.asarray, state.model_state)
    sup_j = [jnp.asarray(a) for a in supports]
    losses_j = []
    for s in range(N_STEPS):
        state, metrics = engine.train_step(
            state, jnp.asarray(xs[s]), jnp.asarray(ys[s]), sup_j)
        losses_j.append(float(metrics["loss"]))

    # torch twin from the SAME initial weights; nodevecs as trainable
    # Parameters (the reference trains them, `model.py:117-118` + Adam over
    # model.parameters() at `engine.py:33`)
    model = TorchGWNet(cfg)
    load_params_into_torch(model, init_params, init_ms)
    model.nodevec1 = torch.nn.Parameter(model.nodevec1)
    model.nodevec2 = torch.nn.Parameter(model.nodevec2)
    params = list(model.parameters())  # includes the registered nodevecs
    opt = torch.optim.Adam(params, lr=1e-3, weight_decay=1e-4)
    sup_t = [torch.tensor(a) for a in supports]

    model.train()
    losses_t = []
    for s in range(N_STEPS):
        x = torch.tensor(xs[s].transpose(0, 3, 2, 1))  # (B, C, N, T)
        x = F.pad(x, (1, 0, 0, 0))                     # engine.py:44
        real = torch.tensor(ys[s][..., 0].transpose(0, 2, 1)).unsqueeze(1)
        out = model(x, sup_t)                          # (B, out_dim, N, 1)
        predict = out.transpose(1, 3) * 9.5 + 31.0     # engine.py:46-49
        loss = torch_masked_mae(predict, real, 0.0)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params, 5.0)    # engine.py:53-54
        opt.step()
        losses_t.append(float(loss.detach()))

    np.testing.assert_allclose(losses_j, losses_t, rtol=5e-4, atol=5e-4)

    # final parameters agree after N_STEPS of optimization
    nv1_j = np.asarray(state.params["nodevec1"])
    np.testing.assert_allclose(nv1_j, model.nodevec1.detach().numpy(),
                               rtol=1e-3, atol=1e-4)
    end2_j = np.asarray(state.params["end2"]["w"])
    np.testing.assert_allclose(
        end2_j, model.end2.weight.detach().numpy()[:, :, 0, 0].T,
        rtol=1e-3, atol=1e-4)
