import time, numpy as np, jax, jax.numpy as jnp
t0=time.perf_counter()
from graph_wavenet_tpu.config import DataConfig, ModelConfig, TrainConfig
from graph_wavenet_tpu.data.synthetic import load_dataset_syn, stack_support_splits
from graph_wavenet_tpu.train.engine import Engine, cluster_mean_projector
print(f"imports {time.perf_counter()-t0:.1f}s", flush=True)

t0=time.perf_counter()
dc = DataConfig(dataset="syn", num_nodes=80, seq_length=48, n_train=4,
                n_valid=2, n_test=1, num_timestep=200, same_g=False)
data, adjs, F_t, G = load_dataset_syn(dc, batch_size=32, seed=0)
print(f"datagen {time.perf_counter()-t0:.1f}s  F_t={F_t}", flush=True)

cfg = ModelConfig(num_nodes=80, out_dim=48, blocks=4, layers=2,
                  skip_channels=256, end_channels=512, n_supports=2,
                  start_dilation=4)
e = Engine(cfg, TrainConfig(), data["scaler"], diff_g=True)
sup = stack_support_splits(adjs, 4, 1)
sup_t = [jnp.asarray(s) for s in sup["train"]]
proj = jnp.asarray(np.stack([cluster_mean_projector(g.community_labels, 5)
                             for g in G["train"]]))
x, y, idx = next(iter(data["train_loader"].get_iterator()))
xi = jnp.asarray(x); yi = jnp.asarray(y); idxi = jnp.asarray(idx)
bs = [s[idxi] for s in sup_t]
t0=time.perf_counter()
state, m = e.train_step_syn(e.state, xi, yi, bs, proj[idxi], F_t)
print(f"compile+first step {time.perf_counter()-t0:.1f}s loss={float(m['loss']):.4f}", flush=True)
t0=time.perf_counter()
n=20
for _ in range(n):
    state, m = e.train_step_syn(state, xi, yi, bs, proj[idxi], F_t)
float(m['loss'])
print(f"steady {(time.perf_counter()-t0)/n*1e3:.1f} ms/step", flush=True)
