import time, dataclasses
import numpy as np, jax, jax.numpy as jnp
from graph_wavenet_tpu.config import ModelConfig, TrainConfig
from graph_wavenet_tpu.data.scaler import StandardScaler
from graph_wavenet_tpu.train.engine import Engine

def timed_steps(engine, state, x, y, sup, n):
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = engine.train_step(state, x, y, sup)
    float(metrics["loss"])
    return time.perf_counter() - t0, state

def bench_train(cfg, label):
    engine = Engine(cfg, TrainConfig(), StandardScaler(54.0, 20.0))
    rng = np.random.default_rng(0)
    a = rng.random((2, cfg.num_nodes, cfg.num_nodes)).astype(np.float32)
    sup = [jnp.asarray(s/s.sum(-1,keepdims=True)) for s in a] if cfg.gcn_bool else None
    x = jnp.asarray(rng.normal(size=(64,12,cfg.num_nodes,2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(64,12,cfg.num_nodes,2)).astype(np.float32)+50)
    state = engine.state
    for _ in range(3): state, m = engine.train_step(state, x, y, sup)
    float(m["loss"])
    d1, state = timed_steps(engine, state, x, y, sup, 30)
    d2, state = timed_steps(engine, state, x, y, sup, 90)
    ms = (d2-d1)/60*1e3
    print(f"{label}: {ms:.2f} ms/step", flush=True)
    return ms

base = ModelConfig(num_nodes=207, out_dim=12, blocks=4, layers=2,
                   skip_channels=256, end_channels=512, n_supports=2)
bench_train(base, "full dropout0.3")
bench_train(dataclasses.replace(base, dropout=0.0), "full dropout0")
bench_train(dataclasses.replace(base, gcn_bool=False, addaptadj=False), "temporal-only")
bench_train(dataclasses.replace(base, addaptadj=False), "no-adapt")
# eval step cost
engine = Engine(base, TrainConfig(), StandardScaler(54.,20.))
rng = np.random.default_rng(0)
a = rng.random((2,207,207)).astype(np.float32)
sup=[jnp.asarray(s/s.sum(-1,keepdims=True)) for s in a]
x = jnp.asarray(rng.normal(size=(64,12,207,2)).astype(np.float32))
y = jnp.asarray(rng.normal(size=(64,12,207,2)).astype(np.float32)+50)
m = engine.eval_step(engine.state, x, y, sup); float(m["loss"])
def te(n):
    t0=time.perf_counter()
    for _ in range(n): m = engine.eval_step(engine.state, x, y, sup)
    float(m["loss"]); return time.perf_counter()-t0
d=te(90)-te(30)
print(f"eval step: {d/60*1e3:.2f} ms/step", flush=True)
