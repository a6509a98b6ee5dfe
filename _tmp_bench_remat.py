import time, numpy as np, jax, jax.numpy as jnp
from graph_wavenet_tpu.config import ModelConfig, TrainConfig
from graph_wavenet_tpu.data.scaler import StandardScaler
from graph_wavenet_tpu.train.engine import Engine

def bench(remat, dtype):
    cfg = ModelConfig(num_nodes=207, in_dim=2, out_dim=12, residual_channels=32,
                      dilation_channels=32, skip_channels=256, end_channels=512,
                      blocks=4, layers=2, gcn_bool=True, addaptadj=True,
                      n_supports=2, dtype=dtype, remat=remat)
    batch, seq = 64, 12
    engine = Engine(cfg, TrainConfig(), StandardScaler(54.0, 20.0))
    rng = np.random.default_rng(0)
    a = rng.random((2, 207, 207)).astype(np.float32)
    supports = [jnp.asarray(s / s.sum(-1, keepdims=True)) for s in a]
    x = jnp.asarray(rng.normal(size=(batch, seq, 207, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(batch, seq, 207, 2)).astype(np.float32) + 50.0)
    state = engine.state
    t0 = time.perf_counter()
    for _ in range(3):
        state, m = engine.train_step(state, x, y, supports)
    float(m["loss"])
    print(f"  compile+warmup {time.perf_counter()-t0:.1f}s", flush=True)
    def timed(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = engine.train_step(state, x, y, supports)
        float(m["loss"])
        return time.perf_counter() - t0
    dt = timed(90) - timed(30)
    print(f"remat={remat} dtype={dtype}: {dt/60*1e3:.2f} ms/step, "
          f"{batch*207*seq*60/dt/1e6:.1f}M node-ts/s", flush=True)

bench(False, "bfloat16")
bench(True, "bfloat16")
