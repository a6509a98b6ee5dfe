import time, dataclasses, numpy as np, jax, jax.numpy as jnp
from graph_wavenet_tpu.benchmarks import CONFIGS, bench_train_step
cfg = CONFIGS["syn-5k-nodes"]
for batch, seq in ((4, 12), (8, 12)):
    try:
        r = bench_train_step(cfg, batch=batch, seq=seq, steps=10, warmup=2)
        print(f"5120 nodes batch={batch}: {r['step_ms']:.1f} ms/step, "
              f"{r['node_timesteps_per_s']:.3e} node-ts/s", flush=True)
    except Exception as e:
        print(f"batch={batch} failed: {str(e)[:200]}", flush=True)
# pems-bay config too
r = bench_train_step(CONFIGS["pems-bay-full"], batch=64, seq=12, steps=30, warmup=3)
print(f"pems-bay 325 nodes batch=64: {r['step_ms']:.2f} ms/step, "
      f"{r['node_timesteps_per_s']:.3e} node-ts/s", flush=True)
