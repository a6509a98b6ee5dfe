"""A/B decomposition of the flagship train step on TPU (differential timing).

Usage: python garage/decomp_bench.py
"""
from dataclasses import replace

from graph_wavenet_tpu.benchmarks import FLAGSHIP, bench_train_step

BF16 = replace(FLAGSHIP, dtype="bfloat16")

VARIANTS = {
    "bf16 full (bench.py config)": BF16,
    "bf16 no dropout": replace(BF16, dropout=0.0),
    "bf16 no adaptive adj": replace(BF16, addaptadj=False),
    "bf16 temporal-only": replace(BF16, gcn_bool=False, addaptadj=False),
    "fp32 full": FLAGSHIP,
}

for name, cfg in VARIANTS.items():
    r = bench_train_step(cfg, batch=64, seq=12, steps=60)
    print(f"{name:32s} {r['step_ms']:7.2f} ms/step  "
          f"{r['node_timesteps_per_s']/1e6:7.1f} M node-ts/s", flush=True)
