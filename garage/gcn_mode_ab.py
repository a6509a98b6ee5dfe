"""In-process A/B of gcn dataflow modes + batch scaling on TPU.

Alternates modes in interleaved order so device warmth/noise cancels.
Usage: python garage/gcn_mode_ab.py
"""
from dataclasses import replace

from graph_wavenet_tpu.benchmarks import FLAGSHIP, bench_train_step

BF16 = replace(FLAGSHIP, dtype="bfloat16")

results = {}
for rep in range(3):
    for mode in ("stacked", "fused"):
        r = bench_train_step(replace(BF16, gcn_mode=mode), batch=64,
                             seq=12, steps=60)
        results.setdefault(mode, []).append(r["step_ms"])
for mode, times in results.items():
    print(f"{mode:8s} {min(times):6.2f} ms (best of {len(times)}): "
          f"{['%.2f' % t for t in times]}", flush=True)

for batch in (128, 256):
    r = bench_train_step(BF16, batch=batch, seq=12, steps=40)
    print(f"batch {batch}: {r['step_ms']:6.2f} ms  "
          f"{r['node_timesteps_per_s']/1e6:6.1f} M node-ts/s", flush=True)
