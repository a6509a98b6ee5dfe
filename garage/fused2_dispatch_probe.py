"""Probe the fused-order-2 dispatch boundary on real TPU hardware.

The fused kernel (``ops.pallas.block_diffusion.gathered_block_mix_flat2``)
falls back to chaining two single-hop kernels below a total-output-size
threshold because XLA:TPU places small custom-call outputs in scoped VMEM
and the fused call's two outputs overflow the 16 MiB scoped budget
(observed: "scoped allocation 18.00M, limit 16.00M"). The r4 advisor
flagged the original 64 MiB threshold as ~4x above the observed failure —
silently un-fusing mid-scale runs. This probe measures, per total-output
size:

  * whether the FORCED fused path compiles+runs (``GWT_FUSED2_DISPATCH=
    fused``),
  * fused vs chained step time (so the threshold can also be perf-honest:
    if chaining is FASTER at a size, falling back there is correct even
    if fused would compile).

Each size runs in-process; dispatch is a trace-time static, so both
branches retrace cleanly. Run on the chip:

    python garage/fused2_dispatch_probe.py [--out fig/fused2_probe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def banded_flat(nb: int, bs: int, rng) -> "object":
    from graph_wavenet_tpu.ops import block_sparse as B

    n = nb * bs
    a = np.zeros((n, n), np.float32)
    for i in range(nb):
        for j in (i - 1, i, i + 1):
            if 0 <= j < nb:
                a[j * bs:(j + 1) * bs, i * bs:(i + 1) * bs] = \
                    rng.random((bs, bs)).astype(np.float32) / (3 * bs)
    return B.as_fused2(B.as_flat_pallas(B.from_dense(a, block_size=bs)))


def time_mode(fused, x, mode: str, steps: int = 30, backward: bool = False):
    """(ok, ms) for one dispatch mode; ok=False carries the error head.

    ``backward`` also runs the VJP — the transpose chain uses the fused
    kernel WITH the ``add`` operand (3 streamed tiles), which is the
    variant the original scoped-VMEM failure was observed on. Median of
    3 differential timings (same methodology as benchmarks.py)."""
    import jax
    import jax.numpy as jnp

    os.environ["GWT_FUSED2_DISPATCH"] = mode

    if backward:
        def f(v):
            o1, o2 = fused.mix2_2d(v)
            return jnp.sum(jnp.sin(o1) + jnp.cos(o2))

        run1 = jax.grad(f)
    else:
        def run1(v):
            return fused.mix2_2d(v)

    try:
        out = run1(x)
        jax.block_until_ready(out)
    except Exception as e:  # compile-time placement failures land here
        return False, str(e).splitlines()[0][:160]

    def run_steps(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = run1(x)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    meas = []
    for _ in range(3):
        t1, t2 = run_steps(steps // 3), run_steps(steps)
        per = (t2 - t1) / (steps - steps // 3)
        meas.append(per if per > 0 else t2 / steps)
    return True, sorted(meas)[1] * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", "probe is only meaningful on TPU"
    rng = np.random.default_rng(0)
    rows = []
    # sweep total output bytes (2 outs, fp32) across the disputed range:
    # old threshold 64 MiB, observed failure 18 MiB total
    cases = [
        (2, 6144),    # the observed-failure shape: 18.0 MiB total
        (2, 4096),    # 8 MiB
        (2, 8192),    # 16 MiB
        (4, 4096),    # 16 MiB, more rows
        (4, 6144),    # 24 MiB
        (4, 8192),    # 32 MiB
        (8, 6144),    # 48 MiB
        (8, 8192),    # 64 MiB
        (16, 8192),   # 128 MiB
    ]
    for nb, r in cases:
        fused = banded_flat(nb, args.bs, rng)
        n = nb * args.bs
        x = jnp.asarray(rng.normal(size=(n, r)), jnp.float32)
        rp = r + (-r) % 128
        total_mb = 2 * nb * args.bs * rp * 4 / 2**20
        row = {"nb": nb, "r": r, "total_out_mb": round(total_mb, 1)}
        for tag, bwd in (("fwd", False), ("bwd", True)):
            ok_f, ms_f = time_mode(fused, x, "fused", args.steps, bwd)
            ok_c, ms_c = time_mode(fused, x, "chain", args.steps, bwd)
            row[f"fused_{tag}_ok"] = ok_f
            row[f"fused_{tag}_ms"] = round(ms_f, 3) if ok_f else ms_f
            row[f"chain_{tag}_ms"] = round(ms_c, 3) if ok_c else ms_c
            if ok_f and ok_c:
                row[f"{tag}_fused_speedup"] = round(ms_c / ms_f, 3)
        rows.append(row)
        print(row, flush=True)
        jax.clear_caches()
    os.environ.pop("GWT_FUSED2_DISPATCH", None)
    rec = {"device": jax.devices()[0].device_kind, "bs": args.bs,
           "rows": rows}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
