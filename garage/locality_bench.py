"""Measure the block-locality lever (VERDICT r1 #2): 41k-node block-sparse
train step on a real spatial k-NN graph under RCM ordering, vs the round-1
random-block baseline; plus the same-graph identity-vs-RCM A/B at 5120
nodes (identity at 41k is block-dense — it does not fit, which is itself
the point).

Run on the TPU host: python garage/locality_bench.py
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from graph_wavenet_tpu.benchmarks import bench_sparse_train_step  # noqa: E402


def main() -> None:
    cases = [
        # the production configuration first (flat live-block + best
        # ordering), then the A/B axes: padded-vs-flat, rcm-vs-hilbert,
        # rect, and the round-1 random-block baseline
        dict(n_nodes=40960, form="block-flat", graph="spatial",
             ordering="best"),
        dict(n_nodes=40960, form="block-pallas", graph="spatial",
             ordering="best"),
        dict(n_nodes=40960, form="block-flat", graph="spatial",
             ordering="rcm"),
        dict(n_nodes=40960, form="block-rect", graph="spatial",
             ordering="best"),
        dict(n_nodes=40960, form="block-flat", graph="random"),
        dict(n_nodes=5120, form="block-flat", graph="spatial",
             ordering="best"),
    ]
    for case in cases:
        r = bench_sparse_train_step(**case)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
