"""Three-arm timing for nb_scores' shared-feature pinning strategy
(r12 verdict item 3): eager localCheckpoint (the r11 choice) vs lazy
persist vs no pinning, on the two heaviest NB consumers. Writes
docs/NB_CHECKPOINT.json.

Usage: python tools/measure_nb_checkpoint.py [sf_dir ...]
Defaults to sf0.1; pass /root/testdata/sf1-equivalent dirs to add the
sf1 arm. Each (arm, query, sf) cell is the min of RUNS runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = 2
QUERIES = ["q_nb_quality", "q_corpus_clean_nb"]
ARMS = ["checkpoint", "persist", "none"]


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    from kafka_clickhouse_implementation_spark.session import get_spark
    from kafka_clickhouse_implementation_spark.operators import nb_quality
    from kafka_clickhouse_implementation_spark.registry import all_queries

    spark = get_spark("nb-pin-measure")
    qs = all_queries()
    out: dict[str, dict] = {"runs_per_cell": RUNS, "cells": {}}
    # warm-up: one uncounted pass so page cache / codegen don't bias arm 1
    for sf_dir in sf_dirs:
        qs["q_nb_quality"](spark, sf_dir).collect()
    for sf_dir in sf_dirs:
        for arm in ARMS:
            nb_quality.NB_PIN = arm
            for q in QUERIES:
                best = None
                for _ in range(RUNS):
                    t0 = time.time()
                    qs[q](spark, sf_dir).collect()
                    dt = time.time() - t0
                    best = dt if best is None or dt < best else best
                    spark.catalog.clearCache()
                out["cells"][f"{os.path.basename(sf_dir)}/{arm}/{q}"] = round(
                    best, 3
                )
                print(f"{sf_dir} {arm:10s} {q:20s} {best:.2f}s", flush=True)
    os.makedirs("docs", exist_ok=True)
    with open("docs/NB_CHECKPOINT.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
