#!/usr/bin/env python
"""Upsert read-side cost probe — the round-12 verdict's optional-depth
item: put a NUMBER on how the versioned-upsert table's read cost grows
as row versions accumulate, and what compaction buys back, so the
"compaction runs off-peak" cadence claim in plans/upsert.py carries
measurement the way PROBE_10M.json backs the ANN claims.

Setup: N_KEYS keys get an initial full write (wave 0), then WAVES-1
update waves each re-versioning UPDATE_FRAC of the keys (deterministic
key % slice — the steady-state shape of the C168/C170/C178 maintained
indexes, where per-trigger writes are the changed keys only). After
every wave the probe times read_latest (the latest-per-key window rank
over ALL accumulated versions — the FINAL-read analogue), then runs
compact_versions and times the read again.

Usage: python tools/upsert_cost_probe.py [out_json]
Writes docs/UPSERT_COST.json. Deterministic; ~1 minute on local[32].
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kafka_clickhouse_implementation_spark.plans.upsert import (  # noqa: E402
    append_versions,
    compact_versions,
    read_latest,
)
from kafka_clickhouse_implementation_spark.session import get_spark  # noqa: E402

N_KEYS = 2_000_000
WAVES = 9  # wave 0 full + 8 update waves
UPDATE_FRAC = 4  # each update wave re-versions 1/UPDATE_FRAC of keys


def timed_read(spark, path: str, reps: int = 3) -> tuple[float, int]:
    best = float("inf")
    n = 0
    for _ in range(reps):
        t0 = time.monotonic()
        n = read_latest(spark, path, ("key",), "version").count()
        best = min(best, time.monotonic() - t0)
    return round(best, 2), n


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "docs/UPSERT_COST.json"
    path = "/tmp/spark_graft_scale/upsert_cost_table"
    shutil.rmtree(path, ignore_errors=True)

    spark = get_spark("upsert_cost_probe")
    keys = spark.range(N_KEYS).select(F.col("id").alias("key"))

    waves = []
    for v in range(WAVES):
        w = keys if v == 0 else keys.filter(
            (F.col("key") + v) % UPDATE_FRAC == 0
        )
        append_versions(
            w.select(
                "key",
                F.lit(v).cast("long").alias("version"),
                (F.col("key") * 31 + v).cast("long").alias("payload"),
            ),
            path,
        )
        sec, n_latest = timed_read(spark, path)
        waves.append(
            {
                "wave": v,
                "rows_total": spark.read.parquet(path).count(),
                "n_latest": n_latest,
                "read_latest_sec": sec,
            }
        )

    pre_files = len(glob.glob(os.path.join(path, "*.parquet")))
    t0 = time.monotonic()
    compact_versions(spark, path, ("key",), "version")
    compact_sec = round(time.monotonic() - t0, 2)
    post_sec, post_latest = timed_read(spark, path)
    artifact = {
        "n_keys": N_KEYS,
        "waves": WAVES,
        "update_frac": f"1/{UPDATE_FRAC}",
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "per_wave": waves,
        "pre_compact": {
            "rows_total": waves[-1]["rows_total"],
            "files": pre_files,
            "read_latest_sec": waves[-1]["read_latest_sec"],
        },
        "compact_sec": compact_sec,
        "post_compact": {
            "rows_total": spark.read.parquet(path).count(),
            "files": len(glob.glob(os.path.join(path, "*.parquet"))),
            "read_latest_sec": post_sec,
            "n_latest": post_latest,
        },
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
