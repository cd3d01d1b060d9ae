#!/usr/bin/env python
"""IVF-SQ8 recall probe (round 15 — the measured follow-up the C193
recorded negative asked for): the C193 sweep showed PQ's 32-bit codes
cap drift recall BELOW the probed-list ceiling — widening nprobe
DILUTES the shortlist because noisy ADC scores displace true neighbors
before the exact re-rank sees them. This probe runs the SAME drift
corpus and sweep grid through the C196 IVF-SQ8 search and, per
(books, nprobe) cell, also measures the PROBED-LIST CEILING (exact
re-rank of every probed candidate — what a perfect quantizer would
score), so the artifact decomposes recall loss into
  routing loss   = 1 - ceiling            (coarse quantizer's share)
  quantizer loss = ceiling - recall       (code noise's share)
for both quantizer families side by side (PQ numbers live in
docs/ANN_DRIFT.json from the same corpus/grid).

stale    = coarse books + SQ dim-stats trained on the ORIGINAL corpus
           only, coding/searching the combined corpus (the maintained-
           index-after-drift state; out-of-bounds dims saturate via
           the clamp — FAISS SQ semantics);
retrained= both trained on the combined corpus (the C188 rebuild).

Usage: python tools/ann_sq8_probe.py [sf_dir] [out_json]
Writes docs/ANN_SQ8.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafka_clickhouse_implementation_spark.session import get_spark  # noqa: E402

from ann_drift_probe import (  # noqa: E402
    SPAN,
    SWEEP_NPROBE,
    SWEEP_SHORT_R,
    RECALL_KS,
    build_combined,
    recalls,
)

CEILING_SHORT_R = 1_000_000_000  # short_r past every candidate list


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "docs/ANN_SQ8.json"
    spark = get_spark("ann_sq8_probe")

    from kafka_clickhouse_implementation_spark.operators.clustering import (
        ITERS,
        Q_EVERY,
        _code_points,
        _dist2_arrays,
        _eq_arrays,
        _lloyd_arrays,
        _pts_long,
        _sq8_codes,
        _sq8_search,
        _sq8_train,
        ivf_k,
    )

    drift = build_combined(spark, src)
    eq_all = _eq_arrays(spark, drift).localCheckpoint()
    pts_all = _pts_long(spark, drift).localCheckpoint()
    kmax = max(RECALL_KS)

    # exact brute-force truth (identical to ann_drift_probe)
    q = eq_all.filter(F.col("vec_id") % Q_EVERY == 0).select(
        F.col("vec_id").alias("query_id"), F.col("eq").alias("ea")
    )
    pairs = q.join(
        eq_all.select(
            F.col("vec_id").alias("neighbor_id"), F.col("eq").alias("eb")
        )
    ).filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", _dist2_arrays("ea", "eb").alias("d")
    )
    truth = (
        pairs.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d", "neighbor_id")
            ),
        )
        .filter(F.col("rk") <= kmax)
        .select("query_id", "neighbor_id", "rk")
        .localCheckpoint()
    )

    artifact: dict = {
        "source": src,
        "span": SPAN,
        "recall_ks": list(RECALL_KS),
        "sweep_nprobe": list(SWEEP_NPROBE),
        "sweep_short_r": list(SWEEP_SHORT_R),
        "quantizer": "SQ8 (C196)",
        "pq_twin_artifact": "docs/ANN_DRIFT.json",
    }

    def run_books(label: str, train_dir: str) -> None:
        eq_train = _eq_arrays(spark, train_dir).localCheckpoint()
        k = ivf_k(eq_train.count())
        _asg_train, asg_carr, _ = _lloyd_arrays(spark, eq_train, k, ITERS)
        # every vector of the COMBINED corpus assigned/coded by these books
        asg = _code_points(eq_all, asg_carr).select("vec_id", "cid").localCheckpoint()
        dimstats = _sq8_train(_pts_long(spark, train_dir)).localCheckpoint()
        codes = _sq8_codes(pts_all, dimstats).localCheckpoint()
        cells = {}
        for nprobe in SWEEP_NPROBE:
            for short_r in SWEEP_SHORT_R:
                res = _sq8_search(
                    spark, eq_all, pts_all, asg_carr, asg, codes, dimstats,
                    nprobe=nprobe, short_r=short_r, topk=kmax,
                )
                cells[f"nprobe{nprobe}_short{short_r}"] = recalls(
                    spark, res, truth
                )
            # probed-list ceiling: exact re-rank of EVERY probed
            # candidate — the recall a zero-noise quantizer would get
            res = _sq8_search(
                spark, eq_all, pts_all, asg_carr, asg, codes, dimstats,
                nprobe=nprobe, short_r=CEILING_SHORT_R, topk=kmax,
            )
            cells[f"nprobe{nprobe}_ceiling"] = recalls(spark, res, truth)
        artifact[label] = {"k_lists": k, "sweep": cells}

    run_books("stale_books", src)
    run_books("retrained_books", drift)

    artifact["note"] = (
        "Same corpus/grid as docs/ANN_DRIFT.json (PQ). nprobeN_ceiling"
        " = exact re-rank of every probed candidate (short_r unbounded)"
        " — the coarse-routing bound; an SQ8 cell at or near its"
        " ceiling means the 8-bit-per-dim codes rank candidates"
        " essentially exactly, i.e. the C193 recorded negative's"
        " residual gap was quantization noise, and what remains is"
        " routing (nprobe/k geometry), which more probes DO now buy."
    )
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
