"""Youden-J comparison for the NB trigram-feature flag (r12 verdict
item 7): run the C175 PR curve at the sf1-equivalent corpus with
SPARK_GRAFT_NB_TRIGRAMS off and on (two subprocesses — the flag binds
at import), compute max J = max(recall - FPR) over the ladder, write
docs/NB_TRIGRAM_J.json.

Usage: python tools/measure_nb_trigrams.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys
sys.path.insert(0, %(root)r)
from kafka_clickhouse_implementation_spark.session import get_spark
from kafka_clickhouse_implementation_spark.registry import all_queries

spark = get_spark("nb-trigram-measure")
rows = all_queries()["q_nb_pr_curve"](spark, %(sf)r).collect()
out = [
    dict(thr=r.thr_nano, tp=r.tp, fp=r.fp, fn=r.fn, tn=r.tn) for r in rows
]
print("JROWS=" + json.dumps(out))
"""


def run_arm(sf_dir: str, trigrams: bool) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_NB_TRIGRAMS"] = "1" if trigrams else "0"
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD % {"root": ROOT, "sf": sf_dir}],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("JROWS=")]
    if not line:
        raise RuntimeError(proc.stderr[-4000:])
    rows = json.loads(line[0][len("JROWS="):])
    best = None
    for r in rows:
        pos = r["tp"] + r["fn"]
        neg = r["fp"] + r["tn"]
        if not pos or not neg:
            continue
        recall = r["tp"] / pos
        fpr = r["fp"] / neg
        j = recall - fpr
        if best is None or j > best["J"]:
            best = dict(
                thr_nano=r["thr"],
                recall=round(recall, 4),
                fpr=round(fpr, 4),
                J=round(j, 4),
            )
    return {"curve": rows, "best": best}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf1"
    off = run_arm(sf_dir, False)
    print("off:", off["best"], flush=True)
    on = run_arm(sf_dir, True)
    print("on: ", on["best"], flush=True)
    out = {
        "sf_dir": sf_dir,
        "unigram_bigram": off["best"],
        "with_char_trigrams": on["best"],
        "curve_off": off["curve"],
        "curve_on": on["curve"],
    }
    with open(os.path.join(ROOT, "docs", "NB_TRIGRAM_J.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"off_J": off["best"], "on_J": on["best"]}))


if __name__ == "__main__":
    main()
