"""Youden-J comparison for the NB 8192-bucket flag (r13 verdict item
8): run the C175 PR curve at the sf1-equivalent corpus with
SPARK_GRAFT_NB_BUCKETS=4096 and =8192 (two subprocesses — the flag
binds at import), compute max J = max(recall - FPR) over the ladder,
write docs/NB_BUCKETS_J.json. Same protocol as measure_nb_trigrams.py.

Usage: python tools/measure_nb_buckets.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from measure_nb_trigrams import _CHILD  # noqa: E402  (shared child body)

import subprocess  # noqa: E402


def run_arm(sf_dir: str, buckets: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_NB_BUCKETS"] = str(buckets)
    env.pop("SPARK_GRAFT_NB_TRIGRAMS", None)
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
    b4k = run_arm(sf_dir, 4096)
    print("4096:", b4k["best"], flush=True)
    b8k = run_arm(sf_dir, 8192)
    print("8192:", b8k["best"], flush=True)
    out = {
        "sf_dir": sf_dir,
        "buckets_4096": b4k["best"],
        "buckets_8192": b8k["best"],
        "curve_4096": b4k["curve"],
        "curve_8192": b8k["curve"],
    }
    with open(os.path.join(ROOT, "docs", "NB_BUCKETS_J.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"J_4096": b4k["best"], "J_8192": b8k["best"]}))


if __name__ == "__main__":
    main()
