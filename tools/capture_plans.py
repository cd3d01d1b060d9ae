"""Capture .explain("formatted") output for declared queries into
plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence the
judge checks plan claims against — guide §7.2).

Usage: python tools/capture_plans.py TAG SUFFIX [sf_dir] QUERY [QUERY...]
e.g.:  python tools/capture_plans.py r15 before /root/testdata/sf0.1 q_ann_ivfpq
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_clickhouse_implementation_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    args = sys.argv[3:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
