"""CLI: run declared queries by name.

    python -m kafka_clickhouse_implementation_spark list
    python -m kafka_clickhouse_implementation_spark run q_mv_daily [--sf-dir DIR] [--explain] [-n 20]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="kafka_clickhouse_implementation_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list declared queries")
    runp = sub.add_parser("run", help="run a declared query")
    runp.add_argument("name")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--explain", action="store_true", help="print the physical plan")
    runp.add_argument("-n", type=int, default=20, help="rows to show")
    args = p.parse_args(argv)

    from kafka_clickhouse_implementation_spark.registry import all_oracles, all_queries

    qs = all_queries()
    if args.cmd == "list":
        oracles = all_oracles()
        for name in sorted(qs):
            kind = "oracle" if name in oracles else "rows-only"
            print(f"{name:28s} [{kind}]  {qs[name].__doc__.strip().splitlines()[0]}")
        return 0

    if args.name not in qs:
        print(f"unknown query {args.name!r}; try `list`", file=sys.stderr)
        return 2
    from kafka_clickhouse_implementation_spark.session import get_spark

    spark = get_spark(f"cli:{args.name}")
    t0 = time.time()
    df = qs[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.n, truncate=False)
    print(f"[{time.time() - t0:.2f}s]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
