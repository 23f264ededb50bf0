#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run queries against
their DuckDB oracles at the canonical gate dataset and print a BAD list.

Usage:
  python tools/gate_replica.py                  # first 50 (the gate window)
  python tools/gate_replica.py --all            # every registry query
  python tools/gate_replica.py --only a,b,c     # named queries

Run with stdout redirected and stderr dropped (Spark progress bars
corrupt grep-filtered output):
  python tools/gate_replica.py > /tmp/gate.out 2>/dev/null
The LAST line is the machine-readable verdict: ``BAD: []`` means green.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="run every registry query")
    ap.add_argument("--only", default="", help="comma-separated query names")
    ap.add_argument("--sf-dir", default=None, help="dataset dir (default: gate)")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from shifu_spark import get_spark
    from shifu_spark.queries import GATE_SF_DIR
    from tests.oracle import compare

    sf_dir = args.sf_dir or GATE_SF_DIR
    spark = get_spark("gate_replica")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if args.only:
        names = [n for n in args.only.split(",") if n]
    elif args.all:
        names = list(qs)
    else:
        names = list(qs)[:50]

    bad: list[tuple[str, object]] = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            sql = oracles.get(name)
            if sql is None:
                n = len(sdf.collect())
                print(name, "rows-only", n, flush=True)
                if n <= 0:
                    bad.append((name, "zero rows"))
                continue
            res = compare(sdf, con, sql, name)
            print(name, "PASS" if not res else "FAIL", flush=True)
            if res:
                bad.append((name, res[:2]))
        except Exception as ex:  # noqa: BLE001 — a gate replica must not die mid-list
            traceback.print_exc()
            bad.append((name, repr(ex)[:200]))
    print("BAD:", bad)
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
