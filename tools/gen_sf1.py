#!/usr/bin/env python
"""Rebuild the /tmp/sf1 scale-proof dataset: 10x sf0.1 with shifted keys
and per-replica-perturbed document text (used by
BENCH_sf1_scaleproof.json; see NOTES.md round-5 item 12 — the replica
construction deliberately plants 10-way near-dup clusters, which makes
the dedup family a stress case, not a plan regression).

Usage: python tools/gen_sf1.py [out_dir=/tmp/sf1]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    src = "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql("PRAGMA threads=8")
    con.sql(f"""
COPY (SELECT * REPLACE (l_orderkey + r*10000000 AS l_orderkey)
      FROM read_parquet('{src}/lineitem.parquet'),
           (SELECT unnest(range(10)) AS r)) TO '{out}/lineitem.parquet' (FORMAT parquet)
""")
    con.sql(f"""
COPY (SELECT doc_id + r*5000 AS doc_id,
             text || ' rep' || r AS text,
             lang,
             source,
             length(text || ' rep' || r) AS n_chars
      FROM read_parquet('{src}/documents.parquet'),
           (SELECT unnest(range(10)) AS r)) TO '{out}/documents.parquet' (FORMAT parquet)
""")
    con.sql(f"""
COPY (SELECT * REPLACE (o_orderkey + r*10000000 AS o_orderkey)
      FROM read_parquet('{src}/orders.parquet'),
           (SELECT unnest(range(10)) AS r)) TO '{out}/orders.parquet' (FORMAT parquet)
""")
    for t in ["region", "nation", "customer", "supplier", "part", "events", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    for t in ["lineitem", "documents", "orders"]:
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
