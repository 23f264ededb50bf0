"""Local replica of the driver's DuckDB-oracle comparison.

For each (queries()[name], oracle_sql()[name]) pair: run the Spark query
and the DuckDB SQL on the same parquet tables, then compare row count,
column names, and order-insensitive values (columns sorted by name, rows
sorted) — mirroring the driver's CORRECTNESS gate so failures show up
locally first.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_cell(v):
    """Type-tagged normalization mirroring the driver's *typed* value hash.

    int vs float cells must NOT compare equal (Python 0 == 0.0 hid the
    bin_avg_score DOUBLE-vs-BIGINT mismatch in round 1) — so every numeric
    cell carries its type class in the normalized form."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        # driver-style: compare at ~9 significant digits to absorb fp noise
        return ("float", float(f"{v:.9g}"))
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, (list, tuple)):
        # recurse so array cells get the same typed/9-sig-digit treatment
        # as scalars — raw list equality would let an int-vs-double
        # element class mismatch pass (0 == 0.0) and fp noise fail
        return ("list", tuple(_norm_cell(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _norm_cell(x)) for k, x in v.items())))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def compare(spark_df, con, sql: str, name: str = "?") -> list[str]:
    """Return list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sp_rows = spark_df.collect()
    sp_cols = sorted(spark_df.columns)
    oc = con.sql(sql)
    ora_cols_raw = list(oc.columns)
    ora_rows = oc.fetchall()
    ora_cols = sorted(ora_cols_raw)

    if sp_cols != ora_cols:
        problems.append(f"{name}: schema mismatch spark={sp_cols} oracle={ora_cols}")
        return problems
    if len(sp_rows) != len(ora_rows):
        problems.append(f"{name}: row count spark={len(sp_rows)} oracle={len(ora_rows)}")
        return problems

    sidx = [spark_df.columns.index(c) for c in sp_cols]
    oidx = [ora_cols_raw.index(c) for c in sp_cols]
    s_sorted = sorted((tuple(_norm_cell(r[i]) for i in sidx) for r in sp_rows), key=repr)
    o_sorted = sorted((tuple(_norm_cell(r[i]) for i in oidx) for r in ora_rows), key=repr)
    for i, (a, b) in enumerate(zip(s_sorted, o_sorted)):
        if a != b:
            problems.append(f"{name}: row {i} differs\n  spark ={a}\n  oracle={b}")
            if len(problems) > 5:
                break
    return problems
