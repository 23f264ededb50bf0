"""Probabilistic sketches with DETERMINISTIC, oracle-checkable hashing.

Count-Min (Cormode & Muthukrishnan 2005): d independent hash rows of
width w; point estimate = min over rows of the hit counter. The sketch
BUILD is a bounded groupBy (d·w counters regardless of data size) — the
constant-memory heavy-hitter / frequency primitive for 100 TB streams
where an exact per-key groupBy's state would be unbounded.

Hashing here is the repo's standard md5-threshold machinery (row i's
hash = fold of the first 4 hex nibbles of md5('cms{i}|' || key)), so the
sketch contents are a pure function of the data — identical across
engines, reruns and partitionings, and mirrored exactly by the DuckDB
oracle (F.rand/xxhash layouts are not). Spark's native HLL
(approx_count_distinct) covers distinct counting; this adds the
frequency-sketch family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 32

_HEX = "0123456789abcdef"


def _nibble_fold_sql(h_sql: str, width: int) -> str:
    """16-bit value from the first 4 hex nibbles of ``h_sql`` modulo
    ``width`` — spelled in the SQL subset both engines parse identically
    (position(x IN y), substr)."""
    terms = " + ".join(
        f"(position(substr({h_sql}, {j + 1}, 1) IN '{_HEX}') - 1) * {16 ** (3 - j)}"
        for j in range(4)
    )
    return f"(({terms}) % {width})"


def cms_bucket_sql(key_sql: str, i: int, width: int = CMS_WIDTH) -> str:
    """Row-``i`` bucket for a key expression (engine-shared SQL; the
    md5/concat spelling below parses in both Spark SQL and DuckDB)."""
    h = f"md5(concat('cms{i}|', cast({key_sql} AS string)))"
    return _nibble_fold_sql(h, width)


def cms_bucket_expr(key_col: str, i: int, width: int = CMS_WIDTH) -> Column:
    return F.expr(cms_bucket_sql(key_col, i, width))


def cms_build_df(
    df: DataFrame, key_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Build the sketch: (row_i, bucket, cnt) — at most depth·width rows.

    ONE corpus pass: the d bucket ids compute in-row (posexplode of a
    d-slot array), then a bounded groupBy; the shuffle carries at most
    depth·width·n_tasks partial rows — constant in data size. That
    bound is the whole point of the sketch at scale."""
    buckets = F.array(*[cms_bucket_expr(key_col, i, width) for i in range(depth)])
    return (
        df.select(F.posexplode(buckets).alias("row_i", "bucket"))
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate_df(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for ``keys``: min over rows of the matching
    counter (the classic CMS upper bound: estimate >= true count,
    overestimate only from collisions). The sketch side is
    depth·width-sized, so it BROADCASTS; missing counters read as 0."""
    probes = keys.select(
        F.col(key_col),
        F.posexplode(
            F.array(*[cms_bucket_expr(key_col, i, width) for i in range(depth)])
        ).alias("row_i", "bucket"),
    )
    joined = probes.join(F.broadcast(cms), ["row_i", "bucket"], "left").select(
        key_col, F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("cms_estimate"))
