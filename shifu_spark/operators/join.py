"""Joins — the combo-model score assembly.

Reference: combo/PigDataJoin.java:45-133 generates a Pig COGROUP of N
score relations by uid, takes the first tuple per bag, and drops groups
missing any side — i.e. an N-way INNER equi-join with
first-value-per-key dedup. combo/DataJoinMapReducer.java is the same as
raw MapReduce.

Spark: chained ``df.join(..., on=uid, how='inner')``. Catalyst picks
broadcast vs sort-merge per side size (use ``F.broadcast`` to force when
a score table is known-small). Dedup-first-per-key is a row_number
window — kept optional since score files are normally unique per uid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_first_per_key(df: DataFrame, key: str, order_cols: list[str] | None = None) -> DataFrame:
    """Take one row per key (deterministic order — the reference takes the
    bag's first tuple, which is nondeterministic; we sort for testability)."""
    order = [F.col(c) for c in (order_cols or df.columns if order_cols is not None else df.columns)]
    w = Window.partitionBy(key).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def combo_join(tables: list[DataFrame], uid_col: str, prefixes: list[str] | None = None) -> DataFrame:
    """N-way inner join by uid with per-table column prefixes.

    Mirrors PigDataJoin's rename (`model_i::score` style) by prefixing
    non-key columns ``{prefix}_{col}``.
    """
    if prefixes is None:
        prefixes = [f"m{i}" for i in range(len(tables))]
    out: DataFrame | None = None
    for t, p in zip(tables, prefixes):
        renamed = t.select(
            F.col(uid_col),
            *[F.col(c).alias(f"{p}_{c}") for c in t.columns if c != uid_col],
        )
        out = renamed if out is None else out.join(renamed, uid_col, "inner")
    assert out is not None
    return out
