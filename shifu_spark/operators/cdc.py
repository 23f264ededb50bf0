"""Change-data-capture application: batch MERGE (upsert/delete) and
SCD Type-2 validity-interval history.

The warehouse-maintenance complement of the streaming gold-table upsert
(streaming/ops.start_gold_table_foreach_batch): the same latest-state
semantics expressed as a pure batch plan — union the snapshot with the
change set, keep the highest-sequence row per key, drop deletes.  The
reference maintains its model/eval state via full rewrites (e.g.
core/processor/*Processor.java persisting whole ModelConfig/ColumnConfig
snapshots); CDC merge is the incremental form a 100 TB table needs.

Scale shape: one hash shuffle on the key for the row_number window —
partition size is rows-per-key (snapshot row + its changes), never
data-scale.  SCD2 is one lead() window per key over the change stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_merge(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a change set to a snapshot: the latest change per key wins
    (ties broken by an explicit destructiveness rank — a same-sequence D beats U),
    'D' rows delete the key, 'U'/'I' rows replace it.  The snapshot
    enters the union as sequence 0 ('I'), so unchanged keys survive.

    ``changes`` must carry the snapshot's payload columns plus
    (seq_col >= 1, op_col in {'U','I','D'}).  Returns the merged
    snapshot (payload columns only).
    """
    payload = [c for c in snapshot.columns]
    snap = snapshot.select(
        *payload, F.lit(0).cast("long").alias(seq_col), F.lit("I").alias(op_col)
    )
    ch = changes.select(*payload, F.col(seq_col).cast("long"), F.col(op_col))
    # explicit destructiveness rank: lexicographic op order would put
    # 'U' above 'D' and resurrect a same-sequence delete
    op_rank = (
        F.when(F.col(op_col) == "D", 2).when(F.col(op_col) == "U", 1).otherwise(0)
    )
    # final payload tiebreak: two changes sharing (key, seq, op) but
    # differing in payload would otherwise make row_number pick an
    # arbitrary winner — nondeterministic across runs/engines.  Ordering
    # by the payload columns (desc, nulls last) fixes one winner.
    payload_ties = [F.col(c).desc_nulls_last() for c in payload if c != key]
    w = Window.partitionBy(key).orderBy(F.desc(seq_col), op_rank.desc(), *payload_ties)
    return (
        snap.unionAll(ch)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != "D"))
        .select(*payload)
    )


def scd2_intervals(
    changes: DataFrame,
    key: str,
    ts_col: str = "ts",
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """Build Slowly-Changing-Dimension Type-2 history from a change
    stream: each change row becomes a validity interval
    [valid_from, valid_to) with valid_to = the key's next change (null
    = still current), plus an is_current flag.  One lead() window per
    key; ties on ts are ordered by the attribute columns so the history
    is deterministic under same-instant changes.

    A NULL-ts change sorts FIRST (pinned explicitly — Spark's asc
    default, but DuckDB/ANSI default NULLS LAST, so a mirrored oracle
    must spell ``NULLS FIRST`` if NULL timestamps can reach the window;
    the registry query can't produce one in a multi-row partition).
    """
    attrs = attr_cols or [c for c in changes.columns if c not in (key, ts_col)]
    w = Window.partitionBy(key).orderBy(
        F.col(ts_col).asc_nulls_first(), *[F.col(a) for a in attrs]
    )
    return changes.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w).alias("valid_to"),
        F.lead(F.col(ts_col)).over(w).isNull().alias("is_current"),
    )
