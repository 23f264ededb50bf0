"""Physical-plan inspection — the plan-regression toolkit.

The reference hand-tunes its execution (reducer counts, in-mapper
combining, salted keys — SURVEY §4); on Spark those properties are
Catalyst's job, but they can silently regress when an operator is
rewritten. These helpers read the executed plan so tests can pin the
plan shape an operator is supposed to have:

    assert_pushed_filters(df, ["l_shipdate"])   # filter reached the scan
    assert count_shuffles(df) <= 2              # agg = one exchange + AQE read
    assert has_broadcast_join(df)               # dim side stayed broadcast

Used by tests/test_plans.py; also handy interactively:
``print(plan_report(df))``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _full_explain(df: DataFrame) -> str:
    """Plan string with the metadata formatter widened: the default
    spark.sql.maxMetadataStringLength=100 truncates a ReadSchema past
    ~6 columns ('...' and no closing '>'), which made wide scans
    INVISIBLE to the old pruning regex (r10 lint sanity check). 2000
    chars covers any schema in this engine; restored after."""
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key, "100")
    spark.conf.set(key, "2000")
    try:
        return df._jdf.queryExecution().toString()
    finally:
        spark.conf.set(key, old)


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges in the executed plan (AQE reuse and
    broadcast exchanges excluded)."""
    plan = _executed_plan(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    plan = _executed_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every scan in the optimized plan.

    Spark's plan formatter truncates long field lists with ``...`` and
    drops the closing bracket, so accept either terminator (a filter
    list long enough to truncate still names its leading columns)."""
    return re.findall(r"PushedFilters: \[(.*?)(?:\]|\.\.\.)", _full_explain(df))


def assert_pushed_filters(df: DataFrame, column_substrings: list[str]) -> None:
    """Assert each named column appears in some scan's pushed filters."""
    pushed = " | ".join(pushed_filters(df))
    missing = [c for c in column_substrings if c not in pushed]
    if missing:
        raise AssertionError(f"filters not pushed to scan for: {missing}\npushed: {pushed}")


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists each parquet scan actually reads (pruning check).

    Spark's plan formatter TRUNCATES a long ReadSchema at ~100 chars,
    appending ``...`` and dropping the closing ``>`` — exactly the wide,
    unpruned scans a pruning check exists to catch. The old
    closing-``>`` regex made such scans INVISIBLE (a full-width scan
    parsed as "no scan at all" and passed). A truncated schema now
    parses as its visible column prefix plus a literal ``...`` sentinel
    column, so its width reads as a lower bound and pruning checks
    treat it as unpruned (r10 lint sanity check found this)."""
    out: list[list[str]] = []
    for line in re.findall(r"ReadSchema: struct<([^\n]*)", _full_explain(df)):
        truncated = line.endswith("...")
        body = line[:-3] if truncated else line.rstrip(">")
        cols = [c.split(":")[0] for c in body.split(",") if c]
        if truncated:
            cols.append("...")
        out.append(cols)
    return out


def assert_columns_pruned(df: DataFrame, table_width: int) -> None:
    """Assert no scan reads the full table width (projection reached it).
    A truncated (``...``) schema is wide by construction and fails."""
    schemas = read_schema_columns(df)
    widths = [len(cols) for cols in schemas]
    if any("..." in cols for cols in schemas):
        raise AssertionError(
            f"scan ReadSchema is formatter-truncated (>= {max(widths)} columns) — unpruned"
        )
    if any(w >= table_width for w in widths):
        raise AssertionError(f"scan reads {max(widths)} columns of a {table_width}-wide table")


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """How many WholeStageCodegen regions the executed plan contains.

    Under AQE the final plan (with codegen markers) only exists after an
    action — run ``df.count()`` first or this reports 0."""
    return len(set(re.findall(r"\*\((\d+)\)", _executed_plan(df))))


def plan_report(df: DataFrame) -> str:
    """One-screen plan summary for interactive tuning."""
    return (
        f"shuffles:            {count_shuffles(df)}\n"
        f"broadcast join:      {has_broadcast_join(df)}\n"
        f"codegen spans:       {whole_stage_codegen_spans(df)}\n"
        f"pushed filters:      {pushed_filters(df)}\n"
        f"scan read schemas:   {read_schema_columns(df)}\n"
    )
