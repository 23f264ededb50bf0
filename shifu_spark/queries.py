"""Query registry — every SURVEY §2 operator exposed as a (spark, sf_dir) ->
DataFrame callable plus a matching DuckDB oracle SQL string.

Registration happens via the @query decorator; __spark_entry__.py re-exports
QUERIES / ORACLES for the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Scans / filters / aggregations (SURVEY §2.1, §2.2, §2.4)
# ---------------------------------------------------------------------------

# sums accumulate as DECIMAL(38,10) on both sides: exact and
# order-independent, so the rounded doubles are bit-identical across
# engines (double sums drift in the last ulp with partition order)
_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(cast(l_quantity AS DECIMAL(38,10)))::DOUBLE, 4) AS sum_qty,
       round(sum(cast(l_extendedprice AS DECIMAL(38,10)))::DOUBLE, 4) AS sum_base_price,
       round(sum(cast(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10)))::DOUBLE, 4) AS sum_disc_price,
       round(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,10)))::DOUBLE, 4) AS sum_charge,
       round(sum(cast(l_quantity AS DECIMAL(38,10)))::DOUBLE / count(*), 6) AS avg_qty,
       round(sum(cast(l_extendedprice AS DECIMAL(38,10)))::DOUBLE / count(*), 6) AS avg_price,
       round(sum(cast(l_discount AS DECIMAL(38,10)))::DOUBLE / count(*), 6) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("tpch_q1", _Q1_ORACLE)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: the flagship scan→filter→groupBy→agg.

    Catalyst pushes the shipdate filter and the 7-column projection into
    the parquet scan; partial aggregation bounds the shuffle at
    (#groups × #tasks) rows regardless of data size.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def dsum(e):
        return F.sum(e.cast("decimal(38,10)")).cast("double")

    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(dsum(F.col("l_quantity")), 4).alias("sum_qty"),
            F.round(dsum(F.col("l_extendedprice")), 4).alias("sum_base_price"),
            F.round(dsum(disc_price), 4).alias("sum_disc_price"),
            F.round(dsum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(dsum(F.col("l_quantity")) / n, 6).alias("avg_qty"),
            F.round(dsum(F.col("l_extendedprice")) / n, 6).alias("avg_price"),
            F.round(dsum(F.col("l_discount")) / n, 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Column stats (SURVEY §2.4 — the `shifu stats` moment pass)
# ---------------------------------------------------------------------------

_STATS_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _stats_oracle() -> str:
    from shifu_spark.operators.stats import numeric_stats_oracle_sql

    return numeric_stats_oracle_sql("lineitem", _STATS_COLS) + "\nORDER BY column_name"


@query("column_stats", None)
def column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column moments/percentiles/distincts — one wide agg, one pass.

    Reference: UpdateBinningInfoMapper/Reducer power-sum accumulation +
    ColumnStatsCalculator NIST closed forms (see operators/stats.py).
    """
    from shifu_spark.operators.stats import numeric_stats_df

    li = _t(spark, sf_dir, "lineitem")
    return numeric_stats_df(li, _STATS_COLS).orderBy("column_name")


ORACLES["column_stats"] = _stats_oracle()


# ---------------------------------------------------------------------------
# Binning + KS/IV/WOE (SURVEY §2.4, §2.5)
# ---------------------------------------------------------------------------

_KSIV_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_KSIV_BINS = 10


@query("ksiv_equal_interval", None)
def ksiv_equal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-interval binning + KS/IV/WOE, tag = (l_returnflag = 'R').

    Bin assignment is computed inline — least(floor((x-min)/width), k-1) —
    with min/max from a broadcast single-row agg, so Spark and the oracle
    evaluate bit-identical double arithmetic.
    """
    from shifu_spark.operators.ksiv import ksiv_df

    li = _t(spark, sf_dir, "lineitem")
    k = _KSIV_BINS

    mm = li.agg(
        *[F.min(c).alias(f"{c}__mn") for c in _KSIV_COLS],
        *[F.max(c).alias(f"{c}__mx") for c in _KSIV_COLS],
    )
    with_mm = li.crossJoin(F.broadcast(mm))
    structs = []
    for c in _KSIV_COLS:
        mn, mx = F.col(f"{c}__mn"), F.col(f"{c}__mx")
        b = F.least(F.floor((F.col(c) - mn) / ((mx - mn) / k)), F.lit(k - 1))
        structs.append(F.struct(F.lit(c).alias("column_name"), b.alias("bin")))
    is_pos = (F.col("l_returnflag") == "R").alias("_pos")
    melted = with_mm.select(F.explode(F.array(*structs)).alias("cb"), is_pos)
    counts = melted.groupBy(
        F.col("cb.column_name").alias("column_name"), F.col("cb.bin").alias("bin")
    ).agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("bin_count_pos"),
        F.sum(F.when(~F.col("_pos"), 1).otherwise(0)).alias("bin_count_neg"),
    )
    return ksiv_df(counts)


def _ksiv_oracle() -> str:
    from shifu_spark.operators.ksiv import ksiv_oracle_sql

    k = _KSIV_BINS
    per_col = []
    for c in _KSIV_COLS:
        per_col.append(
            f"""
SELECT '{c}' AS column_name,
       least(floor(({c} - mn) / ((mx - mn) / {k})), {k - 1}) AS bin,
       sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS bin_count_pos,
       sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS bin_count_neg
FROM lineitem CROSS JOIN (SELECT min({c}) AS mn, max({c}) AS mx FROM lineitem)
GROUP BY 1, 2"""
        )
    counts_sql = "\nUNION ALL\n".join(per_col)
    return ksiv_oracle_sql(counts_sql)


ORACLES["ksiv_equal_interval"] = _ksiv_oracle()
