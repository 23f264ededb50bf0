"""Pearson correlation matrix — pairwise-complete, from exact co-moment sums.

Reference: core/correlation/CorrelationMapper.java / CorrelationReducer.java
(1992 LoC of hand-written in-mapper combining of xySum/xxSum/yySum/
adjustCount writables). In Spark ONE wide ``agg`` computes every pairwise
co-moment — Catalyst's partial aggregation replaces the manual combiner,
and nothing but one partial-agg row per task is shuffled.

Pairwise-complete semantics (CorrelationWritable.java:40-56): each (i,j)
pair uses only rows where BOTH are non-null — implemented by masking each
term with the pair's joint-null predicate.

corr(i,j) = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))
computed from DECIMAL(38,10) sums so results are exact-deterministic
(double co-moment sums drift with partition order).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,10)"


def correlation_df(df: DataFrame, columns: list[str], round_to: int | None = 6) -> DataFrame:
    """Upper-triangle Pearson correlations as (col_x, col_y, corr) rows.

    Pairwise-complete means NULL **and non-finite** values exclude the
    row from that pair's population (the reference maps NaN/Infinity to
    missing before any stat — Normalizer.java:566-571): a NaN or Inf
    double cannot be summed through the DECIMAL co-moment path (the
    cast nulls it), so a null-only guard would keep the row in ``n``
    while silently dropping it from every sum — a wrong VALUE, not an
    error (planted-fixture test pins exact exclusion on both engines)."""
    from shifu_spark.functions.nonvalue import is_value as _finite

    aggs = []
    pairs = list(combinations(columns, 2))
    for x, y in pairs:
        cx, cy = F.col(x).try_cast("double"), F.col(y).try_cast("double")
        both = _finite(cx) & _finite(cy)
        mx = F.when(both, cx)
        my = F.when(both, cy)
        key = f"{x}__{y}"
        aggs += [
            F.count(F.when(both, F.lit(1))).alias(f"{key}__n"),
            F.sum(mx.cast(_DEC)).cast("double").alias(f"{key}__sx"),
            F.sum(my.cast(_DEC)).cast("double").alias(f"{key}__sy"),
            F.sum((mx * mx).cast(_DEC)).cast("double").alias(f"{key}__sxx"),
            F.sum((my * my).cast(_DEC)).cast("double").alias(f"{key}__syy"),
            F.sum((mx * my).cast(_DEC)).cast("double").alias(f"{key}__sxy"),
        ]
    wide = df.agg(*aggs)

    selects = []
    for x, y in pairs:
        key = f"{x}__{y}"
        n = F.col(f"{key}__n")
        sx, sy = F.col(f"{key}__sx"), F.col(f"{key}__sy")
        sxx, syy, sxy = F.col(f"{key}__sxx"), F.col(f"{key}__syy"), F.col(f"{key}__sxy")
        num = n * sxy - sx * sy
        den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        c = F.when(den == 0, F.lit(0.0)).otherwise(num / den)
        if round_to is not None:
            c = F.round(c, round_to)
        selects.append(wide.select(F.lit(x).alias("col_x"), F.lit(y).alias("col_y"), c.alias("corr")))
    out = selects[0]
    for s in selects[1:]:
        out = out.unionAll(s)
    return out.orderBy("col_x", "col_y")


def correlation_oracle_sql(table: str, columns: list[str], round_to: int = 6) -> str:
    """DuckDB mirror with identical decimal co-moment math."""
    parts = []
    for x, y in combinations(columns, 2):
        parts.append(
            f"""
SELECT '{x}' AS col_x, '{y}' AS col_y,
       round(CASE WHEN sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) = 0 THEN 0.0
                  ELSE (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) END, {round_to}) AS corr
FROM (
  SELECT count(*)::DOUBLE AS n,
         sum(cast({x} AS DECIMAL(38,10)))::DOUBLE AS sx,
         sum(cast({y} AS DECIMAL(38,10)))::DOUBLE AS sy,
         sum(cast({x}*{x} AS DECIMAL(38,10)))::DOUBLE AS sxx,
         sum(cast({y}*{y} AS DECIMAL(38,10)))::DOUBLE AS syy,
         sum(cast({x}*{y} AS DECIMAL(38,10)))::DOUBLE AS sxy
  FROM {table}
  WHERE isfinite({x}::DOUBLE) AND isfinite({y}::DOUBLE)
)"""
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_x, col_y"
