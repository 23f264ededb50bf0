"""Data-layout optimization: Z-order (Morton) clustering keys.

The lakehouse data-skipping primitive (Delta ``OPTIMIZE ZORDER BY`` /
Iceberg sort-order analog): quantize each clustering column to a
``bits``-wide rank, interleave the bits into one Morton key, and sort /
repartitionByRange the table by that key before writing. Files then
carry TIGHT min/max ranges on EVERY clustering dimension, so parquet
footer pruning skips most files for selective multi-dimensional
predicates — at 100 TB this is the difference between scanning a few
files and scanning the table when queries filter on two+ columns.

Everything is pure JVM expressions: quantization is a broadcast 1-row
min/max agg + arithmetic; the bit interleave is one ``F.expr`` SQL
string of shift/mask terms (the PQ lesson: big literal expressions as a
single SQL string, not py4j Column chains).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_expr(col: str, mn: str, mx: str, bits: int) -> Column:
    """Rank ``col`` into [0, 2^bits) given broadcast min/max columns.

    NULL -> 0 (sorts first, like Delta). The max value lands on
    2^bits - 1 exactly; a degenerate (constant) column quantizes to 0.
    """
    levels = (1 << bits) - 1
    c = F.col(col).cast("double")
    lo, hi = F.col(mn).cast("double"), F.col(mx).cast("double")
    rank = F.floor((c - lo) / (hi - lo) * levels + 0.5)
    return (
        F.when(c.isNull() | (hi == lo), F.lit(0))
        .otherwise(F.least(F.greatest(rank, F.lit(0)), F.lit(levels)))
        .cast("long")
    )


def morton_interleave_sql(rank_cols: list[str], bits: int) -> str:
    """Morton bit-interleave of quantized ranks as ONE SQL expression.

    Bit b of dimension d lands at position b * n_dims + d, so the key
    cycles through dimensions from the LSB up; sorting by it gives the
    classic Z curve. Returns a SQL string (shiftleft/shiftright & masks)
    valid in both Spark SQL and, with `>>`/`<<` spelling, DuckDB — the
    oracle builder below emits the DuckDB spelling from the same terms.
    """
    n = len(rank_cols)
    terms = [
        f"shiftleft(shiftright({col}, {b}) & 1, {b * n + d})"
        for b in range(bits)
        for d, col in enumerate(rank_cols)
    ]
    return " + ".join(terms)


def morton_interleave_duckdb(rank_cols: list[str], bits: int) -> str:
    """The same interleave, spelled for DuckDB (>> / << / & operators)."""
    n = len(rank_cols)
    terms = [
        f"((({col} >> {b}) & 1) << {b * n + d})"
        for b in range(bits)
        for d, col in enumerate(rank_cols)
    ]
    return " + ".join(terms)


def zorder_keys(df: DataFrame, cols: list[str], bits: int = 10) -> DataFrame:
    """Append ``zkey`` (the Morton key over ``cols``) plus the per-column
    quantized ranks ``zr_<col>``. One broadcast 1-row min/max agg + one
    narrow projection; zero data-scale shuffles — the caller then
    ``repartitionByRange('zkey')``/sorts to realize the layout."""
    from shifu_spark.functions.nonvalue import is_value

    # non-finite values are MISSING: excluded from the min/max bounds (a
    # NaN max poisons every rank) and ranked NULL — the NULL zkey is the
    # missing rows' own layout group, identically on both engines (a real
    # rewrite routes that group to a dedicated file)
    aggs = []
    for c in cols:
        v = F.when(is_value(F.col(c).cast("double")), F.col(c))
        aggs += [F.min(v).alias(f"mn_{c}"), F.max(v).alias(f"mx_{c}")]
    mm = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(mm))
    rank_names = []
    for c in cols:
        rn = f"zr_{c}"
        out = out.withColumn(
            rn,
            F.when(
                is_value(F.col(c).cast("double")),
                quantize_expr(c, f"mn_{c}", f"mx_{c}", bits),
            ),
        )
        rank_names.append(rn)
    out = out.withColumn("zkey", F.expr(morton_interleave_sql(rank_names, bits)))
    return out.drop(*[f"mn_{c}" for c in cols], *[f"mx_{c}" for c in cols])


# ---------------------------------------------------------------------------
# Hilbert curve keys (2-D) — the better-locality sibling of Z-order
# ---------------------------------------------------------------------------

def hilbert_xy2d(x: int, y: int, bits: int) -> int:
    """Reference kernel (classic Wikipedia xy2d): distance along the
    2-D Hilbert curve of order ``bits`` for a cell (x, y). Used by the
    tests as the independent ground truth for the SQL unroll."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def hilbert_keys(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Append ``hkey`` (Hilbert-curve distance over exactly two
    clustering columns) plus quantized ranks ``hr_<col>`` — the
    better-locality alternative to :func:`zorder_keys`: consecutive
    Hilbert keys are ALWAYS adjacent cells (unit L1 step, no Z-curve
    jumps), so range-partitioned files carry even tighter per-dimension
    min/max windows.

    Same scale shape as zorder_keys: one broadcast 1-row min/max agg +
    ``bits`` chained narrow projections (Catalyst collapses them into
    one codegen stage; expression growth is LINEAR in bits because each
    level's (x, y, d) is a named column, not an inlined subtree — the
    naive nested unroll is exponential). Zero data-scale shuffles.
    """
    if len(cols) != 2:
        raise ValueError("hilbert_keys clusters exactly two columns (2-D curve)")
    from shifu_spark.functions.nonvalue import is_value

    # same missing contract as zorder_keys: non-finite values stay out
    # of the min/max bounds and rank NULL (the NULL hkey layout group)
    aggs = []
    for c in cols:
        v = F.when(is_value(F.col(c).cast("double")), F.col(c))
        aggs += [F.min(v).alias(f"mn_{c}"), F.max(v).alias(f"mx_{c}")]
    out = df.crossJoin(F.broadcast(df.agg(*aggs)))
    rank_names = []
    for c in cols:
        rn = f"hr_{c}"
        out = out.withColumn(
            rn,
            F.when(
                is_value(F.col(c).cast("double")),
                quantize_expr(c, f"mn_{c}", f"mx_{c}", bits),
            ),
        )
        rank_names.append(rn)
    out = (
        out.withColumn("_hx", F.col(rank_names[0]))
        .withColumn("_hy", F.col(rank_names[1]))
        .withColumn("_hd", F.lit(0).cast("long"))
    )
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = (F.col("_hx").bitwiseAND(s) > 0).cast("long")
        ry = (F.col("_hy").bitwiseAND(s) > 0).cast("long")
        out = out.withColumn(
            "_hd", F.col("_hd") + F.lit(s * s) * ((rx * 3).bitwiseXOR(ry))
        )
        swap_x = F.when(rx == 1, F.lit(s - 1) - F.col("_hy")).otherwise(F.col("_hy"))
        swap_y = F.when(rx == 1, F.lit(s - 1) - F.col("_hx")).otherwise(F.col("_hx"))
        nx = F.when(ry == 0, swap_x).otherwise(F.col("_hx"))
        ny = F.when(ry == 0, swap_y).otherwise(F.col("_hy"))
        out = out.withColumn("_nx", nx).withColumn("_ny", ny)
        out = (
            out.withColumn("_hx", F.col("_nx"))
            .withColumn("_hy", F.col("_ny"))
            .drop("_nx", "_ny")
        )
    out = out.withColumn("hkey", F.col("_hd")).drop("_hx", "_hy", "_hd")
    return out.drop(*[f"mn_{c}" for c in cols], *[f"mx_{c}" for c in cols])
