"""Eval metrics — cumulative confusion matrix, ROC/PR/gains, AUC.

Reference: core/ConfusionMatrix.java:276-620 (driver-side single-thread
scan over the score-sorted file carrying running TP/FP/TN/FN + weighted),
core/eval/AreaUnderCurve.java:56-133 (trapezoid integration),
container/obj/PerformanceResult.java. Weight semantics: unparseable
weights default to 1.0 and negatives clamp to 1.0
(ConfusionMatrix.java:361-370).

Spark shape — fully distributed, no driver scan:
  * collapse to per-distinct-score points first (groupBy score — bounds
    all downstream work by #distinct scores, not #rows);
  * cumulative TP/FP via window over score DESC (ties collapse into one
    point, making the scan deterministic — the reference's row-at-a-time
    walk is order-dependent within ties);
  * ROC-AUC via the trapezoid over those points (equivalently the
    Mann-Whitney rank statistic); integer-count arithmetic keeps results
    bit-deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def clamp_weight(weight_col: str) -> Column:
    """Unparseable -> 1.0, negative -> 1.0 (ConfusionMatrix.java:361-370)."""
    w = F.col(weight_col).cast("double")
    return F.when(w.isNull() | (w < 0), F.lit(1.0)).otherwise(w)


def confusion_points_df(
    df: DataFrame,
    score_col: str,
    label_expr: Column,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-distinct-score cumulative confusion matrix.

    Returns (score, tp, fp, fn, tn, wtp, wfp, precision, recall, fpr) —
    one row per distinct score, cumulative counts for the rule
    "predict positive iff score >= this score" (score-descending scan,
    ConfusionMatrix.java:276-520).
    """
    w = clamp_weight(weight_col) if weight_col else F.lit(1.0)
    pts = (
        df.select(
            F.col(score_col).cast("double").alias("score"),
            F.when(label_expr, 1).otherwise(0).alias("y"),
            w.alias("w"),
        )
        .groupBy("score")
        .agg(
            F.sum("y").alias("pos"),
            F.sum(F.lit(1) - F.col("y")).alias("neg"),
            F.sum(F.when(F.col("y") == 1, F.col("w")).otherwise(0.0)).alias("wpos"),
            F.sum(F.when(F.col("y") == 0, F.col("w")).otherwise(0.0)).alias("wneg"),
        )
    )
    wdesc = Window.orderBy(F.desc("score")).rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        pts.withColumn("tp", F.sum("pos").over(wdesc))
        .withColumn("fp", F.sum("neg").over(wdesc))
        .withColumn("wtp", F.sum("wpos").over(wdesc))
        .withColumn("wfp", F.sum("wneg").over(wdesc))
        .withColumn("tot_p", F.sum("pos").over(wall))
        .withColumn("tot_n", F.sum("neg").over(wall))
        .select(
            "score",
            F.col("tp").cast("long").alias("tp"),
            F.col("fp").cast("long").alias("fp"),
            (F.col("tot_p") - F.col("tp")).cast("long").alias("fn"),
            (F.col("tot_n") - F.col("fp")).cast("long").alias("tn"),
            "wtp",
            "wfp",
            # try_divide: degenerate corpora (no positives / no negatives)
            # yield NULL metrics instead of an ANSI divide-by-zero
            F.try_divide(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision"),
            F.try_divide(F.col("tp"), F.col("tot_p")).alias("recall"),
            F.try_divide(F.col("fp"), F.col("tot_n")).alias("fpr"),
        )
    )


def roc_auc_df(df: DataFrame, score_col: str, label_expr: Column, round_to: int | None = 6) -> DataFrame:
    """ROC AUC via the Mann-Whitney rank form with average ranks for ties.

    AUC = (Σ avg-ranks of positives − nP(nP+1)/2) / (nP·nN).
    All intermediates are exact integers/half-integers -> deterministic
    across engines, and equals the trapezoid over the full-resolution ROC
    (AreaUnderCurve.java:56-133 semantics without bucketing loss).
    """
    d = df.select(F.col(score_col).cast("double").alias("score"), F.when(label_expr, 1).otherwise(0).alias("y"))
    # average rank per distinct score = (min_rank + max_rank)/2, ascending
    pts = d.groupBy("score").agg(F.count("*").alias("n"), F.sum("y").alias("npos"))
    wasc = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = (
        pts.withColumn("cum_n", F.sum("n").over(wasc))
        .withColumn("avg_rank", F.col("cum_n") - (F.col("n") - 1) / 2.0)
        .withColumn("tot_p", F.sum("npos").over(wall))
        .withColumn("tot", F.sum("n").over(wall))
    )
    agg = ranked.agg(
        F.sum(F.col("avg_rank") * F.col("npos")).alias("rank_sum"),
        F.first("tot_p").alias("np"),
        (F.first("tot") - F.first("tot_p")).alias("nn"),
    )
    auc = F.try_divide(
        F.col("rank_sum") - F.col("np") * (F.col("np") + 1) / 2.0, F.col("np") * F.col("nn")
    )
    if round_to is not None:
        auc = F.round(auc, round_to)
    return agg.select(auc.alias("auc"))


def pr_auc_trapezoid(points: DataFrame, round_to: int | None = 6) -> DataFrame:
    """PR AUC: trapezoid over (recall, precision) points ordered by recall.

    Mirrors AreaUnderCurve.ofPr (:56-133): Σ (r_i − r_{i-1})·(p_i + p_{i-1})/2.
    """
    wprev = Window.orderBy("recall")
    t = (
        points.select("recall", "precision")
        .withColumn("prev_r", F.lag("recall").over(wprev))
        .withColumn("prev_p", F.lag("precision").over(wprev))
        .filter(F.col("prev_r").isNotNull())
    )
    auc = F.sum((F.col("recall") - F.col("prev_r")) * (F.col("precision") + F.col("prev_p")) / 2.0)
    if round_to is not None:
        auc = F.round(auc, round_to)
    return t.agg(auc.alias("pr_auc"))


def gain_buckets_df(points: DataFrame, num_buckets: int = 10, round_to: int | None = 6) -> DataFrame:
    """Bucketed gains table: first point crossing each 1/N "action rate".

    Reference buckets by FPR/recall/gain boundary crossings
    (ConfusionMatrix.java:276-520 performanceBucketNum). Action rate =
    (tp+fp)/total; we keep the first score point at or past each i/N.
    """
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t = points.withColumn("total", (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")))
    t = t.withColumn("action_rate", (F.col("tp") + F.col("fp")) / F.col("total"))
    t = t.withColumn("bucket", F.least(F.floor(F.col("action_rate") * num_buckets), F.lit(num_buckets)))
    wbucket = Window.partitionBy("bucket").orderBy(F.desc("score"))
    out = (
        t.withColumn("rn", F.row_number().over(wbucket))
        .filter(F.col("rn") == 1)
        .select("bucket", "score", "action_rate", "precision", "recall", "fpr")
        .orderBy("bucket")
    )
    _ = wall
    if round_to is not None:
        for c in ("action_rate", "precision", "recall", "fpr"):
            out = out.withColumn(c, F.round(F.col(c), round_to))
    return out


# ---------------------------------------------------------------------------
# Distributed prefix-sum (the 100 TB form of the cumulative score scan)
# ---------------------------------------------------------------------------

def _range_prefix_offsets(parted: DataFrame, cols: list[str]) -> DataFrame:
    """Per-partition exclusive prefix offsets for ``cols``.

    Sums each range-partition's totals (one tiny row per partition),
    cumulates them on the driver (#partitions rows — trivially small),
    and returns (pid, <col>_off...) for a broadcast join back."""
    from pyspark.sql.functions import spark_partition_id

    totals = (
        parted.withColumn("__pid", spark_partition_id())
        .groupBy("__pid")
        .agg(*[F.sum(c).alias(c) for c in cols])
        .orderBy("__pid")
        .collect()
    )
    rows, running = [], {c: 0 for c in cols}
    for r in totals:
        rows.append((r["__pid"], *[running[c] for c in cols]))
        for c in cols:
            running[c] += r[c] or 0
    spark = parted.sparkSession
    schema = "pid int, " + ", ".join(f"{c}_off long" for c in cols)
    return spark.createDataFrame(rows, schema), running


def confusion_points_scalable(
    df: DataFrame,
    score_col: str,
    label_expr: Column,
    num_ranges: int | None = None,
) -> DataFrame:
    """Cumulative confusion matrix without the single-task global window.

    The plain :func:`confusion_points_df` uses ``sum() OVER (ORDER BY
    score)`` — correct, but an unpartitioned window funnels every
    distinct-score row through ONE task. This form is the distributed
    prefix-sum: range-repartition by score desc, cumulate WITHIN each
    range (tasks run in parallel), then add per-range exclusive offsets
    (#partitions driver rows, broadcast back). Identical output.
    """
    spark = df.sparkSession
    n = num_ranges or spark.sparkContext.defaultParallelism
    pts = (
        df.select(
            F.col(score_col).cast("double").alias("score"),
            F.when(label_expr, 1).otherwise(0).alias("y"),
        )
        .groupBy("score")
        .agg(F.sum("y").alias("pos"), F.sum(F.lit(1) - F.col("y")).alias("neg"))
    )
    parted = pts.repartitionByRange(n, F.desc("score")).sortWithinPartitions(F.desc("score")).persist()
    parted.count()  # pin the partitioning — offsets must see the same layout
    offsets, grand = _range_prefix_offsets(parted, ["pos", "neg"])
    from pyspark.sql.functions import spark_partition_id

    wpart = (
        Window.partitionBy("__pid")
        .orderBy(F.desc("score"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        parted.withColumn("__pid", spark_partition_id())
        .join(F.broadcast(offsets), F.col("__pid") == F.col("pid"))
        .withColumn("tp", F.sum("pos").over(wpart) + F.col("pos_off"))
        .withColumn("fp", F.sum("neg").over(wpart) + F.col("neg_off"))
        # grand totals fall out of the offset scan — no global window
        .withColumn("tot_p", F.lit(grand["pos"]))
        .withColumn("tot_n", F.lit(grand["neg"]))
        .select(
            "score",
            F.col("tp").cast("long").alias("tp"),
            F.col("fp").cast("long").alias("fp"),
            (F.col("tot_p") - F.col("tp")).cast("long").alias("fn"),
            (F.col("tot_n") - F.col("fp")).cast("long").alias("tn"),
            F.try_divide(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision"),
            F.try_divide(F.col("tp"), F.col("tot_p")).alias("recall"),
            F.try_divide(F.col("fp"), F.col("tot_n")).alias("fpr"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Raw-score rescale strategies (GBT scores are unbounded margins)
# ---------------------------------------------------------------------------

def rescale_score_expr(score: Column | str, strategy: str = "SIGMOID") -> Column:
    """Map raw model output to [0,1] before the confusion-matrix sweep.

    Reference: ConfusionMatrix.java:257-276,404-420 — GBT margins are
    rescaled per configured strategy before bucketing:
      RAW       pass-through (already a probability)
      SIGMOID   1/(1+exp(-2·s)) (the reference's scaled sigmoid)
      OLD_SIGMOID  1/(1+exp(-s))
      MAXMIN    (s - min)/(max - min) — needs the global max/min, so this
                variant takes (score, min_col, max_col) broadcast columns
    """
    s = F.col(score) if isinstance(score, str) else score
    s = s.cast("double")
    if strategy == "RAW":
        return s
    if strategy == "SIGMOID":
        return 1.0 / (1.0 + F.exp(-2.0 * s))
    if strategy == "OLD_SIGMOID":
        return 1.0 / (1.0 + F.exp(-s))
    raise ValueError(f"unsupported rescale strategy {strategy}")


def rescale_maxmin_expr(score: Column | str, min_col: Column, max_col: Column) -> Column:
    """MAXMIN rescale with broadcast global bounds; degenerate range -> 0.5
    (the reference clamps equal-max-min the same way)."""
    s = (F.col(score) if isinstance(score, str) else score).cast("double")
    rng = max_col - min_col
    return F.when(rng <= 0, F.lit(0.5)).otherwise((s - min_col) / rng)
