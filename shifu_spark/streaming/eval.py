"""Streaming model evaluation — windowed threshold-curve statistics.

The reference's eval family (ConfusionMatrix.java / PerformanceEvaluator,
SURVEY §2.6) is batch-only; this is its streaming twin. Per event-time
window the stream accumulates the per-score (pos, neg) counts — the
sufficient statistic for EVERY threshold metric (confusion matrix, ROC,
PR, gains) — and finalization computes rank-sum AUC plus a fixed-threshold
confusion per window, either batch-side on a replayed sink (tests, driver
gate) or per closed window inside ``foreachBatch`` (production).

Scale shape: the streaming state is (windows-in-watermark × distinct
scores) rows; bucketize an unbounded score upstream (the callers here use
``floor``) to bound it. Finalization is window-partitioned — every window
function runs PARTITION BY window_start, so windows finalize in parallel
and no global sort exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def streaming_score_counts(
    stream: DataFrame,
    score: Column,
    pos: Column,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed per-score positive/negative counts over a scored stream.

    ``score`` should be bounded-cardinality (bucketed); ``pos`` is the
    boolean label column/expression. Output: one row per
    (window_start, score) with pos/neg counts — the input contract of
    :func:`auc_confusion_per_window`.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .where(score.isNotNull())
        .groupBy(F.window(ts_col, window).alias("w"), score.alias("score"))
        .agg(
            F.sum(F.when(pos, 1).otherwise(0)).alias("pos"),
            F.sum(F.when(pos, 0).otherwise(1)).alias("neg"),
        )
        .select(F.col("w.start").alias("window_start"), "score", "pos", "neg")
    )


def auc_confusion_per_window(
    counts: DataFrame, threshold: float, round_to: int | None = 6
) -> DataFrame:
    """Finalize per-window ROC AUC (tied-rank Mann-Whitney, the same
    formula as the batch ``roc_auc`` oracle) and the confusion matrix at
    ``threshold`` from grouped (window_start, score, pos, neg) counts.

    All arithmetic is exact-integer until the final division: avg_rank is
    an exact multiple of 0.5 and rank_sum stays far below 2^53, so the
    result is bit-identical across engines and partitionings. Windows are
    independent partitions — no global window anywhere.
    """
    w_ws = Window.partitionBy("window_start").orderBy("score")
    n = F.col("pos") + F.col("neg")
    ranked = counts.withColumn(
        "avg_rank", F.sum(n).over(w_ws) - (n - F.lit(1)) / F.lit(2.0)
    )
    agg = ranked.groupBy("window_start").agg(
        F.sum("pos").alias("p"),
        F.sum("neg").alias("nn"),
        F.sum(F.col("avg_rank") * F.col("pos")).alias("rank_sum"),
        F.sum(F.when(F.col("score") >= threshold, F.col("pos")).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("score") >= threshold, F.col("neg")).otherwise(0)).alias("fp"),
    )
    auc = F.when(
        (F.col("p") > 0) & (F.col("nn") > 0),
        (F.col("rank_sum") - F.col("p") * (F.col("p") + 1) / F.lit(2.0))
        / (F.col("p") * F.col("nn")),
    )
    if round_to is not None:
        auc = F.round(auc, round_to)
    return agg.select(
        "window_start",
        auc.alias("auc"),
        F.col("tp").alias("tp"),
        F.col("fp").alias("fp"),
        (F.col("p") - F.col("tp")).alias("fn"),
        (F.col("nn") - F.col("fp")).alias("tn"),
    ).orderBy("window_start")


def start_eval_monitor_foreach_batch(
    stream: DataFrame,
    score: Column,
    pos: Column,
    threshold: float,
    output_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Production wiring: closed windows' score counts flow through
    ``foreachBatch``; each batch finalizes AUC + confusion per window and
    appends one parquet row per window — swap the parquet write for any
    batch sink without touching the streaming graph.

    Append mode ⇒ a window's counts arrive exactly once after the
    watermark passes its end, so every emitted (window, auc, confusion)
    row is final. Checkpointing makes the query restartable with
    exactly-once semantics for idempotent sinks.
    """
    counts = streaming_score_counts(stream, score, pos, ts_col, window, watermark)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            auc_confusion_per_window(batch_df, threshold)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_path)
        )

    return (
        counts.writeStream.outputMode("append")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
