"""Model training — MLlib estimators replacing the reference's Guagua BSP.

Reference: core/dtrain/* (~20k LoC of hand-rolled distributed NN/LR/RF/GBT
on YARN map tasks + ZooKeeper/netty master-worker aggregation,
TrainModelProcessor.java:661-1000). MLlib's aggregate-broadcast iteration
is the same algorithmic shape (master averages, workers recompute), so
the rebuild maps:

  NN   -> MultilayerPerceptronClassifier (activation-set gap documented)
  LR   -> LogisticRegression            (core/dtrain/lr/)
  RF   -> RandomForestClassifier        (core/dtrain/dt/ DTMaster/DTWorker)
  GBT  -> GBTClassifier                 (impurity/loss/featureSubset mapped)
  bagging -> loop of fits on df.sample(seed+bag)  (TrainModelProcessor:931)
  grid search -> ParamGridBuilder + TrainValidationSplit (gs/GridSearch.java)
  k-fold -> CrossValidator              (ShifuInputFormat.java:149)

Reference param names map (dt/Impurity.java:106-553, dt/Loss.java:36-104,
dt/FeatureSubsetStrategy.java:23-31):
  impurity VARIANCE->'variance', ENTROPY->'entropy', GINI->'gini'
  loss SQUARED->'squared', ABSOLUTE->'absolute', LOG->'logistic'
  featureSubset ALL->'all', HALF->'0.5', ONETHIRD->'onethird',
  TWOTHIRDS->'0.667', SQRT->'sqrt', LOG2->'log2', AUTO->'auto'
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.ml.classification import (
    GBTClassifier,
    LogisticRegression,
    MultilayerPerceptronClassifier,
    RandomForestClassifier,
)
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IMPURITY = {"VARIANCE": "variance", "ENTROPY": "entropy", "GINI": "gini", "FRIEDMANMSE": "variance"}
_FEATURE_SUBSET = {
    "ALL": "all", "HALF": "0.5", "ONETHIRD": "onethird", "TWOTHIRDS": "0.667",
    "SQRT": "sqrt", "LOG2": "log2", "AUTO": "auto",
}


@dataclass
class TrainParams:
    """Subset of ModelTrainConf the Spark build honors."""

    algorithm: str = "LR"  # LR | RF | GBT | NN
    num_iterations: int = 50
    learning_rate: float = 0.1
    trees: int = 20
    max_depth: int = 5
    impurity: str = "GINI"
    feature_subset_strategy: str = "AUTO"
    hidden_layers: list[int] = field(default_factory=lambda: [16])
    bags: int = 1
    bag_fraction: float = 1.0
    seed: int = 42
    extra: dict[str, Any] = field(default_factory=dict)


def assemble_features(df: DataFrame, feature_cols: list[str], label_col: str = "tag") -> DataFrame:
    """Dense-vector assembly of normalized features (+ double label)."""
    va = VectorAssembler(inputCols=feature_cols, outputCol="features", handleInvalid="keep")
    out = va.transform(df)
    if label_col in df.columns:
        out = out.withColumn("label", F.col(label_col).cast("double"))
    return out


def _estimator(params: TrainParams, n_features: int):
    if params.algorithm == "LR":
        return LogisticRegression(maxIter=params.num_iterations, regParam=params.extra.get("reg", 0.0))
    if params.algorithm == "RF":
        return RandomForestClassifier(
            numTrees=params.trees,
            maxDepth=params.max_depth,
            impurity=_IMPURITY.get(params.impurity, "gini"),
            featureSubsetStrategy=_FEATURE_SUBSET.get(params.feature_subset_strategy, "auto"),
            seed=params.seed,
        )
    if params.algorithm == "GBT":
        return GBTClassifier(
            maxIter=params.num_iterations,
            maxDepth=params.max_depth,
            stepSize=params.learning_rate,
            seed=params.seed,
        )
    if params.algorithm == "NN":
        layers = [n_features, *params.hidden_layers, 2]
        return MultilayerPerceptronClassifier(maxIter=params.num_iterations, layers=layers, seed=params.seed)
    raise ValueError(f"unsupported algorithm {params.algorithm}")


def train_models(assembled: DataFrame, params: TrainParams, n_features: int) -> list:
    """Train ``params.bags`` models, each on a seeded resample
    (TrainModelProcessor.java:931-942 bagging)."""
    models = []
    for bag in range(params.bags):
        d = assembled
        if params.bags > 1 or params.bag_fraction < 1.0:
            d = assembled.sample(withReplacement=False, fraction=params.bag_fraction, seed=params.seed + bag)
        est = _estimator(params, n_features)
        models.append(est.fit(d))
    return models


def score_ensemble(assembled: DataFrame, models: list, keep_cols: list[str] | None = None) -> DataFrame:
    """Bagged ensemble scoring: per-model positive-class probability plus
    mean/max/min/median columns (core/Scorer.java:200-470,
    ScoreObject.java:35-74 aggregation; EvalScoreUDF output schema
    :540-611 tag,weight,mean,max,min,median,model0..N).

    MLlib transforms run sequentially (each a JVM pipeline — no Python
    per-row cost); the aggregates are array expressions.
    """
    from pyspark.ml.functions import vector_to_array

    out = assembled
    score_cols = []
    for i, m in enumerate(models):
        col = f"model{i}"
        out = (
            m.transform(out.drop("rawPrediction", "probability", "prediction"))
            .withColumn(col, vector_to_array(F.col("probability")).getItem(1))
            .drop("rawPrediction", "probability", "prediction")
        )
        score_cols.append(col)
    return with_ensemble_stats(out, score_cols, keep_cols)


def with_ensemble_stats(out: DataFrame, score_cols: list[str], keep_cols: list[str] | None = None) -> DataFrame:
    """mean/max/min/median over per-model score columns as array
    expressions (ScoreObject.java:35-74 aggregation; shared by the MLlib
    and custom-NN ensembles)."""
    arr = F.array(*[F.col(c) for c in score_cols])
    n = len(score_cols)
    sorted_arr = F.array_sort(arr)
    if n % 2 == 1:
        median = F.element_at(sorted_arr, (n + 1) // 2)
    else:
        median = (F.element_at(sorted_arr, n // 2) + F.element_at(sorted_arr, n // 2 + 1)) / 2.0
    out = (
        out.withColumn("mean", F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / n)
        .withColumn("max", F.array_max(arr))
        .withColumn("min", F.array_min(arr))
        .withColumn("median", median)
    )
    keep = (keep_cols or []) + ["mean", "max", "min", "median", *score_cols]
    have = [c for c in keep if c in out.columns]
    return out.select(*have)


# ---------------------------------------------------------------------------
# Grid search (gs/GridSearch.java:44-170) + k-fold CV (ShifuInputFormat:149)
# ---------------------------------------------------------------------------


def flatten_grid(grid: dict[str, list]) -> list[dict]:
    """Cartesian flatten of list-valued hyperparams — GridSearch.java:44-170
    expands train#params lists the same way."""
    from itertools import product

    keys = sorted(grid)
    return [dict(zip(keys, combo)) for combo in product(*[grid[k] for k in keys])]


def grid_search(
    assembled: DataFrame,
    base: TrainParams,
    grid: dict[str, list],
    n_features: int,
    train_fraction: float = 0.8,
) -> list[dict]:
    """Train/validate each grid point on a seeded split; returns
    [{params, auc}] sorted by auc desc. The split is randomSplit with the
    TrainParams seed — the Spark analogue of the injected validation
    split set (guagua/ShifuInputFormat.java:74-149)."""
    from dataclasses import replace

    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    train, valid = assembled.randomSplit([train_fraction, 1 - train_fraction], seed=base.seed)
    train = train.persist()
    valid = valid.persist()
    # materialize both caches BEFORE the overlapped fits below: a cold
    # cache read by concurrent jobs is recomputed by each until one
    # finishes (wasted passes, not a correctness issue — the seeded
    # split is per-partition deterministic)
    train.count()
    valid.count()

    def _one_point(point: dict) -> dict:
        params = replace(base, **{k: v for k, v in point.items() if hasattr(base, k)})
        params.extra = {**base.extra, **{k: v for k, v in point.items() if not hasattr(base, k)}}
        model = _estimator(params, n_features).fit(train)
        ev = BinaryClassificationEvaluator(metricName="areaUnderROC")
        return {"params": point, "auc": ev.evaluate(model.transform(valid))}

    try:
        # grid points are independent fits over the same cached split —
        # overlap a few so the next point's tasks back-fill executors
        # idled by the current point's stage tails (guide §2.6).  2-3 in
        # flight is the guide's sweet spot; results keep grid order
        # (pool.map) and each fit is seed-deterministic, so the output
        # is identical to the sequential loop.  inheritable_thread_target
        # (ADVICE r12): under pinned-thread mode pool threads get FRESH
        # JVM thread-local properties, so a caller-set job group /
        # scheduler pool / cancellation would silently not apply to the
        # overlapped fits (profilers under-attribute them); the wrapper
        # copies the calling thread's properties into each worker run.
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        points = flatten_grid(grid)
        # session form also inherits session tags (and avoids the
        # "Tags will not be inherited" warning under pinned threads)
        wrap = inheritable_thread_target(train.sparkSession)
        with ThreadPoolExecutor(max_workers=min(3, max(1, len(points)))) as pool:
            results = list(pool.map(wrap(_one_point), points))
    finally:
        train.unpersist()
        valid.unpersist()
    return sorted(results, key=lambda r: -r["auc"])


def kfold_cv(assembled: DataFrame, params: TrainParams, n_features: int, k: int = 5) -> list[float]:
    """K-fold cross validation with deterministic fold assignment
    (crc32 of the monotonically-increasing id % k — stable for a FIXED
    physical layout, unlike randomSplit chains, but layout-dependent
    like any id-based scheme; for folds that survive repartitioning key
    them on a business key via purify.hash_fold_expr instead). Returns
    per-fold AUC."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    folded = assembled.withColumn(
        "__fold", F.pmod(F.crc32(F.monotonically_increasing_id().cast("string")) + params.seed, F.lit(k))
    ).persist()
    # materialize the fold assignment ONCE before the overlapped fits:
    # concurrent cold-cache readers would each recompute it (wasted
    # passes; values identical either way — the id is a pure function
    # of the fixed physical layout)
    folded.count()

    def _one_fold(fold: int) -> float:
        train = folded.filter(F.col("__fold") != fold)
        valid = folded.filter(F.col("__fold") == fold)
        model = _estimator(params, n_features).fit(train)
        ev = BinaryClassificationEvaluator(metricName="areaUnderROC")
        return ev.evaluate(model.transform(valid))

    try:
        # folds are independent fits over the one cached assignment —
        # overlap a few so fold j+1's tasks back-fill executors idled
        # by fold j's stage tails (guide §2.6).  pool.map keeps fold
        # order and each fit is deterministic on its fold's rows, so
        # the per-fold AUC list is identical to the sequential loop.
        # inheritable_thread_target: copy the caller's JVM thread-local
        # properties (job group / scheduler pool) into the pool threads
        # so tagging and cancellation apply to the overlapped fits
        # (ADVICE r12 — pinned-thread mode gives fresh properties).
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        # session form also inherits session tags (warning-free under
        # pinned threads)
        wrap = inheritable_thread_target(folded.sparkSession)
        with ThreadPoolExecutor(max_workers=min(3, max(1, k))) as pool:
            aucs = list(pool.map(wrap(_one_fold), range(k)))
    finally:
        folded.unpersist()
    return aucs
