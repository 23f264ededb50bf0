"""Posttrain operators: sensitivity variable selection, reason codes,
tree-path encoding, feature importance.

Reference:
  * Sensitivity SE/ST (core/varselect/VarSelectMapper.java:54-340,
    VarSelectReducer.java:39-226): score each row, re-score with column i
    masked (filled with its mean), accumulate per-column MSE of the score
    delta (SE) or vs target (ST); rank columns.
  * Reason codes (udf/CalculateReasonCodeUDF.java, core/Reasoner.java):
    top contributing variables per scored row.
  * Tree-path encoding (udf/EncodeDataUDF.java:45-120, TreeModel.encode):
    each row -> per-tree leaf index at depth d (feature generation).
  * Feature importance (core/posttrain/FeatureImportanceMapper.java:53).

Spark shapes:
  * Sensitivity runs as ONE Arrow-batched mapInPandas pass with the
    model's weight vector broadcast — each batch computes the base score
    and all masked scores vectorized (numpy matrix ops), emitting
    per-column partial (sum, sumsq, n) rows; a tiny groupBy finalizes.
    The reference needed a cached network per mapper; numpy re-scoring a
    masked LR column is a rank-1 update: s_masked = s - w_j (x_j - mean_j).
  * Reason codes for linear models are PURE column expressions
    (contribution_j = w_j·x_j) — sort_array of (|contrib|, name) structs,
    no Python.
  * Tree-path encoding extracts each tree's (feature, threshold,
    left, right) arrays once on the driver, broadcasts, and traverses in
    a vectorized pandas UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Sensitivity (SE) for linear models
# ---------------------------------------------------------------------------

def sensitivity_se(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    intercept: float,
    means: list[float] | None = None,
) -> DataFrame:
    """Per-column SE = mean squared delta between base score and the
    column-masked score (VarSelectMapper semantics, SE mode).

    LR: s = sigmoid(w·x + b); masking column j to its mean shifts the
    logit by -w_j (x_j - mean_j) — one rank-1 update per column, fully
    vectorized per Arrow batch. Returns (column_name, se, rank).
    """
    w = np.asarray(weights, dtype=np.float64)
    mu = np.asarray(means if means is not None else [0.0] * len(w), dtype=np.float64)
    cols = list(feature_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sums = np.zeros(len(cols))
        count = 0
        for pdf in batches:
            x = pdf[cols].to_numpy(dtype=np.float64)
            logit = x @ w + intercept
            base = 1.0 / (1.0 + np.exp(-logit))
            # masked logit for column j = logit - w_j (x_j - mu_j)
            delta = w[None, :] * (x - mu[None, :])  # (n, k)
            masked = 1.0 / (1.0 + np.exp(-(logit[:, None] - delta)))
            sums += ((masked - base[:, None]) ** 2).sum(axis=0)
            count += len(pdf)
        yield pd.DataFrame({"column_name": cols, "sq_sum": sums, "n": [count] * len(cols)})

    partials = df.select(*cols).mapInPandas(run, "column_name string, sq_sum double, n long")
    agg = partials.groupBy("column_name").agg(
        (F.sum("sq_sum") / F.sum("n")).alias("se")
    )
    from pyspark.sql import Window

    # bounded: unpartitioned rank over #feature-columns rows (catalog-scale)
    rk = F.row_number().over(Window.orderBy(F.desc("se"), F.asc("column_name")))
    return agg.withColumn("rank", rk).select("rank", "column_name", F.round("se", 8).alias("se"))


def sensitivity_st(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    intercept: float,
    label_col: str,
    means: list[float] | None = None,
) -> DataFrame:
    """Per-column ST = mean squared (target − column-masked score).

    The other half of the wrapper varselect (VarSelectMapper.java:306-309:
    ``diff = outputs[0] - currentModelScore`` under FILTER_BY_ST;
    VarSelectReducer ranks by rms desc — identical ordering to ranking by
    this MSE). Masking fills column j with its mean, a rank-1 logit
    update, so one Arrow pass scores all masked variants per batch.
    Returns (rank, column_name, st).
    """
    w = np.asarray(weights, dtype=np.float64)
    mu = np.asarray(means if means is not None else [0.0] * len(w), dtype=np.float64)
    cols = list(feature_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sums = np.zeros(len(cols))
        count = 0
        for pdf in batches:
            x = pdf[cols].to_numpy(dtype=np.float64)
            y = pdf[label_col].to_numpy(dtype=np.float64)
            logit = x @ w + intercept
            delta = w[None, :] * (x - mu[None, :])  # (n, k)
            masked = 1.0 / (1.0 + np.exp(-(logit[:, None] - delta)))
            sums += ((y[:, None] - masked) ** 2).sum(axis=0)
            count += len(pdf)
        yield pd.DataFrame({"column_name": cols, "sq_sum": sums, "n": [count] * len(cols)})

    partials = df.select(label_col, *cols).mapInPandas(
        run, "column_name string, sq_sum double, n long"
    )
    agg = partials.groupBy("column_name").agg((F.sum("sq_sum") / F.sum("n")).alias("st"))
    from pyspark.sql import Window

    # bounded: unpartitioned rank over #feature-columns rows (catalog-scale)
    rk = F.row_number().over(Window.orderBy(F.desc("st"), F.asc("column_name")))
    return agg.withColumn("rank", rk).select("rank", "column_name", F.round("st", 8).alias("st"))


# ---------------------------------------------------------------------------
# Reason codes for linear models — pure expressions
# ---------------------------------------------------------------------------

def reason_codes_linear(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    top_k: int = 3,
) -> DataFrame:
    """Top-k |w_j·x_j| contributing features per row as an array column.

    CalculateReasonCodeUDF semantics for the linear case — entirely
    JVM-side: array of (abs contrib desc, name) structs, sorted, sliced.
    """
    from shifu_spark.functions.nonvalue import is_value

    # a MISSING (NULL/NaN/±Inf) feature contributes NOTHING — it can
    # never be a reason. Unguarded, a NULL contribution's sort position
    # flips between engines (Spark structs sort NULL fields first,
    # DuckDB last) and an Inf value would always rank itself first.
    entries = [
        F.struct(
            F.when(
                is_value(F.col(c).cast("double")),
                F.abs(F.col(c).cast("double") * float(w)),
            )
            .otherwise(F.lit(0.0))
            .alias("a"),
            F.lit(c).alias("name"),
        )
        for c, w in zip(feature_cols, weights)
    ]
    arr = F.reverse(F.array_sort(F.array(*entries)))  # sort by a asc, then name; reversed = desc
    top = F.slice(arr, 1, top_k)
    return df.withColumn("reason_codes", F.transform(top, lambda s: s["name"]))


# ---------------------------------------------------------------------------
# Tree-path encoding
# ---------------------------------------------------------------------------

def extract_tree(java_root) -> dict[str, list]:
    """Flatten an MLlib decision tree into parallel arrays
    (feature, threshold, left, right, prediction); leaves have
    feature == -1 and carry the node prediction."""
    feat: list[int] = []
    thr: list[float] = []
    left: list[int] = []
    right: list[int] = []
    pred: list[float] = []

    def walk(node) -> int:
        idx = len(feat)
        cls = node.getClass().getSimpleName()
        if cls == "InternalNode":
            split = node.split()
            if split.getClass().getSimpleName() != "ContinuousSplit":
                # a CategoricalSplit routes by set membership, not by a
                # threshold compare — silently encoding it as x <= 0.0
                # would produce wrong leaf indices / ensemble scores /
                # PMML with no error (pmml.py's raise-on-unsupported
                # policy applies here too). Train without categorical
                # feature metadata (the repo's normalize pipeline feeds
                # indexed/woe'd NUMERIC features) or one-hot upstream.
                raise ValueError(
                    "extract_tree: categorical splits are not supported "
                    f"(feature {split.featureIndex()})"
                )
            feat.append(split.featureIndex())
            thr.append(float(split.threshold()))
            left.append(-1)
            right.append(-1)
            pred.append(float(node.prediction()))
            li = walk(node.leftChild())
            ri = walk(node.rightChild())
            left[idx], right[idx] = li, ri
        else:
            feat.append(-1)
            thr.append(0.0)
            left.append(-1)
            right.append(-1)
            pred.append(float(node.prediction()))
        return idx

    walk(java_root)
    return {"feature": feat, "threshold": thr, "left": left, "right": right, "prediction": pred}


def tree_path_encode_trees(
    df: DataFrame,
    feature_cols: list[str],
    trees: list[dict[str, list]],
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Leaf-index encoding against explicit tree structures (the lookup
    half of EncodeDataUDF.java:45-120, independent of any model fit).

    ``trees`` are preorder parallel-array dicts as produced by
    :func:`extract_tree` (feature/threshold/left/right/prediction; leaves
    have feature == -1). The per-batch traversal is fully vectorized:
    all rows advance one tree level per numpy step, so cost is
    O(rows × depth) with no Python-per-row work. ``keep_cols`` are
    passthrough id columns carried alongside the features.
    """
    keep = list(keep_cols or [])
    cols = list(feature_cols)
    sel = df.select(*keep, *cols)
    # build the output schema structurally: string-hacking simpleString()
    # breaks on nested types (replace/rstrip eat a nested struct's own
    # angle brackets, e.g. a keep col typed array<string>)
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    schema = StructType(
        list(sel.schema.fields)
        + [StructField("tree_leaves", ArrayType(IntegerType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = pdf[cols].to_numpy(dtype=np.float64)
            n = len(pdf)
            leaves = np.zeros((n, len(trees)), dtype=np.int32)
            for t_i, t in enumerate(trees):
                feat = np.asarray(t["feature"])
                thr = np.asarray(t["threshold"])
                lft = np.asarray(t["left"])
                rgt = np.asarray(t["right"])
                node = np.zeros(n, dtype=np.int64)
                active = feat[node] >= 0
                while active.any():
                    f = feat[node[active]]
                    goes_left = x[active, f] <= thr[node[active]]
                    nxt = np.where(goes_left, lft[node[active]], rgt[node[active]])
                    node[active] = nxt
                    active = feat[node] >= 0
                leaves[:, t_i] = node
            out = pdf.copy()
            out["tree_leaves"] = list(leaves)
            yield out

    return sel.mapInPandas(run, schema)


def tree_forward_score(
    trees: list[dict[str, list]],
    leaves_col: str = "tree_leaves",
    weights: list[float] | None = None,
    mode: str = "rf",
):
    """Ensemble forward score from per-tree leaf indices — the scoring
    half of IndependentTreeModel.compute (IndependentTreeModel.java:
    390-445: RF = weighted AVERAGE of per-tree leaf predictions,
    GBT = weighted SUM; predictNode:516 is the traversal half, driven
    here by :func:`tree_path_encode_trees`).

    Pure JVM column expression: each tree's prediction array becomes an
    array literal, ``element_at`` looks up the leaf, and the weighted
    terms fold sequentially in tree order (matching the reference's
    accumulation order, so doubles are bit-identical to a SQL mirror).
    """
    if mode not in ("rf", "gbt"):
        raise ValueError(f"mode must be 'rf' or 'gbt', got {mode!r}")
    if not trees:
        raise ValueError("tree_forward_score needs at least one tree")
    if weights is None:
        weights = [1.0] * len(trees)
    if mode == "rf" and float(sum(weights)) == 0.0:
        raise ValueError("rf mode needs a nonzero weight sum (weighted average)")
    leaf = F.col(leaves_col)
    acc = None
    for t_i, (t, w) in enumerate(zip(trees, weights)):
        pred = F.element_at(
            F.array(*[F.lit(float(p)) for p in t["prediction"]]),
            leaf.getItem(t_i) + 1,
        )
        term = pred * float(w)
        acc = term if acc is None else acc + term
    if mode == "gbt":
        return acc
    return acc / float(sum(weights))


def tree_path_encode(df: DataFrame, feature_cols: list[str], tree_model) -> DataFrame:
    """Per-tree leaf index per row (EncodeDataUDF / TreeModel.encode).

    Extracts tree structures driver-side once, broadcasts the arrays,
    traverses vectorized in mapInPandas. Output: input columns + an
    array<int> ``tree_leaves`` (one slot per tree).
    """
    trees = []
    jm = tree_model._java_obj
    if hasattr(jm, "trees"):
        for jt in jm.trees():
            trees.append(extract_tree(jt.rootNode()))
    else:
        trees.append(extract_tree(jm.rootNode()))
    return tree_path_encode_trees(df, feature_cols, trees)


def feature_importance_df(tree_model, feature_cols: list[str]) -> list[tuple[str, float]]:
    """MLlib featureImportances -> (column, importance) ranked desc
    (FeatureImportanceMapper/Reducer replacement)."""
    imps = tree_model.featureImportances
    pairs = [(feature_cols[i], float(imps[i])) for i in range(len(feature_cols))]
    return sorted(pairs, key=lambda p: (-p[1], p[0]))
