"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent SQL for the correctness gate.

Column names are aliased identically on both sides; floating aggregates
are rounded to 6 decimals on both sides so the order-insensitive value
hash is stable across engines (double summation order differs).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shifu_spark.queries import QUERIES, ORACLES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary on sf0.001 lineitem."""
    return QUERIES["tpch_q1"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks the first 50 entries of ``queries()``
# in dict order.  Round 2 proved 50 queries (CORRECTNESS_r02.json); the 32
# registered after them never got a driver row.  Per VERDICT.md round-2 item
# #1 we rotate: the round-2-unproven queries (plus anything newly added this
# round) come first, then sentinel re-checks of the already-proven core
# family fill the window to 50.  Every remaining proven query follows, so
# the full registry is still exposed.
_PRIORITY = [
    # -- 32 queries registered at positions 50-81 in round 2 (driver-unproven)
    "eval_meta_score",
    "reason_codes",
    "tree_path_encoding",
    "onehot_normalize",
    "discrete_zscore_normalize",
    "woe_zscore_normalize",
    "hybrid_normalize",
    "old_zscale_normalize",
    "weight_hybrid_normalize",
    "zscale_onehot_normalize",
    "category_missing_mean",
    "mean_impute",
    "pr_auc",
    "feature_importance",
    "freq_items",
    "embedding_lsh_topk",
    "weighted_confusion",
    "multiclass_confusion",
    "sgd_lr_train",
    "nn_train",
    "ga_varselect",
    "dynamic_binning",
    "embedding_ivf_topk",
    "embedding_ivf_multiprobe",
    "kmeans_step_centroids",
    "confusion_matrix_scalable",
    "events_props_json",
    "weighted_roc_auc",
    "dedup_groups",
    "salted_group_counts",
    "audio_wav_features",
    "image_ppm_features",
    # -- new round-3 queries (need their first driver row)
    "embedding_neardup_lsh_scale",
    "streaming_sessionize",
    "streaming_minhash_dedup",
    "streaming_running_stats",
    "auto_filter",
    "native_ntile_binning",
    "gain_chart_export",
    "ksiv_equal_positive",
    "varselect_top_ks",
    "image_png_features",
    "video_y4m_features",
    # -- sentinel re-checks of the round-2-proven core family, biased
    # toward the paths round 3 touched (curve metrics, streaming ts)
    "tpch_q1",
    "ksiv_equal_interval",
    "confusion_matrix_points",
    "roc_auc",
    "weighted_pr_auc",
    "streaming_drift_psi",
    "hybrid_column_woe",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # a typo'd or stale priority name would silently shift every later
    # query out of the 50-slot gate window — fail loudly instead
    unknown = [n for n in _PRIORITY if n not in QUERIES]
    assert not unknown, f"_PRIORITY names not in registry: {unknown}"
    ordered = {n: QUERIES[n] for n in _PRIORITY}
    ordered.update({n: fn for n, fn in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
