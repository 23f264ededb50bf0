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
# in dict order.  The window rotates every round so no oracle-backed query's
# latest green driver row slips more than two rounds stale (the judge's
# freshness standard); new queries MUST enter the first 50 or they are never
# driver-proven.  Every remaining proven query follows after slot 50, so the
# full registry stays exposed.
_PRIORITY = [
    # -- round-5 rotation (VERDICT r4 next-round item #1; NOTES.md item 17
    # is the authoritative displaced list): the 26 queries whose latest
    # driver proof is round 2 come FIRST so their freshness doesn't slip
    # past two rounds, followed by the three r02 rows-only training
    # sentinels, the three r03-proven mid-window names the verdict
    # scheduled explicitly, sentinels for every r5-touched code path, and
    # r03-proven fills (oldest-first central families).  New r5 queries
    # displace fills as they land — a first hash-checked proof beats a
    # sentinel re-run.
    # 1-26: the NOTES item-17 list, verbatim order.
    "unpivot_column_totals",
    "topk_orders_per_priority",
    "doc_fingerprint",
    "text_roundtrip_stats",
    "date_to_unix",
    "concat_fields",
    "token_count_by_source",
    "events_sessionize",
    "bin_avg_score",
    "weighted_gain_buckets",
    "ngram_jaccard_pairs",
    "rf_train",  # rows-only
    "simhash_neardup_pairs",
    "embedding_neardup_pairs",
    "distinct_counts",
    "embedding_topk",
    "sensitivity_se",
    "gain_buckets",
    "multiclass_tag_recode",
    "score_rescale",
    "shingleset_dedup",
    "text_stats",
    "ksiv_weighted",
    "psi_by_column",
    "woe_normalize",
    "segment_expansion",
    # 27-29: remaining r02-era rows-only training queries (VERDICT
    # missing #1 names them alongside the item-17 list).
    "grid_search",
    "kfold_cv",
    "stratified_sample",
    # 30-32: r03-proven, scheduled mid-window by VERDICT item #1.
    "dedup_groups",
    "embedding_neardup_lsh_scale",
    "tpch_q1",
    # 33-38: sentinels for r5-touched code paths — native_ntile gains a
    # row-cap guard, the RIFF/WAV walker gains size validation (ADVICE),
    # the GIF decoder gains descriptor checks (ADVICE), the AVI demuxer
    # is restricted to stream 00 (ADVICE), and bm25/ann_recall gain
    # checkpoint-release + shared-oracle-path fixes (ADVICE).
    "native_ntile_binning",
    "audio_wav_features",
    "video_gif_features",
    "video_mjpeg_features",
    "ann_recall_report",
    "bm25_topk",
    # 39-50: r03-proven fills, central families first; the last four are
    # displaced by new round-5 queries as they land.
    "roc_auc",
    "salted_group_counts",  # r3→r4 1.64x jitter watch (VERDICT wrong #5)
    # new round-5 queries (first driver row): the deterministic scoring
    # halves of the LR and RF training families (VERDICT item #5),
    # displacing the dynamic_binning / reason_codes fills (both
    # r03-proven, binning/posttrain families keep siblings in-window).
    "lr_forward_pinned",
    "rf_forward_pinned",
    # REAL FLAC codec (first driver row); displaces the r03-proven
    # eval_meta_score fill (the eval family keeps roc/pr/confusion
    # in-window).
    "audio_flac_features",
    # streaming packing twin (first driver row; 10th streaming
    # pattern); displaces the r03-proven streaming_running_stats fill
    # (the streaming family keeps drift_psi + four r04 greens).
    "streaming_sequence_packing",
    # streaming mixture twin (first driver row; 11th pattern);
    # displaces the r03-proven hybrid_column_woe fill (the normalize
    # family holds several front-of-window r02 re-proofs).
    "streaming_source_mixture",
    # PII scrubbing + in-doc repetition filter (first driver rows);
    # displace the r03-proven pr_auc / confusion_matrix_points fills
    # (roc_auc keeps the curve family in-window; both displaced names
    # join the r6 front list in NOTES.md).
    "pii_redaction",
    "repetition_signals",
    # GBT combine half (first driver row; completes the pinned scoring
    # halves of the training family); displaces the r03-proven
    # freq_items fill (column_stats-era stats family is well covered) —
    # freq_items joins the r6 front list in NOTES.md.
    "gbt_forward_pinned",
    # per-source corpus report card (first driver row); displaces the
    # r03-proven auto_filter fill — auto_filter joins the r6 front
    # list in NOTES.md.
    "corpus_report_by_source",
    # Z-order layout planner (first driver row); displaces the
    # r03-proven streaming_drift_psi fill (streaming holds two r05
    # first-proofs + four r04 greens in recent windows) — drift_psi
    # joins the r6 front list in NOTES.md.
    "zorder_skipping_stats",
    # -- everything below is OUTSIDE the 50-slot gate window; kept in
    # rough round-4 order so the full registry stays exposed.
    "column_stats",
    "zscore_normalize",
    "psi_events_by_day",
    "correlation_matrix",
    "combo_score_join",
    "nation_revenue",
    "purify_filter",
    "exact_dedup",
    "minhash_lsh_pairs",
    "ksiv_categorical",
    "ksiv_equal_population",
    "varselect_top_iv",
    "sensitivity_st",
    "events_props_json",
    "tree_path_encoding_pinned",
    "nn_forward_pinned",
    "streaming_eval_metrics",
    "image_jpeg_features",
    "pq_encode",
    "pq_adc_topk",
    "streaming_heavy_hitters",
    "categorical_index_normalize",
    "asis_woe_normalize",
    "invalid_tag_filter",
    "unigram_logprob_quality",
    "chunk_dup_fraction",
    "ksiv_equal_negative",
    "hash_stratified_sample",
    "kfold_assignment",
    "streaming_dim_enrichment",
    "streaming_attribution_join",
    "audio_mulaw_features",
    "audio_adpcm_features",
    "decontamination_overlap",
    "gopher_quality_flags",
    "quality_classifier_score",
    "sequence_packing",
    "embedding_ivfpq_topk",
    "source_mixture_sample",
    "streaming_decontamination",
    "warc_extract_stats",
    "dedup_rep_by_quality",
    "wds_shard_stats",
    "calibration_buckets",
    "brier_score",
    "corpus_curation_funnel",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # a typo'd or stale priority name would silently shift every later
    # query out of the 50-slot gate window — fail loudly instead
    # (explicit raise, not assert: assert compiles out under python -O)
    unknown = [n for n in _PRIORITY if n not in QUERIES]
    if unknown:
        raise ValueError(f"_PRIORITY names not in registry: {unknown}")
    ordered = {n: QUERIES[n] for n in _PRIORITY}
    ordered.update({n: fn for n, fn in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
