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
    # -- round-4 rotation (VERDICT r3 item #2): the queries whose latest
    # driver proof is round 2 come first, so r03∪r04 covers the whole
    # registry with every proof at most two rounds old.
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
    # -- the round-3 red cell, re-run with the ::BIGINT oracle fix
    "events_props_json",
    # -- new round-4 queries (first driver row). nn_forward_pinned takes
    # the slot of the rows-only stratified_sample sentinel: a first
    # hash-checked proof beats re-running a rows-only row.
    "tree_path_encoding_pinned",
    "nn_forward_pinned",
    "streaming_eval_metrics",
    "image_jpeg_features",
    # PQ takes the kfold_cv/grid_search slots (rows-only sentinels whose
    # re-run carries less information than a first hash-checked proof;
    # both stay in the registry after the window)
    "pq_encode",
    "pq_adc_topk",
    "streaming_heavy_hitters",
    # late-round-4 queries (first driver row); they displace six
    # untouched r02-proven expression queries (unpivot/topk-orders/
    # doc_fingerprint/text_roundtrip/date_to_unix/concat_fields), whose
    # r02 rows are exactly two rounds old at this gate — a query with
    # NO row ever is the worse gap (the round-2 lesson)
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
    # -- continuation-session round-4 queries (first driver row): the
    # compressed-codec family (mu-law, IMA ADPCM, MJPEG/AVI) and the
    # retrieval/decontamination text pair. They take the slots of the
    # r03-proven sentinels (dedup_groups / embedding_neardup_lsh_scale /
    # tpch_q1 — all fresh at 1 round old), the rows-only rf_train
    # sentinel, and ngram_jaccard_pairs (r02; goes to the FRONT of the
    # r5 window with the other displaced r02 queries — see NOTES.md).
    "audio_mulaw_features",
    "audio_adpcm_features",
    "video_mjpeg_features",
    "bm25_topk",
    "decontamination_overlap",
    # quality-filter pair (first driver row); displaces the r02-proven
    # simhash_neardup_pairs / embedding_neardup_pairs sentinels (their
    # family siblings minhash_lsh_pairs / embedding_topk stay in-window;
    # both displaced names join the r5 front list in NOTES.md)
    "gopher_quality_flags",
    "quality_classifier_score",
    # sequence packing (first driver row); displaces the r02-proven
    # distinct_counts sentinel (trivial agg; the stats family keeps
    # column_stats + freq_items in-window) — r5 front list in NOTES.md
    "sequence_packing",
    # IVF-ADC (first driver row); displaces the r02-proven brute-force
    # embedding_topk baseline (the ANN family keeps pq_encode /
    # pq_adc_topk in-window) — r5 front list in NOTES.md
    "embedding_ivfpq_topk",
    # ANN recall ladder (first driver row); displaces sensitivity_se
    # (sibling sensitivity_st stays in-window) — r5 front list
    "ann_recall_report",
    # mixture sampling + streaming decontamination (first driver rows);
    # displace the r02-proven gain_buckets and multiclass_tag_recode
    # (the eval/normalize families keep many in-window greens) — both
    # displaced names join the r5 front list in NOTES.md
    "source_mixture_sample",
    "streaming_decontamination",
    # WARC archive ingest (first driver row); displaces the r02-proven
    # score_rescale expression map — r5 front list in NOTES.md
    "warc_extract_stats",
    # quality-aware dedup representative (first driver row); displaces
    # the r02-proven shingleset_dedup (exact_dedup + minhash_lsh_pairs
    # keep the family in-window) — r5 front list in NOTES.md
    "dedup_rep_by_quality",
    # GIF/LZW codec (first driver row); displaces the r02-proven
    # text_stats (the text family holds many r4 in-window greens) —
    # r5 front list in NOTES.md
    "video_gif_features",
    # webdataset shard ingest (first driver row); displaces the
    # r02-proven ksiv_weighted (categorical/equal_population keep the
    # family in-window) — r5 front list in NOTES.md
    "wds_shard_stats",
    # calibration/Brier eval pair (first driver rows); displace the
    # r02-proven psi_by_column and woe_normalize (each family keeps
    # fresher siblings in-window) — r5 front list in NOTES.md
    "calibration_buckets",
    "brier_score",
    # the end-to-end curation funnel (first driver row) — every LLM
    # pipeline stage composed and cross-checked in one query; displaces
    # the r02-proven segment_expansion (purify_filter keeps the family
    # in-window) — r5 front list in NOTES.md
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
