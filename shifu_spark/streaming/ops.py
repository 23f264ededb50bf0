"""Streaming operators beyond the batch surface.

The reference is strictly batch (SURVEY §2.9); these are the Structured
Streaming counterparts of its operators plus the stateful running-stats
accumulator it only has as a local helper:

  * streaming dedup     — exact content dedup inside the watermark, the
                          stream form of operators/dedup.exact_dedup_df
  * session windows     — gap-based sessionization (the stream form of the
                          batch events_sessionize query)
  * running stats       — per-key Welford mean/variance carried across
                          micro-batches via ``applyInPandasWithState``
                          (core/StreamStatsCalculator.java:30-126 keeps the
                          same running moments single-node; here the state
                          store shards it by key)

State bounds: dedup state = digests inside the watermark horizon; session
state = open sessions per key; running stats = one (n, mean, M2) triple
per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first occurrence of each content digest within the
    watermark horizon. ``dropDuplicatesWithinWatermark`` keys the state
    store by digest AND evicts entries once the watermark passes them —
    plain ``dropDuplicates(["digest"])`` would never clean its state
    (Spark only evicts dedup state when the event-time column is part of
    the subset), growing one row per distinct digest forever. Late
    re-occurrences past the watermark are the accepted trade for bounded
    state (document-dedup at stream scale is always horizoned)."""
    return (
        stream.withColumn("digest", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )


def streaming_sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session aggregation: (key, session_start, session_end,
    n_events). ``session_window`` merges events closer than ``gap``; the
    watermark closes sessions so state stays bounded."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Stateful running moments (applyInPandasWithState)
# ---------------------------------------------------------------------------

RUNNING_STATS_SCHEMA = "key string, n long, mean double, std double"
_STATE_SCHEMA = "n long, mean double, m2 double"


def _welford_fn(key, pdfs, state):
    """Merge each micro-batch into Welford (n, mean, M2) state.

    Batch side uses numpy for the in-batch moments, then a single
    Chan-et-al merge with the carried state — numerically stable and
    O(1) state per key."""
    import math

    import numpy as np

    if state.exists:
        n, mean, m2 = state.get
    else:
        n, mean, m2 = 0, 0.0, 0.0
    for pdf in pdfs:
        x = pdf["value"].to_numpy(dtype=float)
        bn = len(x)
        if bn == 0:
            continue
        bmean = float(x.mean())
        bm2 = float(((x - bmean) ** 2).sum())
        if n == 0:
            n, mean, m2 = bn, bmean, bm2
        else:
            delta = bmean - mean
            tot = n + bn
            m2 = m2 + bm2 + delta * delta * n * bn / tot
            mean = mean + delta * bn / tot
            n = tot
    state.update((n, mean, m2))
    std = math.sqrt(m2 / (n - 1)) if n > 1 else 0.0
    import pandas as pd

    yield pd.DataFrame({"key": [key[0]], "n": [n], "mean": [mean], "std": [std]})


CENTS_STATS_SCHEMA = "key string, n long, sum_c long, sumsq_c long"
_CENTS_STATE_SCHEMA = "n long, sum_c long, sumsq_c long"


def _cents_fn(key, pdfs, state):
    """Exact integer-cent moment accumulation (2-decimal metrics).

    Unlike float Welford, integer sums are associative — the result is
    independent of row order, batch boundaries, AND engine float
    behavior, so a DuckDB oracle can match it bit-for-bit. int64 bounds:
    sum_c < 2^53 keeps the downstream double division exact-input;
    sumsq_c overflows int64 only past ~10^12 rows·cent² per key."""
    import numpy as np
    import pandas as pd

    if state.exists:
        n, s, ss = state.get
    else:
        n, s, ss = 0, 0, 0
    for pdf in pdfs:
        x = pdf["value"].to_numpy(dtype=float)
        # NULL/NaN/±Inf are MISSING (the engine-wide nonvalue class):
        # skip like SQL aggregates — a bare ~isnan let ±Inf through to
        # astype(int64), whose result is undefined (observed INT64_MIN)
        x = x[np.isfinite(x)]
        # half-AWAY-from-zero to match SQL round(); np.rint rounds half
        # to even (0.125 -> 12 vs SQL's 13)
        c = (np.sign(x) * np.floor(np.abs(x) * 100.0 + 0.5)).astype(np.int64)
        n += len(c)
        s += int(c.sum())
        ss += int((c * c).sum())
    state.update((n, s, ss))
    yield pd.DataFrame({"key": [key[0]], "n": [n], "sum_c": [s], "sumsq_c": [ss]})


def streaming_running_stats_exact_cents(
    stream: DataFrame,
    key_col: str,
    value_col: str = "value",
) -> DataFrame:
    """Per-key running moments with EXACT integer-cent state.

    The oracle-deterministic twin of :func:`streaming_running_stats` for
    fixed-2-decimal metrics: emits (key, n, sum_c, sumsq_c); derive
    mean = sum_c/(100n) and std = sqrt((n·sumsq_c − sum_c²)/(n(n−1)))/100
    as double ops over the exact integers — identical on every engine."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = stream.select(
        F.col(key_col).cast("string").alias("key"), F.col(value_col).alias("value")
    )
    return src.groupBy("key").applyInPandasWithState(
        _cents_fn,
        outputStructType=CENTS_STATS_SCHEMA,
        stateStructType=_CENTS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_running_stats(
    stream: DataFrame,
    key_col: str,
    value_col: str = "value",
) -> DataFrame:
    """Per-key running mean/std across micro-batches.

    ``applyInPandasWithState`` shards the (n, mean, M2) state by key in
    the state store — the distributed form of the reference's
    StreamStatsCalculator.add() loop. Emits the updated stats row for
    every key seen in the batch (update semantics)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = stream.select(F.col(key_col).cast("string").alias("key"), F.col(value_col).alias("value"))
    return src.groupBy("key").applyInPandasWithState(
        _welford_fn,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_windowed_key_counts(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed per-key counts — the state backbone of streaming top-k /
    heavy hitters. State = (windows inside the watermark × distinct
    keys); for an unbounded key domain, bucket or sketch the key
    upstream (the same bounding move as streaming_score_counts)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "key", "cnt")
    )


def top_k_per_window(counts: DataFrame, k: int = 3) -> DataFrame:
    """Top-k keys per window by count (count desc, key asc tiebreak).
    Window functions partition by window_start — windows rank in
    parallel, no global sort."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(F.desc("cnt"), F.asc("key"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("window_start", F.col("rank").cast("int").alias("rank"), "key", "cnt")
        .orderBy("window_start", "rank")
    )


# ---------------------------------------------------------------------------
# Streaming sequence packing (applyInPandasWithState)
# ---------------------------------------------------------------------------

PACKING_SCHEMA = (
    "doc_id long, shard int, n_tokens int, tok_offset long, first_seq long, n_seqs long"
)
_PACK_STATE_SCHEMA = "total long"


def streaming_sequence_packing(src: DataFrame, budget: int = 512) -> DataFrame:
    """Per-shard running token-offset assignment over a document stream —
    the streaming twin of the batch sequence-packing plan (GPT-style
    concat-and-chop into fixed ``budget``-token sequences).

    ``src`` must provide (doc_id, n_tokens, shard). State per shard is a
    single long: the shard's cumulative token count. Each micro-batch's
    docs are packed in doc_id order continuing from the carried offset,
    so offsets are exact across any batch boundary (pinned by
    tests/test_streaming_ops.py against the batch plan over a 2-batch
    replay). Packing is inherently arrival-order-defined; a bounded
    replay whose arrival order is doc_id order reproduces the batch
    result exactly. Scale shape: state is O(shards) longs, each output
    row is emitted exactly once (append mode)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd

        total = state.get[0] if state.exists else 0
        frames = [p[["doc_id", "n_tokens"]] for p in pdfs]
        rows = pd.concat(frames).sort_values("doc_id")
        # NULL n_tokens (an un-tokenizable NULL-text doc): consumes 0
        # tokens at the running offset and emits NULL n_tokens/n_seqs —
        # the batch twin's driver-proven contract; a bare astype(int64)
        # was a job-killing crash on the NaN
        n_raw = rows["n_tokens"]
        miss = n_raw.isna()
        n_tok = n_raw.fillna(0).astype("int64")
        tok_offset = n_tok.cumsum() - n_tok + total
        first_seq = tok_offset // budget
        n_seqs = ((tok_offset + n_tok - 1) // budget - first_seq + 1).astype("Int64")
        n_seqs[miss] = pd.NA
        state.update((int(total + int(n_tok.sum())),))
        # a NULL doc_id hashes to the NULL shard — its own packing group
        # with its own running offset (the batch twin's driver-proven
        # contract); int(key[0]) on that group key was a NaN crash
        shard_val = None if pd.isna(key[0]) else int(key[0])
        yield pd.DataFrame(
            {
                "doc_id": rows["doc_id"].astype("Int64"),
                "shard": pd.Series([shard_val] * len(rows), dtype="Int32"),
                "n_tokens": n_raw.astype("Int64"),
                "tok_offset": tok_offset,
                "first_seq": first_seq,
                "n_seqs": n_seqs,
            }
        )

    return src.groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType=PACKING_SCHEMA,
        stateStructType=_PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ASOF_SCHEMA = (
    "user_id long, purchase_id long, ts_us long, click_id long, click_ts_us long"
)
_ASOF_STATE_SCHEMA = "last_ts_us long, last_id long"


def streaming_asof_attribution(src: DataFrame) -> DataFrame:
    """Streaming AS-OF join (the stream twin of operators/join.asof_join):
    every purchase event emits the same user's most recent click
    at-or-before it, carried across micro-batches.

    ``src`` must provide (user_id, event_id, event_type, ts_us). State
    per user is the MINIMAL as-of state — one (last_click_ts, id) pair;
    each micro-batch's events replay in (ts_us, event_id) order
    continuing from the carried pair. Exact vs the batch as-of join
    whenever micro-batches arrive in event-time order (the bounded
    availableNow file replay, pinned by a 2-batch test); a production
    deployment tolerates cross-batch disorder by buffering clicks
    inside the watermark horizon before folding them into this state —
    same output, O(horizon) instead of O(1) state.
    Scale shape: state is one pair per user; each purchase row is
    emitted exactly once (append mode)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd

        last_ts, last_id = state.get if state.exists else (None, None)
        rows = pd.concat(list(pdfs))
        out = {"purchase_id": [], "ts_us": [], "click_id": [], "click_ts_us": []}
        # a NULL-ts purchase cannot be event-time ordered: it emits with
        # NO attributable click — exactly the ASOF LEFT oracle, where the
        # NULL comparison matches nothing (NULL-ts clicks are filtered
        # upstream; int(NaN) here was a job-killing crash)
        null_ts = rows["ts_us"].isna()
        for _, r in rows[null_ts & (rows["event_type"] == "purchase")].iterrows():
            out["purchase_id"].append(int(r["event_id"]))
            out["ts_us"].append(None)
            out["click_id"].append(None)
            out["click_ts_us"].append(None)
        for _, r in rows[~null_ts].sort_values(["ts_us", "event_id"]).iterrows():
            if r["event_type"] == "click":
                last_ts, last_id = int(r["ts_us"]), int(r["event_id"])
            elif r["event_type"] == "purchase":
                out["purchase_id"].append(int(r["event_id"]))
                out["ts_us"].append(int(r["ts_us"]))
                out["click_id"].append(last_id)
                out["click_ts_us"].append(last_ts)
        if last_id is not None:
            state.update((last_ts, last_id))
        # NULL-user purchases form the NULL group; their clicks were
        # filtered upstream (NULL joins nothing), so they emit unmatched
        user_val = None if pd.isna(key[0]) else int(key[0])
        yield pd.DataFrame(
            {
                "user_id": pd.Series([user_val] * len(out["purchase_id"]), dtype="Int64"),
                "purchase_id": pd.Series(out["purchase_id"], dtype="int64"),
                "ts_us": pd.Series(out["ts_us"], dtype="Int64"),
                "click_id": pd.Series(out["click_id"], dtype="Int64"),
                "click_ts_us": pd.Series(out["click_ts_us"], dtype="Int64"),
            }
        )

    # clicks with no user or no event time can never attach to a
    # purchase (the oracle's NULL equality / NULL ts-compare semantics)
    flt = src.filter(
        F.col("event_type").isin("click", "purchase")
        & ~(
            (F.col("event_type") == "click")
            & (F.col("user_id").isNull() | F.col("ts_us").isNull())
        )
    )
    return flt.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=ASOF_SCHEMA,
        stateStructType=_ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_cms_windowed(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    window: str = "1 day",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Windowed Count-Min sketch build over a stream (13th pattern):
    per event-time window, the (row_i, bucket) counter table from
    operators/sketch — the CONSTANT-state form of windowed heavy
    hitters: state is (windows inside the watermark) × depth × width
    counters no matter how many distinct keys flow through, which is
    exactly what an unbounded key domain needs (the documented caveat
    on streaming_windowed_key_counts). Stateless per-row bucket
    computation + one windowed groupBy; estimates finalize batch-side
    from the sink."""
    from shifu_spark.operators.sketch import CMS_DEPTH, CMS_WIDTH, cms_bucket_expr

    buckets = F.array(
        *[cms_bucket_expr(key_col, i, CMS_WIDTH) for i in range(CMS_DEPTH)]
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.posexplode(buckets).alias("row_i", "bucket"))
        .groupBy(F.window(ts_col, window).alias("w"), "row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "row_i", "bucket", "cnt")
    )


def start_gold_table_foreach_batch(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    gold_path: str,
    checkpoint_path: str,
):
    """Incremental GOLD-TABLE maintenance (the medallion upsert pattern):
    each micro-batch's per-key partial aggregates MERGE into a parquet
    gold table holding one row per key with running (n, sum, max).

    The merge is read-modify-overwrite on the aggregate-sized gold table
    (atomic swap via a temp directory rename) — with a lakehouse table
    format you would express the same thing as ``MERGE INTO`` and skip
    the rewrite; the STREAMING side is identical either way.

    The stream carries RAW rows and each batch aggregates INSIDE
    foreachBatch: a streaming-graph groupBy would hold cumulative state
    and emit totals-so-far in update mode, which a downstream merge
    would double-count — per-batch deltas must come from a stateless
    graph. The gold table stays key-cardinality-sized and sums
    accumulate in DECIMAL(38,10), so the merged totals equal a batch
    aggregate over the union of all input exactly (pinned by the
    2-batch replay test)."""
    import os
    import shutil
    import uuid

    # one token per CHECKPOINT INSTANCE, not per start() call and not per
    # path: the at-least-once replay this marker suppresses (failure after
    # the directory swap but before the checkpoint commit) only surfaces
    # across a query RESTART — which re-invokes this function, so a
    # per-start uuid would mint a fresh token and the replayed batch would
    # re-merge and double-count. A path-derived token would survive too
    # much: deleting the checkpoint dir and restarting at the same path
    # restarts batch ids at 0, and a token that is a pure function of the
    # path would wrongly suppress the new stream's first batches. So the
    # nonce is PERSISTED INSIDE the checkpoint dir itself — it lives and
    # dies with exactly the batch-id sequence it guards: restarts of the
    # same checkpoint reuse it (replays suppressed), a reset or a new
    # checkpoint mints a new one (fresh batch 0..N merge normally), and
    # path spelling (relative/absolute/symlink) is irrelevant.
    # This sink's merge machinery (open/os.rename/shutil on gold_path,
    # nonce file below) is LOCAL-FILESYSTEM by construction — on a
    # URI-addressed store the nonce would land on one driver's local
    # disk and a restart elsewhere would mint a fresh token, silently
    # re-enabling the double-count this guard exists to prevent. Fail
    # loudly instead; at that scale the gold table belongs in a
    # lakehouse MERGE INTO sink (module docstring).
    # reject ANY scheme-prefixed path, not just '://' forms: single-slash
    # Hadoop URIs (file:/tmp/ckpt, hdfs:/x) are valid to Spark, so the
    # checkpoint would resolve at the URI location while the Python-side
    # nonce/marker I/O below writes a literal local directory named
    # 'file:' — silently re-enabling the stale-token double-count this
    # guard exists to prevent.  RFC 3986 scheme = ALPHA *(ALPHA / DIGIT /
    # "+" / "-" / "."); requiring >=2 chars before the colon keeps
    # Windows drive letters (C:\x) legal.
    import re as _re

    for p in (checkpoint_path, gold_path):
        if _re.match(r"^[A-Za-z][A-Za-z0-9+.\-]+:", p):
            raise ValueError(
                f"start_gold_table_foreach_batch requires local-filesystem "
                f"paths (got {p!r}); use a lakehouse MERGE sink for "
                "URI-addressed storage"
            )
    os.makedirs(checkpoint_path, exist_ok=True)
    nonce_path = os.path.join(checkpoint_path, "_gold_run_token")
    if os.path.isfile(nonce_path):
        with open(nonce_path) as fh:
            run_token = fh.read().strip()
    else:
        run_token = uuid.uuid4().hex[:16]
        with open(nonce_path, "w") as fh:
            fh.write(run_token)

    def _merge(raw_df: DataFrame, batch_id: int) -> None:
        if raw_df.isEmpty():
            return
        # idempotency on batch replay: foreachBatch is at-least-once — a
        # failure AFTER the swap but BEFORE the checkpoint commit re-runs
        # the same batch_id on restart, and re-merging would double-count
        # n/sum permanently. The (run token, last applied batch_id) pair
        # rides INSIDE the swapped directory (underscore-prefixed files
        # are invisible to the parquet reader, like _SUCCESS), so table +
        # marker move atomically together.
        marker = os.path.join(gold_path, "_last_batch")
        if os.path.isfile(marker):
            with open(marker) as fh:
                tok, _, last = fh.read().strip().partition(" ")
                if tok == run_token and last and batch_id <= int(last):
                    return
        batch_df = raw_df.groupBy(F.col(key_col).alias("key")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(38,10)")).alias("s"),
            F.max(F.col(value_col)).alias("mx"),
        )
        spark = raw_df.sparkSession
        if os.path.isdir(gold_path):
            cur = spark.read.parquet(gold_path)
            merged = (
                cur.unionByName(batch_df)
                .groupBy("key")
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("s").cast("decimal(38,10)").alias("s"),
                    F.max("mx").alias("mx"),
                )
            )
        else:
            merged = batch_df
        tmp = f"{gold_path}__swap_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_last_batch"), "w") as fh:
            fh.write(f"{run_token} {batch_id}")
        old = f"{gold_path}__old_{uuid.uuid4().hex[:8]}"
        if os.path.isdir(gold_path):
            os.rename(gold_path, old)
        os.rename(tmp, gold_path)
        if os.path.isdir(old):
            shutil.rmtree(old)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
