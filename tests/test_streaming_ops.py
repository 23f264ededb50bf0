"""Streaming operators: dedup, sessionization, stateful running stats.

Each test checks stream results against the equivalent batch computation
on the same parquet data (availableNow trigger = bounded replay)."""

import math
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def events_src(spark, tmp_path_factory):
    from shifu_spark.queries import _events

    ev = _events(spark, "/root/testdata/sf0.001").select("ts", "user_id", "event_type", "value")
    path = str(tmp_path_factory.mktemp("stream") / "events")
    ev.write.parquet(path)
    return path, ev.schema, ev


def _run(stream_df, name, mode="append"):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


class TestStreamingDedup:
    def test_dedup_keeps_one_per_digest(self, spark, events_src):
        from shifu_spark.streaming.ops import streaming_exact_dedup

        path, schema, ev = events_src
        stream = spark.readStream.schema(schema).parquet(path)
        _run(streaming_exact_dedup(stream, text_col="event_type", watermark="10 seconds"), "dedup_t")
        got = spark.sql("SELECT digest, count(*) AS c FROM dedup_t GROUP BY digest").collect()
        n_types = ev.select("event_type").distinct().count()
        assert len(got) == n_types
        assert all(r["c"] == 1 for r in got)

    def test_minhash_dedup_dirty_docs_across_restart(self, spark, tmp_path):
        """Dirty-input x restart for the DEDUP stream (VERDICT r10
        item 4's second family): stop the minhash signature-group
        stream with NULL-text / empty docs as the last rows before the
        boundary and a NULL-id doc in-flight, restart from the same
        checkpoint onto a second dirty file whose first doc DUPLICATES
        a file-1 doc. The recovered aggregate must equal the batch
        signature-group over the union — the cross-restart duplicate
        only counts 2 if the signature's group state was recovered, and
        the NULL-signature/NULL-id ingest contracts must hold
        identically on the recovery path."""
        import time

        from shifu_spark.operators.dedup import with_minhash_signature

        schema = "doc_id long, text string, lang string, source string, n_chars long"
        dup_text = "the fast key order sort table scan merge part window"
        file1 = [
            (0, dup_text, "en", "src0", 52),
            (1, "value data row batch stream spark plan", "en", "src1", 38),
            # dirty stop boundary
            (5, "", "en", "src0", 0),
            (6, None, None, "src1", None),
            (None, "null id doc in flight", "en", "src0", 21),
        ]
        file2 = [
            (10, dup_text, "en", "src1", 52),   # cross-restart duplicate of doc 0
            (11, None, "en", "src0", None),
            (12, "fresh doc after the restart boundary", "en", "src1", 36),
        ]
        src = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame(file1, schema).coalesce(1).write.parquet(src)

        def run_once():
            stream = (
                spark.readStream.schema(spark.read.parquet(src).schema)
                .parquet(src)
                .where(F.col("doc_id").isNotNull())
            )
            sig = (
                with_minhash_signature(stream)
                .where(F.col("signature").isNotNull())
                .select("doc_id", "signature")
            )
            agg = sig.groupBy("signature").agg(
                F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("n_docs")
            )
            q = (
                agg.writeStream.format("memory")
                .queryName("mh_dirty_restart_t")
                .option("checkpointLocation", ckpt)
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            assert q.exception() is None

        run_once()
        time.sleep(1.1)  # file-source ordering is by modification time
        spark.createDataFrame(file2, schema).coalesce(1).write.mode("append").parquet(src)
        run_once()  # NEW query: the dup's count needs the RECOVERED state

        got = {
            (r["rep_id"], r["n_docs"])
            for r in spark.sql(
                "SELECT rep_id, n_docs FROM mh_dirty_restart_t"
            ).collect()
        }
        batch = spark.createDataFrame(
            [r for r in file1 + file2], schema
        ).where(F.col("doc_id").isNotNull())
        want = {
            (r["rep_id"], r["n_docs"])
            for r in with_minhash_signature(batch)
            .where(F.col("signature").isNotNull())
            .groupBy("signature")
            .agg(F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("n_docs"))
            .collect()
        }
        assert got == want
        assert (0, 2) in got  # the cross-restart duplicate was recovered

    def test_minhash_dedup_dirty_restart_with_rescale(self, spark, tmp_path):
        """Dirty-input x restart x RESCALE for the DEDUP stream (extends
        the running-stats rescale pin to a second state kernel — the one
        that matters most at 100 TB, where a dedup stream outlives many
        cluster resizes). Checkpoint born at shuffle.partitions=5 with
        NULL-text/NULL-id dirty rows as the stop boundary; resumed under
        a session now set to 13 onto a file whose first doc DUPLICATES a
        pre-resize doc. The signature's group state lives in whichever
        of the birth-5 state partitions hash(signature) chose — a naive
        re-hash over 13 would route the duplicate's update to a
        different partition and count it 1, forking the state. Asserts
        the birth-N state layout is pinned (no dirs 5..12 appear) and
        the recovered aggregate equals the batch run over the union."""
        import time

        from shifu_spark.operators.dedup import with_minhash_signature

        schema = "doc_id long, text string, lang string, source string, n_chars long"
        dup_text = "the fast key order sort table scan merge part window"
        file1 = [
            (0, dup_text, "en", "src0", 52),
            (1, "value data row batch stream spark plan", "en", "src1", 38),
            (5, "", "en", "src0", 0),
            (6, None, None, "src1", None),
            (None, "null id doc in flight", "en", "src0", 21),
        ]
        file2 = [
            (10, dup_text, "en", "src1", 52),   # cross-resize duplicate of doc 0
            (11, None, "en", "src0", None),
            (12, "fresh doc after the resize boundary", "en", "src1", 36),
        ]
        src = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame(file1, schema).coalesce(1).write.parquet(src)

        def run_once():
            stream = (
                spark.readStream.schema(spark.read.parquet(src).schema)
                .parquet(src)
                .where(F.col("doc_id").isNotNull())
            )
            sig = (
                with_minhash_signature(stream)
                .where(F.col("signature").isNotNull())
                .select("doc_id", "signature")
            )
            agg = sig.groupBy("signature").agg(
                F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("n_docs")
            )
            q = (
                agg.writeStream.format("memory")
                .queryName("mh_rescale_t")
                .option("checkpointLocation", ckpt)
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            assert q.exception() is None

        orig = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            run_once()  # checkpoint born at N=5 state partitions
            state0 = os.path.join(ckpt, "state", "0")
            born = {d for d in os.listdir(state0) if d.isdigit()}
            assert born == {"0", "1", "2", "3", "4"}
            time.sleep(1.1)  # file-source ordering is by modification time
            spark.createDataFrame(file2, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            spark.conf.set("spark.sql.shuffle.partitions", "13")
            run_once()  # the resize: dup's count needs the pinned state
            assert {d for d in os.listdir(state0) if d.isdigit()} == born
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", orig)

        got = {
            (r["rep_id"], r["n_docs"])
            for r in spark.sql("SELECT rep_id, n_docs FROM mh_rescale_t").collect()
        }
        batch = spark.createDataFrame(
            [r for r in file1 + file2], schema
        ).where(F.col("doc_id").isNotNull())
        want = {
            (r["rep_id"], r["n_docs"])
            for r in with_minhash_signature(batch)
            .where(F.col("signature").isNotNull())
            .groupBy("signature")
            .agg(F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("n_docs"))
            .collect()
        }
        assert got == want
        assert (0, 2) in got  # the cross-resize duplicate was recovered


class TestStreamingSessionize:
    def test_sessions_match_batch_session_window(self, spark, events_src):
        from shifu_spark.streaming.ops import streaming_sessionize

        path, schema, ev = events_src
        stream = spark.readStream.schema(schema).parquet(path)
        _run(streaming_sessionize(stream, gap="30 minutes", watermark="1 minute"), "sess_t")
        got = {
            (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
            for r in spark.sql("SELECT * FROM sess_t").collect()
        }
        batch = {
            (r["user_id"], r["w"].start, r["w"].end): r["n"]
            for r in ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got, "no sessions emitted"
        # every emitted (closed) session must match the batch computation
        assert all(batch.get(k) == v for k, v in got.items())
        # ... AND completeness: subset-of-batch alone would pass a
        # regression that drops all but one closed session. Under
        # availableNow replay the final watermark is deterministic
        # (max event time - 1 minute); every batch session closed
        # strictly before it must have been emitted.
        import datetime as _dt

        max_ts = ev.agg(F.max("ts")).first()[0]
        horizon = max_ts - _dt.timedelta(minutes=1)
        must_emit = {k: v for k, v in batch.items() if k[2] < horizon}
        assert must_emit, "fixture leaves no closed sessions — test is vacuous"
        missing = {k for k in must_emit if k not in got}
        assert not missing, f"closed sessions not emitted: {sorted(missing)[:5]}"


class TestRunningStats:
    def test_welford_matches_batch_moments(self, spark, events_src):
        from shifu_spark.streaming.ops import streaming_running_stats

        path, schema, ev = events_src
        stream = spark.readStream.schema(schema).parquet(path)
        _run(streaming_running_stats(stream, "event_type"), "rs_t", mode="update")
        # last emitted row per key = final running state
        rows = spark.sql(
            "SELECT key, n, mean, std FROM rs_t"
        ).collect()
        final = {}
        for r in rows:  # memory sink appends per batch; keep max-n row
            if r["key"] not in final or r["n"] > final[r["key"]]["n"]:
                final[r["key"]] = r
        batch = {
            r["event_type"]: r
            for r in ev.groupBy("event_type")
            .agg(F.count("value").alias("n"), F.avg("value").alias("mean"), F.stddev("value").alias("std"))
            .collect()
        }
        assert set(final) == set(batch)
        for k, b in batch.items():
            s = final[k]
            assert s["n"] == b["n"]
            assert math.isclose(s["mean"], b["mean"], rel_tol=1e-9)
            assert math.isclose(s["std"], b["std"], rel_tol=1e-9)

    def test_dirty_values_in_flight_across_restart(self, spark, tmp_path):
        """Dirty-input x restart for the RUNNING-STATS state kernel
        (third stateful family after packing and dedup): the stream is
        stopped right after a batch whose LAST rows are NaN / ±Inf /
        NULL values and a NULL key, then a NEW query recovers the
        per-key (n, sum_c, sumsq_c) state and keeps counting. The
        recovered exact-integer state must equal the single-pass batch
        sums over the union's FINITE values — a non-finite value that
        leaked into a checkpointed sum would corrupt every post-restart
        emission for that key, and a key whose pre-restart values were
        ALL non-finite must resume from a clean zero state."""
        import time

        from shifu_spark.streaming.ops import streaming_running_stats_exact_cents

        schema = "key string, value double"
        nan, inf = float("nan"), float("inf")
        file1 = [
            ("k1", 1.25), ("k1", 2.50), ("k2", 10.00),
            # dirty stop boundary: the last checkpointed updates
            ("k1", nan), ("k2", inf), ("k3", -inf), ("k3", nan),
            (None, 5.00), ("k2", None),
        ]
        file2 = [
            ("k1", 4.00), ("k2", -3.75),
            ("k3", 7.00),          # k3's FIRST finite value, post-restart
            ("k1", inf), (None, nan), (None, 2.00),
        ]
        src = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        spark.createDataFrame(file1, schema).coalesce(1).write.parquet(src)

        def run_once():
            stream = spark.readStream.schema(schema).parquet(src)
            q = (
                streaming_running_stats_exact_cents(stream, "key")
                # update-mode emissions need foreachBatch for a
                # checkpoint-recoverable file sink (the memory sink only
                # recovers in complete mode)
                .writeStream.foreachBatch(
                    lambda df, _bid: df.write.mode("append").parquet(out)
                )
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            assert q.exception() is None

        run_once()
        time.sleep(1.1)  # file-source ordering is by modification time
        spark.createDataFrame(file2, schema).coalesce(1).write.mode("append").parquet(src)
        run_once()  # NEW query: recovered sums must be finite-only

        final = {}
        for r in spark.read.parquet(out).collect():
            if r["key"] not in final or r["n"] > final[r["key"]]["n"]:
                final[r["key"]] = r
        got = {k: (v["n"], v["sum_c"], v["sumsq_c"]) for k, v in final.items()
               if v["n"] > 0}
        want = {}
        for k, v in file1 + file2:
            if v is None or math.isnan(v) or math.isinf(v):
                continue
            c = round(v * 100)
            n, s, ss = want.get(k, (0, 0, 0))
            want[k] = (n + 1, s + c, ss + c * c)
        assert got == want
        # the all-non-finite-before-restart key recovered cleanly
        assert got["k3"] == (1, 700, 490000)

    @pytest.mark.parametrize("born_n,resumed_n", [(5, 13), (13, 5)])
    def test_dirty_restart_with_rescaled_shuffle_partitions(
        self, spark, tmp_path, born_n, resumed_n
    ):
        """VERDICT r11 item 7 (stretch): dirty-input x restart x RESCALE.
        At 100 TB the restart that matters is a cluster RESIZE — the job
        resumes under a different parallelism. Spark decouples state
        partitioning from cluster size by PINNING
        spark.sql.shuffle.partitions into the checkpoint's offset log at
        query birth: a resume under a different session setting must keep
        the N state-store partitions it was born with (reassigning them
        over however many executors now exist) and produce results equal
        to the uninterrupted run. A naive engine that re-hashed keys over
        M != N partitions would route each key's post-resize updates to a
        DIFFERENT state partition and silently fork its state — n resets,
        sums double-count. Same dirty stop boundary as the test above:
        the NaN/Inf/NULL rows are the last thing checkpointed before the
        resize. Parametrized BOTH directions — a scale-OUT resume
        (5 -> 13) and the scale-IN one (13 -> 5): shrink is the cheaper,
        more common resize in practice (spot loss, off-peak downscale)
        and must neither drop state partitions beyond birth-N nor
        truncate recovered state."""
        import time

        from shifu_spark.streaming.ops import streaming_running_stats_exact_cents

        schema = "key string, value double"
        nan, inf = float("nan"), float("inf")
        file1 = [
            ("k1", 1.25), ("k1", 2.50), ("k2", 10.00),
            ("k1", nan), ("k2", inf), ("k3", -inf), ("k3", nan),
            (None, 5.00), ("k2", None),
        ]
        file2 = [
            ("k1", 4.00), ("k2", -3.75), ("k3", 7.00),
            ("k1", inf), (None, nan), (None, 2.00),
        ]
        src = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        spark.createDataFrame(file1, schema).coalesce(1).write.parquet(src)

        def run_once():
            stream = spark.readStream.schema(schema).parquet(src)
            q = (
                streaming_running_stats_exact_cents(stream, "key")
                .writeStream.foreachBatch(
                    lambda df, _bid: df.write.mode("append").parquet(out)
                )
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            assert q.exception() is None

        orig = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", str(born_n))
            run_once()  # checkpoint born at N=born_n state partitions
            # the state store materialized exactly N partition dirs
            state0 = os.path.join(ckpt, "state", "0")
            born = {d for d in os.listdir(state0) if d.isdigit()}
            assert born == {str(i) for i in range(born_n)}
            time.sleep(1.1)  # file-source ordering is by modification time
            spark.createDataFrame(file2, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            # the resize: resume under a session that now says M != N
            spark.conf.set("spark.sql.shuffle.partitions", str(resumed_n))
            run_once()
            # state partition count stayed pinned at birth-N — neither
            # forked dirs beyond it (scale-out) nor dropped dirs (scale-in)
            assert {d for d in os.listdir(state0) if d.isdigit()} == born
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", orig)

        final = {}
        for r in spark.read.parquet(out).collect():
            if r["key"] not in final or r["n"] > final[r["key"]]["n"]:
                final[r["key"]] = r
        got = {k: (v["n"], v["sum_c"], v["sumsq_c"]) for k, v in final.items()
               if v["n"] > 0}
        want = {}
        for k, v in file1 + file2:
            if v is None or math.isnan(v) or math.isinf(v):
                continue
            c = round(v * 100)
            n, s, ss = want.get(k, (0, 0, 0))
            want[k] = (n + 1, s + c, ss + c * c)
        assert got == want
        assert got["k3"] == (1, 700, 490000)


class TestDriftForeachBatchSink:
    def test_foreach_batch_psi_parquet_sink(self, spark, tmp_path):
        """Production sink wiring: two micro-batches (maxFilesPerTrigger=1);
        the second advances the watermark past the first hour's window end,
        so its PSI row lands in the parquet sink, finalized once."""
        from datetime import datetime

        from shifu_spark.streaming.drift import psi_of_batch, start_drift_monitor_foreach_batch

        src = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        mk = lambda h, m, v: (datetime(2026, 1, 1, h, m), float(v))
        early = [mk(0, i % 60, 1.0 + 3 * (i % 4)) for i in range(40)]
        late = [mk(6, i % 60, 2.0) for i in range(10)]  # watermark mover
        schema = "ts timestamp, v double"
        spark.createDataFrame(early, schema).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(late, schema).coalesce(1).write.mode("append").parquet(src)

        boundaries = [0.0, 2.0, 5.0]
        expected = {0: 0.5, 1: 0.3, 2: 0.2}
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        q = start_drift_monitor_foreach_batch(
            stream, "v", boundaries, expected, out, ckpt, window="1 hour", watermark="2 hours"
        )
        # the monitor runs the default trigger — poll until the closed
        # window's PSI row reaches the parquet sink, then stop
        import time

        def _out_ready():
            try:
                return len(spark.read.parquet(out).take(1)) > 0
            except Exception:
                return False

        deadline = time.time() + 120
        while time.time() < deadline and not _out_ready():
            time.sleep(1)
        q.stop()
        q.awaitTermination(30)
        assert _out_ready(), "no PSI rows reached the sink before timeout"

        got = spark.read.parquet(out)
        rows = {r["window_start"]: r["psi"] for r in got.collect()}
        # only the hour-0 window closed (hour-6 stays open)
        assert set(rows) == {datetime(2026, 1, 1, 0, 0)}

        # batch replica of the same math on the same early rows
        bdf = spark.createDataFrame(early, schema).select(
            F.lit(datetime(2026, 1, 1, 0, 0)).alias("window_start"),
            F.col("v"),
        )
        from shifu_spark.operators.binning import bin_index_expr

        counts = (
            bdf.withColumn("bin", bin_index_expr("v", boundaries))
            .groupBy("window_start", "bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        want = psi_of_batch(counts, expected).collect()[0]["psi"]
        assert abs(rows[datetime(2026, 1, 1, 0, 0)] - want) < 1e-9

    def test_dirty_window_finalizes_once_across_restart(self, spark, tmp_path):
        """Dirty-input x restart for WATERMARK/WINDOW state (sixth
        family, a different Spark state path from the five kernel/merge
        pins): run 1 ingests the hour-0 window whose LAST rows are
        NaN / +-Inf / NULL values and a NULL timestamp, then stops with
        the window still OPEN (watermark not yet past its end). Run 2
        recovers the window counts + watermark from the checkpoint and
        ingests the watermark-moving file; the hour-0 PSI row must
        finalize exactly ONCE and equal the batch replica over ALL
        hour-0 rows — the dirty boundary rows' bin policy must survive
        the checkpoint round-trip."""
        import time
        from datetime import datetime

        from shifu_spark.streaming.drift import (
            psi_of_batch,
            start_drift_monitor_foreach_batch,
        )

        src = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        nan, inf = float("nan"), float("inf")
        mk = lambda h, m, v: (datetime(2026, 1, 1, h, m), v)
        early = [mk(0, i % 60, 1.0 + 3 * (i % 4)) for i in range(40)] + [
            # dirty stop boundary: checkpointed window counts include these
            mk(0, 55, nan), mk(0, 56, inf), mk(0, 57, -inf), mk(0, 58, None),
            (None, 3.0),  # NULL ts: windowless, must not wedge recovery
        ]
        late = [mk(6, i % 60, 2.0) for i in range(10)]  # watermark mover
        schema = "ts timestamp, v double"
        boundaries = [0.0, 2.0, 5.0]
        expected = {0: 0.5, 1: 0.3, 2: 0.2}
        spark.createDataFrame(early, schema).coalesce(1).write.parquet(src)

        def run_once():
            stream = spark.readStream.schema(schema).parquet(src)
            q = start_drift_monitor_foreach_batch(
                stream, "v", boundaries, expected, out, ckpt,
                window="1 hour", watermark="2 hours",
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(30)
            assert q.exception() is None

        run_once()  # hour-0 (incl. dirty rows) counted, window OPEN, stop
        time.sleep(1.1)
        spark.createDataFrame(late, schema).coalesce(1).write.mode("append").parquet(src)
        run_once()  # recover window+watermark state; hour-0 finalizes

        got = spark.read.parquet(out).collect()
        rows = [(r["window_start"], r["psi"]) for r in got]
        assert len(rows) == 1, rows  # finalized exactly once
        assert rows[0][0] == datetime(2026, 1, 1, 0, 0)

        from shifu_spark.operators.binning import bin_index_expr

        bdf = spark.createDataFrame(
            [r for r in early if r[0] is not None], schema
        ).select(
            F.lit(datetime(2026, 1, 1, 0, 0)).alias("window_start"), F.col("v")
        )
        counts = (
            bdf.withColumn("bin", bin_index_expr("v", boundaries))
            .groupBy("window_start", "bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        want = psi_of_batch(counts, expected).collect()[0]["psi"]
        assert abs(rows[0][1] - want) < 1e-9

    def test_dirty_window_rescale_finalizes_once(self, spark, tmp_path):
        """Dirty-input x restart x RESCALE for WATERMARK/WINDOW state —
        a different Spark state path from the key-hash kernels (state is
        keyed by (window,bin) and retired by the watermark, so a
        re-partitioned resume could both fork counts AND re-finalize the
        window). Checkpoint born at shuffle.partitions=5 with the hour-0
        window OPEN and NaN/+-Inf/NULL rows as the last thing
        checkpointed; resumed under 13 with the watermark-moving file.
        Asserts the birth-N state layout is pinned, the hour-0 PSI row
        finalizes exactly ONCE, and its value equals the batch replica
        over ALL hour-0 rows including the dirty boundary."""
        import time
        from datetime import datetime

        from shifu_spark.streaming.drift import (
            psi_of_batch,
            start_drift_monitor_foreach_batch,
        )

        src = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        nan, inf = float("nan"), float("inf")
        mk = lambda h, m, v: (datetime(2026, 1, 1, h, m), v)
        early = [mk(0, i % 60, 1.0 + 3 * (i % 4)) for i in range(40)] + [
            mk(0, 55, nan), mk(0, 56, inf), mk(0, 57, -inf), mk(0, 58, None),
            (None, 3.0),
        ]
        late = [mk(6, i % 60, 2.0) for i in range(10)]  # watermark mover
        schema = "ts timestamp, v double"
        boundaries = [0.0, 2.0, 5.0]
        expected = {0: 0.5, 1: 0.3, 2: 0.2}
        spark.createDataFrame(early, schema).coalesce(1).write.parquet(src)

        def run_once():
            stream = spark.readStream.schema(schema).parquet(src)
            q = start_drift_monitor_foreach_batch(
                stream, "v", boundaries, expected, out, ckpt,
                window="1 hour", watermark="2 hours",
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(30)
            assert q.exception() is None

        orig = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            run_once()  # hour-0 counted (incl. dirty rows), window OPEN
            state0 = os.path.join(ckpt, "state", "0")
            born = {d for d in os.listdir(state0) if d.isdigit()}
            assert born == {"0", "1", "2", "3", "4"}
            time.sleep(1.1)
            spark.createDataFrame(late, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            spark.conf.set("spark.sql.shuffle.partitions", "13")
            run_once()  # the resize: hour-0 must finalize from pinned state
            assert {d for d in os.listdir(state0) if d.isdigit()} == born
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", orig)

        got = spark.read.parquet(out).collect()
        rows = [(r["window_start"], r["psi"]) for r in got]
        assert len(rows) == 1, rows  # finalized exactly once, post-resize
        assert rows[0][0] == datetime(2026, 1, 1, 0, 0)

        from shifu_spark.operators.binning import bin_index_expr

        bdf = spark.createDataFrame(
            [r for r in early if r[0] is not None], schema
        ).select(
            F.lit(datetime(2026, 1, 1, 0, 0)).alias("window_start"), F.col("v")
        )
        counts = (
            bdf.withColumn("bin", bin_index_expr("v", boundaries))
            .groupBy("window_start", "bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        want = psi_of_batch(counts, expected).collect()[0]["psi"]
        assert abs(rows[0][1] - want) < 1e-9


class TestStreamingEval:
    def test_windowed_auc_confusion_matches_batch(self, spark, events_src):
        """Streamed per-window score counts + finalize must equal the
        same formula computed batch-side on the same rows."""
        from shifu_spark.streaming.eval import auc_confusion_per_window, streaming_score_counts

        path, schema, ev = events_src
        stream = spark.readStream.schema(schema).parquet(path)
        score = F.floor("value").cast("long")
        pos = F.col("event_type").isin("purchase", "signup")
        counts = streaming_score_counts(
            stream, score, pos, ts_col="ts", window="1 day", watermark="0 seconds"
        )
        q = _run(counts, "seval_t", mode="complete")
        try:
            got = {
                r["window_start"]: (r["auc"], r["tp"], r["fp"], r["fn"], r["tn"])
                for r in auc_confusion_per_window(spark.table("seval_t"), 100.0).collect()
            }
        finally:
            q.stop()
            spark.catalog.dropTempView("seval_t")

        bcounts = (
            ev.where(score.isNotNull())
            .groupBy(
                F.date_trunc("day", "ts").alias("window_start"), score.alias("score")
            )
            .agg(
                F.sum(F.when(pos, 1).otherwise(0)).alias("pos"),
                F.sum(F.when(pos, 0).otherwise(1)).alias("neg"),
            )
        )
        want = {
            r["window_start"]: (r["auc"], r["tp"], r["fp"], r["fn"], r["tn"])
            for r in auc_confusion_per_window(bcounts, 100.0).collect()
        }
        assert got == want and len(got) > 0
        # AUC sanity: every value in [0, 1]
        assert all(0.0 <= v[0] <= 1.0 for v in got.values() if v[0] is not None)

    def test_foreach_batch_eval_parquet_sink(self, spark, tmp_path):
        """Production wiring: append-mode foreachBatch emits one final
        (window, auc, confusion) parquet row once the watermark closes
        the window; values equal the batch finalize on the same rows."""
        import time
        from datetime import datetime

        from shifu_spark.streaming.eval import (
            auc_confusion_per_window,
            start_eval_monitor_foreach_batch,
        )

        src = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        mk = lambda h, m, s, lbl: (datetime(2026, 1, 1, h, m), float(s), lbl)
        # hour-0 window: scores 0..19, label correlates with score
        early = [mk(0, i % 60, i % 20, i % 20 >= 10 and i % 3 > 0) for i in range(60)]
        late = [mk(6, i % 60, 5.0, False) for i in range(8)]  # watermark mover
        schema = "ts timestamp, score double, lbl boolean"
        spark.createDataFrame(early, schema).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(late, schema).coalesce(1).write.mode("append").parquet(src)

        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        q = start_eval_monitor_foreach_batch(
            stream,
            score=F.col("score"),
            pos=F.col("lbl"),
            threshold=10.0,
            output_path=out,
            checkpoint_path=ckpt,
            window="1 hour",
            watermark="2 hours",
        )

        def _out_ready():
            try:
                return len(spark.read.parquet(out).take(1)) > 0
            except Exception:
                return False

        deadline = time.time() + 120
        while time.time() < deadline and not _out_ready():
            time.sleep(1)
        q.stop()
        q.awaitTermination(30)
        assert _out_ready(), "no eval rows reached the sink before timeout"

        got = spark.read.parquet(out).collect()
        # only the hour-0 window closed
        assert {r["window_start"] for r in got} == {datetime(2026, 1, 1, 0, 0)}
        row = got[0]

        bcounts = (
            spark.createDataFrame(early, schema)
            .select(
                F.lit(datetime(2026, 1, 1, 0, 0)).alias("window_start"),
                F.col("score"),
                F.col("lbl"),
            )
            .groupBy("window_start", "score")
            .agg(
                F.sum(F.when(F.col("lbl"), 1).otherwise(0)).alias("pos"),
                F.sum(F.when(F.col("lbl"), 0).otherwise(1)).alias("neg"),
            )
        )
        want = auc_confusion_per_window(bcounts, 10.0).collect()[0]
        assert (row["auc"], row["tp"], row["fp"], row["fn"], row["tn"]) == (
            want["auc"], want["tp"], want["fp"], want["fn"], want["tn"],
        )


class TestStreamingSequencePacking:
    def test_state_carries_offsets_across_micro_batches(self, spark, tmp_path):
        """Two micro-batches (maxFilesPerTrigger=1, doc_id-ordered file
        arrival): per-shard token offsets must continue exactly where
        the previous batch left off — the streamed plan equals the batch
        window plan over the union."""
        from shifu_spark.queries import QUERIES, _packing_inputs, _PACK_BUDGET
        from shifu_spark.streaming.ops import streaming_sequence_packing

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        src = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        # arrival order must be doc_id order (packing is arrival-order-
        # defined): file 1 = low ids, file 2 = high ids, written in turn
        docs.filter(F.col("doc_id") < 25).coalesce(1).write.parquet(src)
        import time

        time.sleep(1.1)  # file-source ordering is by modification time
        docs.filter(F.col("doc_id") >= 25).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_sequence_packing(_packing_inputs(stream), budget=_PACK_BUDGET)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.lastProgress is not None and q.lastProgress["batchId"] >= 1, (
            "replay did not split into multiple micro-batches"
        )
        got = {
            r["doc_id"]: (r["shard"], r["n_tokens"], r["tok_offset"], r["first_seq"], r["n_seqs"])
            for r in spark.read.parquet(out).collect()
        }
        want = {
            r["doc_id"]: (r["shard"], r["n_tokens"], r["tok_offset"], r["first_seq"], r["n_seqs"])
            for r in QUERIES["sequence_packing"](spark, "/root/testdata/sf0.001").collect()
        }
        assert got == want


    def test_state_restores_across_full_restart(self, spark, tmp_path):
        """State-store RECOVERY, not just intra-run carry: the query is
        run to completion on file 1 and STOPPED, file 2 arrives while
        nothing is running, and a NEW query starts from the same
        checkpoint — the second run must resume per-shard token offsets
        from the recovered state store (a fresh-state restart would
        restart every shard at offset 0 and break the batch equality)."""
        from shifu_spark.queries import QUERIES, _packing_inputs, _PACK_BUDGET
        from shifu_spark.streaming.ops import streaming_sequence_packing

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        src = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        docs.filter(F.col("doc_id") < 25).coalesce(1).write.parquet(src)

        def run_once():
            stream = (
                spark.readStream.schema(docs.schema).parquet(src)
            )
            q = (
                streaming_sequence_packing(_packing_inputs(stream), budget=_PACK_BUDGET)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            assert q.exception() is None

        run_once()  # processes file 1, checkpoints state, terminates
        import time

        time.sleep(1.1)  # file-source ordering is by modification time
        docs.filter(F.col("doc_id") >= 25).coalesce(1).write.mode("append").parquet(src)
        run_once()  # NEW query instance: must recover state, process file 2

        got = {
            r["doc_id"]: (r["shard"], r["n_tokens"], r["tok_offset"], r["first_seq"], r["n_seqs"])
            for r in spark.read.parquet(out).collect()
        }
        want = {
            r["doc_id"]: (r["shard"], r["n_tokens"], r["tok_offset"], r["first_seq"], r["n_seqs"])
            for r in QUERIES["sequence_packing"](spark, "/root/testdata/sf0.001").collect()
        }
        assert got == want

    def test_dirty_docs_in_flight_across_restart(self, spark, tmp_path):
        """Dirty-input x restart intersection (VERDICT r10 item 4): the
        stop boundary lands ON dirty rows — file 1 ENDS with NULL-text /
        empty / whitespace docs plus a NULL-id doc in-flight, the query
        is stopped, and a NEW query recovers the state store to process
        a second dirty file. The recovered run must equal the
        uninterrupted batch plan over the union: dirty rows at the
        boundary may neither kill recovery nor skew the recovered
        per-shard token offsets (a NULL n_tokens that leaked into a
        shard's running total as NaN would shift every later doc)."""
        import glob
        import shutil
        import time

        from shifu_spark.queries import QUERIES, _packing_inputs, _PACK_BUDGET
        from shifu_spark.streaming.ops import streaming_sequence_packing

        schema = "doc_id long, text string, lang string, source string, n_chars long"
        file1 = [
            (0, "the fast key order sort table scan merge", "en", "src0", 41),
            (1, "value data row batch stream spark", "en", "src1", 33),
            (2, ("dup " * 30).strip(), "en", "src0", 119),
            # the stop boundary: dirty rows are the LAST state updates
            # checkpointed before the restart
            (6, None, None, "src0", None),          # NULL text
            (7, "", "en", "src1", 0),               # empty text
            (8, "   ", "en", "src0", 3),            # whitespace-only
            (None, "null id doc in flight", "en", "src0", 21),  # NULL PK
        ]
        file2 = [
            (10, "after restart normal doc", "en", "src1", 24),
            (11, None, "en", "src0", None),          # NULL text again
            (12, "", "es", "src1", 0),
            (13, "!!! ??? ...", "en", "src0", 11),
            (14, "café über 中文 \U0001f600", "de", "src1", 14),
        ]
        src = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        spark.createDataFrame(file1, schema).coalesce(1).write.parquet(src)

        def run_once():
            stream = (
                spark.readStream.schema(
                    spark.read.parquet(src).schema
                ).parquet(src)
                # the _docs PRIMARY-KEY ingest contract, stream side
                # (mirrors the production streaming_sequence_packing site)
                .where(F.col("doc_id").isNotNull())
            )
            q = (
                streaming_sequence_packing(_packing_inputs(stream), budget=_PACK_BUDGET)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            assert q.exception() is None

        run_once()  # file 1 incl. the dirty boundary rows, checkpoint, stop
        time.sleep(1.1)  # file-source ordering is by modification time
        spark.createDataFrame(file2, schema).coalesce(1).write.mode("append").parquet(src)
        run_once()  # NEW query: recover state THROUGH the dirty rows

        # uninterrupted reference: the batch plan over the union (dirty
        # dir shaped like driver testdata — single documents.parquet file)
        base = str(tmp_path / "batchref")
        union = spark.createDataFrame(file1 + file2, schema)
        tmpdir = f"{base}/_d"
        union.coalesce(1).write.parquet(tmpdir)
        shutil.move(
            glob.glob(f"{tmpdir}/part-*.parquet")[0], f"{base}/documents.parquet"
        )
        got = {
            r["doc_id"]: (r["shard"], r["n_tokens"], r["tok_offset"], r["first_seq"], r["n_seqs"])
            for r in spark.read.parquet(out).collect()
        }
        want = {
            r["doc_id"]: (r["shard"], r["n_tokens"], r["tok_offset"], r["first_seq"], r["n_seqs"])
            for r in QUERIES["sequence_packing"](spark, base).collect()
        }
        assert got == want
        assert None not in got  # the NULL-id in-flight doc was excluded

    def test_dirty_restart_with_rescale_packing(self, spark, tmp_path):
        """Dirty-input x restart x RESCALE for the sequence-packing
        state (applyInPandasWithState keyed by shard): the per-shard
        running token offset lives in whichever birth-N state partition
        hash(shard) chose; a resume re-hashed over M != N would start a
        shard's post-resize docs at offset 0 and silently overlap its
        pre-resize sequences. Checkpoint born at shuffle.partitions=5
        with NULL-text/empty/whitespace docs as the stop boundary;
        resumed under 13; asserts the birth-N layout is pinned and the
        recovered offsets equal the uninterrupted batch packing over
        the union."""
        import glob
        import shutil
        import time

        from shifu_spark.queries import QUERIES, _packing_inputs, _PACK_BUDGET
        from shifu_spark.streaming.ops import streaming_sequence_packing

        schema = "doc_id long, text string, lang string, source string, n_chars long"
        file1 = [
            (0, "the fast key order sort table scan merge", "en", "src0", 41),
            (1, "value data row batch stream spark", "en", "src1", 33),
            (2, ("dup " * 30).strip(), "en", "src0", 119),
            (6, None, None, "src0", None),
            (7, "", "en", "src1", 0),
            (8, "   ", "en", "src0", 3),
            (None, "null id doc in flight", "en", "src0", 21),
        ]
        file2 = [
            (10, "after resize normal doc", "en", "src1", 23),
            (11, None, "en", "src0", None),
            (12, "", "es", "src1", 0),
            (13, "!!! ??? ...", "en", "src0", 11),
            (14, "café über 中文 \U0001f600", "de", "src1", 14),
        ]
        src = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        spark.createDataFrame(file1, schema).coalesce(1).write.parquet(src)

        def run_once():
            stream = (
                spark.readStream.schema(
                    spark.read.parquet(src).schema
                ).parquet(src)
                .where(F.col("doc_id").isNotNull())
            )
            q = (
                streaming_sequence_packing(_packing_inputs(stream), budget=_PACK_BUDGET)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            assert q.exception() is None

        orig = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            run_once()  # checkpoint born at N=5 state partitions
            state0 = os.path.join(ckpt, "state", "0")
            born = {d for d in os.listdir(state0) if d.isdigit()}
            assert born == {"0", "1", "2", "3", "4"}
            time.sleep(1.1)  # file-source ordering is by modification time
            spark.createDataFrame(file2, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            spark.conf.set("spark.sql.shuffle.partitions", "13")
            run_once()  # the resize: offsets must continue, not restart
            assert {d for d in os.listdir(state0) if d.isdigit()} == born
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", orig)

        base = str(tmp_path / "batchref")
        union = spark.createDataFrame(file1 + file2, schema)
        tmpdir = f"{base}/_d"
        union.coalesce(1).write.parquet(tmpdir)
        shutil.move(
            glob.glob(f"{tmpdir}/part-*.parquet")[0], f"{base}/documents.parquet"
        )
        got = {
            r["doc_id"]: (r["shard"], r["n_tokens"], r["tok_offset"], r["first_seq"], r["n_seqs"])
            for r in spark.read.parquet(out).collect()
        }
        want = {
            r["doc_id"]: (r["shard"], r["n_tokens"], r["tok_offset"], r["first_seq"], r["n_seqs"])
            for r in QUERIES["sequence_packing"](spark, base).collect()
        }
        assert got == want
        assert None not in got


class TestStreamingAsof:
    def test_asof_state_carries_across_micro_batches(self, spark, tmp_path):
        """Two event-time-ordered micro-batches: every purchase must get
        the latest click at-or-before it even when that click arrived in
        the PREVIOUS batch (the carried (ts, id) state), equal to the
        batch as-of join over the union."""
        import time

        from shifu_spark.operators.join import asof_join
        from shifu_spark.queries import _events
        from shifu_spark.streaming.ops import streaming_asof_attribution

        ev = _events(spark, "/root/testdata/sf0.001").select(
            "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
        )
        split = ev.approxQuantile("ts_us", [0.5], 0.0)[0]
        src = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        ev.filter(F.col("ts_us") <= split).coalesce(1).write.parquet(src)
        time.sleep(1.1)  # file-source ordering is by modification time
        ev.filter(F.col("ts_us") > split).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_asof_attribution(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.lastProgress is not None and q.lastProgress["batchId"] >= 1

        got = {
            r["purchase_id"]: (r["click_id"], r["click_ts_us"])
            for r in spark.read.parquet(out).collect()
        }
        purchases = ev.filter("event_type = 'purchase'").select(
            F.col("event_id").alias("purchase_id"), "user_id", F.col("ts_us")
        )
        clicks = ev.filter("event_type = 'click'").select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts_us").alias("click_ts_us"),
        )
        want = {
            r["purchase_id"]: (r["asof_click_id"], r["asof_click_ts_us"])
            for r in asof_join(
                purchases, clicks, ["user_id"], "ts_us", "click_ts_us",
                ["click_id", "click_ts_us"], tie_cols=["click_id"],
            ).collect()
        }
        assert got == want

    def test_dirty_events_in_flight_across_restart(self, spark, tmp_path):
        """Dirty-input x restart for the AS-OF attribution state (fourth
        stateful family): the stream stops right after a batch whose
        LAST rows are a NULL-ts purchase, a NULL-ts click and a
        NULL-user click/purchase; a NEW query recovers the per-user
        (last_click_ts, id) pair and a post-restart purchase must
        attribute the PRE-restart click from recovered state — while a
        user whose every pre-restart click was dirty stays unmatched.
        Equal to the batch as-of join over the union."""
        import time

        from shifu_spark.operators.join import asof_join
        from shifu_spark.streaming.ops import streaming_asof_attribution

        schema = "user_id long, event_id long, event_type string, ts_us long"
        file1 = [
            (1, 100, "click", 1000),
            (1, 101, "purchase", 1500),
            # dirty stop boundary: the last checkpointed rows
            (1, 102, "purchase", None),   # NULL-ts purchase -> unmatched
            (2, 103, "click", None),      # NULL-ts click -> filtered
            (None, 104, "click", 1200),   # NULL-user click -> filtered
            (None, 105, "purchase", 1300),  # NULL-user purchase -> unmatched
        ]
        file2 = [
            (1, 110, "purchase", 2000),   # needs the RECOVERED click 100
            (2, 111, "purchase", 2500),   # only dirty clicks before -> unmatched
            (1, 112, "click", 2100),
            (1, 113, "purchase", 2200),   # in-batch click 112
            (2, 114, "purchase", None),   # NULL-ts again, post-restart
        ]
        src = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        spark.createDataFrame(file1, schema).coalesce(1).write.parquet(src)

        def run_once():
            stream = spark.readStream.schema(
                spark.read.parquet(src).schema
            ).parquet(src)
            q = (
                streaming_asof_attribution(stream)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            assert q.exception() is None

        run_once()
        time.sleep(1.1)  # file-source ordering is by modification time
        spark.createDataFrame(file2, schema).coalesce(1).write.mode("append").parquet(src)
        run_once()

        got = {
            r["purchase_id"]: (r["click_id"], r["click_ts_us"])
            for r in spark.read.parquet(out).collect()
        }
        union = spark.createDataFrame(file1 + file2, schema)
        purchases = union.filter("event_type = 'purchase'").select(
            F.col("event_id").alias("purchase_id"), "user_id", "ts_us"
        )
        clicks = union.filter(
            "event_type = 'click' AND user_id IS NOT NULL AND ts_us IS NOT NULL"
        ).select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts_us").alias("click_ts_us"),
        )
        want = {
            r["purchase_id"]: (r["asof_click_id"], r["asof_click_ts_us"])
            for r in asof_join(
                purchases, clicks, ["user_id"], "ts_us", "click_ts_us",
                ["click_id", "click_ts_us"], tie_cols=["click_id"],
            ).collect()
        }
        assert got == want
        # the post-restart attribution crossed the dirty boundary
        assert got[110] == (100, 1000)
        assert got[111] == (None, None)

    def test_dirty_restart_with_rescale_asof(self, spark, tmp_path):
        """Dirty-input x restart x RESCALE for the as-of attribution
        state — the ARBITRARY-PYTHON-STATE path (applyInPandasWithState
        keyed by user_id), a third Spark state mechanism after the SQL
        agg kernels and the window/watermark store. The per-user
        (last_click_ts, id) pair lives in whichever of the birth-N
        state partitions hash(user_id) chose; a resume that re-hashed
        over M != N would look up the post-resize purchase's user in a
        partition that never saw the pre-resize click and silently
        attribute nothing. Checkpoint born at shuffle.partitions=5 with
        NULL-ts/NULL-user rows as the stop boundary; resumed under 13;
        asserts the birth-N layout is pinned and the cross-resize
        purchase attributes the PRE-resize click."""
        import time

        from shifu_spark.operators.join import asof_join
        from shifu_spark.streaming.ops import streaming_asof_attribution

        schema = "user_id long, event_id long, event_type string, ts_us long"
        file1 = [
            (1, 100, "click", 1000),
            (1, 101, "purchase", 1500),
            (1, 102, "purchase", None),
            (2, 103, "click", None),
            (None, 104, "click", 1200),
            (None, 105, "purchase", 1300),
        ]
        file2 = [
            (1, 110, "purchase", 2000),   # needs the click RECOVERED across the resize
            (2, 111, "purchase", 2500),   # only dirty clicks before -> unmatched
            (1, 112, "click", 2100),
            (1, 113, "purchase", 2200),
            (2, 114, "purchase", None),
        ]
        src = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        spark.createDataFrame(file1, schema).coalesce(1).write.parquet(src)

        def run_once():
            stream = spark.readStream.schema(
                spark.read.parquet(src).schema
            ).parquet(src)
            q = (
                streaming_asof_attribution(stream)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            assert q.exception() is None

        orig = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            run_once()  # checkpoint born at N=5 state partitions
            state0 = os.path.join(ckpt, "state", "0")
            born = {d for d in os.listdir(state0) if d.isdigit()}
            assert born == {"0", "1", "2", "3", "4"}
            time.sleep(1.1)  # file-source ordering is by modification time
            spark.createDataFrame(file2, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            spark.conf.set("spark.sql.shuffle.partitions", "13")
            run_once()  # the resize
            assert {d for d in os.listdir(state0) if d.isdigit()} == born
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", orig)

        got = {
            r["purchase_id"]: (r["click_id"], r["click_ts_us"])
            for r in spark.read.parquet(out).collect()
        }
        union = spark.createDataFrame(file1 + file2, schema)
        purchases = union.filter("event_type = 'purchase'").select(
            F.col("event_id").alias("purchase_id"), "user_id", "ts_us"
        )
        clicks = union.filter(
            "event_type = 'click' AND user_id IS NOT NULL AND ts_us IS NOT NULL"
        ).select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts_us").alias("click_ts_us"),
        )
        want = {
            r["purchase_id"]: (r["asof_click_id"], r["asof_click_ts_us"])
            for r in asof_join(
                purchases, clicks, ["user_id"], "ts_us", "click_ts_us",
                ["click_id", "click_ts_us"], tie_cols=["click_id"],
            ).collect()
        }
        assert got == want
        # the attribution crossed BOTH the dirty boundary and the resize
        assert got[110] == (100, 1000)
        assert got[111] == (None, None)


class TestGoldTableUpsert:
    def test_two_batch_merge_equals_batch_aggregate(self, spark, tmp_path):
        """The medallion upsert: after a 2-micro-batch replay, the gold
        table equals one batch aggregate over all input (exact DECIMAL
        sums), including keys that appear in BOTH batches."""
        import time

        from shifu_spark.queries import _events
        from shifu_spark.streaming.ops import start_gold_table_foreach_batch

        ev = _events(spark, "/root/testdata/sf0.001").select("user_id", "value", "ts")
        src = str(tmp_path / "in")
        split = ev.approxQuantile("value", [0.5], 0.0)[0]
        ev.filter(F.col("value") <= split).coalesce(1).write.parquet(src)
        time.sleep(1.1)
        ev.filter(F.col("value") > split).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        gold = str(tmp_path / "gold")
        q = start_gold_table_foreach_batch(
            stream, "user_id", "value", gold, str(tmp_path / "ckpt")
        )
        q.awaitTermination(180)
        assert q.lastProgress is not None and q.lastProgress["batchId"] >= 1

        got = {
            r["key"]: (r["n"], r["s"], r["mx"])
            for r in spark.read.parquet(gold).collect()
        }
        want = {
            r["key"]: (r["n"], r["s"], r["mx"])
            for r in ev.groupBy(F.col("user_id").alias("key"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(38,10)")).alias("s"),
                F.max("value").alias("mx"),
            )
            .collect()
        }
        assert got == want
        # both batches really contributed (some key spans the split)
        assert any(n > 1 for n, _, _ in got.values())

    def test_dirty_rows_in_flight_across_restart(self, spark, tmp_path):
        """Dirty-input x restart for the gold-table MERGE (fifth stateful
        family — here the 'state' is the gold table itself): stop after
        a batch whose LAST merged rows are NaN / +-Inf / NULL values and
        a NULL key, restart onto a second dirty file, and assert the
        final gold table is byte-equal to an UNINTERRUPTED run of the
        same pipeline over the union — the merge policy for non-finite
        values must be restart-invariant (a NaN that reached the table
        differently across the boundary would poison every later merge
        of its key)."""
        import math as _math
        import time

        from shifu_spark.streaming.ops import start_gold_table_foreach_batch

        schema = "user_id long, value double"
        nan, inf = float("nan"), float("inf")
        file1 = [
            (1, 10.5), (2, 20.0),
            # dirty stop boundary
            (1, nan), (2, inf), (3, -inf), (3, None), (None, 5.0),
        ]
        file2 = [
            (1, 1.5), (2, -2.0), (3, 7.0), (None, nan), (4, -inf),
        ]

        def norm(rows):
            def v(x):
                if isinstance(x, float) and _math.isnan(x):
                    return "NaN"
                return x
            return {r["key"]: (r["n"], v(r["s"]), v(r["mx"])) for r in rows}

        # restarted lane: file 1, stop, file 2, recover
        src_a = str(tmp_path / "in_a")
        gold_a = str(tmp_path / "gold_a")
        ckpt_a = str(tmp_path / "ckpt_a")
        spark.createDataFrame(file1, schema).coalesce(1).write.parquet(src_a)

        def run_a():
            stream = spark.readStream.schema(
                spark.read.parquet(src_a).schema
            ).parquet(src_a)
            q = start_gold_table_foreach_batch(stream, "user_id", "value", gold_a, ckpt_a)
            q.awaitTermination(180)
            assert q.exception() is None

        run_a()
        time.sleep(1.1)  # file-source ordering is by modification time
        spark.createDataFrame(file2, schema).coalesce(1).write.mode("append").parquet(src_a)
        run_a()

        # uninterrupted lane: identical input, one run
        src_b = str(tmp_path / "in_b")
        gold_b = str(tmp_path / "gold_b")
        spark.createDataFrame(file1, schema).coalesce(1).write.parquet(src_b)
        spark.createDataFrame(file2, schema).coalesce(1).write.mode("append").parquet(src_b)
        stream = spark.readStream.schema(
            spark.read.parquet(src_b).schema
        ).parquet(src_b)
        q = start_gold_table_foreach_batch(
            stream, "user_id", "value", gold_b, str(tmp_path / "ckpt_b")
        )
        q.awaitTermination(180)
        assert q.exception() is None

        got = norm(spark.read.parquet(gold_a).collect())
        want = norm(spark.read.parquet(gold_b).collect())
        assert got == want
        # the dirty-boundary keys really crossed the restart
        assert got[1][0] == want[1][0] and got[1][0] >= 2

    def test_dirty_restart_with_rescale_gold_table(self, spark, tmp_path):
        """Dirty-input x restart x RESCALE for the gold-table merge —
        completing the rescale matrix over all six dirty-restart
        families. This family is DELIBERATELY different: foreachBatch
        keeps no state store (asserted — the checkpoint has no state/
        dir), because the 'state' is the gold table itself, which is
        partition-count-independent by construction. A resize therefore
        only re-shuffles the per-batch aggregate + merge, and the pin
        is pure result equality: born at shuffle.partitions=5, stopped
        on the NaN/Inf/NULL boundary, resumed under 13, the final gold
        table must equal an uninterrupted single-parallelism run over
        the union — including the NaN-merge policy crossing the
        resize."""
        import math as _math
        import time

        from shifu_spark.streaming.ops import start_gold_table_foreach_batch

        schema = "user_id long, value double"
        nan, inf = float("nan"), float("inf")
        file1 = [
            (1, 10.5), (2, 20.0),
            (1, nan), (2, inf), (3, -inf), (3, None), (None, 5.0),
        ]
        file2 = [
            (1, 1.5), (2, -2.0), (3, 7.0), (None, nan), (4, -inf),
        ]

        def norm(rows):
            def v(x):
                if isinstance(x, float) and _math.isnan(x):
                    return "NaN"
                return x
            return {r["key"]: (r["n"], v(r["s"]), v(r["mx"])) for r in rows}

        src_a = str(tmp_path / "in_a")
        gold_a = str(tmp_path / "gold_a")
        ckpt_a = str(tmp_path / "ckpt_a")
        spark.createDataFrame(file1, schema).coalesce(1).write.parquet(src_a)

        def run_a():
            stream = spark.readStream.schema(
                spark.read.parquet(src_a).schema
            ).parquet(src_a)
            q = start_gold_table_foreach_batch(stream, "user_id", "value", gold_a, ckpt_a)
            q.awaitTermination(180)
            assert q.exception() is None

        orig = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            run_a()
            # no state store: the gold table IS the state
            assert not os.path.isdir(os.path.join(ckpt_a, "state"))
            time.sleep(1.1)  # file-source ordering is by modification time
            spark.createDataFrame(file2, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src_a)
            spark.conf.set("spark.sql.shuffle.partitions", "13")
            run_a()  # the resize: merge result must be partition-invariant
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", orig)

        # uninterrupted lane: identical input, one run, one parallelism
        src_b = str(tmp_path / "in_b")
        gold_b = str(tmp_path / "gold_b")
        spark.createDataFrame(file1, schema).coalesce(1).write.parquet(src_b)
        spark.createDataFrame(file2, schema).coalesce(1).write.mode("append").parquet(src_b)
        stream = spark.readStream.schema(
            spark.read.parquet(src_b).schema
        ).parquet(src_b)
        q = start_gold_table_foreach_batch(
            stream, "user_id", "value", gold_b, str(tmp_path / "ckpt_b")
        )
        q.awaitTermination(180)
        assert q.exception() is None

        got = norm(spark.read.parquet(gold_a).collect())
        want = norm(spark.read.parquet(gold_b).collect())
        assert got == want
        assert got[1][0] == want[1][0] and got[1][0] >= 2

    def test_replay_across_restart_is_idempotent(self, spark, tmp_path):
        """The at-least-once window the marker exists for: a crash AFTER
        the gold-table swap but BEFORE the checkpoint commit re-delivers
        the same batch_id on RESTART (new start() invocation). Simulated
        exactly: run one batch to completion, delete the checkpoint's
        ``commits/0`` (so Spark believes batch 0 never committed and
        replays it), restart with the same checkpoint. The marker token
        is a NONCE persisted inside the checkpoint dir — stable across
        restarts of the same checkpoint instance (NOT a function of the
        path; see test_checkpoint_reset_is_not_suppressed) — so the
        replayed merge must be suppressed and the gold table must equal
        a single batch aggregate, not double-counted."""
        from shifu_spark.queries import _events
        from shifu_spark.streaming.ops import start_gold_table_foreach_batch

        ev = _events(spark, "/root/testdata/sf0.001").select("user_id", "value", "ts")
        src, gold, ckpt = (str(tmp_path / d) for d in ("in", "gold", "ckpt"))
        ev.coalesce(1).write.parquet(src)

        def run():
            stream = spark.readStream.schema(ev.schema).parquet(src)
            q = start_gold_table_foreach_batch(stream, "user_id", "value", gold, ckpt)
            q.awaitTermination(120)

        run()
        commit0 = os.path.join(ckpt, "commits", "0")
        assert os.path.isfile(commit0)
        os.remove(commit0)  # crash-before-commit: batch 0 will replay
        crc = os.path.join(ckpt, "commits", ".0.crc")  # checksum-FS sidecar
        if os.path.isfile(crc):
            os.remove(crc)
        run()

        got = {
            r["key"]: (r["n"], r["s"], r["mx"])
            for r in spark.read.parquet(gold).collect()
        }
        want = {
            r["key"]: (r["n"], r["s"], r["mx"])
            for r in ev.groupBy(F.col("user_id").alias("key"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(38,10)")).alias("s"),
                F.max("value").alias("mx"),
            )
            .collect()
        }
        assert got == want  # replayed batch merged ZERO additional rows

    def test_checkpoint_reset_is_not_suppressed(self, spark, tmp_path):
        """The run token is a nonce persisted INSIDE the checkpoint dir —
        the identity of the checkpoint INSTANCE, not of its path. After
        'rm -rf ckpt' and a restart at the SAME path, batch ids restart
        at 0 but the fresh nonce must NOT match the gold marker, so the
        new stream's batches merge normally (standard at-least-once
        contract: resetting the checkpoint without resetting the sink
        reprocesses — it must never silently DROP the new batches, which
        is what a path-derived token would do)."""
        import shutil

        from shifu_spark.queries import _events
        from shifu_spark.streaming.ops import start_gold_table_foreach_batch

        ev = _events(spark, "/root/testdata/sf0.001").select("user_id", "value", "ts")
        src, gold, ckpt = (str(tmp_path / d) for d in ("in", "gold", "ckpt"))
        ev.coalesce(1).write.parquet(src)

        def run():
            stream = spark.readStream.schema(ev.schema).parquet(src)
            q = start_gold_table_foreach_batch(stream, "user_id", "value", gold, ckpt)
            q.awaitTermination(120)

        run()
        once = {r["key"]: r["n"] for r in spark.read.parquet(gold).collect()}
        shutil.rmtree(ckpt)  # checkpoint reset, gold table kept
        run()  # same input re-reads as a fresh batch 0
        twice = {r["key"]: r["n"] for r in spark.read.parquet(gold).collect()}
        assert twice == {k: 2 * n for k, n in once.items()}


class TestStreamingExactDedup:
    def test_duplicates_across_micro_batches_dropped(self, spark, tmp_path):
        """The duplicate copy arrives in a LATER micro-batch but within
        the watermark horizon: dropDuplicatesWithinWatermark must still
        drop it (state carried across batches), and emit every distinct
        id exactly once."""
        import time

        from pyspark.sql import functions as F

        base = 1_700_000_000_000_000  # µs
        rows = [(i, base + i * 60_000_000, f"u{i % 3}", 1.0 * i) for i in range(10)]
        df = spark.createDataFrame(rows, "event_id long, ts_us long, user_id string, value double")
        df = df.select(
            "event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id", "value"
        )
        src, ckpt, out = (str(tmp_path / d) for d in ("in", "ckpt", "out"))
        df.coalesce(1).write.parquet(src)
        time.sleep(1.1)  # file order = modification time
        dups = df.filter(F.col("event_id") % 3 == 0)
        dups.coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        ded = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        q = (
            ded.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.lastProgress is not None and q.lastProgress["batchId"] >= 1
        got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
        assert got == list(range(10))  # each id exactly once


class TestGoldTableUriGuard:
    @pytest.mark.parametrize(
        "bad",
        [
            "hdfs://nn:8020/ckpt",     # classic double-slash URI
            "s3a://bucket/ckpt",
            "file:/tmp/ckpt",          # single-slash Hadoop URI: Spark
            "hdfs:/ckpt",              # resolves it, but the Python-side
            "file:///tmp/ckpt",        # nonce I/O would write a literal
        ],                             # local dir named 'file:'
    )
    def test_scheme_prefixed_paths_rejected(self, tmp_path, bad):
        """ADVICE r8: the old guard only caught '://', so single-slash
        Hadoop URIs (file:/x, hdfs:/x) passed — Spark would checkpoint
        at the URI location while the nonce/marker files landed on the
        driver's local disk, silently re-enabling the double-count the
        guard exists to prevent. Any RFC-3986 scheme prefix must fail
        loudly, in either path argument."""
        from shifu_spark.streaming.ops import start_gold_table_foreach_batch

        good = str(tmp_path / "ok")
        for gold, ckpt in ((bad, good), (good, bad)):
            with pytest.raises(ValueError, match="local-filesystem"):
                start_gold_table_foreach_batch(None, "k", "v", gold, ckpt)
