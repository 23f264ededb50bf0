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
