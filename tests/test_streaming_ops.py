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
