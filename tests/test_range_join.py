"""range_bucket_join — the bucketized no-equi-key interval join.

Differential contract: output row-set == the naive theta join
(lo <= point < hi) on every fixture, including negative domains,
intervals spanning many buckets, touching boundaries, and empty
intervals.  Plan contract: with broadcast disabled the join is a
shuffled equi join on the cell id — NO BroadcastNestedLoopJoin, NO
CartesianProduct (that absence is the whole point of the operator).
"""

import pytest
from pyspark.sql import functions as F

from shifu_spark.operators.join import range_bucket_join


def _points(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "pid long, pt long")


def _intervals(spark, spans):
    return spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(spans)], "iid long, lo long, hi long"
    )


def _naive(vals, spans):
    return sorted(
        (pi, ii)
        for pi, v in enumerate(vals)
        for ii, (lo, hi) in enumerate(spans)
        if lo <= v < hi
    )


def _check(spark, vals, spans, bucket):
    out = range_bucket_join(
        _points(spark, vals), _intervals(spark, spans), "pt", "lo", "hi", bucket
    )
    got = sorted((r.pid, r.iid) for r in out.select("pid", "iid").collect())
    assert got == _naive(vals, spans)


class TestRangeBucketJoin:
    def test_matches_naive_theta_join(self, spark):
        # deterministic pseudo-random fixture: multiplicative hash
        vals = [(i * 2654435761) % 1000 - 200 for i in range(120)]
        spans = [((j * 40503) % 700 - 150, (j * 40503) % 700 - 150 + (j % 7) * 37) for j in range(25)]
        _check(spark, vals, spans, bucket=50)

    def test_half_open_boundaries(self, spark):
        # point == lo matches, point == hi does not
        _check(spark, [10, 20], [(10, 20)], bucket=7)

    def test_interval_spanning_many_buckets(self, spark):
        _check(spark, list(range(0, 100, 9)), [(5, 95)], bucket=3)

    def test_negative_domain_floor_division(self, spark):
        # floor (not truncate-toward-zero) bucketing: -1 must land in
        # cell -1, not cell 0, or points just below zero miss intervals
        _check(spark, [-10, -1, 0, 1], [(-5, 2)], bucket=4)

    def test_empty_interval_dropped(self, spark):
        _check(spark, [5], [(5, 5), (6, 4)], bucket=2)

    def test_exact_above_2_53(self, spark):
        # magnitudes past 2^53: DOUBLE division would round the cell id
        # and hash matching pairs to different cells, silently dropping
        # them (ADVICE r6 medium).  2^53 + 1 is the first long a double
        # cannot represent; the cluster below/above it must still join.
        base = 1 << 53
        vals = [base - 1, base, base + 1, base + 3, -base - 1, -base + 1]
        spans = [
            (base - 2, base + 2),      # straddles 2^53
            (base + 2, base + 5),      # entirely above
            (-base - 3, -base + 2),    # negative far domain
        ]
        for bucket in (3, 7, 1000):
            _check(spark, vals, spans, bucket)

    def test_column_overlap_raises(self, spark):
        p = _points(spark, [1])
        with pytest.raises(ValueError, match="disjoint"):
            range_bucket_join(p, p, "pt", "pt", "pt", 10)

    def test_bad_bucket_raises(self, spark):
        p = _points(spark, [1])
        iv = _intervals(spark, [(0, 2)])
        with pytest.raises(ValueError, match="bucket"):
            range_bucket_join(p, iv, "pt", "lo", "hi", 0)

    def test_plan_is_equi_join_not_nested_loop(self, spark):
        from shifu_spark.plans.inspect import _executed_plan

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            vals = list(range(0, 500, 3))
            spans = [(k * 10, k * 10 + 25) for k in range(40)]
            out = range_bucket_join(
                _points(spark, vals), _intervals(spark, spans), "pt", "lo", "hi", 16
            )
            plan = _executed_plan(out)
            assert "BroadcastNestedLoopJoin" not in plan
            assert "CartesianProduct" not in plan
            assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
