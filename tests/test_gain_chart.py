"""Gain-chart export: table oracle-parity lives in the registry
(gain_chart_export); these pin the driver-side CSV/HTML renderers and
the lift algebra."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def rows(spark):
    from shifu_spark.operators.gain_chart import gain_chart_rows_df

    df = spark.range(0, 2000).select(
        (F.col("id") % 101 / 101.0).alias("score"),
        (F.rand(11) < 0.25).cast("int").alias("label"),
    )
    return gain_chart_rows_df(df, "score", F.col("label") == 1, 10).collect()


def test_lift_is_recall_over_action_rate(rows):
    # lift is computed from the UNROUNDED recall/action_rate (matching
    # the oracle); recomputing from the rounded output columns carries
    # up to ~1e-5 of input-rounding noise
    for r in rows:
        if r["action_rate"] and r["lift"] is not None:
            assert r["lift"] == pytest.approx(r["recall"] / r["action_rate"], abs=5e-5)


def test_full_action_bucket_has_unit_lift(rows):
    last = max(rows, key=lambda r: r["action_rate"])
    # acting on everything catches everything: recall 1 at action_rate 1
    assert last["action_rate"] == pytest.approx(1.0, abs=1e-9)
    assert last["lift"] == pytest.approx(1.0, abs=1e-9)


def test_csv_render(rows):
    from shifu_spark.operators.gain_chart import gain_chart_csv

    csv = gain_chart_csv(rows)
    lines = csv.strip().split("\n")
    assert lines[0] == "bucket,score,action_rate,precision,recall,fpr,lift"
    assert len(lines) == len(rows) + 1
    # every line has the full column count even with NULL cells
    assert all(line.count(",") == 6 for line in lines)


def test_html_render_is_self_contained(rows):
    from shifu_spark.operators.gain_chart import render_gain_chart_html

    doc = render_gain_chart_html(rows, title="model <1> eval")
    assert doc.startswith("<!DOCTYPE html>")
    assert "<svg" in doc and "polyline" in doc
    assert "model &lt;1&gt; eval" in doc  # titles are escaped
    assert "<script" not in doc  # no external/inline JS
    assert doc.count("<tr>") == len(rows) + 1
