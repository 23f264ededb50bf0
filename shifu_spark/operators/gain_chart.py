"""Gain-chart export — the reference's one remaining reporting artifact.

Reference: core/eval/GainChart.java (HTML chart over the eval
PerformanceResult buckets) + ExportModelProcessor's CSV twin. All the
underlying metrics already exist in operators/eval_metrics; this module
is the presentation layer: a bucketed operating-point table with
cumulative lift, rendered to CSV / self-contained HTML with zero
third-party dependencies (stdlib string templating only — the reference
bundles a JS chart lib; we emit an inline SVG polyline instead).

The TABLE is the driver-checkable part (``gain_chart_rows_df`` backs the
``gain_chart_export`` registry query, oracle-mirrored in DuckDB); the
renderers are driver-side functions over the collected (≤ buckets+1)-row
result, pinned by tests/test_gain_chart.py.
"""

from __future__ import annotations

import html

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gain_chart_rows_df(
    df: DataFrame,
    score_col: str,
    label_expr: Column,
    num_buckets: int = 10,
    round_to: int | None = 6,
    cache_out: list[DataFrame] | None = None,
) -> DataFrame:
    """Gain-chart operating points: gain_buckets_df plus cumulative lift.

    lift = recall / action_rate — how many times better than random the
    model captures positives when acting on the top action_rate fraction
    (GainChart.java's "model vs random" series; the random baseline
    catches exactly action_rate of positives).
    """
    from shifu_spark.operators.eval_metrics import confusion_points_df, gain_buckets_df

    pts = confusion_points_df(df, score_col, label_expr, cache_out=cache_out)
    out = gain_buckets_df(pts, num_buckets, round_to=None)
    lift = F.try_divide(F.col("recall"), F.col("action_rate"))
    out = out.withColumn("lift", lift)
    if round_to is not None:
        for c in ("action_rate", "precision", "recall", "fpr", "lift"):
            out = out.withColumn(c, F.round(F.col(c), round_to))
    return out


def gain_chart_csv(rows: list) -> str:
    """CSV export (ExportModelProcessor gain-chart CSV twin): header +
    one line per operating point, stdlib-only."""
    cols = ["bucket", "score", "action_rate", "precision", "recall", "fpr", "lift"]
    lines = [",".join(cols)]
    for r in rows:
        lines.append(",".join("" if r[c] is None else repr(r[c]) for c in cols))
    return "\n".join(lines) + "\n"


def _svg_polyline(points: list[tuple[float, float]], color: str, w: int, h: int) -> str:
    pts = " ".join(f"{x * w:.1f},{(1 - y) * h:.1f}" for x, y in points)
    return f'<polyline fill="none" stroke="{color}" stroke-width="2" points="{pts}"/>'


def render_gain_chart_html(rows: list, title: str = "Gain chart") -> str:
    """Self-contained HTML gain chart (GainChart.java:39+ semantics):
    recall-vs-action_rate curve for the model, the y=x random baseline,
    and the operating-point table. Inline SVG, no external scripts."""
    pts = sorted(
        (
            (r["action_rate"], r["recall"])
            for r in rows
            # zero-positive corpora yield NULL recall (try_divide) — skip
            # those points rather than crash float() below
            if r["action_rate"] is not None and r["recall"] is not None
        ),
        key=lambda p: p[0],
    )
    w = h = 400
    svg = (
        f'<svg viewBox="0 0 {w} {h}" width="{w}" height="{h}" '
        f'style="border:1px solid #999;background:#fff">'
        + _svg_polyline([(0.0, 0.0), (1.0, 1.0)], "#bbb", w, h)
        + _svg_polyline([(0.0, 0.0)] + [(float(x), float(y)) for x, y in pts], "#0a62c9", w, h)
        + "</svg>"
    )
    head = "".join(
        f"<th>{html.escape(c)}</th>"
        for c in ("bucket", "score", "action_rate", "precision", "recall", "fpr", "lift")
    )
    body = "".join(
        "<tr>"
        + "".join(
            f"<td>{'' if r[c] is None else html.escape(str(r[c]))}</td>"
            for c in ("bucket", "score", "action_rate", "precision", "recall", "fpr", "lift")
        )
        + "</tr>"
        for r in rows
    )
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)}</title></head><body>"
        f"<h1>{html.escape(title)}</h1>{svg}"
        f"<table border='1' cellspacing='0'><tr>{head}</tr>{body}</table>"
        "</body></html>"
    )
