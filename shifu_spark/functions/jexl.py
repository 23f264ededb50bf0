"""JEXL-subset expression translation.

The reference evaluates Apache JEXL 2 expressions over header-bound row
maps for row filters ("purify", core/DataPurifier.java:47-130) and weight
expressions (udf/NormalizeUDF.java:145,317,528). We translate the
arithmetic / comparison / boolean / ternary subset to Spark SQL text and
hand it to ``F.expr`` — the filter then participates in Catalyst
predicate pushdown, which the reference never had (SURVEY §4).

Unsupported constructs raise loudly — the reference silently disables a
bad expression (DataPurifier catches and ignores), which SURVEY §7 flags
as a bug not to copy.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# token-level rewrites: JEXL -> SQL
_REWRITES = [
    (re.compile(r"&&"), " AND "),
    (re.compile(r"\|\|"), " OR "),
    (re.compile(r"!="), "<>"),
    (re.compile(r"(?<![<>=!])==(?!=)"), "="),
    (re.compile(r"!(?![=])"), " NOT "),
    (re.compile(r"\bnull\b"), "NULL"),
    (re.compile(r"\btrue\b"), "TRUE"),
    (re.compile(r"\bfalse\b"), "FALSE"),
]

_FORBIDDEN = re.compile(r"(new\s+\w|\.\w+\s*\(|\[\]|=~|!~|\bsize\s*\(|\bempty\s*\()")

_TERNARY = re.compile(r"^(.*?)\?(.*):(.*)$")


def jexl_to_sql(expr: str) -> str:
    """Translate a JEXL filter/weight expression to a Spark SQL expression.

    Supported: arithmetic (+ - * / %), comparisons, && || !, ternary
    ``cond ? a : b``, parentheses, column identifiers (``ns::name``
    namespaces collapse to the leaf name). Anything else -> ValueError.
    """
    if _FORBIDDEN.search(expr):
        raise ValueError(f"unsupported JEXL construct in {expr!r}")
    s = expr.strip()
    # namespace collapse: ns::col -> col (column/NSColumn.java)
    s = re.sub(r"\b\w+::(\w+)", r"\1", s)
    m = _TERNARY.match(s)
    if m and "?" not in m.group(1):
        cond, a, b = (jexl_to_sql(g) for g in m.groups())
        return f"CASE WHEN {cond} THEN {a} ELSE {b} END"
    for pat, rep in _REWRITES:
        s = pat.sub(rep, s)
    return s


def jexl_filter(expr: str) -> Column:
    """JEXL row filter -> boolean Column (DataPurifier semantics)."""
    return F.expr(jexl_to_sql(expr))


def jexl_weight(expr: str | None) -> Column:
    """JEXL weight expression -> double Column; None/blank -> 1.0.

    Weight parse failures default to 1.0 (ConfusionMatrix.java:361-370 /
    NormalizeUDF weight handling)."""
    if not expr or not expr.strip():
        return F.lit(1.0)
    w = F.expr(jexl_to_sql(expr)).try_cast("double")
    return F.when(w.isNull() | (w < 0), F.lit(1.0)).otherwise(w)
