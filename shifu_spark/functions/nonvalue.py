"""The engine's ONE definition of the MISSING value class for doubles.

NULL, NaN, +Infinity and -Infinity are all MISSING (mean-impute in
z-score, the dedicated missing slot in bin lookups, excluded from
moments/correlation/eval points, whole-row exclusion in the Gram) —
Normalizer.java:566-573's "if the value is Infinite or NaN, treat it
as missing" unified with SQL NULL.

This helper exists because the r9/r10 "non-finite population split"
bugs were EXACTLY one private copy of this predicate being updated
while another wasn't (six copies had accreted by r10's code review).
Every operator family imports these; a semantics tweak (say, deciding
subnormals or -0.0 are missing too) happens in one place and the
dirty-frame parity suite (tests/test_properties.py::
TestNonFiniteDirtyFrame) re-proves every family against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INF = float("inf")


def is_nonvalue(c: Column) -> Column:
    """TRUE when ``c`` (a double Column) is NULL/NaN/±Infinity."""
    return c.isNull() | F.isnan(c) | (F.abs(c) == F.lit(_INF))


def is_value(c: Column) -> Column:
    """TRUE when ``c`` is a finite non-null double — ``~is_nonvalue``
    spelled positively (NULL-safe: NULL yields FALSE, not NULL)."""
    return c.isNotNull() & ~F.isnan(c) & (F.abs(c) != F.lit(_INF))


def nonvalue_sql(col_sql: str) -> str:
    """DuckDB-side mirror for oracles: the SAME class as a SQL predicate."""
    return f"({col_sql} IS NULL OR NOT isfinite(CAST({col_sql} AS DOUBLE)))"
