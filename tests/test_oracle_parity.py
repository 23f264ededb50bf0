"""Run every registered query against its DuckDB oracle — the local replica
of the driver's correctness gate (CORRECTNESS_r{N}.json)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle import compare, duckdb_conn

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def _pairs():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, name, fn, sql):
    df = fn(spark, SF_DIR)
    if sql is None:
        # rows-only check (non-SQL-expressible op): every registered
        # rows-only query is a training/sampling sentinel that BUILDS
        # its rows, so emptiness is always a bug — `>= 0` could never
        # bind on anything
        assert df.count() > 0, f"{name}: rows-only query returned no rows"
        return
    con = duckdb_conn(SF_DIR)
    problems = compare(df, con, sql, name)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0  # the flagship aggregate is never empty
    assert df.columns
