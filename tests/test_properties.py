"""Property-based tests (hypothesis) for the pure-python kernels —
randomized coverage the reference's deterministic-golden style misses
(SURVEY §5 notes it has none)."""

import math
import os
import sys

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


counts = st.lists(
    st.tuples(st.integers(0, 10**6), st.integers(0, 10**4)), min_size=1, max_size=60
).map(lambda xs: [(float(i), c) for i, (_, c) in enumerate(xs)])


class TestDynamicBinMerge:
    @given(counts, st.integers(1, 12))
    @settings(max_examples=200, deadline=None)
    def test_invariants(self, small, k):
        from shifu_spark.operators.binning import dynamic_bin_merge

        b = dynamic_bin_merge(small, k)
        total = sum(c for _, c in small)
        if total == 0:
            assert b == []
            return
        # boundaries strictly ascending, start at first lo, never exceed k
        assert b[0] == small[0][0]
        assert all(x < y for x, y in zip(b, b[1:]))
        assert 1 <= len(b) <= k
        # every boundary is an existing small-bin lo (never invented)
        los = {lo for lo, _ in small}
        assert all(x in los for x in b)


class TestWelfordMerge:
    @given(
        st.lists(
            st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=0, max_size=50),
            min_size=1,
            max_size=6,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_chunked_merge_equals_global_moments(self, chunks):
        """Merging per-chunk moments Chan-style == numpy over the concat."""
        from shifu_spark.streaming.ops import _welford_fn

        class FakeState:
            exists = False
            get = None

            def update(self, v):
                self.get = v
                self.exists = True

        import pandas as pd

        state = FakeState()
        out = None
        for out in _welford_fn(("k",), (pd.DataFrame({"value": c}) for c in chunks), state):
            pass
        allv = np.concatenate([np.array(c, dtype=float) for c in chunks]) if any(len(c) for c in chunks) else np.array([])
        n = len(allv)
        assert out is not None
        row = out.iloc[0]
        assert row["n"] == n
        if n > 0:
            assert math.isclose(row["mean"], float(allv.mean()), rel_tol=1e-9, abs_tol=1e-9)
        if n > 1:
            assert math.isclose(row["std"], float(allv.std(ddof=1)), rel_tol=1e-6, abs_tol=1e-6)


class TestJexlTranslation:
    @given(st.sampled_from(["a", "b_1", "ns::col"]), st.integers(-100, 100), st.sampled_from(["<", ">", "<=", ">=", "==", "!="]))
    @settings(max_examples=100, deadline=None)
    def test_comparison_translation_shape(self, name, num, op):
        from shifu_spark.functions.jexl import jexl_to_sql

        sql = jexl_to_sql(f"{name} {op} {num}")
        assert "::" not in sql  # namespaces collapsed
        assert str(num) in sql
        if op == "==":
            assert "=" in sql and "==" not in sql
        if op == "!=":
            assert "<>" in sql

    @given(st.sampled_from(["new java.util.Date()", "a.size()", "x =~ y", "empty(x)"]))
    @settings(max_examples=20, deadline=None)
    def test_forbidden_constructs_raise(self, expr):
        import pytest

        from shifu_spark.functions.jexl import jexl_to_sql

        with pytest.raises(ValueError):
            jexl_to_sql(expr)


class TestSeqDotExactness:
    @given(
        st.integers(1, 40),
        st.integers(1, 8),
    )
    @settings(max_examples=50, deadline=None)
    def test_seq_dot_equals_python_fold(self, dim, rows):
        """The vectorized kernel must be bit-identical to the scalar
        sequential fold it replaces (the oracle-parity contract)."""
        rng = np.random.default_rng(dim * 1000 + rows)
        a = rng.normal(size=(rows, dim))
        b = rng.normal(size=(rows, dim))
        from shifu_spark.operators.similarity import _seq_dot

        got = _seq_dot(a, b)
        for r in range(rows):
            acc = 0.0
            for d in range(dim):
                acc = acc + a[r, d] * b[r, d]
            assert got[r] == acc  # bitwise equality, not isclose
