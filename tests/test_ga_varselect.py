"""GA wrapper varselect (ml/ga_varselect.py) — mechanics + recovery.

Selection mechanics mirror CandidateGenerator.java (inherit/hybrid/mutate
bands); fitness is the Gram-matrix linear probe. The end-to-end test
plants 2 informative features among 6 and expects the GA to find them.
"""

import numpy as np
import pytest

from shifu_spark.ml.ga_varselect import (
    CandidateGenerator,
    ga_varselect,
    gram_matrix,
    subset_valid_mse,
)


class TestCandidateGenerator:
    def test_init_seeds_shape_and_uniqueness(self):
        gen = CandidateGenerator(list(range(10)), 4, 15, seed=1)
        seeds = gen.init_seeds()
        assert len(seeds) == 15
        for s in seeds:
            assert len(s) == 4 and len(set(s)) == 4  # no repeated genes

    def test_next_generation_bands(self):
        gen = CandidateGenerator(list(range(10)), 3, 10, hybrid_percent=60, mutation_percent=20, seed=2)
        seeds = gen.init_seeds()
        ranked = [(s, float(i)) for i, s in enumerate(seeds)]
        nxt = gen.next_generation(ranked)
        assert len(nxt) == 10
        # inherit band: first 20% + 1 seeds carried over unchanged
        assert nxt[0] == seeds[0]
        for s in nxt:
            assert len(s) == 3 and len(set(s)) == 3

    def test_hybrid_child_genes_from_parents(self):
        gen = CandidateGenerator(list(range(20)), 5, 10, seed=3)
        f, m = (0, 1, 2, 3, 4), (3, 4, 5, 6, 7)
        child = gen._hybrid(f, m)
        assert len(child) == 5
        assert set(child) <= set(f) | set(m)

    def test_param_validation(self):
        with pytest.raises(ValueError):
            CandidateGenerator(list(range(5)), 9, 10)
        with pytest.raises(ValueError):
            CandidateGenerator(list(range(5)), 2, 10, hybrid_percent=80, mutation_percent=30)


def _fixture(spark, n=600, seed=9):
    """y = 2*x0 - 3*x3 + noise; x1,x2,x4,x5 are noise columns."""
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (n, 6))
    y = 2.0 * x[:, 0] - 3.0 * x[:, 3] + rng.normal(0, 0.1, n)
    rows = [tuple(map(float, (*x[i], y[i]))) for i in range(n)]
    cols = [f"x{i}" for i in range(6)]
    return spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols) + ", y double"), cols


class TestGramFitness:
    def test_gram_matches_numpy(self, spark):
        df, cols = _fixture(spark, n=100)
        g, n = gram_matrix(df, cols, "y")
        pdf = df.toPandas()
        z = np.column_stack([pdf[cols].to_numpy(), np.ones(n), pdf["y"].to_numpy()])
        np.testing.assert_allclose(g, z.T @ z, rtol=1e-9)
        assert n == 100

    def test_informative_subset_scores_better(self, spark):
        df, cols = _fixture(spark)
        g, n = gram_matrix(df, cols, "y")
        good = subset_valid_mse(g, g, n, [0, 3])
        bad = subset_valid_mse(g, g, n, [1, 2])
        assert good < bad / 10


class TestGAVarselect:
    def test_recovers_informative_features(self, spark):
        df, cols = _fixture(spark, n=800)
        train, valid = df.randomSplit([0.7, 0.3], seed=4)
        res = ga_varselect(
            train,
            valid,
            cols,
            label_col="y",
            expect_variable_cnt=2,
            population_live_size=12,
            population_multiply_cnt=6,
            seed=7,
        )
        assert res.best_features == ["x0", "x3"]
        # best error never regresses generation to generation: at least
        # one elite is always inherited, so the per-generation best is
        # non-increasing — the old disjunction was satisfied by ANY run
        # whose final error merely beat the initial one
        assert all(a >= b for a, b in zip(res.history, res.history[1:])), res.history


class TestGramDirtyGuard:
    def test_nonfinite_input_raises_loudly(self, spark):
        """One NaN row must fail the Gram pass with a clear error — the
        alternative is every candidate's fitness silently ranking on
        NaN (SCALE.md principle 6: dirty rows may not SKEW a job)."""
        import pytest

        from shifu_spark.ml.ga_varselect import gram_matrix

        df = spark.createDataFrame(
            [(1.0, 2.0, 1.0), (float("nan"), 0.5, 0.0), (0.5, 1.0, 1.0)],
            "f1 double, f2 double, label double",
        )
        with pytest.raises(Exception, match="non-finite|normalize"):
            gram_matrix(df, ["f1", "f2"], "label")
