"""pca_top_component_df — distributed exact-int Gram + deterministic
power iteration."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from shifu_spark.operators.pca import (
    PCA_SCALE,
    gram_matrix_df,
    pca_top_component_df,
    power_iteration,
)


def _vec_df(spark, mat, parts=1):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(parts) if parts > 1 else df


class TestGram:
    def test_gram_matches_numpy_exact(self, spark):
        rng = np.random.RandomState(7)
        mat = rng.uniform(-0.6, 0.6, size=(40, 5)).astype(np.float32)
        df = _vec_df(spark, mat, parts=4)
        cells = {(r.i, r.j): r.g for r in gram_matrix_df(df, "embedding", 5).collect()}
        # the reference quantization: same JVM round semantics (half away
        # from zero), applied to the float->double-exact values
        q = np.array(
            [
                [int(np.floor(abs(v) * PCA_SCALE + 0.5)) * (1 if v >= 0 else -1) for v in row]
                for row in mat.astype(np.float64)
            ],
            dtype=object,
        )
        expected = q.T @ q  # python ints: exact
        for i in range(5):
            for j in range(5):
                assert cells[(i + 1, j + 1)] == int(expected[i, j])

    def test_layout_invariance_bitwise(self, spark):
        rng = np.random.RandomState(11)
        mat = rng.uniform(-0.5, 0.5, size=(60, 6)).astype(np.float32)
        a = pca_top_component_df(_vec_df(spark, mat, parts=1), "embedding", 6).collect()
        b = pca_top_component_df(_vec_df(spark, mat, parts=7), "embedding", 6).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


class TestPowerIteration:
    def test_aligns_with_numpy_eigenvector(self, spark):
        rng = np.random.RandomState(3)
        # planted dominant direction so the top eigengap is wide
        d = 8
        u = rng.randn(d)
        u /= np.linalg.norm(u)
        mat = (np.outer(rng.randn(300), u) * 0.4 + rng.randn(300, d) * 0.02).astype(
            np.float32
        )
        out = pca_top_component_df(_vec_df(spark, mat, parts=3), "embedding", d, iters=20)
        v = np.array([r.loading for r in out.orderBy("dim").collect()])
        v /= np.linalg.norm(v)
        g = (mat.astype(np.float64).T @ mat.astype(np.float64))
        w, vecs = np.linalg.eigh(g)
        top = vecs[:, np.argmax(w)]
        assert abs(abs(float(np.dot(v, top))) - 1.0) < 1e-4

    def test_zero_matrix_raises(self):
        gram = {(i, j): 0 for i in range(1, 3) for j in range(1, 3)}
        with pytest.raises(ValueError, match="zero vector"):
            power_iteration(gram, 2, 3)
