"""K-means quantizer training (operators/similarity.kmeans_step/fit)."""

from pyspark.sql import functions as F


def test_kmeans_fit_shapes_and_stability(spark):
    from shifu_spark.operators.similarity import kmeans_fit, kmeans_step

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = kmeans_fit(emb, F.col("vec_id") < 4, iters=2)
    assert 1 <= len(cents) <= 4  # empty cells drop out
    dim = emb.select(F.size("embedding")).first()[0]
    for cid, vec in cents:
        assert len(vec) == dim

    # a step from the fitted centroids changes them less than the first
    # step from raw seeds did (coarse convergence signal)
    step = {(r["cell"], r["pos"]): r["centroid"] for r in kmeans_step(emb, cents).collect()}
    n_el = sum(len(vec) for _, vec in cents)
    drift = sum(
        abs(step.get((cid, p), v) - v) for cid, vec in cents for p, v in enumerate(vec)
    )
    assert drift / n_el < 0.02  # mean per-element movement is tiny once fitted
