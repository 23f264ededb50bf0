"""In-row MinHash signature (the streaming-dedup stateless half) must
equal the shuffle-based batch signature exactly — same shingling, same
salted-md5 family, same lexicographic min."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_inrow_signature_equals_batch_wide(spark):
    from shifu_spark.operators.dedup import _minhash_wide, shingles_df, with_minhash_signature

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wide = _minhash_wide(shingles_df(docs, 3), 8)
    batch_sig = wide.select(
        "doc_id", F.concat_ws("|", *[F.col(f"mh{k}") for k in range(8)]).alias("signature")
    )
    inrow_sig = with_minhash_signature(docs, 3, 8).select("doc_id", "signature")
    diff = batch_sig.join(inrow_sig, "doc_id").filter(
        batch_sig["signature"] != inrow_sig["signature"]
    )
    assert batch_sig.count() == inrow_sig.count() > 0
    assert diff.count() == 0


def test_inrow_signature_short_doc(spark):
    """Docs shorter than the shingle width use the truncated text as the
    single shingle — identical on both paths."""
    from shifu_spark.operators.dedup import _minhash_wide, shingles_df, with_minhash_signature

    docs = spark.createDataFrame([(1, "one two"), (2, "x")], ["doc_id", "text"])
    wide = _minhash_wide(shingles_df(docs, 3), 4)
    batch_sig = {
        r["doc_id"]: "|".join(r[f"mh{k}"] for k in range(4)) for r in wide.collect()
    }
    inrow = {
        r["doc_id"]: r["signature"]
        for r in with_minhash_signature(docs, 3, 4).select("doc_id", "signature").collect()
    }
    assert batch_sig == inrow
