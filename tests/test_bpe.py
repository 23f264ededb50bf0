"""BPE tokenizer: deterministic training, canonical encoding, lossless
round trip, and the distributed application path."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


class TestBpeKernel:
    def test_training_matches_hand_derivation(self):
        """Sennrich-style worked example: corpus with a dominant pair
        must merge it first; ties break (count desc, pair asc)."""
        from shifu_spark.operators.bpe import EOW, bpe_train

        merges = bpe_train(["low low low lower newest newest"], 4)
        # 'lo' appears in every word of 'low'*3 + 'lower' = 4 times; 'ne'/'ew'/'es'... 
        assert merges[0] == ("l", "o")
        assert merges[1] == ("lo", "w")
        assert all(isinstance(a, str) and isinstance(b, str) for a, b in merges)

    def test_training_deterministic(self):
        from shifu_spark.operators.bpe import bpe_train

        corpus = ["alpha beta gamma alpha beta", "beta gamma gamma delta"]
        assert bpe_train(corpus, 10) == bpe_train(corpus, 10)

    @given(
        st.lists(
            # min_size=0 words: joining yields consecutive / leading /
            # trailing space runs, which must round-trip exactly
            st.text(alphabet="abcdef", min_size=0, max_size=8),
            min_size=1,
            max_size=30,
        ),
        st.integers(0, 40),
    )
    @settings(max_examples=100, deadline=None)
    def test_roundtrip_lossless(self, words, n_merges):
        """∀ corpora (arbitrary space runs included) and merge counts:
        decode(encode(text)) == text."""
        from shifu_spark.operators.bpe import bpe_decode, bpe_encode_word, bpe_train

        text = " ".join(words)
        merges = bpe_train([text], n_merges)
        ranks = {p: i for i, p in enumerate(merges)}
        pieces = []
        for w in text.split(" "):
            pieces += bpe_encode_word(w, ranks)
        assert bpe_decode(pieces) == text

    @given(st.integers(0, 2**32 - 1))
    @settings(max_examples=30, deadline=None)
    def test_more_merges_never_more_pieces(self, seed):
        """Adding merges can only keep or shrink the piece count."""
        import numpy as np

        from shifu_spark.operators.bpe import bpe_encode_word, bpe_train

        rng = np.random.default_rng(seed)
        words = ["".join(rng.choice(list("abcd"), rng.integers(1, 7))) for _ in range(20)]
        text = " ".join(words)
        prev = None
        for k in (0, 5, 15, 40):
            merges = bpe_train([text], k)
            ranks = {p: i for i, p in enumerate(merges)}
            n = sum(len(bpe_encode_word(w, ranks)) for w in words)
            if prev is not None:
                assert n <= prev
            prev = n


class TestBpeDistributed:
    def test_space_runs_roundtrip_and_eow_guard(self, spark):
        """The distributed path preserves arbitrary space runs (empty
        words become bare-EOW pieces) and rejects literal-marker text."""
        import pytest

        from shifu_spark.operators.bpe import bpe_decode, bpe_encode_df, bpe_train

        texts = ["a  b", " lead", "trail ", "", "  ", "ab   cd"]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        merges = bpe_train(texts, 10)
        out = {r["doc_id"]: r for r in bpe_encode_df(df, merges).collect()}
        for i, t in enumerate(texts):
            assert bpe_decode(list(out[i]["pieces"])) == t, (i, t)
            assert out[i]["n_words"] == len(t.split(" ")), (i, t)
        bad = spark.createDataFrame([(0, "has a </w> marker")], "doc_id long, text string")
        with pytest.raises(Exception, match="end-of-word"):
            bpe_encode_df(bad, merges).collect()

    def test_encode_df_matches_kernel_and_roundtrips(self, spark):
        from shifu_spark.operators.bpe import (
            bpe_decode,
            bpe_encode_df,
            bpe_encode_word,
            bpe_train,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        sample = [r["text"] for r in docs.orderBy("doc_id").limit(20).collect()]
        merges = bpe_train(sample, 50)
        ranks = {p: i for i, p in enumerate(merges)}
        out = {r["doc_id"]: r for r in bpe_encode_df(docs, merges).collect()}
        rows = {r["doc_id"]: r["text"] for r in docs.collect()}
        assert set(out) == set(rows)
        for doc_id, text in rows.items():
            words = text.split(" ")
            want = []
            for w in words:
                want += bpe_encode_word(w, ranks)
            got = list(out[doc_id]["pieces"])
            assert got == want, doc_id
            assert bpe_decode(got) == text
            assert out[doc_id]["n_words"] == len(words)
        # trained merges genuinely compress this corpus
        total_pieces = sum(r["n_pieces"] for r in out.values())
        total_chars = sum(len(t.replace(" ", "")) + len(t.split()) for t in rows.values())
        assert total_pieces < 0.6 * total_chars


class TestBpePinned:
    def test_pinned_merges_stable_and_compressive(self, spark):
        """The fixture merge table reproduces identically (pure function
        of the literal corpus) and genuinely compresses the gate-shaped
        corpus (merges fire: pieces << chars)."""
        from shifu_spark.operators.bpe import (
            BPE_PINNED_NUM_MERGES,
            bpe_encode_df,
            bpe_pinned_merges,
        )

        m1, m2 = bpe_pinned_merges(), bpe_pinned_merges()
        assert m1 == m2 and len(m1) == BPE_PINNED_NUM_MERGES
        assert all("|" not in a + b for a, b in m1)  # oracle map-key separator safety

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = bpe_encode_df(docs, m1).agg(
            F.sum("n_pieces").alias("p"), F.sum("n_words").alias("w")
        ).collect()[0]
        chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
        # zero-merge baseline = non-space chars + one EOW per word
        # = chars + n_docs; the pinned table must cut that by a third
        assert out["p"] < 0.67 * (chars + docs.count())
