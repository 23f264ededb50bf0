"""Byte-pair-encoding tokenizer: deterministic training + distributed
application (the tokenization step of an LLM data pipeline).

Shape (the production pattern, same as the PQ/ANN codebooks): the merge
table is TRAINED once on a bounded driver-side sample (tokenizer
training is corpus-statistics-sized, not corpus-sized), then broadcast
and APPLIED distributed via an Arrow-batched ``mapInPandas`` — the
per-token merge loop is genuinely iterative, so this is the documented
Pandas-UDF case, not a built-in-expression case.

Determinism: merge selection ties break on (count desc, pair lexicographic
asc); the trained table is a pure function of the sample, so re-training
on the same rows reproduces byte-identical merges on any engine.
Round-trip: with the end-of-word marker every encoding concatenates back
to the original text exactly — including arbitrary space runs (empty
words are preserved as a bare EOW piece) — for any input that does not
contain the literal EOW marker string, which the encoder rejects loudly
(pinned by property tests).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

EOW = "</w>"  # end-of-word marker (classic Sennrich et al. 2016 form)


def bpe_train(texts: list[str], num_merges: int) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from whitespace-tokenized ``texts``.

    Classic BPE: start from characters (+ EOW), repeatedly merge the
    most frequent adjacent symbol pair. Ties break deterministically on
    (count desc, pair asc)."""
    vocab: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[tuple(list(w) + [EOW])] += 1

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for word, cnt in vocab.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: Counter = Counter()
        for word, cnt in vocab.items():
            out = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and (word[i], word[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with the trained merge ranks (lowest rank first —
    the exact training order, which is what makes encoding canonical)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode_df(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pieces array<string>, n_pieces, n_words): distributed BPE
    application with the merge table broadcast inside the Arrow stage.
    Lossless: :func:`bpe_decode` of the pieces reproduces the input text
    exactly, arbitrary space runs included — empty words (consecutive /
    leading / trailing spaces) encode as a bare EOW piece and n_words
    counts them (``len(text.split(" "))`` semantics). Input containing
    the literal EOW marker is rejected with ValueError (it would be
    indistinguishable from the marker after concatenation).
    (property-tested in tests/test_bpe.py)."""
    ranks = {p: i for i, p in enumerate(merges)}
    schema = f"{id_col} long, pieces array<string>, n_pieces int, n_words int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-task word->pieces memo: encoding is a pure function of the
        # word, and corpus word count >> vocabulary size, so memoizing
        # distinct words turns the per-token merge loop into a dict hit
        # for the overwhelming majority of tokens (~9x at sf1)
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out = {id_col: [], "pieces": [], "n_pieces": [], "n_words": []}
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                # NULL text -> no output row (mirrors the oracle's NULL
                # propagation); str(None) would literally BPE-encode the
                # word "None" (found by the r10 dirty-corpus audit)
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    continue
                s = str(text)
                if EOW in s:
                    raise ValueError(
                        f"text contains the literal {EOW!r} end-of-word "
                        f"marker; encoding would not round-trip (doc {doc_id})"
                    )
                words = s.split(" ")
                pieces: list[str] = []
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = memo[w] = bpe_encode_word(w, ranks)
                    pieces += enc
                out[id_col].append(doc_id)
                out["pieces"].append(pieces)
                out["n_pieces"].append(len(pieces))
                out["n_words"].append(len(words))
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(run, schema)


def bpe_decode(pieces: list[str]) -> str:
    """Inverse of encoding: concatenate, turn EOW back into spaces, and
    drop exactly ONE trailing space — ``split(" ")`` emits n_spaces+1
    words so the final word's EOW is structural, not content. Genuine
    trailing spaces in the input survive (they encode as extra empty
    words)."""
    s = "".join(pieces).replace(EOW, " ")
    return s[:-1] if s.endswith(" ") else s


# Fixture corpus for the PINNED merge table (the PQ-codebook pattern:
# trained once from literals, so both engines apply the same literal
# ranks; bpe_train itself is pytest-pinned by a hand derivation).
# Vocabulary overlaps the synthetic documents tables so the merges
# genuinely fire at gate scale.
BPE_PINNED_CORPUS = [
    "join hash row batch scan customer column filter small slow merge",
    "order vector line data table agg value key stream window spark group",
    "join hash row batch scan column filter data table key stream group",
    "the quick brown fox jumps over the lazy dog the end",
    "merge join hash join scan filter order by group by window agg",
]
BPE_PINNED_NUM_MERGES = 48


def bpe_pinned_merges() -> list[tuple[str, str]]:
    """The pinned merge table: a pure function of the literal corpus
    above (deterministic ties), re-derived identically on every call."""
    return bpe_train(BPE_PINNED_CORPUS, BPE_PINNED_NUM_MERGES)
