"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish regex pieces),
document fingerprinting (content digest + shingle-set digest). All pure
``pyspark.sql.functions`` column expressions — JVM-side, codegen'd,
streaming-compatible; every op has a portable ANSI-SQL mirror for the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker lists (heuristic, deterministic)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "es": ["el", "la", "de", "y", "que", "en", "los", "una"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
}

STOPWORDS_EN = ["the", "a", "an", "of", "and", "or", "to", "in", "is", "it"]


def token_count_expr(text: Column | str) -> Column:
    """Whitespace token count. Portable form: single-space split size."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(t, " "))


def distinct_token_count_expr(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.array_distinct(F.split(t, " ")))


def bpe_piece_count_expr(text: Column | str) -> Column:
    """BPE-ish piece count: alphanumeric runs + single non-space symbols.

    Counted via regexp extraction (`[a-z0-9]+|[^a-z0-9\\s]`) — a cheap
    stand-in for a real tokenizer's piece count at pretrain-data scale.
    """
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.expr(f"regexp_extract_all(lower({_n(text)}), '[a-z0-9]+|[^a-z0-9 ]', 0)"))


def _n(text: Column | str) -> str:
    return text if isinstance(text, str) else "text"


def stopword_fraction_expr(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens in the stopword list (exact int ratio)."""
    sw = stopwords or STOPWORDS_EN
    t = F.col(text) if isinstance(text, str) else text
    toks = F.split(t, " ")
    hits = F.size(F.filter(toks, lambda x: x.isin(sw)))
    return hits / F.size(toks)


def quality_score_expr(text: Column | str, n_chars: Column | str | None = None) -> Column:
    """Composite quality score in [0,1]:

      0.4·min(1, n_tokens/100) + 0.3·(1 − punct_ratio) + 0.3·distinct_ratio

    length / punctuation / vocabulary-diversity ratios — the standard
    cheap pretrain-quality heuristics, as one JVM expression.
    """
    t = F.col(text) if isinstance(text, str) else text
    ntok = F.size(F.split(t, " ")).cast("double")
    ndist = F.size(F.array_distinct(F.split(t, " "))).cast("double")
    npunct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    punct_ratio = npunct / F.length(t)
    return (
        F.least(ntok / 100.0, F.lit(1.0)) * 0.4
        + (1.0 - punct_ratio) * 0.3
        + (ndist / ntok) * 0.3
    )


def lang_id_expr(text: Column | str, markers: dict[str, list[str]] | None = None) -> Column:
    """Argmax of per-language marker-token hit counts; tie/zero -> 'und'.

    Deterministic tie-break: higher count wins, then language code asc.
    """
    m = markers or LANG_MARKERS
    t = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(t), " ")
    best_lang = F.lit("und")
    best_cnt = F.lit(0)
    for lang in sorted(m.keys(), reverse=True):  # asc-priority under strict >
        cnt = F.size(F.filter(toks, lambda x: x.isin(m[lang])))
        better = cnt > best_cnt
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_cnt = F.when(better, cnt).otherwise(best_cnt)
    return best_lang


def fingerprint_df(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, digest, prefix_digest): full-content md5 + first-5-token
    md5 (cheap near-dup blocking key)."""
    t = F.col(text_col)
    prefix = F.concat_ws(" ", F.slice(F.split(t, " "), 1, 5))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(t).alias("digest"),
        F.md5(prefix).alias("prefix_digest"),
    )


def text_stats_df(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc text statistics table (the `documents` analogue of the
    numeric stats pass)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars"),
        token_count_expr(text_col).alias("n_tokens"),
        distinct_token_count_expr(text_col).alias("n_distinct_tokens"),
        F.round(quality_score_expr(text_col), 6).alias("quality"),
        lang_id_expr(text_col).alias("lang_pred"),
    )


# Pinned unigram "language model" for quality scoring: dyadic-rational
# log-probs (exact multiples of 1/64) so per-doc sums are EXACT in
# float64 and therefore independent of summation order — the driver
# oracle can sum in any order and still hash-match. Production would
# broadcast a fitted vocab table; the pinned one keeps the oracle
# closed-form (same move as the pinned PQ codebooks / NN weights).
UNIGRAM_LOGPROB = {
    "the": -2.0, "a": -2.25, "value": -2.5, "table": -2.75, "row": -3.0,
    "data": -3.0, "fast": -3.25, "slow": -3.25, "scan": -3.5, "hash": -3.5,
    "join": -3.5, "part": -3.75, "key": -3.75, "agg": -4.0, "query": -4.0,
    "column": -4.25, "filter": -4.25, "batch": -4.5, "window": -4.5,
    "order": -4.75, "small": -4.75, "merge": -5.0, "line": -5.0,
    "customer": -5.25, "spark": -5.25, "group": -5.5, "big": -5.5,
}
UNIGRAM_OOV_LOGPROB = -8.0


def unigram_logprob_exprs(
    text: Column | str,
    vocab: dict[str, float] | None = None,
    oov_logprob: float = UNIGRAM_OOV_LOGPROB,
) -> tuple[Column, Column]:
    """(mean token log-prob, OOV rate) under a broadcast unigram model —
    the cheap perplexity-filter surrogate every LLM data pipeline runs
    (Wenzek et al., "CCNet", LREC 2020 uses a 5-gram LM the same way).

    Pure JVM: map-literal lookup + higher-order fold, no explode, no
    shuffle. With dyadic-rational log-probs the sum is exact, so the
    result is partition- and engine-order independent."""
    v = vocab or UNIGRAM_LOGPROB
    t = F.col(text) if isinstance(text, str) else text
    m = F.create_map(*[F.lit(x) for kv in sorted(v.items()) for x in kv])
    toks = F.split(t, " ")
    lp = F.transform(toks, lambda w: F.coalesce(m.getItem(w), F.lit(float(oov_logprob))))
    total = F.aggregate(lp, F.lit(0.0), lambda acc, x: acc + x)
    n = F.size(toks)
    mean_lp = F.when(n > 0, total / n).otherwise(F.lit(None))
    oov = F.size(F.filter(toks, lambda w: m.getItem(w).isNull()))
    oov_rate = F.when(n > 0, oov.cast("double") / n).otherwise(F.lit(None))
    return mean_lp, oov_rate
