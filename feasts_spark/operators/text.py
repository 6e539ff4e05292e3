"""Text-analysis operators for training-data pipelines.

All JVM-side (native pyspark.sql.functions / SQL lambda expressions — no
Python in the hot path), so Catalyst keeps them inside whole-stage codegen
and pushes the column pruning down to the parquet scan. Every operator has
an exact DuckDB-SQL twin in __spark_entry__.oracle_sql().

Operators: BPE-ish token counting, stopword-score language ID, quality
scoring (length/punct/stopword ratios), min-hash document fingerprinting
(8-char shingles -> lexicographic-min md5; the single-hash degenerate case
of the MinHash family in operators.dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# A BPE-ish pre-tokenizer: letter runs | digit runs | single non-space
# punctuation — the common first split before byte-pair merges.
BPE_SPLIT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny deterministic stopword inventories (top function words).
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "von", "mit", "auf", "ein"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "por"],
}


def _tokens(text_col: str):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def _stop_hits(text_col: str, words: list[str]):
    arr = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"size(filter(split(trim(lower({text_col})), '\\\\s+'),"
        f" t -> t IN ({arr})))"
    )


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex pieces."""
    return df.select(
        id_col,
        F.size(_tokens(text_col)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT), F.lit(0))).alias(
            "n_bpe_pieces"
        ),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"[0-9]+"), F.lit(0))
        ).alias("n_number_runs"),
        F.size(
            F.regexp_extract_all(
                F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"), F.lit(0)
            )
        ).alias("n_punct"),
    )


def language_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-hit score per language + argmax prediction (ties -> first
    language in sorted order, deterministic)."""
    out = df.select(
        id_col,
        *[
            _stop_hits(text_col, ws).alias(f"score_{lang}")
            for lang, ws in sorted(STOPWORDS.items())
        ],
    )
    langs = sorted(STOPWORDS)
    # deterministic argmax: greatest (score, -ord) via chained CASE
    pred = F.lit(langs[0])
    best = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:
        s = F.col(f"score_{lang}")
        pred = F.when(s > best, F.lit(lang)).otherwise(pred)
        best = F.when(s > best, s).otherwise(best)
    return out.withColumn("pred_lang", pred)


def quality_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic document quality: length, mean word length, stopword and
    punctuation ratios, and a composite [0,1] score."""
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    stop_ratio = _stop_hits(text_col, STOPWORDS["en"]) / n_tok
    punct_ratio = (
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"), F.lit(0)))
        / F.greatest(n_chars, F.lit(1))
    )
    mean_word_len = (
        F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", ""))
        / F.greatest(n_tok, F.lit(1))
    )
    length_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    composite = (
        F.lit(0.4) * length_score
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0)))
    )
    # floor(x*1e4+0.500001)/1e4 instead of round(): engines disagree on
    # decimal ties (DuckDB half-away on shortest repr, Spark HALF_UP on
    # BigDecimal); floor on the identical double is deterministic in both,
    # and the 1e-6 boundary nudge keeps summation-order ULP divergence from
    # straddling an exact .5 tie. Mirrors the oracle SQL verbatim.
    q4 = F.floor(composite * 10000 + F.lit(0.500001)) / 10000
    return df.select(
        id_col,
        n_tok.alias("n_tokens"),
        (F.floor(mean_word_len * 1e4 + F.lit(0.500001)) / 1e4).alias("mean_word_len"),
        (F.floor(stop_ratio * 1e4 + F.lit(0.500001)) / 1e4).alias("stopword_ratio"),
        (F.floor(punct_ratio * 1e4 + F.lit(0.500001)) / 1e4).alias("punct_ratio"),
        q4.alias("quality_score"),
    )


def fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle: int = 8
) -> DataFrame:
    """Document fingerprint: lexicographic-min md5 over all character
    8-gram shingles of the lowercased text (a 1-hash MinHash; docs sharing
    the fingerprint almost surely share an 8-gram extremum -> near-dup
    clustering key). n_shingles = count of distinct shingles."""
    t = F.lower(F.col(text_col))
    grams = F.expr(
        f"transform(sequence(1, greatest(length(lower({text_col})) - {shingle - 1}, 1)),"
        f" i -> substring(lower({text_col}), i, {shingle}))"
    )
    hashes = F.transform(grams, lambda g: F.md5(g))
    return df.select(
        id_col,
        F.array_min(hashes).alias("fingerprint"),
        F.size(F.array_distinct(grams)).alias("n_shingles"),
        F.length(t).alias("n_chars_norm"),
    )
