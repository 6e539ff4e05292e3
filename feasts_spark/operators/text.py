"""Text-analysis operators for training-data pipelines.

All JVM-side (native pyspark.sql.functions / SQL lambda expressions — no
Python in the hot path), so Catalyst keeps them inside whole-stage codegen
and pushes the column pruning down to the parquet scan. Every operator has
an exact DuckDB-SQL twin in __spark_entry__.oracle_sql().

Operators: BPE-ish token counting, stopword-score language ID, quality
scoring (length/punct/stopword ratios), within-document repetition
features (Gopher-style duplicate/top n-gram fractions), min-hash document
fingerprinting (8-char shingles -> lexicographic-min md5; the single-hash
degenerate case of the MinHash family in operators.dedup).
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


def _word_grams(text_col: str, n: int):
    """Word n-grams (space-joined) over whitespace tokens of the trimmed,
    lowercased text — the same shingle idiom as operators.dedup."""
    toks = _tokens(text_col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def repetition_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Within-document repetition features (the Gopher / MassiveText
    repetition quality filters, Rae et al. 2021 §A1.1, adapted to word
    n-grams): for each n in `ns`,

      - ``dup_{n}gram_frac``      — fraction of n-gram occurrences that are
        repeats of an earlier occurrence (1 - distinct/total),
      - ``top_{n}gram``           — the most frequent n-gram (ties break to
        the lexicographically smallest, deterministically in both engines),
      - ``top_{n}gram_char_frac`` — fraction of the document's non-space
        characters covered by occurrences of that top n-gram
        (count * chars(gram) / chars(doc)).

    Plan shape — ONE gram lineage for every n: a single explode of tagged
    (n, gram) pairs -> groupBy (doc, n, gram) count (one shuffle, map-side
    partial agg) -> groupBy (doc, n) with a single struct-min aggregate
    that yields total/distinct/top in the same pass (min of (-count, gram)
    is (max count, lex-smallest gram)) -> pivot the few n values back to
    columns with one conditional-first groupBy(doc) -> one scalar join to
    the per-doc char counts. Two corpus scans total (gram branch + char
    branch), three exchanges, no window, no Python, all whole-stage
    codegen; the shuffles are keyed on (doc, n, gram) so hot grams inside
    one huge doc still land in one group — bounded by doc length, not
    corpus size. High dup fractions are the standard "remove repetitive
    boilerplate/generation loops" training-data filter.
    """
    word_chars = F.length(
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", "")
    )
    base = df.select(F.col(id_col).alias("doc_id"), word_chars.alias("_wc"))
    def _tag(n):
        # single-arg lambda only: a 2-arg callable makes F.transform pass
        # the array index as the second argument, clobbering the n tag
        return F.transform(
            _word_grams(text_col, n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram")),
        )

    tagged = F.flatten(F.array(*[_tag(n) for n in ns]))
    grams = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tagged).alias("_t")
    ).select("doc_id", F.col("_t.n").alias("n"), F.col("_t.gram").alias("gram"))
    counts = grams.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_n = counts.groupBy("doc_id", "n").agg(
        F.sum("cnt").alias("_total"),
        F.count(F.lit(1)).alias("_distinct"),
        F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("gram"))).alias("_m"),
    )
    pivoted = per_n.groupBy("doc_id").agg(
        *[
            agg
            for n in ns
            for agg in (
                F.first(F.when(F.col("n") == n, F.col("_total")), True)
                .alias(f"_total_{n}"),
                F.first(F.when(F.col("n") == n, F.col("_distinct")), True)
                .alias(f"_distinct_{n}"),
                F.first(F.when(F.col("n") == n, F.col("_m")), True)
                .alias(f"_m_{n}"),
            )
        ]
    )
    out = base.join(pivoted, "doc_id")
    for n in ns:
        out = out.select(
            "*",
            F.col(f"_total_{n}").alias(f"total_{n}grams"),
            (
                F.floor(
                    (F.lit(1.0) - F.col(f"_distinct_{n}") / F.col(f"_total_{n}"))
                    * 1e4
                    + F.lit(0.500001)
                )
                / 1e4
            ).alias(f"dup_{n}gram_frac"),
            F.col(f"_m_{n}.gram").alias(f"top_{n}gram"),
            (-F.col(f"_m_{n}.nc")).alias(f"top_{n}gram_count"),
        )
        out = out.withColumn(
            f"top_{n}gram_char_frac",
            F.floor(
                (
                    F.col(f"top_{n}gram_count")
                    * F.length(F.regexp_replace(F.col(f"top_{n}gram"), r"\s+", ""))
                    / F.greatest(F.col("_wc"), F.lit(1))
                )
                * 1e4
                + F.lit(0.500001)
            )
            / 1e4,
        )
    return out.drop(
        "_wc", *[c for n in ns for c in (f"_total_{n}", f"_distinct_{n}", f"_m_{n}")]
    )


# PII pattern inventory (C4/Dolma-style pre-training scrub classes). Each
# pattern was parity-probed against DuckDB's RE2: no backreferences, no
# lookaround, so Java regex (Spark) and RE2 (DuckDB) match identically —
# that equivalence is what makes the pii columns oracle-able. Extend per
# deployment; order matters: classes CAN overlap (an IP or email inside a
# URL), so both the scrub and the per-class counts run sequentially in this
# fixed order — each class is counted on the text with all earlier classes
# already replaced, so counts describe exactly what the scrub replaced.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[A-Za-z0-9./_-]+", "<URL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,2} \(\d{3}\) \d{3}-\d{4}", "<PHONE>"),
)


def pii_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII detection + scrub digest: per document, the match count of each
    PII class in PII_PATTERNS (emails, URLs, IPv4s, +cc (nnn) nnn-nnnn
    phones) and the md5 of the text after replacing every match with its
    class sentinel — the standard pre-training scrub step (C4/Dolma), with
    the digest standing in for shipping the scrubbed text so the scrub
    itself is correctness-checked without materializing a second corpus.

    Counts are SEQUENTIAL, in PII_PATTERNS order: each class is counted on
    the text with all earlier classes already scrubbed, so overlapping
    matches (an IP inside a URL) are attributed to exactly one class and
    `sum(n_*)` equals the number of sentinels in the digested text.

    Plan shape: pure projection — no shuffle; the regex counters and the
    chained regexp_replace all evaluate inside the scan's whole-stage
    codegen, so at 100 TB this costs exactly one pass over the text column
    (write the scrubbed text instead of its md5 in a real scrub job; the
    plan is identical). Patterns are RE2-safe (no backreferences), keeping
    them portable across engines.
    """
    scrub = F.col(text_col)
    counts = []
    for name, pat, tag in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(scrub, F.lit(pat), F.lit(0)))
            .alias(f"n_{name}s")
        )
        scrub = F.regexp_replace(scrub, pat, tag)
    return df.select(id_col, *counts, F.md5(scrub).alias("scrub_md5"))


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


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """One-row corpus datasheet — the summary a dataset card leads with:
    doc/source/language counts, whitespace-token totals and p50/p95
    per-doc counts, character total, empty-doc fraction, and the exact
    duplicate-text fraction (1 − distinct md5(text)/n).

    One pass of decomposable aggregates plus Spark's exact percentile
    and two distinct-count aggregates — Catalyst plans the distincts via
    expand, still a single scan. At 100 TB this is the cheap query you
    run BEFORE committing to a curation pass, not after."""
    n_tok = F.size(_tokens(text_col)).cast("long")
    empty = (F.length(F.trim(F.col(text_col))) == 0).cast("int")
    return df.select(
        F.col(text_col),
        F.col(lang_col),
        F.col(source_col),
        n_tok.alias("_nt"),
        empty.alias("_empty"),
        F.md5(F.col(text_col)).alias("_h"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.col(source_col)).alias("n_sources"),
        F.count_distinct(F.col(lang_col)).alias("n_langs"),
        F.sum("_nt").alias("total_ws_tokens"),
        F.expr("percentile(_nt, 0.5)").alias("p50_tokens"),
        F.expr("percentile(_nt, 0.95)").alias("p95_tokens"),
        F.sum(F.length(text_col)).alias("total_chars"),
        (F.sum("_empty") / F.count(F.lit(1))).alias("empty_frac"),
        (F.lit(1.0) - F.count_distinct(F.col("_h")) / F.count(F.lit(1)))
        .alias("exact_dup_frac"),
    )
