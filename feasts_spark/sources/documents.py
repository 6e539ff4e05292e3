"""Deterministic document-corpus synthesizer for corpus-scale benchmarks.

Mirrors sources/transcripts.py for the `documents` table shape
(doc_id, text, lang, source, n_chars) but stays ALL-JVM: every column is
a codegen projection over spark.range(n) — word choices are
xxhash64(seed, id, position) indexed into a literal vocabulary array, so
any subset of partitions reproduces independently with no driver data,
no Python, and no RNG state. That matters for benchmarking: a corpus
synthesized this way materializes at scan speed, so timed operators
measure THEMSELVES, not a Python generator feeding them.

Duplicate signal: every `dup_every`-th document reuses the word stream
of its successor id (exact near-dup pairs for dup_span/jaccard-style
operators); the small vocabulary also yields organic shared n-grams,
like real boilerplate-heavy web text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# ~12 chars/word avg keeps docs in the few-hundred-byte range of web text
_VOCAB = (
    "the a of to and in is for on with that this from by as at be are was "
    "query spark table rollup tier turn agent tool answer plan result data "
    "time series trend season noise model train sample token corpus filter "
    "window bucket shuffle join partition schema column stream batch state "
    "write read scan cache index vector cluster metric score count total "
    "user event value point chunk span gap fill rate limit budget source "
    "language quality text document duplicate hash band signature estimate "
    "feature spectral entropy lambda residual remainder seasonal adjust "
    "crawl snapshot delta merge dedup contain overlap pattern engine scale"
).split()
LANGS = ["en", "de", "es", "fr", "zh"]

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def synthesize_documents(
    spark: SparkSession,
    n_docs: int,
    n_sources: int = 20,
    min_words: int = 40,
    max_words: int = 90,
    dup_every: int = 37,
    seed: int = 42,
) -> DataFrame:
    """Distributed deterministic `documents` table (see module docstring)."""
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    v = len(_VOCAB)
    df = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # every dup_every-th doc clones its successor's word stream (exact
    # duplicate text under a distinct id)
    eff = F.when(
        (F.col("doc_id") % dup_every == 0) & (F.col("doc_id") + 1 < n_docs),
        F.col("doc_id") + 1,
    ).otherwise(F.col("doc_id"))
    n_words = (
        F.lit(min_words)
        + F.pmod(F.xxhash64(F.lit(seed), eff), F.lit(max_words - min_words + 1))
    ).cast("int")
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda j: F.element_at(
                vocab,
                (F.pmod(F.xxhash64(F.lit(seed), eff, j), F.lit(v)) + 1).cast(
                    "int"
                ),
            ),
        ),
    )
    return df.select(
        "doc_id",
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]),
            (F.pmod(F.xxhash64(F.lit(seed + 1), F.col("doc_id")), F.lit(len(LANGS))) + 1).cast("int"),
        ).alias("lang"),
        F.concat(
            F.lit("src-"),
            F.pmod(F.xxhash64(F.lit(seed + 2), F.col("doc_id")), F.lit(n_sources)),
        ).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("int"))
