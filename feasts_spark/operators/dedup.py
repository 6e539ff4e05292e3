"""Deduplication operators for training-data pipelines.

Four tiers, cheapest to most semantic (all Spark-first):

  exact_dedup        — md5(text) groupBy; one shuffle, trivially scalable.
  ngram_jaccard_pairs— exact word-n-gram Jaccard via explode + self-join on
                       shared shingles, with a document-frequency cap that
                       drops hot shingles (the MMDS stopword-shingle fix)
                       so one common 3-gram can't make the join quadratic.
                       Pure SQL (codegen), oracle-able.
  minhash_lsh        — MinHash signatures (numpy-vectorized uint64
                       universal hashing inside mapInPandas — no per-shingle
                       Python, no object dtype) banded into LSH buckets;
                       only bucket cohabitants become candidate pairs. At
                       scale: signature pass is map-only; the only shuffle
                       keys on (band, band_hash); candidates are verified
                       with exact Jaccard on a join that touches just the
                       candidates.
  simhash            — 60-bit SimHash computed ENTIRELY in SQL (explode
                       tokens -> md5-prefix token hash -> per-bit sign
                       sums), so the hot path is whole-stage codegen and a
                       DuckDB oracle can replay it bit-for-bit. Near-dup
                       banding uses ceil-distributed chunks with
                       n_chunks = max_hamming + 1, so the pigeonhole
                       guarantee holds for ANY radius (round 1 banded four
                       16-bit chunks, which is only complete for
                       Hamming <= 3).

The reference engine (feasts) has no dedup; these follow the standard MMDS
constructions (Leskovec et al., ch.3) re-expressed on DataFrames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

SIMHASH_BITS = 60  # md5 15-hex-char prefix: parseable to int64 in both engines

# Pinned SipHash key for token hashing (pandas hash_array). Passing it
# explicitly makes MinHash signatures a FORMAT: determinism no longer rests
# on pandas' default-key internals being identical across executor builds.
# Changing this value changes every signature — treat it like a codec
# version constant.
MINHASH_HASH_KEY = "feasts-spark-mh1"  # exactly 16 bytes, as pandas requires


def exact_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_members: int = 32,
) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text.

    Row width is BOUNDED: `member_ids` carries only the `max_members`
    smallest ids per duplicate group (plus the exact `n_dups` count), so a
    boilerplate string duplicated 10^8 times cannot make one aggregation
    group materialize a 10^8-element array. The ranking window shuffles on
    the same key as the aggregate, so Spark reuses the partitioning — one
    exchange total, and the window sort spills to disk instead of
    collecting the group in memory. Callers needing the full membership
    should keep the exploded (text_hash, id) mapping as its own table.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("text_hash").orderBy(id_col)
    s = (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .withColumn("_rn", F.row_number().over(w))
    )
    return s.groupBy("text_hash").agg(
        F.min(id_col).alias("rep_id"),
        F.count(F.lit(1)).alias("n_dups"),
        F.sort_array(
            F.collect_list(F.when(F.col("_rn") <= max_members, F.col(id_col)))
        ).alias("member_ids"),
    )


def tokenize_expr(text_col: str):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def _word_ngrams(toks, n: int):
    """All word n-grams of a token array, in order — EMPTY for documents
    with fewer than `n` tokens (no truncated shorter gram; see
    ngram_containment / dup_span_stats docstrings). `ngram_jaccard_pairs`
    deliberately keeps its own truncated-gram variant: there, the whole
    short doc standing in as one shingle is what lets two identical
    2-token docs still pair at n=3."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = 256,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >= 1 shingle.

    Plan shape: explode distinct shingles -> drop shingles appearing in more
    than `max_doc_freq` documents -> self-join on shingle (shuffle keyed on
    shingle) -> per-pair intersection count -> Jaccard via |A|+|B|-|A∩B|.

    The doc-frequency cap bounds the candidate blow-up: a shingle shared by
    d documents contributes d^2/2 join rows, so one stopword 3-gram common
    to 10^6 docs would otherwise create ~10^12 candidates. With the cap on,
    BOTH the intersection and the set sizes are computed over the capped
    shingle universe (hot shingles removed from every document alike), so
    any emitted score is the exact Jaccard of the capped sets —
    boilerplate-heavy near-dups are no longer pushed below the threshold
    by uncapped denominators. CAVEAT: a document whose EVERY shingle is
    hot has an empty capped set and joins to nothing, so a pair of such
    documents (even byte-identical ones) emits NO row at all — catch
    those with exact_dedup / minhash, or pass `max_doc_freq=None` for
    exact Jaccard over the full shingle sets.
    """
    toks = tokenize_expr(text_col)
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
                )
            )
        ).alias("gram"),
    )
    joinable = grams
    if max_doc_freq is not None:
        hot = (
            grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("gram")
        )
        # the hot set is tiny by construction — broadcast the anti-join
        joinable = grams.join(F.broadcast(hot), "gram", "left_anti")
    # sizes from the CAPPED gram set: Jaccard is then exact over the capped
    # shingle universe (identical docs stay 1.0; see docstring)
    sizes = joinable.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    a = joinable.alias("a")
    b = joinable.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_grams", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_grams", "nb"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def ngram_containment(
    eval_df: DataFrame,
    train_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Train/eval contamination check: for each eval document, the fraction
    of its distinct word n-grams that occur anywhere in the training corpus
    (the n-gram-overlap decontamination test of GPT-3 appendix C / the Pile,
    with word n-grams).

    Returns (doc_id, n_grams, n_hits, containment). Plan shape: distinct
    grams per eval doc (one shuffle on (doc, gram)), global distinct train
    grams (one shuffle on gram), left-semi join eval->train on gram, per-doc
    count. The train side is reduced to DISTINCT grams before the join, so
    its size is vocabulary-bounded, not corpus-bounded; AQE broadcasts it
    when small and shuffle-joins on gram otherwise — at 100 TB you would
    additionally pre-bucket both sides by gram or insert a bloom filter,
    but the join key and reduction are already the scale-correct ones.
    An eval doc with zero hits still gets a row (containment 0.0); an
    eval doc with fewer than `n` tokens has NO word n-grams and emits no
    row at all (it cannot be contaminated at this granularity) — it never
    joins a truncated shorter gram against the training corpus (ADVICE
    r03). Sub-n training docs likewise contribute no grams.
    """
    toks = tokenize_expr(text_col)
    gram_arr = F.array_distinct(_word_ngrams(toks, n))
    eval_grams = eval_df.select(
        F.col(id_col).alias("doc_id"), F.explode(gram_arr).alias("gram")
    )
    train_grams = (
        train_df.select(F.explode(gram_arr).alias("gram")).distinct()
    )
    totals = eval_grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        eval_grams.join(train_grams, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        totals.join(hits, "doc_id", "left")
        .withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)))
        .withColumn(
            "containment",
            F.floor(
                F.col("n_hits") / F.col("n_grams") * 1e4 + F.lit(0.500001)
            )
            / 1e4,
        )
    )


def dup_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Cross-document duplicated-span statistics: for each document, how
    much of it consists of n-token windows that also appear in at least one
    OTHER document (the document-level summary of substring-dedup a la Lee
    et al. 2021, "Deduplicating Training Data Makes Language Models
    Better", with fixed-width token windows standing in for suffix-array
    matches).

    Returns (doc_id, n_windows, n_dup_windows, dup_span_frac) where a
    window is "dup" iff its exact n-token text occurs in >= 2 distinct
    documents. Documents with fewer than `n` tokens have no n-token
    windows: they get a (0, 0, 0.0) row, never a truncated shorter
    window. Complements repetition_scores (WITHIN-doc repeats): a doc
    can be internally clean yet largely copied from elsewhere — this is
    the filter that catches mirrored/boilerplate content.

    Plan shape — ONE lineage, one corpus scan, ZERO joins: explode windows
    with multiplicity -> groupBy (doc, gram) count (one shuffle, map-side
    combine) -> gram doc-frequency via count() over a gram-partitioned
    window (second exchange; the input is already one row per (doc, gram),
    so the window sees doc-frequency-many rows per gram) -> one final
    groupBy(doc) summing total vs corpus-shared window counts. No
    candidate-pair self-join means no quadratic blow-up on boilerplate:
    cost is linear in corpus token count. Skew note for 100 TB: a gram
    shared by d docs buffers d rows in one window partition (spills via
    UnsafeExternalSorter, never fans out); for the default n>=4-token
    windows d is modest, and hashing the gram to xxhash64 shrinks the two
    gram-keyed exchanges — kept as text here so the DuckDB twin is exact.
    """
    toks = tokenize_expr(text_col)
    # explode_outer keeps sub-n documents as a single NULL-gram row, so
    # they still get a (0, 0, 0.0) stats row instead of a truncated
    # shorter-than-n window or silently vanishing (ADVICE r03). The
    # NULL-gram rows carry cnt=0 and never count as duplicated.
    g = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(_word_ngrams(toks, n)).alias("gram"),
    )
    c = g.groupBy("doc_id", "gram").agg(
        F.sum(F.when(F.col("gram").isNull(), 0).otherwise(1)).alias("cnt")
    )
    c = c.withColumn("n_docs", F.count(F.col("gram")).over(Window.partitionBy("gram")))
    per_doc = c.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_windows"),
        F.sum(F.when(F.col("n_docs") >= 2, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_dup_windows"),
    )
    return per_doc.withColumn(
        "dup_span_frac",
        F.floor(
            F.col("n_dup_windows")
            / F.greatest(F.col("n_windows"), F.lit(1))
            * 1e4
            + F.lit(0.500001)
        )
        / 1e4,
    )


def _minhash_params(num_perm: int, seed: int = 42):
    """(a, b) for h_i(x) = (a_i*x + b_i) mod 2^64 with odd a_i.

    Multiply-shift (Dietzfelbinger) hashing: the mod-2^64 wrap is free in
    uint64, a_i odd makes the map a bijection on Z_2^64, and min-wise
    equality — the only property MinHash uses — is preserved. Three array
    passes per slab (mul, add, min) instead of a Mersenne modular reduce.
    """
    rng = np.random.RandomState(seed)
    a = (
        rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64) * np.uint64(2)
        + np.uint64(1)
    )
    b = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)
    return a, b


def _ragged_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate arange(starts[i], starts[i]+counts[i]) without a loop."""
    ends = np.cumsum(counts)
    total = int(ends[-1]) if ends.size else 0
    out_offs = ends - counts
    return (
        np.arange(total, dtype=np.int64)
        - np.repeat(out_offs, counts)
        + np.repeat(starts, counts)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Map-only MinHash signature pass: (id, signature array<long>).

    Vectorized end to end — no per-shingle Python, no hashlib, no object
    dtype:
      1. every TOKEN is hashed once in one C pass (pandas siphash with a
         fixed key — deterministic across executors);
      2. shingle ids are rolling combinations of `shingle_n` consecutive
         token hashes (odd-constant multiply-mix), computed with array
         slicing — shingle strings are never materialized;
      3. no set-dedup: min over a multiset equals min over its set, so
         MinHash still estimates SET Jaccard;
      4. the (num_perm x n_shingles) hash matrix is multiply-shift
         (odd-a a*x+b mod 2^64, free uint64 wrap — no divides, no
         object dtype) and is min-reduced per document with
         np.minimum.reduceat.
    Documents are processed in ~256k-shingle slabs so the matrix stays
    ~256 MB regardless of Arrow batch size.
    """
    a_params, b_params = _minhash_params(num_perm, seed)
    # odd 64-bit mixing constants (splitmix64/xxhash finalizer family)
    mix = np.array(
        [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
         0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD][:shingle_n],
        dtype=np.uint64,
    )
    slab_shingles = 1 << 18

    def fn(batches):
        a = a_params[:, None]
        b = b_params[:, None]
        for pdf in batches:
            token_lists = [
                t.lower().split() for t in pdf[text_col].fillna("").astype(str)
            ]
            ndocs = len(token_lists)
            lens = np.fromiter(
                (len(t) for t in token_lists), dtype=np.int64, count=ndocs
            )
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            flat = [tok for lst in token_lists for tok in lst]
            tok_h = (
                pd.util.hash_array(
                    np.asarray(flat, dtype=object), hash_key=MINHASH_HASH_KEY
                )
                if flat
                else np.empty(0, np.uint64)
            )
            # rolling shingle ids over the global token array
            n_win = max(tok_h.size - shingle_n + 1, 0)
            sh_all = np.zeros(n_win, dtype=np.uint64)
            for j in range(shingle_n):
                sh_all += tok_h[j : j + n_win] * mix[j]
            counts = np.maximum(lens - shingle_n + 1, 0)
            counts2 = np.where(counts > 0, counts, 1)  # short docs -> 1 shingle
            offs2 = np.concatenate([[0], np.cumsum(counts2)[:-1]])
            X = np.empty(int(counts2.sum()), dtype=np.uint64)
            X[_ragged_ranges(offs2, counts)] = sh_all[_ragged_ranges(starts, counts)]
            for d in np.flatnonzero(counts == 0):  # rare: len(toks) < n
                h = tok_h[starts[d] : starts[d] + lens[d]]
                X[offs2[d]] = (h * mix[: h.size]).sum() if h.size else np.uint64(0)
            sig_rows = np.empty((ndocs, num_perm), dtype=np.uint64)
            doc_lo = 0
            while doc_lo < ndocs:  # slab by docs: bounded hash matrix
                doc_hi = doc_lo
                tot = 0
                while doc_hi < ndocs and (
                    tot == 0 or tot + counts2[doc_hi] <= slab_shingles
                ):
                    tot += int(counts2[doc_hi])
                    doc_hi += 1
                x = X[offs2[doc_lo] : offs2[doc_lo] + tot][None, :]
                hs = a * x + b  # (num_perm, tot) uint64, mod-2^64 wrap
                sig_rows[doc_lo:doc_hi] = np.minimum.reduceat(
                    hs, offs2[doc_lo:doc_hi] - offs2[doc_lo], axis=1
                ).T
                doc_lo = doc_hi
            yield pd.DataFrame(
                {"id": pdf[id_col], "signature": [r.astype(np.int64) for r in sig_rows]}
            )

    return df.select(id_col, text_col).mapInPandas(
        fn, schema="id long, signature array<long>"
    )


def minhash_signatures_oph(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """One-permutation MinHash (Li/Owen/Zhang 2012) with OPTIMAL
    densification (Shrivastava 2017): O(S) hash work per document instead
    of O(num_perm * S).

    Each shingle is hashed ONCE; its top log2(num_perm) bits pick a bin
    and the remaining bits compete for the bin minimum (one vectorized
    scatter-min over the whole Arrow batch). Empty bins borrow from bins
    chosen by a seeded hash of (bin, attempt) — document-independent
    random targets, so borrowed values never form the consecutive runs
    that make LSH bands spuriously collide for sparse documents. Output
    schema matches minhash_signatures, so LSH banding and the estimator
    run unchanged.

    The classical k-hash signature is ~25x more hash arithmetic at
    num_perm=128; use this variant when the signature pass dominates
    (e.g. >10^9 documents), the classical one when estimator variance on
    short documents matters more (OPH densification adds variance for
    documents with far fewer shingles than bins).
    """
    if num_perm & (num_perm - 1):
        raise ValueError("num_perm must be a power of two for OPH binning")
    bin_bits = num_perm.bit_length() - 1
    shift = np.uint64(64 - bin_bits)
    seed_mix = np.uint64(0xA5A5A5A5_00000001 * (seed * 2 + 1) & 0xFFFFFFFFFFFFFFFF)
    mix = np.array(
        [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
         0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD][:shingle_n],
        dtype=np.uint64,
    )
    MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
    _rng = np.random.RandomState(seed ^ 0xD1CE)
    _oph_jmaps = _rng.randint(0, num_perm, size=(64, num_perm))

    def fn(batches):
        for pdf in batches:
            token_lists = [
                t.lower().split() for t in pdf[text_col].fillna("").astype(str)
            ]
            ndocs = len(token_lists)
            lens = np.fromiter(
                (len(t) for t in token_lists), dtype=np.int64, count=ndocs
            )
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            flat = [tok for lst in token_lists for tok in lst]
            tok_h = (
                pd.util.hash_array(
                    np.asarray(flat, dtype=object), hash_key=MINHASH_HASH_KEY
                )
                if flat
                else np.empty(0, np.uint64)
            )
            n_win = max(tok_h.size - shingle_n + 1, 0)
            sh_all = np.zeros(n_win, dtype=np.uint64)
            for j in range(shingle_n):
                sh_all += tok_h[j : j + n_win] * mix[j]
            sh_all = sh_all * seed_mix  # seeded odd-multiplier permutation
            counts = np.maximum(lens - shingle_n + 1, 0)
            doc_of = np.repeat(np.arange(ndocs), counts)
            win_pos = _ragged_ranges(starts, counts)
            vals = sh_all[win_pos]
            bins = (vals >> shift).astype(np.int64)
            M = np.full((ndocs, num_perm), MAX, dtype=np.uint64)
            np.minimum.at(M, (doc_of, bins), vals)
            for d in np.flatnonzero(counts == 0):  # rare: len(toks) < n
                h = tok_h[starts[d] : starts[d] + lens[d]]
                v = (h * mix[: h.size]).sum() * seed_mix if h.size else np.uint64(0)
                M[d, int(v >> shift)] = v
            # OPTIMAL densification (Shrivastava, ICML 2017): each empty
            # bin borrows from a bin chosen by a seeded hash of
            # (bin, attempt) — independent of the document. Rotation-style
            # nearest-neighbor borrowing copies one shared source min into
            # RUNS of consecutive bins, which makes 4-consecutive-bin LSH
            # bands collide for sparse documents sharing a single shingle;
            # random borrow targets break that correlation (measured:
            # ~290 -> ~0 spurious band candidates on the 500-doc corpus).
            # Each attempt is one vectorized gather over the matrix.
            empty = M == MAX
            if empty.any():
                orig_empty = empty.copy()
                for t in range(64):
                    if not empty.any():
                        break
                    j = _oph_jmaps[t]
                    src_ok = ~orig_empty[:, j]
                    fill = empty & src_ok
                    M = np.where(fill, M[:, j], M)
                    empty &= ~fill
                if empty.any():  # pathological rows: fall back to row min
                    row_min = M.min(axis=1, keepdims=True)
                    M = np.where(empty, row_min, M)
            yield pd.DataFrame(
                {"id": pdf[id_col],
                 "signature": [r.astype(np.int64) for r in M]}
            )

    return df.select(id_col, text_col).mapInPandas(
        fn, schema="id long, signature array<long>"
    )


def minhash_lsh_bands(
    signatures: DataFrame, num_bands: int = 32, num_perm: int = 128
) -> DataFrame:
    """(id, band, band_hash) LSH bucket table for a signature frame.

    This IS the persistable dedup index: in a snapshot pipeline, write it
    once per corpus (bucketed by (band, band_hash) via
    sources.tableio.write_bucketed) and join each new crawl delta against
    it — see minhash_lsh_incremental."""
    if num_perm % num_bands != 0:
        raise ValueError(
            f"num_bands={num_bands} must divide num_perm={num_perm} evenly"
        )
    rows = num_perm // num_bands
    # in-plan length guard: a signature built with a different num_perm
    # would slice out-of-range bands whose empty concat hashes IDENTICALLY
    # for every doc, silently degenerating the bucket join into a cross
    # product — fail loud instead
    sig_ok = F.size(F.col("signature")) == num_perm
    return signatures.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda bnd: F.when(
                    sig_ok,
                    F.xxhash64(
                        F.concat_ws(
                            ",", F.transform(
                                F.slice(F.col("signature"), bnd * rows + 1, rows),
                                lambda v: v.cast("string"),
                            )
                        )
                    ),
                ).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "minhash_lsh_bands: signature length "
                            ),
                            F.size(F.col("signature")).cast("string"),
                            F.lit(f" != num_perm {num_perm}"),
                        )
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )


def _band_pairs(banded: DataFrame) -> DataFrame:
    """Self-join a (id, band, band_hash) table: distinct id_a < id_b pairs."""
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_candidates(
    signatures: DataFrame, num_bands: int = 32, num_perm: int = 128
) -> DataFrame:
    """Band the signature, bucket-join: candidate pairs per shared bucket."""
    return _band_pairs(minhash_lsh_bands(signatures, num_bands, num_perm))


def minhash_estimate(
    signatures: DataFrame, candidates: DataFrame
) -> DataFrame:
    """Estimated Jaccard = fraction of matching signature positions."""
    sa = signatures.withColumnRenamed("id", "id_a").withColumnRenamed(
        "signature", "sig_a"
    )
    sb = signatures.withColumnRenamed("id", "id_b").withColumnRenamed(
        "signature", "sig_b"
    )
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / F.size("sig_a"),
        )
        .select("id_a", "id_b", "est_jaccard")
    )


def minhash_lsh_incremental(
    existing_sigs: DataFrame,
    new_sigs: DataFrame,
    num_bands: int = 32,
    broadcast_new: bool = False,
    threshold: float | None = None,
    num_perm: int = 128,
) -> DataFrame:
    """Dedup a new snapshot delta against an existing corpus WITHOUT
    re-pairing the corpus with itself.

    The per-document banding is independent, so the full-corpus LSH pair
    set restricted to pairs touching a new document is EXACTLY
    (new x existing bucket join) ∪ (new x new self-join) — old x old
    pairs were already resolved when the index was built and are never
    recomputed. At 100 TB this is the difference between re-bucketing
    10^9 documents per crawl and joining a 10^6-row delta against a
    persisted (band, band_hash)-bucketed index table (write it with
    sources.tableio.write_bucketed to make the big side's shuffle a
    one-time cost; see tests/test_dedup_multimodal.py for the
    equivalence property).

    Returns (kind, id_a, id_b, est_jaccard) where kind='vs_index' pairs
    a new doc (id_a) with an existing doc (id_b), and kind='within_batch'
    pairs two new docs (id_a < id_b). Pass broadcast_new=True when the
    delta is small enough to ship to every executor (the usual case);
    threshold filters the estimate if given. `num_perm` must match the
    signature width both frames were built with (guarded in-plan by
    minhash_lsh_bands)."""
    new_bands = minhash_lsh_bands(new_sigs, num_bands, num_perm)
    old_bands = minhash_lsh_bands(existing_sigs, num_bands, num_perm)
    nbj = F.broadcast(new_bands) if broadcast_new else new_bands
    cross = (
        old_bands.alias("a")
        .join(
            nbj.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            # a re-crawled doc carrying the same id in both snapshots
            # would otherwise pair with itself (est 1.0, meaningless)
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(F.col("b.id").alias("id_a"), F.col("a.id").alias("id_b"))
        .distinct()
    )
    sn = new_sigs.withColumnRenamed("id", "id_a").withColumnRenamed(
        "signature", "sig_a"
    )
    so = existing_sigs.withColumnRenamed("id", "id_b").withColumnRenamed(
        "signature", "sig_b"
    )
    est_expr = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.size("sig_a")
    )
    vs_index = (
        cross.join(sn, "id_a")
        .join(so, "id_b")
        .select(
            F.lit("vs_index").alias("kind"),
            "id_a",
            "id_b",
            est_expr.alias("est_jaccard"),
        )
    )
    # reuse the delta's banding lineage for the within-batch leg rather
    # than re-banding new_sigs from scratch
    within = minhash_estimate(new_sigs, _band_pairs(new_bands)).select(
        F.lit("within_batch").alias("kind"), "id_a", "id_b", "est_jaccard"
    )
    out = vs_index.unionByName(within)
    if threshold is not None:
        out = out.filter(F.col("est_jaccard") >= threshold)
    return out


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over duplicate pairs: (id, label) with label =
    the minimum id reachable through the pair graph — the canonical
    representative each duplicate group collapses to.

    Iterative min-label propagation: each round every vertex takes the
    minimum label among itself and its neighbors; rounds needed = graph
    diameter, and near-dup clusters are shallow (pairs all touch a few
    hub documents), so convergence is fast. Each round is one join + one
    aggregate, labels are localCheckpoint()ed to keep the lineage flat,
    and convergence is detected with a count — O(rounds) driver actions,
    never a collect of the graph. (At extreme diameters use the
    large-star/small-star CC variant; for dedup graphs plain propagation
    converges in a handful of rounds.)
    """
    edges = pairs.select(
        F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
    )
    sym = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = sym.join(labels, sym["a"] == labels["id"]).select(
            F.col("b").alias("id"), F.col("label")
        )
        new = (
            labels.union(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iter} rounds — the "
            "pair graph has diameter > max_iter; raise max_iter or switch "
            "to a large-star/small-star contraction for deep chains"
        )
    return labels


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """60-bit SimHash (Charikar 2002) computed entirely in SQL.

    Token hash = first 15 hex chars of md5(token) parsed base-16 — the one
    hash both Spark (`conv`) and DuckDB (`'0x…'::BIGINT`) evaluate
    identically, which is what makes the DuckDB oracle possible. Per bit i,
    the sign sum counts +1/-1 over token OCCURRENCES (frequency-weighted,
    per the paper); bit i of the output is 1 iff the sum is positive.

    Plan shape: project -> explode -> hash -> one groupBy(id) with 60
    conditional sums -> combine. Everything whole-stage codegen; the only
    shuffle keys on id. Empty/whitespace-only docs get simhash 0 via the
    left join back to the id universe.
    """
    toks = (
        df.select(F.col(id_col).alias("id"), tokenize_expr(text_col).alias("_t"))
        .select("id", F.explode("_t").alias("tok"))
        .filter(F.col("tok") != "")
        .withColumn(
            "h",
            F.expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)"),
        )
    )
    sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"s{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    combined = sums.select(
        "id",
        sum(
            [
                F.when(F.col(f"s{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
                for i in range(SIMHASH_BITS)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return ids.join(combined, "id", "left").select(
        "id", F.coalesce("simhash", F.lit(0)).alias("simhash")
    )


def simhash_oracle_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB SQL computing the same 60-bit simhash as simhash_signatures."""
    sum_cols = ",\n    ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(SIMHASH_BITS)
    )
    combine = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN {1 << i}::BIGINT ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS id,
         ('0x' || substr(md5(t.tok), 1, 15))::BIGINT AS h
  FROM {table},
       unnest(string_split_regex(trim(lower({text_col})), '\\s+')) AS t(tok)
  WHERE t.tok <> ''
), sums AS (
  SELECT id, {sum_cols}
  FROM toks GROUP BY id
), sh AS (
  SELECT id, {combine} AS simhash FROM sums
)
SELECT d.{id_col} AS id, coalesce(sh.simhash, 0) AS simhash
FROM (SELECT DISTINCT {id_col} FROM {table}) d LEFT JOIN sh ON sh.id = d.{id_col}
"""


def _chunk_bounds(nbits: int, n_chunks: int) -> list[tuple[int, int]]:
    """(offset, width) per chunk, widths differing by at most one bit."""
    base, rem = divmod(nbits, n_chunks)
    bounds = []
    off = 0
    for i in range(n_chunks):
        w = base + (1 if i < rem else 0)
        bounds.append((off, w))
        off += w
    return bounds


def simhash_near_pairs(signatures: DataFrame, max_hamming: int = 3) -> DataFrame:
    """ALL pairs within `max_hamming`, banded on max_hamming+1 bit chunks.

    Pigeonhole: a pair differing in at most k bits must agree exactly on at
    least one of k+1 disjoint chunks, so banding into k+1 chunks is
    COMPLETE for radius k (round 1's fixed four chunks were only complete
    for k <= 3). The join only shuffles on (chunk_idx, chunk_val); the
    radius/cost trade-off is explicit — larger k means narrower chunks and
    bigger buckets.
    """
    n_chunks = max_hamming + 1
    if n_chunks > SIMHASH_BITS:
        raise ValueError(
            f"max_hamming={max_hamming} needs {n_chunks} chunks > "
            f"{SIMHASH_BITS} hash bits"
        )
    chunks = signatures.select(
        "id", "simhash",
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("simhash"), off)
                .bitwiseAND(F.lit((1 << w) - 1))
                .cast("long")  # a lone chunk can be 60 bits (max_hamming=0)
                for off, w in _chunk_bounds(SIMHASH_BITS, n_chunks)
            ])
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
