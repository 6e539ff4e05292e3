"""Deduplication operators for training-data pipelines.

Four tiers, cheapest to most semantic (all Spark-first):

  exact_dedup        — md5(text) groupBy; one shuffle, trivially scalable.
  ngram_jaccard_pairs— exact word-n-gram Jaccard via explode + self-join on
                       shared shingles. Pure SQL (codegen), oracle-able;
                       intended for candidate verification or small domains.
  minhash_lsh        — MinHash signatures (vectorized numpy inside
                       mapInPandas; universal hashing (a*x+b) mod p over
                       xxhash64 shingle ids) banded into LSH buckets; only
                       bucket cohabitants become candidate pairs. At scale:
                       signature pass is map-only; the only shuffle keys on
                       (band, band_hash); candidates are verified with exact
                       Jaccard on a join that touches just the candidates.
  simhash            — 64-bit SimHash; near-dup = small Hamming distance,
                       banded on 16-bit chunks for the same
                       shuffle-only-on-buckets property.

The reference engine (feasts) has no dedup; these follow the standard MMDS
constructions (Leskovec et al., ch.3) re-expressed on DataFrames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_MERSENNE_P = (1 << 61) - 1


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text."""
    return df.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.min(id_col).alias("rep_id"),
        F.count(F.lit(1)).alias("n_dups"),
        F.collect_list(id_col).alias("member_ids"),
    )


def tokenize_expr(text_col: str):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >= 1 shingle.

    Plan shape: explode distinct shingles -> self-join on shingle (shuffle
    keyed on shingle) -> per-pair intersection count -> Jaccard via
    |A|+|B|-|A∩B|. Pairs sharing nothing never materialize.
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
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    a = grams.alias("a")
    b = grams.alias("b")
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


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE_P, size=num_perm, dtype=np.int64).astype(object)
    b = rng.randint(0, _MERSENNE_P, size=num_perm, dtype=np.int64).astype(object)
    return a, b


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Map-only MinHash signature pass: (id, signature array<long>)."""
    a_params, b_params = _minhash_params(num_perm, seed)

    def fn(batches):
        a = np.array(a_params, dtype=object)
        b = np.array(b_params, dtype=object)
        for pdf in batches:
            sigs = []
            for text in pdf[text_col].fillna("").astype(str):
                toks = text.lower().split()
                if len(toks) < shingle_n:
                    shingles = {" ".join(toks)} if toks else {""}
                else:
                    shingles = {
                        " ".join(toks[i : i + shingle_n])
                        for i in range(len(toks) - shingle_n + 1)
                    }
                # shingle ids via python hash of md5 (stable across workers)
                import hashlib

                ids = np.array(
                    [
                        int.from_bytes(
                            hashlib.md5(s.encode()).digest()[:8], "big"
                        )
                        for s in shingles
                    ],
                    dtype=object,
                )
                # h_i(x) = (a_i * x + b_i) mod p, min over shingles
                hs = (ids[None, :] * a[:, None] + b[:, None]) % _MERSENNE_P
                sig = hs.min(axis=1)
                sigs.append([int(v) & 0x7FFFFFFFFFFFFFFF for v in sig])
            yield pd.DataFrame({"id": pdf[id_col], "signature": sigs})

    return df.select(id_col, text_col).mapInPandas(
        fn, schema="id long, signature array<long>"
    )


def minhash_lsh_candidates(
    signatures: DataFrame, num_bands: int = 32
) -> DataFrame:
    """Band the signature, bucket-join: candidate pairs per shared bucket."""
    num_perm = 128  # rows = num_perm / num_bands
    rows = num_perm // num_bands
    banded = signatures.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda bnd: F.xxhash64(
                    F.concat_ws(
                        ",", F.transform(
                            F.slice(F.col("signature"), bnd * rows + 1, rows),
                            lambda v: v.cast("string"),
                        )
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
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


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens (Charikar 2002)."""

    def fn(batches):
        import hashlib

        for pdf in batches:
            out = []
            for text in pdf[text_col].fillna("").astype(str):
                toks = text.lower().split()
                acc = np.zeros(64, dtype=np.int64)
                for t in toks:
                    bits = np.unpackbits(
                        np.frombuffer(hashlib.md5(t.encode()).digest()[:8], np.uint8)
                    ).astype(np.int64)
                    acc += 2 * bits - 1
                sim = int.from_bytes(np.packbits(acc > 0).tobytes(), "big")
                out.append(sim & 0x7FFFFFFFFFFFFFFF)
            yield pd.DataFrame({"id": pdf[id_col], "simhash": out})

    return df.select(id_col, text_col).mapInPandas(fn, schema="id long, simhash long")


def simhash_near_pairs(signatures: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance, banded on 16-bit chunks.

    Any pair within Hamming distance 3 must share at least one of the four
    16-bit chunks exactly (pigeonhole) — the join only shuffles on chunk
    values, never all-pairs.
    """
    chunks = signatures.select(
        "id", "simhash",
        F.posexplode(
            F.array(*[
                ((F.col("simhash").cast("long") / F.lit(2 ** (16 * i))).cast("long")
                 % F.lit(65536)).cast("int")
                for i in range(4)
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
