"""Training-data curation operators: deterministic sampling and budgets.

The two standard corpus-shaping moves after filtering/dedup: (1) sample a
per-stratum fraction of documents (language/domain rebalancing) and (2) cap
each source at a token budget, keeping its highest-quality documents first
(the data-mixing step of LLM pretraining recipes — e.g. the Pile's per-set
epochs, LLaMA's source proportions — expressed as an exact, reproducible
dataframe transform instead of an ad-hoc shuffled head).

Both operators are deterministic functions of the data (seeded md5, total
orderings with unique-id tie-breaks), so re-running on the same input —
in any partitioning, on any cluster — selects byte-identical subsets.
Every column has an exact DuckDB twin in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from feasts_spark.operators.text import _tokens, quality_scores

# 2^32 — the md5-prefix uniform's denominator.
_U32 = float(1 << 32)


def sample_uniform(id_col: str = "doc_id", seed: int = 42):
    """Deterministic per-row uniform in [0, 1): first 8 hex chars of
    md5("<seed>|<id>") parsed base-16, over 2^32.

    The same `conv(substring(md5(...)))` construction both Spark and DuckDB
    evaluate identically (the idiom proven by simhash_signatures), so a
    sampling decision is reproducible across engines, runs, and cluster
    sizes — unlike DataFrame.sample, whose output depends on partitioning.
    """
    return (
        F.expr(
            f"cast(conv(substring(md5(concat_ws('|', '{seed}', "
            f"cast({id_col} as string))), 1, 8), 16, 10) as bigint)"
        )
        / F.lit(_U32)
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic stratified Bernoulli sampling: keep a row iff its
    seeded md5-uniform falls below its stratum's fraction.

    Returns the input plus (sample_u, sampled). Filter on ``sampled`` for
    the curated subset; the flags are kept so the decision is auditable.

    Plan shape: pure projection — NO shuffle, no exchange at all; the
    sampling predicate evaluates inside the scan's whole-stage codegen and
    composes with parquet filter pushdown on other predicates. At 100 TB
    this is the only sampler shape that costs one pass and nothing else.
    Changing cluster size, partitioning, or row order cannot change which
    rows are selected (the uniform depends only on seed and id), which is
    what makes train-set membership reproducible and leak-auditable.
    """
    frac = None
    for k, v in sorted(fractions.items()):
        cond, lit = F.col(strata_col) == k, F.lit(float(v))
        frac = F.when(cond, lit) if frac is None else frac.when(cond, lit)
    frac = (
        frac.otherwise(F.lit(float(default_fraction)))
        if frac is not None
        else F.lit(float(default_fraction))
    )
    u = sample_uniform(id_col, seed)
    return df.withColumn("sample_u", u).withColumn(
        "sampled", (F.col("sample_u") < frac).cast("int")
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets the split
    label whose cumulative weight interval contains its seeded
    md5-uniform. Weights must sum to 1 (validated to 1e-9).

    The assignment is a pure function of (seed, id) — re-runs, repartitions
    and cluster-size changes cannot move a document across splits, which is
    the property that makes eval-set membership auditable (and is exactly
    what DataFrame.randomSplit does NOT guarantee). Labels are assigned in
    sorted-key order so the mapping is reproducible from the dict alone.

    Plan shape: pure projection — zero exchanges, evaluates inside the
    scan's whole-stage codegen at any scale.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"split weights must be non-negative: {weights}")
    u = sample_uniform(id_col, seed)
    expr = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name]
        branch = (u < F.lit(acc), F.lit(name))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def reservoir_per_group(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    oversample: float = 8.0,
    candidate_floor: int = 512,
) -> DataFrame:
    """Exact-k deterministic reservoir sample per stratum.

    Keeps, for each stratum, the ``k`` rows with the smallest seeded
    md5-uniform (ties broken on id — a total order), i.e. a uniform
    without-replacement sample of exactly ``min(k, n)`` rows per group
    that is independent of partitioning, row order, and cluster size.
    The per-stratum *fraction* sampler is stratified_sample; this is the
    per-stratum *count* sampler LLM data-mixing recipes actually specify
    ("200k docs per language", not "0.3% of each").

    Returns the selected rows plus (sample_u, rs_rank) with rs_rank in
    1..k ordered by the uniform.

    Plan shape / 100 TB: ranking a whole stratum would sort billions of
    rows per group, so the operator first prefilters CANDIDATES with
    ``u * n_stratum < oversample*k + candidate_floor`` (n from a tiny
    broadcast count agg — the filter runs inside the scan's codegen) and
    ranks only those ~``oversample*k`` rows per stratum: one scan for
    counts, one candidate scan, then a window over a few-thousand-row
    frame. Candidates are exactly the global u-order prefix of each
    stratum, so candidate ranks equal global ranks. Strata with
    ``n <= oversample*k + candidate_floor`` keep every row as a candidate
    (exactness is unconditional there); for larger strata an in-plan
    guard raises loudly if the candidate draw under-fills (probability
    <= exp(-Theta(k + candidate_floor)) — never a silent short sample).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    cap = float(oversample) * float(k) + float(candidate_floor)
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    cand = (
        df.withColumn("sample_u", sample_uniform(id_col, seed))
        .join(F.broadcast(counts), strata_col)
        .filter(F.col("sample_u") * F.col("_n") < F.lit(cap))
    )
    w_rank = Window.partitionBy(strata_col).orderBy(
        F.col("sample_u").asc(), F.col(id_col).asc()
    )
    guard_ok = F.count(F.lit(1)).over(Window.partitionBy(strata_col)) >= F.least(
        F.lit(int(k)).cast("long"), F.col("_n")
    )
    return (
        cand.withColumn(
            "rs_rank",
            F.when(
                guard_ok, F.row_number().over(w_rank).cast("long")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("reservoir_per_group: stratum "),
                        F.col(strata_col).cast("string"),
                        F.lit(
                            " drew fewer candidates than k; raise "
                            "oversample/candidate_floor"
                        ),
                    )
                )
            ),
        )
        .filter(F.col("rs_rank") <= k)
        .drop("_n")
    )


def token_budget_cap(
    df: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cap each source at a token budget, best documents first.

    Orders each source's documents by the composite quality score of
    operators.text.quality_scores (descending; ties break on id, so the
    order is total and deterministic), accumulates whitespace-token counts,
    and keeps a document iff the running total through it stays within
    ``budget_tokens``. Returns (id, source, n_tokens, quality_score,
    cum_tokens, kept_by_budget).

    Plan shape: quality is a per-row projection (no shuffle; joined back on
    id), then ONE shuffle keyed on source for the running-sum window.
    Skew caveat for 100 TB: a window serializes each source on one task, so
    a single billion-document source becomes a straggler. The scale-out
    variant keeps the same semantics in two small aggregates: histogram the
    per-source quality distribution (groupBy(source, quantized quality) —
    map-side combined), pick the quality threshold where the cumulative
    token mass crosses the budget, then keep docs above the threshold with
    a map-only filter; only threshold-boundary docs need the exact window.
    This operator is the exact/auditable form used below that size.
    """
    q = quality_scores(df, id_col=id_col, text_col=text_col).select(
        id_col, "quality_score"
    )
    base = df.select(
        id_col,
        F.col(source_col).alias("source"),
        F.size(_tokens(text_col)).cast("long").alias("n_tokens"),
    ).join(q, id_col)
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality_score").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        id_col,
        "source",
        "n_tokens",
        "quality_score",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
    ).withColumn(
        "kept_by_budget",
        (F.col("cum_tokens") <= F.lit(int(budget_tokens))).cast("int"),
    )
