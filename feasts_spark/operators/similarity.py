"""Approximate nearest-neighbor search over embedding columns.

Scale path for the brute-force cosine top-k baseline (__spark_entry__
q_ann_topk): random-hyperplane LSH (Charikar 2002) buckets vectors so the
candidate join shuffles on bucket ids instead of forming the full cross
product. At N vectors x Q queries brute force is O(N*Q) dot products; LSH
with b sign-bits cuts candidates ~2^-b per probe while multiprobe (flip one
bit) recovers recall. All hyperplanes derive from a fixed seed so results
are deterministic across runs and cluster sizes.

Everything JVM-side after the (vectorized, Arrow-batched) projection UDF:
bucket join, cosine via zip_with/aggregate, top-k via row_number window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F

_COS = (
    "aggregate(zip_with(cast({a} as array<double>), cast({b} as array<double>),"
    " (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    " / sqrt(aggregate(cast({a} as array<double>), 0D, (acc, x) -> acc + x * x)"
    " * aggregate(cast({b} as array<double>), 0D, (acc, x) -> acc + x * x))"
)


def lsh_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 1,
    seed: int = 7,
) -> DataFrame:
    """(id, vec) -> (id, vec, table, bucket): bucket = sign bits of P_t @ v.

    Classic multi-table LSH: each of the n_tables hash tables draws its own
    n_planes hyperplanes; a pair is a candidate if it collides in ANY table
    — recall grows ~1-(1-p^b)^L while the join still shuffles only on
    (table, bucket). P is drawn once per worker from a seeded Generator —
    identical everywhere, so bucketing is globally consistent without a
    broadcast.
    """

    def fn(batches):
        planes_by_dim = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            dim = mat.shape[1]
            if dim not in planes_by_dim:
                planes_by_dim[dim] = np.random.default_rng(seed).standard_normal(
                    (n_tables, n_planes, dim)
                )
            frames = []
            for t in range(n_tables):
                bits = (planes_by_dim[dim][t] @ mat.T) > 0  # (planes, rows)
                bucket = np.zeros(mat.shape[0], dtype=np.int64)
                for i in range(n_planes):
                    bucket |= bits[i].astype(np.int64) << i
                frames.append(
                    pd.DataFrame(
                        {"id": pdf[id_col], "vec": pdf[vec_col],
                         "table": t, "bucket": bucket}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    vec_type = df.schema[vec_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        fn, schema=f"id long, vec {vec_type}, table int, bucket long"
    )


def ann_lsh_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 4,
    seed: int = 7,
    multiprobe: bool = True,
    query_filter=None,
) -> DataFrame:
    """Approximate cosine top-k per query vector via multi-table LSH join.

    multiprobe=True also probes every Hamming-1 neighbor bucket of the
    query in each table (n_planes extra buckets/table), the standard
    recall/fan-out trade. query_filter: optional Column predicate on the
    query id (e.g. limit the query set); candidates always come from the
    full table.
    """
    proj = lsh_project(df, id_col, vec_col, n_planes, n_tables, seed)
    cand = proj.select(
        F.col("id").alias("cand_id"),
        F.col("vec").alias("ec"),
        F.col("table").alias("ctable"),
        F.col("bucket").alias("cbucket"),
    )
    q = proj.select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("eq"),
        F.col("table").alias("qtable"),
        F.col("bucket").alias("qbucket"),
    )
    if query_filter is not None:
        q = q.filter(query_filter(F.col("query_id")))
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)
            ],
        )
        q = q.select(
            "query_id", "eq", "qtable", F.explode(probes).alias("qbucket")
        )
    scored = (
        q.join(
            cand,
            (F.col("qtable") == F.col("ctable"))
            & (F.col("qbucket") == F.col("cbucket")),
        )
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.expr(_COS.format(a="eq", b="ec")).alias("cos"),
        )
        # tables/multiprobe surface the same candidate repeatedly
        .groupBy("query_id", "cand_id")
        .agg(F.max("cos").alias("cos"))
    )
    wrank = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cos")
    )


def brute_force_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter=None,
) -> DataFrame:
    """Exact cosine top-k (the recall oracle for ann_lsh_topk)."""
    q = df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("eq"))
    if query_filter is not None:
        q = q.filter(query_filter(F.col("query_id")))
    c = df.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("ec"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", F.expr(_COS.format(a="eq", b="ec")).alias("cos"))
    )
    wrank = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cos")
    )


def _ivf_centroids(df, id_col, vec_col, n_cells, seed, sample_n=4096,
                   iters=4):
    """Deterministic coarse quantizer: seeded sample -> a few Lloyd
    iterations driver-side (standard IVF training: the sample is O(k*100)
    regardless of table size; the full table is never collected).

    n_cells is clamped to the sample size so tiny tables train fewer
    cells instead of raising from rng.choice(replace=False). The sample
    comes from _seeded_sample — ONE sampling recipe for every
    driver-trained quantizer (IVF, PQ, IVFADC), so they cannot drift onto
    different rows of the same corpus."""
    samp = _seeded_sample(df, id_col, vec_col, sample_n)
    samp = samp / (np.linalg.norm(samp, axis=1, keepdims=True) + 1e-12)
    n_cells = min(n_cells, samp.shape[0])
    rng = np.random.default_rng(seed)
    cent = samp[rng.choice(samp.shape[0], n_cells, replace=False)]
    for _ in range(iters):
        assign = np.argmax(samp @ cent.T, axis=1)
        for c in range(n_cells):
            members = samp[assign == c]
            if members.size:
                v = members.mean(axis=0)
                cent[c] = v / (np.linalg.norm(v) + 1e-12)
    return cent


def _ivf_assign(df: DataFrame, cent: np.ndarray, id_col: str, vec_col: str,
                nprobe: int) -> DataFrame:
    """(id, vec, cell, probes) projection: nearest-centroid cell plus the
    nprobe nearest cells for the query side. Map-only; cent ships in the
    UDF closure (n_cells x dim floats — broadcast-sized)."""

    def assign_fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            mat = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12)
            sims = mat @ cent.T
            order = np.argsort(-sims, axis=1)
            yield pd.DataFrame({
                "id": pdf[id_col],
                "vec": pdf[vec_col],
                "cell": order[:, 0].astype(np.int32),
                "probes": [order[i, :nprobe].astype(np.int32).tolist()
                           for i in range(order.shape[0])],
            })

    vec_type = df.schema[vec_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        assign_fn,
        schema=f"id long, vec {vec_type}, cell int, probes array<int>",
    )


def ivf_params(
    n_rows: int,
    max_cells: int = 4096,
    per_cell: int = 64,
    sample_cap: int = 262_144,
) -> dict:
    """Corpus-size-scaled IVF training parameters (the faiss guidance,
    documented so the numbers survive review):

      n_cells  = clip(round(sqrt(N)), 1, max_cells) — sqrt(N) balances
                 the two serving costs (nprobe centroid comparisons vs
                 N/n_cells candidates per probed cell), giving ~sqrt(N)
                 points per cell. The cap keeps driver-side Lloyd
                 tractable (cost ~ sample_n * n_cells * dim per iter);
                 past ~16M rows the cells simply get larger — raise
                 nprobe, or shard the corpus / use a two-level quantizer.
      sample_n = clip(per_cell * n_cells, 4096, sample_cap) — ≥ ~64
                 training points per centroid (k-means needs 30-256 per
                 cell to place centroids stably); the cap bounds driver
                 memory (sample_cap * dim * 8 bytes) and the per_cell
                 floor degrades gracefully under it.
      nprobe   = clip(round(n_cells / 16), 2, n_cells) — ~6% of cells,
                 the usual recall/latency starting point; callers tune.

    A 500-row test corpus gets (22 cells, 4096 sample) — every row
    trains; 10^9 rows get (4096 cells, 262144 sample): a 0.26-per-mille
    deterministic hash sample with 64 points per cell, not a fixed 4096
    rows spread over the corpus."""
    n_rows = max(int(n_rows), 1)
    n_cells = max(1, min(int(round(n_rows ** 0.5)), max_cells))
    sample_n = max(4096, min(per_cell * n_cells, sample_cap))
    nprobe = max(2, min(int(round(n_cells / 16)), n_cells))
    return {"n_cells": n_cells, "sample_n": sample_n, "nprobe": nprobe}


def ivf_build_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = 8,
    seed: int = 7,
    sample_n: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build the persistable IVF index: (centroids, assignments).

    centroids is a tiny (cell, centroid) frame (O(n_cells) rows — write it
    next to the assignments table); assignments is (id, vec, cell) — at
    scale, write it partitioned/bucketed BY CELL so ivf_query_topk's
    cell join prunes to the probed partitions instead of scanning the
    corpus per query batch. Training stays bounded: seeded total-ordered
    hash sample + driver-side Lloyd (see _ivf_centroids).

    Pass n_cells=None to derive n_cells AND the training sample size from
    the corpus count via ivf_params (one count() job at build time —
    build runs once per corpus snapshot)."""
    if n_cells is None:
        p = ivf_params(df.count())
        n_cells = p["n_cells"]
        sample_n = sample_n if sample_n is not None else p["sample_n"]
    cent = _ivf_centroids(
        df, id_col, vec_col, n_cells, seed,
        **({"sample_n": sample_n} if sample_n is not None else {}),
    )
    assignments = _ivf_assign(df, cent, id_col, vec_col, nprobe=1).select(
        "id", "vec", "cell"
    )
    centroids = df.sparkSession.createDataFrame(
        [(int(i), [float(v) for v in cent[i]]) for i in range(cent.shape[0])],
        "cell int, centroid array<double>",
    )
    return centroids, assignments


def ivf_query_topk(
    centroids: DataFrame,
    assignments: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Serve approximate cosine top-k for a query batch against a BUILT
    index — the index is reused across query batches instead of being
    retrained per call (build once per corpus snapshot, query at serving
    cadence). Queries need not be index members; pass exclude_self=True
    when they are (drops the trivial self-match). The centroids frame is
    collected driver-side — O(n_cells) rows by construction."""
    rows = sorted(centroids.collect(), key=lambda r: r["cell"])
    if [r["cell"] for r in rows] != list(range(len(rows))):
        raise ValueError(
            "centroids frame must carry contiguous cell ids 0..n-1 "
            "(as produced by ivf_build_index); got "
            f"{[r['cell'] for r in rows][:8]}..."
        )
    cent = np.array([r["centroid"] for r in rows], dtype=np.float64)
    qproj = _ivf_assign(queries, cent, id_col, vec_col, nprobe)
    cand = assignments.select(
        F.col("id").alias("cand_id"), F.col("vec").alias("ec"),
        F.col("cell").alias("ccell"),
    )
    q = qproj.select(
        F.col("id").alias("query_id"), F.col("vec").alias("eq"),
        F.explode("probes").alias("qcell"),
    )
    scored = q.join(cand, F.col("qcell") == F.col("ccell"))
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("cand_id"))
    scored = (
        scored.select(
            "query_id", "cand_id",
            F.expr(_COS.format(a="eq", b="ec")).alias("cos"),
        )
        .groupBy("query_id", "cand_id")
        .agg(F.max("cos").alias("cos"))
    )
    wrank = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cos")
    )


def ann_ivf_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = 8,
    nprobe: int | None = 2,
    seed: int = 7,
    query_filter=None,
) -> DataFrame:
    """IVF approximate cosine top-k: coarse-quantize vectors into n_cells
    (max-cosine centroid), queries probe their nprobe nearest cells, and
    the join shuffles on cell ids — candidate work ~ nprobe/n_cells of
    brute force. Composed from ivf_build_index + ivf_query_topk (same
    results as the pre-split implementation: assignment is row-wise, so
    probing the filtered query set equals filtering the probed set).

    n_cells=None scales n_cells, the training sample, and (when nprobe
    is also None) nprobe from the corpus count — see ivf_params."""
    sample_n = None
    if n_cells is None:
        p = ivf_params(df.count())
        n_cells, sample_n = p["n_cells"], p["sample_n"]
        if nprobe is None:
            nprobe = p["nprobe"]
    if nprobe is None:
        raise ValueError("nprobe=None requires n_cells=None (auto params)")
    cent = _ivf_centroids(
        df, id_col, vec_col, n_cells, seed,
        **({"sample_n": sample_n} if sample_n is not None else {}),
    )
    proj = _ivf_assign(df, cent, id_col, vec_col, nprobe)
    cand = proj.select(
        F.col("id").alias("cand_id"), F.col("vec").alias("ec"),
        F.col("cell").alias("ccell"),
    )
    q = proj.select(
        F.col("id").alias("query_id"), F.col("vec").alias("eq"),
        F.explode("probes").alias("qcell"),
    )
    if query_filter is not None:
        q = q.filter(query_filter(F.col("query_id")))
    scored = (
        q.join(cand, F.col("qcell") == F.col("ccell"))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "cand_id",
            F.expr(_COS.format(a="eq", b="ec")).alias("cos"),
        )
        .groupBy("query_id", "cand_id")
        .agg(F.max("cos").alias("cos"))
    )
    wrank = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cos")
    )


def _seeded_sample(df: DataFrame, id_col: str, vec_col: str,
                   sample_n: int) -> np.ndarray:
    """Deterministic bounded training sample: (pmod(xxhash64(id)), id) is a
    TOTAL order, so hash-collision ties cannot reorder between runs or
    cluster layouts. O(sample_n * dim) driver memory regardless of corpus
    size — the full table is never collected."""
    samp = np.array(
        df.select(vec_col, F.col(id_col).alias("_id"))
        .orderBy(F.pmod(F.xxhash64(id_col), F.lit(1_000_003)), F.col("_id"))
        .limit(sample_n)
        .toPandas()[vec_col]
        .tolist(),
        dtype=np.float64,
    )
    if samp.size == 0:
        raise ValueError("vector table is empty")
    return samp


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 256,
    seed: int = 7,
    sample_n: int = 65_536,
    iters: int = 8,
) -> DataFrame:
    """Train a product quantizer (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011): split the d dims into m
    contiguous subspaces and k-means each to n_codes centroids. A vector
    then compresses to m uint8 codes (+1 float norm) — 64-d float64
    embeddings (512 B) become 8 B codes, a 64x memory cut, which is what
    lets a 100 TB embedding corpus's index live in cluster RAM while the
    raw vectors stay in object storage.

    Training is bounded like IVF's: seeded total-ordered hash sample
    (never the corpus) + driver-side per-subspace Lloyd — cost
    O(sample_n * n_codes * d) per iteration, independent of table size.

    Returns the persistable codebook frame (subspace, code, centroid) —
    m * n_codes rows; write it next to the codes table.
    """
    samp = _seeded_sample(df, id_col, vec_col, sample_n)
    books = _pq_lloyd(samp, m, n_codes, seed, iters, ctx="pq_train")
    return _books_frame(df.sparkSession, books)


def _pq_lloyd(samp: np.ndarray, m: int, n_codes: int, seed: int,
              iters: int, ctx: str) -> np.ndarray:
    """Per-subspace Lloyd over a driver-resident training sample; returns
    the (m, n_codes, dsub) codebook tensor. Shared by pq_train (raw
    vectors) and ivfpq_build_index (cell residuals)."""
    dim = samp.shape[1]
    if dim % m:
        raise ValueError(f"{ctx}: dim {dim} not divisible by m={m}")
    dsub = dim // m
    n_codes = min(n_codes, samp.shape[0])
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, dsub))
    for s in range(m):
        x = samp[:, s * dsub:(s + 1) * dsub]
        cent = x[rng.choice(x.shape[0], n_codes, replace=False)]
        for _ in range(iters):
            # ||x-c||^2 argmin == argmin(-2 x.c + ||c||^2); x term constant
            d2 = -2.0 * (x @ cent.T) + (cent * cent).sum(axis=1)
            assign = np.argmin(d2, axis=1)
            for c in np.unique(assign):
                cent[c] = x[assign == c].mean(axis=0)
        books[s] = cent
    return books


def _books_frame(spark, books: np.ndarray) -> DataFrame:
    m, n_codes = books.shape[0], books.shape[1]
    rows = [
        (int(s), int(c), [float(v) for v in books[s, c]])
        for s in range(m)
        for c in range(n_codes)
    ]
    return spark.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    )


def _codebooks_np(codebooks: DataFrame) -> np.ndarray:
    """Collect the (tiny, m*n_codes-row) codebook frame to a contiguous
    (m, n_codes, dsub) array, validating the id layout."""
    rows = sorted(codebooks.collect(), key=lambda r: (r["subspace"], r["code"]))
    m = rows[-1]["subspace"] + 1
    n_codes = rows[-1]["code"] + 1
    if len(rows) != m * n_codes or [
        (r["subspace"], r["code"]) for r in rows
    ] != [(s, c) for s in range(m) for c in range(n_codes)]:
        raise ValueError(
            "codebooks frame must carry contiguous (subspace 0..m-1, "
            "code 0..n-1) ids as produced by pq_train"
        )
    return np.array([r["centroid"] for r in rows], dtype=np.float64).reshape(
        m, n_codes, -1
    )


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress vectors to (id, codes: m bytes, norm): per-subspace
    nearest-codeword ids packed into one BinaryType value, plus the exact
    L2 norm (1 float) so cosine can be served from codes alone. Map-only
    mapInPandas — the codebook ships in the closure (m * n_codes * dsub
    floats, broadcast-sized); no shuffle, scales linearly with the scan."""
    books = _codebooks_np(codebooks)
    m, _, dsub = books.shape
    # (m, dsub*m) padded layout avoided: per-subspace argmin below
    books_sq = (books * books).sum(axis=2)  # (m, n_codes)

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if mat.shape[1] != m * dsub:
                raise ValueError(
                    f"pq_encode: dim {mat.shape[1]} != codebook {m * dsub}"
                )
            codes = np.empty((mat.shape[0], m), dtype=np.uint8)
            for s in range(m):
                x = mat[:, s * dsub:(s + 1) * dsub]
                d2 = -2.0 * (x @ books[s].T) + books_sq[s]
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame({
                "id": pdf[id_col],
                "codes": [c.tobytes() for c in codes],
                "norm": np.linalg.norm(mat, axis=1),
            })

    return df.select(id_col, vec_col).mapInPandas(
        fn, schema="id long, codes binary, norm double"
    )


def pq_query_topk(
    codebooks: DataFrame,
    codes_df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Serve approximate cosine top-k from PQ codes via asymmetric
    distance computation (ADC): each query builds an (m, n_codes) lookup
    table of subspace dot products once, then every candidate scores as m
    table gathers + a sum — no candidate vector is ever decompressed.

    Distribution shape: the query batch is collected driver-side (serving
    batches are O(Q) by design — same contract as ivf_query_topk's
    centroid collect) and its LUTs ship in the closure; the codes table is
    scanned map-only with a per-partition top-k (argpartition), so the
    shuffle carries only Q * k rows PER PARTITION into the final global
    top-k window — the corpus itself never shuffles. At 1000 executors
    over 10^9 codes that is a few-MB exchange after a RAM-resident scan.
    """
    books = _codebooks_np(codebooks)
    m, _, dsub = books.shape
    qrows = queries.select(
        F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv")
    ).collect()
    if not qrows:
        raise ValueError("pq_query_topk: empty query batch")
    qids = np.array([r["_qid"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["_qv"] for r in qrows], dtype=np.float64)
    if qmat.shape[1] != m * dsub:
        raise ValueError(
            f"pq_query_topk: query dim {qmat.shape[1]} != codebook {m * dsub}"
        )
    qnorm = np.linalg.norm(qmat, axis=1) + 1e-12
    # luts[q, s, c] = <q_s, codeword_sc>; approx dot = sum_s luts[q,s,code_s]
    luts = np.einsum("qsd,scd->qsc", qmat.reshape(-1, m, dsub), books)

    def fn(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf["codes"]), dtype=np.uint8
            ).reshape(n, m)
            cnorm = pdf["norm"].to_numpy(dtype=np.float64) + 1e-12
            ids = pdf["id"].to_numpy(dtype=np.int64)
            sub = np.arange(m)
            frames = []
            for qi in range(qids.shape[0]):
                dots = luts[qi][sub, codes].sum(axis=1)
                cos = dots / (qnorm[qi] * cnorm)
                if exclude_self:
                    cos = np.where(ids == qids[qi], -np.inf, cos)
                kk = min(k, n)
                top = np.argpartition(-cos, kk - 1)[:kk]
                keep = top[np.isfinite(cos[top])]
                frames.append(pd.DataFrame({
                    "query_id": qids[qi],
                    "cand_id": ids[keep],
                    "cos": cos[keep],
                }))
            yield pd.concat(frames, ignore_index=True)

    local = codes_df.select("id", "codes", "norm").mapInPandas(
        fn, schema="query_id long, cand_id long, cos double"
    )
    wrank = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        local.withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cos")
    )


def pq_rerank(
    shortlist: DataFrame,
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-cosine re-rank of an ADC shortlist — the standard PQ serving
    recipe (quantized scan prunes the corpus, exact math fixes the
    near-tie ordering quantization scrambles). shortlist carries
    (query_id, cand_id); raw vectors are fetched from `candidates` via a
    BROADCAST of the shortlist (Q * len(shortlist) rows, tiny by
    construction), so the corpus is scanned once and never shuffled."""
    eq = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("eq")
    )
    ec = candidates.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("ec")
    )
    pairs = shortlist.select("query_id", "cand_id").distinct()
    scored = (
        ec.join(F.broadcast(pairs), "cand_id")
        .join(F.broadcast(eq), "query_id")
        .select(
            "query_id", "cand_id",
            F.expr(_COS.format(a="eq", b="ec")).alias("cos"),
        )
    )
    wrank = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cos")
    )


def ann_pq_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 256,
    seed: int = 7,
    query_filter=None,
    rerank: int = 4,
) -> DataFrame:
    """PQ/ADC approximate cosine top-k end to end (train -> encode ->
    ADC shortlist -> exact re-rank), the memory-bound ANN path
    complementing LSH (bucketed candidate pruning) and IVF (cell
    pruning): PQ scans EVERY candidate but at m bytes each, trading
    compute for a corpus whose index fits in RAM. Compose with IVF for
    both (encode per cell, probe then ADC-scan).

    rerank > 0 takes the ADC top (rerank * k) per query and re-scores
    those pairs with exact cosine on the raw vectors (see pq_rerank) —
    ADC alone ranks near-tie neighbors within quantization noise;
    rerank=0 serves straight from codes."""
    books = pq_train(df, id_col, vec_col, m=m, n_codes=n_codes, seed=seed)
    codes = pq_encode(df, books, id_col, vec_col)
    q = df.select(id_col, vec_col)
    if query_filter is not None:
        q = q.filter(query_filter(F.col(id_col)))
    shortlist_k = k * rerank if rerank else k
    adc = pq_query_topk(
        books, codes, q, k=shortlist_k, id_col=id_col, vec_col=vec_col,
        exclude_self=True,
    )
    if not rerank:
        return adc
    return pq_rerank(adc, df, q, k=k, id_col=id_col, vec_col=vec_col)


def ivfpq_build_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    m: int = 8,
    n_codes: int = 256,
    seed: int = 7,
    sample_n: int = 65_536,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build an IVFADC index (Jégou et al. 2011, §"IVFADC"): a coarse
    quantizer buckets vectors into cells, and a product quantizer encodes
    each vector's RESIDUAL from its cell centroid — residuals concentrate
    near zero, so the same code budget quantizes them far more finely
    than raw vectors, and serving gets cell pruning (IVF) and compressed
    candidates (PQ) in one index.

    Everything runs in UNIT-NORMALIZED space (the coarse quantizer is
    spherical, see _ivf_centroids), so residuals are `v/|v| − c_cell` —
    computing them from RAW vectors would fold the corpus's norm spread
    back into the residuals and forfeit exactly the concentration that
    motivates residual coding under cosine. The exact raw norm is still
    stored per vector so dot-product serving stays possible from codes.

    Returns (centroids, codebooks, codes):
      centroids — (cell, centroid), O(n_cells) rows;
      codebooks — (subspace, code, centroid) residual codebooks,
                  m * n_codes rows;
      codes     — (id, cell, codes: m bytes, norm), one row per vector.
    At scale, write `codes` PARTITIONED BY cell: ivfpq_query_topk filters
    on probed cells, so the scan prunes to nprobe/n_cells of the corpus
    before touching any bytes. Training is bounded exactly like IVF's and
    PQ's: seeded total-ordered hash samples + driver-side Lloyd; the
    corpus is never collected.
    """
    cent = _ivf_centroids(df, id_col, vec_col, n_cells, seed)
    samp = _seeded_sample(df, id_col, vec_col, sample_n)
    sampn = samp / (np.linalg.norm(samp, axis=1, keepdims=True) + 1e-12)
    resid = sampn - cent[np.argmax(sampn @ cent.T, axis=1)]
    books = _pq_lloyd(resid, m, n_codes, seed + 1, iters=8,
                      ctx="ivfpq_build_index")
    dsub = books.shape[2]
    books_sq = (books * books).sum(axis=2)

    def encode_fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if mat.shape[1] != m * dsub:
                raise ValueError(
                    f"ivfpq encode: dim {mat.shape[1]} != codebook {m * dsub}"
                )
            matn = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12)
            cells = np.argmax(matn @ cent.T, axis=1)
            res = matn - cent[cells]
            codes = np.empty((mat.shape[0], m), dtype=np.uint8)
            for s in range(m):
                x = res[:, s * dsub:(s + 1) * dsub]
                d2 = -2.0 * (x @ books[s].T) + books_sq[s]
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame({
                "id": pdf[id_col],
                "cell": cells.astype(np.int32),
                "codes": [c.tobytes() for c in codes],
                "norm": np.linalg.norm(mat, axis=1),
            })

    codes_df = df.select(id_col, vec_col).mapInPandas(
        encode_fn, schema="id long, cell int, codes binary, norm double"
    )
    spark = df.sparkSession
    centroids = spark.createDataFrame(
        [(int(i), [float(v) for v in cent[i]]) for i in range(cent.shape[0])],
        "cell int, centroid array<double>",
    )
    return centroids, _books_frame(spark, books), codes_df


def ivfpq_query_topk(
    centroids: DataFrame,
    codebooks: DataFrame,
    codes_df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Serve approximate cosine top-k from an IVFADC index: candidates
    come only from each query's nprobe nearest cells, and score without
    decompression via the residual decomposition over the UNIT vector
    v̂ = v/|v| the index encodes (see ivfpq_build_index):
    cos(q, v) = dot(q, v̂)/|q| = (dot(q, c_cell) + dot(q, v̂ − c_cell))/|q|
              ≈ (dot(q, c_cell) + Σ_s LUT[q, s, code_s]) / |q|
    — the centroid term is one gather from a precomputed (Q, n_cells)
    matrix, the residual term m LUT gathers, both exact in the
    decomposition (only the residual is quantized).

    Distribution shape: queries collect driver-side (O(Q) serving
    contract, like ivf_query_topk / pq_query_topk); the codes scan is
    map-only over `cell IN (probed)` — partition-pruned when the codes
    table is written partitioned by cell — with per-partition top-k, so
    only Q * k rows per partition reach the final window."""
    crows = sorted(centroids.collect(), key=lambda r: r["cell"])
    if [r["cell"] for r in crows] != list(range(len(crows))):
        raise ValueError(
            "centroids frame must carry contiguous cell ids 0..n-1 "
            "(as produced by ivfpq_build_index)"
        )
    cent = np.array([r["centroid"] for r in crows], dtype=np.float64)
    books = _codebooks_np(codebooks)
    m, _, dsub = books.shape
    qrows = queries.select(
        F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv")
    ).collect()
    if not qrows:
        raise ValueError("ivfpq_query_topk: empty query batch")
    qids = np.array([r["_qid"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["_qv"] for r in qrows], dtype=np.float64)
    if qmat.shape[1] != m * dsub:
        raise ValueError(
            f"ivfpq_query_topk: query dim {qmat.shape[1]} != "
            f"codebook {m * dsub}"
        )
    qnorm = np.linalg.norm(qmat, axis=1) + 1e-12
    qc = qmat @ cent.T  # (Q, n_cells): the dot(q, c_cell) term
    nprobe = min(nprobe, cent.shape[0])
    # probe order under cosine == order of qc within a query (positive
    # per-row scaling), so qc serves both purposes
    probes = np.argsort(-qc, axis=1)[:, :nprobe]
    luts = np.einsum("qsd,scd->qsc", qmat.reshape(-1, m, dsub), books)
    probed = sorted({int(c) for row in probes for c in row})

    def fn(batches):
        sub = np.arange(m)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf["codes"]), dtype=np.uint8
            ).reshape(n, m)
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            ids = pdf["id"].to_numpy(dtype=np.int64)
            frames = []
            for qi in range(qids.shape[0]):
                mask = np.isin(cells, probes[qi])
                if exclude_self:
                    mask &= ids != qids[qi]
                if not mask.any():
                    continue
                dots = (
                    qc[qi, cells[mask]]
                    + luts[qi][sub, codes[mask]].sum(axis=1)
                )
                cos = dots / qnorm[qi]
                kk = min(k, cos.shape[0])
                top = np.argpartition(-cos, kk - 1)[:kk]
                frames.append(pd.DataFrame({
                    "query_id": qids[qi],
                    "cand_id": ids[mask][top],
                    "cos": cos[top],
                }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    local = (
        codes_df.filter(F.col("cell").isin(probed))
        .select("id", "cell", "codes")  # norm unused under cosine: prune it
        .mapInPandas(fn, schema="query_id long, cand_id long, cos double")
    )
    wrank = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        local.withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cos")
    )


def ann_ivfpq_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    nprobe: int = 2,
    m: int = 8,
    n_codes: int = 256,
    seed: int = 7,
    query_filter=None,
    rerank: int = 4,
) -> DataFrame:
    """IVFADC approximate cosine top-k end to end (build -> probe ->
    ADC-scan probed cells -> exact re-rank): the composed scale path —
    IVF prunes the scan to nprobe/n_cells of the corpus, PQ shrinks what
    remains to m bytes a vector, and the broadcast re-rank (pq_rerank)
    restores exact ordering on the shortlist. This is the shape that
    serves 10^9+ vectors: the codes index fits in cluster RAM, raw
    vectors stay in object storage and are touched only for the
    Q * rerank * k shortlist rows."""
    cents, books, codes = ivfpq_build_index(
        df, id_col, vec_col, n_cells=n_cells, m=m, n_codes=n_codes,
        seed=seed,
    )
    q = df.select(id_col, vec_col)
    if query_filter is not None:
        q = q.filter(query_filter(F.col(id_col)))
    shortlist_k = k * rerank if rerank else k
    adc = ivfpq_query_topk(
        cents, books, codes, q, k=shortlist_k, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, exclude_self=True,
    )
    if not rerank:
        return adc
    return pq_rerank(adc, df, q, k=k, id_col=id_col, vec_col=vec_col)


def embedding_dup_clusters(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 7,
    tie_stable_round: bool = False,
    max_iter: int = 25,
) -> DataFrame:
    """Semantic (embedding-cosine) near-duplicate clusters: (id, label).

    The embedding-space twin of the text dedup tiers: edges are pairs
    whose EXACT cosine is >= threshold, candidates come from multi-table
    random-hyperplane LSH buckets (`method="lsh"`, the scale path — the
    pair join shuffles on (table, bucket), never the cross product) or
    from the full cross product (`method="brute"`, the labeled
    small-domain baseline the DuckDB oracle replays). Components are then
    collapsed with the same min-label propagation as the text-side
    dup_clusters, so text and embedding dedup agree on representative
    semantics (label = min reachable id).

    `tie_stable_round` rounds the cosine half-up at 4dp
    (floor(cos*1e4 + 0.500001)/1e4 — e.g. 0.94996 -> 0.9500, INCLUDED
    at threshold 0.95) before the threshold test so an independent
    engine summing the dot product in a different order cannot flip
    membership of a boundary pair — the cross-engine-reproducibility
    mode the driver oracle uses.
    """
    from feasts_spark.operators.dedup import dup_clusters

    if method == "brute":
        a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("ea"))
        b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("eb"))
        cand = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        p = lsh_project(df, id_col, vec_col, n_planes, n_tables, seed)
        a = p.select(
            F.col("id").alias("id_a"), F.col("vec").alias("ea"),
            "table", "bucket",
        )
        b = p.select(
            F.col("id").alias("id_b"), F.col("vec").alias("eb"),
            "table", "bucket",
        )
        # same-pair collisions in several tables just re-derive the same
        # edge; dup_clusters distincts the edge set, so no pre-dedup join
        cand = (
            a.join(b, ["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "ea", "id_b", "eb")
        )
    else:
        raise ValueError(f"unknown method: {method!r}")
    cos = F.expr(_COS.format(a="ea", b="eb"))
    if tie_stable_round:
        cos = F.floor(cos * F.lit(1e4) + F.lit(0.500001)) / F.lit(1e4)
    edges = (
        cand.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )
    return dup_clusters(edges, max_iter=max_iter)
