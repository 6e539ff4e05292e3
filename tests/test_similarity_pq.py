"""Product-quantization ANN path (train / encode / ADC serve).

The memory-bound third leg of the ANN tier (next to LSH bucket pruning
and IVF cell pruning): vectors compress to m uint8 codes + 1 float norm,
queries score candidates via asymmetric distance (per-query LUT gathers)
without ever decompressing. Reference scope: this is pipeline
infrastructure the reference (an in-memory R feature library) does not
have; semantics follow Jégou et al. 2011.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from feasts_spark.operators.similarity import (
    ann_pq_topk,
    brute_force_topk,
    pq_encode,
    pq_query_topk,
    pq_train,
)


@pytest.fixture(scope="module")
def clustered(spark):
    """Embedding-shaped corpus: 1200 x 32-d around 40 cluster centers."""
    rng = np.random.default_rng(5)
    n, dim, n_clusters = 1200, 32, 40
    centers = rng.standard_normal((n_clusters, dim))
    assign = rng.integers(0, n_clusters, n)
    vecs = centers[assign] + rng.standard_normal((n, dim)) * 0.2
    return spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(8)


class TestPqCodec:
    def test_dim_not_divisible_raises(self, spark, clustered):
        with pytest.raises(ValueError, match="not divisible"):
            pq_train(clustered, m=5)

    def test_codes_shape_and_compression(self, spark, clustered):
        books = pq_train(clustered, m=8, n_codes=64)
        codes = pq_encode(clustered, books).toPandas()
        assert len(codes) == 1200
        # m bytes per vector: 32 float64 (256 B) -> 8 B, 32x
        assert (codes["codes"].map(len) == 8).all()
        norms = codes.sort_values("id")["norm"].to_numpy()
        assert (norms > 0).all()

    def test_encode_partition_invariant(self, spark, clustered):
        books = pq_train(clustered, m=4, n_codes=32)
        a = (
            pq_encode(clustered.repartition(3), books)
            .toPandas().sort_values("id").reset_index(drop=True)
        )
        b = (
            pq_encode(clustered.coalesce(1), books)
            .toPandas().sort_values("id").reset_index(drop=True)
        )
        assert (a["codes"] == b["codes"]).all()
        np.testing.assert_allclose(
            a["norm"].to_numpy(), b["norm"].to_numpy(), rtol=1e-12
        )

    def test_reconstruction_distortion_bounded(self, spark, clustered):
        """Codebook reconstruction must capture most of the energy on
        clustered data (the regime PQ is built for)."""
        books_df = pq_train(clustered, m=8, n_codes=64)
        books = {
            (r["subspace"], r["code"]): np.array(r["centroid"])
            for r in books_df.collect()
        }
        pdf = clustered.toPandas()
        codes = pq_encode(clustered, books_df).toPandas().set_index("id")
        errs, norms = [], []
        for r in pdf.itertuples():
            v = np.array(r.embedding)
            c = np.frombuffer(codes.loc[r.vec_id, "codes"], dtype=np.uint8)
            rec = np.concatenate([books[(s, int(c[s]))] for s in range(8)])
            errs.append(np.linalg.norm(v - rec))
            norms.append(np.linalg.norm(v))
        rel = np.array(errs) / np.array(norms)
        assert rel.mean() < 0.35, f"mean relative distortion {rel.mean():.3f}"


class TestPqServe:
    @staticmethod
    def _recall(exact, approx):
        hits = total = 0
        for qid, grp in exact.groupby("query_id"):
            truth = set(grp["cand_id"])
            got = set(approx[approx["query_id"] == qid]["cand_id"])
            hits += len(truth & got)
            total += len(truth)
        return hits, total

    def test_recall_vs_brute(self, spark, clustered):
        """m=16 x 256 codes + 4k-shortlist exact re-rank: >= 0.9 recall@5.
        The clustered corpus is the hard regime on purpose — within-cluster
        cosines are near-ties, so pure ADC ordering scrambles inside
        quantization noise and the re-rank stage is what recovers it (the
        Jégou serving recipe)."""
        qf = lambda c: c < 25  # noqa: E731
        exact = brute_force_topk(clustered, k=5, query_filter=qf).toPandas()
        approx = ann_pq_topk(
            clustered, k=5, m=16, n_codes=256, query_filter=qf, rerank=4
        ).toPandas()
        hits, total = self._recall(exact, approx)
        assert total == 125
        assert hits / total >= 0.9, f"recall {hits / total:.2f}"
        # pure ADC (rerank=0) serves from codes alone: much cheaper, and
        # on near-tie data measurably worse — pin the ordering of the two
        # modes so a rerank regression is caught
        adc_only = ann_pq_topk(
            clustered, k=5, m=16, n_codes=256, query_filter=qf, rerank=0
        ).toPandas()
        hits0, _ = self._recall(exact, adc_only)
        assert hits0 / total >= 0.3
        assert hits0 <= hits

    def test_external_queries_and_split_serving(self, spark, clustered):
        """build/serve split with queries NOT in the codes table: the
        perturbation source must rank first, and k rows come back per
        query."""
        from feasts_spark.operators.similarity import pq_rerank

        books = pq_train(clustered, m=16, n_codes=256)
        codes = pq_encode(clustered, books)
        src = clustered.filter(F.col("vec_id") < 5).toPandas()
        rng = np.random.RandomState(0)
        rows = []
        for r in src.itertuples():
            v = np.array(r.embedding, dtype=np.float64)
            v = v + rng.standard_normal(v.size) * 1e-3 * np.linalg.norm(v)
            rows.append((int(r.vec_id) + 100000, [float(x) for x in v]))
        queries = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        short = pq_query_topk(books, codes, queries, k=10)
        assert set(short.toPandas()["query_id"]) == {
            100000 + i for i in range(5)
        }
        out = pq_rerank(short, clustered, queries, k=3).toPandas()
        assert (out.groupby("query_id").size() == 3).all()
        top1 = out[out["rank"] == 1].set_index("query_id")["cand_id"]
        for qid, cand in top1.items():
            assert cand == qid - 100000

    def test_exclude_self_drops_trivial_match(self, spark, clustered):
        books = pq_train(clustered, m=16, n_codes=256)
        codes = pq_encode(clustered, books)
        q = clustered.filter(F.col("vec_id") < 10)
        out = pq_query_topk(
            books, codes, q, k=5, exclude_self=True
        ).toPandas()
        assert not (out["query_id"] == out["cand_id"]).any()
        out2 = pq_query_topk(books, codes, q, k=5).toPandas()
        # without exclusion the self codes place in the ADC top-5 for
        # every query (top-1 is NOT guaranteed: ADC self-similarity is
        # 1 - distortion, inside quantization noise of near-tie cluster
        # mates — which is exactly why rerank exists)
        in_top5 = (
            out2[out2["query_id"] == out2["cand_id"]]
            .groupby("query_id").size()
        )
        # data-dependent: ADC noise can push a self past rank 5 on a few
        # queries (observed 9/10 on this corpus) — assert the behavior,
        # not a guarantee ADC doesn't make
        assert len(in_top5) >= 7

    def test_query_dim_mismatch_raises(self, spark, clustered):
        books = pq_train(clustered, m=8, n_codes=16)
        codes = pq_encode(clustered, books)
        bad = spark.createDataFrame(
            [(1, [0.0] * 16)], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="query dim"):
            pq_query_topk(books, codes, bad, k=3)

    def test_empty_query_batch_raises(self, spark, clustered):
        books = pq_train(clustered, m=8, n_codes=16)
        codes = pq_encode(clustered, books)
        with pytest.raises(ValueError, match="empty query batch"):
            pq_query_topk(
                books, codes, clustered.filter(F.col("vec_id") < 0), k=3
            )


class TestIvfPq:
    """IVFADC: coarse cells + PQ over residuals (Jégou et al. 2011)."""

    def test_recall_with_rerank(self, spark, clustered):
        """Probing half the cells + exact re-rank: >= 0.9 recall@5 on the
        near-tie clustered corpus."""
        from feasts_spark.operators.similarity import ann_ivfpq_topk

        qf = lambda c: c < 25  # noqa: E731
        exact = brute_force_topk(clustered, k=5, query_filter=qf).toPandas()
        approx = ann_ivfpq_topk(
            clustered, k=5, n_cells=16, nprobe=8, m=16, n_codes=256,
            query_filter=qf, rerank=4,
        ).toPandas()
        hits = total = 0
        for qid, grp in exact.groupby("query_id"):
            truth = set(grp["cand_id"])
            got = set(approx[approx["query_id"] == qid]["cand_id"])
            hits += len(truth & got)
            total += len(truth)
        assert total == 125
        assert hits / total >= 0.9, f"recall {hits / total:.2f}"

    def test_candidates_come_only_from_probed_cells(self, spark, clustered):
        """The cell-pruning contract: every served candidate's cell is in
        its query's probe set (recomputed independently here)."""
        from feasts_spark.operators.similarity import (
            ivfpq_build_index,
            ivfpq_query_topk,
        )

        cents, books, codes = ivfpq_build_index(
            clustered, n_cells=16, m=8, n_codes=64
        )
        q = clustered.filter(F.col("vec_id") < 15)
        out = ivfpq_query_topk(
            cents, books, codes, q, k=5, nprobe=3, exclude_self=True
        ).toPandas()
        assert (out.groupby("query_id").size() <= 5).all()
        cent = np.array(
            [r["centroid"] for r in sorted(
                cents.collect(), key=lambda r: r["cell"])]
        )
        cell_of = codes.select("id", "cell").toPandas().set_index("id")["cell"]
        qv = {
            r["vec_id"]: np.array(r["embedding"])
            for r in q.collect()
        }
        for row in out.itertuples():
            probes = np.argsort(-(qv[row.query_id] @ cent.T))[:3]
            assert cell_of[row.cand_id] in probes
            assert row.cand_id != row.query_id

    def test_residual_adc_beats_raw_pq_adc(self, spark, clustered):
        """The reason IVFADC quantizes residuals: at the SAME code budget
        and full probe coverage (no pruning penalty), residual ADC must
        recall at least as well as raw-vector PQ ADC on clustered data —
        residuals concentrate near zero so the codebook spends its
        resolution where the data is. Budget m=16/n_codes=256 (128 bits):
        below that, BOTH paths drown in the corpus's same-cluster
        near-ties (measured 0.24 vs 0.24 at m=8/64) and the comparison is
        noise; at it the gap is real (measured 0.504 vs 0.416)."""
        from feasts_spark.operators.similarity import (
            ann_ivfpq_topk,
            ann_pq_topk,
        )

        qf = lambda c: c < 25  # noqa: E731
        exact = brute_force_topk(clustered, k=5, query_filter=qf).toPandas()

        def recall(approx):
            hits = 0
            for qid, grp in exact.groupby("query_id"):
                got = set(approx[approx["query_id"] == qid]["cand_id"])
                hits += len(set(grp["cand_id"]) & got)
            return hits / len(exact)

        r_ivfpq = recall(ann_ivfpq_topk(
            clustered, k=5, n_cells=16, nprobe=16, m=16, n_codes=256,
            query_filter=qf, rerank=0,
        ).toPandas())
        r_pq = recall(ann_pq_topk(
            clustered, k=5, m=16, n_codes=256, query_filter=qf, rerank=0,
        ).toPandas())
        assert r_ivfpq >= r_pq, f"ivfpq {r_ivfpq:.2f} < pq {r_pq:.2f}"
        assert r_ivfpq >= 0.45

    def test_external_queries(self, spark, clustered):
        """Serving queries that are not index members: the perturbation
        source must come back top-1 after re-rank."""
        from feasts_spark.operators.similarity import (
            ivfpq_build_index,
            ivfpq_query_topk,
            pq_rerank,
        )

        cents, books, codes = ivfpq_build_index(
            clustered, n_cells=16, m=16, n_codes=256
        )
        src = clustered.filter(F.col("vec_id") < 5).toPandas()
        rng = np.random.RandomState(1)
        rows = []
        for r in src.itertuples():
            v = np.array(r.embedding, dtype=np.float64)
            v = v + rng.standard_normal(v.size) * 1e-3 * np.linalg.norm(v)
            rows.append((int(r.vec_id) + 100000, [float(x) for x in v]))
        queries = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        short = ivfpq_query_topk(cents, books, codes, queries, k=12, nprobe=8)
        out = pq_rerank(short, clustered, queries, k=3).toPandas()
        assert (out.groupby("query_id").size() == 3).all()
        top1 = out[out["rank"] == 1].set_index("query_id")["cand_id"]
        for qid, cand in top1.items():
            assert cand == qid - 100000

    def test_encode_partition_invariant(self, spark, clustered):
        from feasts_spark.operators.similarity import ivfpq_build_index

        _, _, a = ivfpq_build_index(
            clustered.repartition(3), n_cells=8, m=4, n_codes=32
        )
        _, _, b = ivfpq_build_index(
            clustered.coalesce(1), n_cells=8, m=4, n_codes=32
        )
        pa = a.toPandas().sort_values("id").reset_index(drop=True)
        pb = b.toPandas().sort_values("id").reset_index(drop=True)
        assert (pa["cell"] == pb["cell"]).all()
        assert (pa["codes"] == pb["codes"]).all()

    def test_error_paths(self, spark, clustered):
        from feasts_spark.operators.similarity import (
            ivfpq_build_index,
            ivfpq_query_topk,
        )

        cents, books, codes = ivfpq_build_index(
            clustered, n_cells=4, m=8, n_codes=16
        )
        with pytest.raises(ValueError, match="empty query batch"):
            ivfpq_query_topk(
                cents, books, codes,
                clustered.filter(F.col("vec_id") < 0), k=3,
            )
        bad = spark.createDataFrame(
            [(1, [0.0] * 16)], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="query dim"):
            ivfpq_query_topk(cents, books, codes, bad, k=3)
        with pytest.raises(ValueError, match="contiguous cell ids"):
            ivfpq_query_topk(
                cents.filter(F.col("cell") > 0), books, codes,
                clustered.filter(F.col("vec_id") < 3), k=3,
            )
