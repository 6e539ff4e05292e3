"""LSH ANN recall vs brute force; text-analysis operators; series_stats."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from feasts_spark.operators.similarity import ann_lsh_topk, brute_force_topk
from feasts_spark.operators.dedup import ngram_containment
from feasts_spark.operators.text import (
    fingerprints,
    language_scores,
    quality_scores,
    repetition_scores,
    token_stats,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


class TestAnnLsh:
    def test_recall_vs_brute_force(self, spark, emb):
        qf = lambda c: c < 20  # noqa: E731
        exact = brute_force_topk(emb, k=5, query_filter=qf).toPandas()
        approx = ann_lsh_topk(emb, k=5, n_planes=4, query_filter=qf).toPandas()
        hits = 0
        total = 0
        for qid, grp in exact.groupby("query_id"):
            truth = set(grp["cand_id"])
            got = set(approx[approx["query_id"] == qid]["cand_id"])
            hits += len(truth & got)
            total += len(truth)
        recall = hits / total
        # 4 tables x 4-bit LSH + hamming-1 multiprobe: measured 0.92 on
        # this fixture; assert with headroom against plane-draw variance.
        assert recall >= 0.85, f"recall {recall:.2f}"

    def test_deterministic(self, spark, emb):
        a = ann_lsh_topk(emb, k=3, query_filter=lambda c: c < 5).toPandas()
        b = ann_lsh_topk(emb, k=3, query_filter=lambda c: c < 5).toPandas()
        key = ["query_id", "rank"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert (a["cand_id"] == b["cand_id"]).all()

    def test_topk_sorted_desc(self, spark, emb):
        out = ann_lsh_topk(emb, k=5, query_filter=lambda c: c < 5).toPandas()
        for _, grp in out.groupby("query_id"):
            cos = grp.sort_values("rank")["cos"].to_numpy()
            assert (np.diff(cos) <= 1e-12).all()


class TestText:
    def test_token_stats_counts(self, spark):
        df = spark.createDataFrame(
            [(0, "Hello, world! 42 times"), (1, "abc")], "doc_id long, text string"
        )
        out = token_stats(df).orderBy("doc_id").toPandas()
        # Hello , world ! 42 times -> 6 bpe pieces; 1 number run; 2 punct
        assert out.loc[0, "n_ws_tokens"] == 4
        assert out.loc[0, "n_bpe_pieces"] == 6
        assert out.loc[0, "n_number_runs"] == 1
        assert out.loc[0, "n_punct"] == 2
        assert out.loc[1, "n_bpe_pieces"] == 1

    def test_language_id_argmax(self, spark):
        df = spark.createDataFrame(
            [
                (0, "the cat is in the house and that is that"),
                (1, "der hund ist nicht auf der wiese und das ist gut"),
                (2, "le chat est pour les amis et une souris"),
            ],
            "doc_id long, text string",
        )
        out = language_scores(df).orderBy("doc_id").toPandas()
        assert list(out["pred_lang"]) == ["en", "de", "fr"]

    def test_quality_monotone_length(self, spark):
        df = spark.createDataFrame(
            [(0, "word " * 100), (1, "word")], "doc_id long, text string"
        )
        out = quality_scores(df).orderBy("doc_id").toPandas()
        assert out.loc[0, "quality_score"] > out.loc[1, "quality_score"]

    def test_repetition_hand_computed(self, spark):
        df = spark.createDataFrame(
            [(0, "a b a b a c"), (1, "x y z")], "doc_id long, text string"
        )
        out = repetition_scores(df).orderBy("doc_id").toPandas()
        # doc 0: 2-grams [ab, ba, ab, ba, ac] -> total 5, distinct 3;
        # tie at count 2 breaks to lexicographically smallest "a b"
        assert out.loc[0, "total_2grams"] == 5
        assert out.loc[0, "dup_2gram_frac"] == pytest.approx(0.4)
        assert out.loc[0, "top_2gram"] == "a b"
        assert out.loc[0, "top_2gram_count"] == 2
        # 2 occurrences x 2 chars ("ab") / 6 word chars
        assert out.loc[0, "top_2gram_char_frac"] == pytest.approx(0.6667)
        # doc 0: 3-grams [aba, bab, aba, bac] -> "a b a" twice, covers all
        assert out.loc[0, "dup_3gram_frac"] == pytest.approx(0.25)
        assert out.loc[0, "top_3gram"] == "a b a"
        assert out.loc[0, "top_3gram_char_frac"] == pytest.approx(1.0)
        # doc 1: no repeats; short-doc 3-gram degenerates to the whole text
        assert out.loc[1, "dup_2gram_frac"] == pytest.approx(0.0)
        assert out.loc[1, "total_3grams"] == 1
        assert out.loc[1, "top_3gram_char_frac"] == pytest.approx(1.0)

    def test_repetition_bounds_on_corpus(self, spark, docs):
        out = repetition_scores(docs).toPandas()
        assert len(out) == docs.count()
        for c in ("dup_2gram_frac", "dup_3gram_frac",
                  "top_2gram_char_frac", "top_3gram_char_frac"):
            assert (out[c] >= 0).all() and (out[c] <= 1).all(), c
        # this synthetic corpus draws ~60 tokens from a ~40-word vocabulary:
        # 2-gram repetition must actually trigger somewhere
        assert (out["dup_2gram_frac"] > 0).any()

    def test_containment_hand_computed(self, spark):
        ev = spark.createDataFrame(
            [(0, "a b c d"), (1, "q r s t")], "doc_id long, text string"
        )
        tr = spark.createDataFrame(
            [(100, "z z a b c")], "doc_id long, text string"
        )
        out = (
            ngram_containment(ev, tr, n=3).orderBy("doc_id").toPandas()
        )
        # doc 0 grams {abc, bcd}; train has abc -> 1/2
        assert out.loc[0, "n_grams"] == 2
        assert out.loc[0, "n_hits"] == 1
        assert out.loc[0, "containment"] == pytest.approx(0.5)
        # doc 1: zero hits still yields a row with containment 0
        assert out.loc[1, "n_hits"] == 0
        assert out.loc[1, "containment"] == pytest.approx(0.0)

    def test_containment_sub_n_docs_emit_no_grams(self, spark):
        """ADVICE r03: docs shorter than n have no n-grams — a 2-token
        eval doc emits no row (nothing to contaminate), and a 2-token
        train doc contributes no truncated gram for longer eval grams to
        spuriously hit."""
        ev = spark.createDataFrame(
            [(0, "a b"), (1, "a b c")], "doc_id long, text string"
        )
        tr = spark.createDataFrame(
            [(100, "a b"), (101, "x y z")], "doc_id long, text string"
        )
        out = ngram_containment(ev, tr, n=3).orderBy("doc_id").toPandas()
        assert list(out["doc_id"]) == [1]  # sub-n eval doc 0: no row
        # train doc 100 ("a b") must NOT have produced the truncated
        # gram "a b"; eval doc 1's single gram "a b c" has no train hit
        assert out.loc[0, "n_grams"] == 1
        assert out.loc[0, "n_hits"] == 0

    def test_fingerprint_stability(self, spark, docs):
        a = fingerprints(docs).orderBy("doc_id").toPandas()
        b = fingerprints(docs).orderBy("doc_id").toPandas()
        assert (a["fingerprint"] == b["fingerprint"]).all()
        # identical text -> identical fingerprint
        df = spark.createDataFrame(
            [(0, "SAME same text body here"), (1, "same SAME text body here")],
            "doc_id long, text string",
        )
        out = fingerprints(df).toPandas()
        # lowercased shingles differ between these two (word order), but
        # case must not matter for identical strings:
        df2 = spark.createDataFrame(
            [(0, "Casing Differs Only"), (1, "cAsInG dIfFeRs OnLy")],
            "doc_id long, text string",
        )
        out2 = fingerprints(df2).toPandas()
        assert out2.loc[0, "fingerprint"] == out2.loc[1, "fingerprint"]


class TestSeriesStats:
    def test_matches_kernel_direct(self, spark):
        from feasts_spark.kernels.stat_tests import ljung_box
        from feasts_spark.operators.series_stats import series_stats

        rows = [("a", i, float(np.sin(i / 3) * 10 + i)) for i in range(40)]
        df = spark.createDataFrame(rows, "series_key string, t int, v double")
        out = series_stats(
            df, ljung_box, ["lb_stat", "lb_pvalue"], order_col="t", value_col="v",
            lag=10,
        ).toPandas()
        x = np.array([r[2] for r in rows])
        expect = ljung_box(x, lag=10)
        assert out.loc[0, "lb_stat"] == pytest.approx(expect["lb_stat"], rel=1e-12)
        assert out.loc[0, "lb_pvalue"] == pytest.approx(expect["lb_pvalue"], rel=1e-9)


class TestAnnIvf:
    def test_recall_and_determinism(self, spark, emb):
        from feasts_spark.operators.similarity import ann_ivf_topk

        qf = lambda c: c < 20  # noqa: E731
        exact = brute_force_topk(emb, k=5, query_filter=qf).toPandas()
        approx = ann_ivf_topk(
            emb, k=5, n_cells=8, nprobe=3, query_filter=qf
        ).toPandas()
        hits = total = 0
        for qid, grp in exact.groupby("query_id"):
            truth = set(grp["cand_id"])
            got = set(approx[approx["query_id"] == qid]["cand_id"])
            hits += len(truth & got)
            total += len(truth)
        # near-random 64-d vectors are IVF's worst case; measured 0.70 at
        # nprobe=3/8 (37% scan) — assert with headroom
        assert hits / total >= 0.55, f"recall {hits/total:.2f}"
        again = ann_ivf_topk(
            emb, k=5, n_cells=8, nprobe=3, query_filter=qf
        ).toPandas()
        key = ["query_id", "rank"]
        a = approx.sort_values(key).reset_index(drop=True)
        b = again.sort_values(key).reset_index(drop=True)
        assert (a["cand_id"] == b["cand_id"]).all()


class TestEmbeddingDupClusters:
    def test_planted_duplicate_groups(self, spark):
        """Identical and near-identical embeddings must cluster to the min
        id; unrelated vectors stay out. LSH and brute agree on planted
        duplicates (identical vectors always share every LSH bucket)."""
        import numpy as np

        from feasts_spark.operators.similarity import embedding_dup_clusters

        rng = np.random.default_rng(11)
        base1 = rng.standard_normal(16)
        base2 = rng.standard_normal(16)
        rows = []
        # group A: ids 0,1,2 — identical / tiny perturbation of base1
        rows.append((0, base1))
        rows.append((1, base1.copy()))
        rows.append((2, base1 + 0.001 * rng.standard_normal(16)))
        # group B: ids 10, 11 — identical copies of base2
        rows.append((10, base2))
        rows.append((11, base2.copy()))
        # noise: ids 20..29 random
        for i in range(20, 30):
            rows.append((i, rng.standard_normal(16)))
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<double>",
        )
        for method in ("brute", "lsh"):
            got = (
                embedding_dup_clusters(
                    df, threshold=0.99, method=method, n_planes=4, n_tables=4
                )
                .toPandas()
                .set_index("id")["label"]
                .to_dict()
            )
            assert got[0] == got[1] == got[2] == 0, (method, got)
            assert got[10] == got[11] == 10, (method, got)
            assert all(i not in got for i in range(20, 30)), (method, got)

    def test_threshold_excludes(self, spark):
        import numpy as np

        from feasts_spark.operators.similarity import embedding_dup_clusters

        rng = np.random.default_rng(5)
        a = rng.standard_normal(8)
        df = spark.createDataFrame(
            [(0, [float(x) for x in a]), (1, [float(x) for x in a]),
             (2, [float(x) for x in rng.standard_normal(8)])],
            "vec_id long, embedding array<double>",
        )
        got = embedding_dup_clusters(df, threshold=0.999, method="brute").toPandas()
        assert set(got["id"]) == {0, 1}


class TestIvfIndexServe:
    def test_build_query_equals_end_to_end(self, spark, emb):
        from feasts_spark.operators.similarity import (
            ann_ivf_topk,
            ivf_build_index,
            ivf_query_topk,
        )

        qf = lambda c: c < 15  # noqa: E731
        direct = ann_ivf_topk(
            emb, k=5, n_cells=8, nprobe=3, query_filter=qf
        ).toPandas()
        centroids, assignments = ivf_build_index(emb, n_cells=8)
        served = ivf_query_topk(
            centroids, assignments, emb.filter(qf(F.col("vec_id"))),
            k=5, nprobe=3, exclude_self=True,
        ).toPandas()
        key = ["query_id", "rank"]
        a = direct.sort_values(key).reset_index(drop=True)
        b = served.sort_values(key).reset_index(drop=True)
        assert len(a) == len(b) > 0
        assert (a["cand_id"].to_numpy() == b["cand_id"].to_numpy()).all()
        np.testing.assert_allclose(
            a["cos"].to_numpy(), b["cos"].to_numpy(), rtol=1e-12
        )

    def test_external_queries(self, spark, emb):
        # queries NOT in the index: perturbed copies of corpus vectors —
        # the serving path must return k neighbors per query and the
        # perturbation source must rank first (it's the nearest vector)
        from feasts_spark.operators.similarity import (
            ivf_build_index,
            ivf_query_topk,
        )

        centroids, assignments = ivf_build_index(emb, n_cells=8)
        src = emb.filter(F.col("vec_id") < 5).toPandas()
        rng = np.random.RandomState(0)
        rows = []
        for r in src.itertuples():
            v = np.array(r.embedding, dtype=np.float64)
            v = v + rng.standard_normal(v.size) * 1e-3 * np.linalg.norm(v)
            rows.append((int(r.vec_id) + 100000, [float(x) for x in v]))
        queries = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = ivf_query_topk(
            centroids, assignments, queries, k=3, nprobe=3
        ).toPandas()
        assert set(out["query_id"]) == {100000 + i for i in range(5)}
        assert (out.groupby("query_id").size() == 3).all()
        top1 = out[out["rank"] == 1].set_index("query_id")["cand_id"]
        for qid, cand in top1.items():
            assert cand == qid - 100000


class TestIvfScaleParams:
    def test_param_math(self):
        from feasts_spark.operators.similarity import ivf_params

        # documented formulas: n_cells=clip(sqrt(N),1,4096),
        # sample=clip(64*n_cells, 4096, 262144), nprobe~n_cells/16
        p = ivf_params(500)
        assert p == {"n_cells": 22, "sample_n": 4096, "nprobe": 2}
        p = ivf_params(1_000_000)
        assert p["n_cells"] == 1000 and p["sample_n"] == 64_000
        assert p["nprobe"] == 62
        p = ivf_params(10**9)
        assert p == {"n_cells": 4096, "sample_n": 262_144, "nprobe": 256}
        assert ivf_params(1)["n_cells"] == 1

    def test_recall_at_10x_corpus(self, spark):
        """Corpus-scaled auto params on a 10x corpus (5000 vectors, 64-d,
        clustered like real embeddings): recall@5 >= 0.9 vs brute force.
        The fixed round-3 defaults (n_cells=8 trained on a 4096-row
        sample) are replaced by ivf_params-derived (71 cells, all-rows
        sample, nprobe 4) purely from the corpus count."""
        import numpy as np

        from feasts_spark.operators.similarity import (
            ann_ivf_topk,
            brute_force_topk,
            ivf_params,
        )

        rng = np.random.default_rng(11)
        n, dim, n_clusters = 5000, 64, 100
        centers = rng.standard_normal((n_clusters, dim))
        assign = rng.integers(0, n_clusters, n)
        vecs = centers[assign] + rng.standard_normal((n, dim)) * 0.25
        emb10 = spark.createDataFrame(
            [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        ).repartition(8)

        p = ivf_params(n)
        assert p["n_cells"] == 71  # sqrt(5000) ~ 70.7

        qf = lambda c: c < 25  # noqa: E731
        exact = brute_force_topk(emb10, k=5, query_filter=qf).toPandas()
        approx = ann_ivf_topk(
            emb10, k=5, n_cells=None, nprobe=None, query_filter=qf
        ).toPandas()
        hits = total = 0
        for qid, grp in exact.groupby("query_id"):
            truth = set(grp["cand_id"])
            got = set(approx[approx["query_id"] == qid]["cand_id"])
            hits += len(truth & got)
            total += len(truth)
        assert total == 125
        assert hits / total >= 0.9, f"recall {hits/total:.2f}"
