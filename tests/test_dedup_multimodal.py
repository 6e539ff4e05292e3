"""Dedup (exact / n-gram Jaccard / MinHash LSH / SimHash) and multimodal
plumbing tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feasts_spark.operators.dedup import (
    exact_dedup,
    minhash_estimate,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from feasts_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def doc_df(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different content about spark rollup tiers and gorilla"
    rows = [
        (0, base), (1, base),          # exact dup
        (2, near),                     # near dup of 0/1
        (3, far), (4, far + " extra"),  # near dups of each other
        (5, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _jaccard(a: str, b: str, n=3):
    ta, tb = a.lower().split(), b.lower().split()
    sa = {" ".join(ta[i:i+n]) for i in range(max(len(ta)-n+1, 1))}
    sb = {" ".join(tb[i:i+n]) for i in range(max(len(tb)-n+1, 1))}
    return len(sa & sb) / len(sa | sb)


class TestDedup:
    def test_exact(self, spark, doc_df):
        out = exact_dedup(doc_df).toPandas()
        dup_row = out[out["n_dups"] == 2]
        assert len(dup_row) == 1  # only (0,1) are byte-identical; 4 has " extra"
        # exactly one group has both 0 and 1
        members = [sorted(m) for m in out["member_ids"]]
        assert [0, 1] in members

    def test_ngram_jaccard(self, spark, doc_df):
        out = ngram_jaccard_pairs(doc_df, threshold=0.0).toPandas()
        pairs = {(r.id_a, r.id_b): r.jaccard for r in out.itertuples()}
        assert pairs[(0, 1)] == pytest.approx(1.0)
        local = doc_df.toPandas().set_index("doc_id")["text"]
        assert pairs[(0, 2)] == pytest.approx(_jaccard(local[0], local[2]))
        assert (3, 4) in pairs

    def test_minhash_pipeline(self, spark, doc_df):
        sigs = minhash_signatures(doc_df)
        cands = minhash_lsh_candidates(sigs)
        est = minhash_estimate(sigs, cands).toPandas()
        got = {(r.id_a, r.id_b): r.est_jaccard for r in est.itertuples()}
        assert got[(0, 1)] == pytest.approx(1.0)  # exact dups always caught
        if (0, 2) in got:  # near dup: estimate near true jaccard
            local = doc_df.toPandas().set_index("doc_id")["text"]
            true_j = _jaccard(local[0], local[2])
            assert abs(got[(0, 2)] - true_j) < 0.25

    def test_minhash_deterministic(self, spark, doc_df):
        a = minhash_signatures(doc_df).orderBy("id").toPandas()
        b = minhash_signatures(doc_df).orderBy("id").toPandas()
        for s1, s2 in zip(a["signature"], b["signature"]):
            assert list(s1) == list(s2)

    def test_simhash(self, spark, doc_df):
        sigs = simhash_signatures(doc_df)
        pairs = simhash_near_pairs(sigs, max_hamming=12).toPandas()
        got = {(r.id_a, r.id_b): r.hamming for r in pairs.itertuples()}
        assert got.get((0, 1)) == 0  # identical text -> identical simhash
        # near-dup pair lands within the hamming budget
        assert (0, 2) in got or (1, 2) in got

    def test_simhash_banding_complete_distance_10(self, spark):
        # A pair at Hamming distance 10 whose differing bits hit 10 DISTINCT
        # chunks: round 1's fixed 4-chunk banding missed any pair differing
        # in all 4 chunks; max_hamming+1 banding must find it (pigeonhole).
        base = 0x0ABCDE123456789
        flipped = base
        for i in range(10):  # one bit in each of 10 different 5/6-bit chunks
            flipped ^= 1 << (i * 6 + 2)
        sigs = spark.createDataFrame(
            [(1, base), (2, flipped)], "id long, simhash long"
        )
        out = simhash_near_pairs(sigs, max_hamming=10).toPandas()
        assert len(out) == 1
        assert int(out.iloc[0]["hamming"]) == 10
        # and a pair just beyond the radius is excluded
        out9 = simhash_near_pairs(sigs, max_hamming=9).toPandas()
        assert len(out9) == 0

    def test_simhash_matches_duckdb_oracle(self, spark, doc_df):
        import duckdb

        from feasts_spark.operators.dedup import simhash_oracle_sql

        got = simhash_signatures(doc_df).toPandas().sort_values("id")
        con = duckdb.connect()
        con.register("documents", doc_df.toPandas())
        exp = (
            con.execute(simhash_oracle_sql("documents")).fetchdf().sort_values("id")
        )
        assert list(got["simhash"]) == list(exp["simhash"])

    def test_ngram_hot_shingle_cap(self, spark):
        # 40 docs sharing one hot shingle + 2 genuine near-dups: with the
        # cap the hot shingle contributes no candidates, so the join stays
        # bounded and only the genuine pair survives.
        hot = "common boilerplate header"
        rows = [(i, f"{hot} unique body {i} filler words {i * 7}") for i in range(40)]
        rows += [(100, "alpha beta gamma delta epsilon zeta"),
                 (101, "alpha beta gamma delta epsilon eta")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        capped = ngram_jaccard_pairs(df, threshold=0.3, max_doc_freq=10).toPandas()
        assert set(zip(capped.id_a, capped.id_b)) == {(100, 101)}
        # uncapped finds the same genuine pair plus hot-shingle noise pairs
        exact = ngram_jaccard_pairs(df, threshold=0.0, max_doc_freq=None).toPandas()
        assert len(exact) >= 40 * 39 / 2  # the quadratic blow-up the cap kills


class TestMultimodal:
    def test_feature_extraction(self, spark):
        media = synthesize_media(spark, n=24)
        feats = extract_features(media).toPandas()
        assert len(feats) == 24
        dims = feats.groupby("kind")["feat_dim"].first().to_dict()
        assert dims == {"audio": 8, "image": 6, "video": 6}
        # deterministic across runs
        again = extract_features(synthesize_media(spark, n=24)).toPandas()
        a = feats.sort_values("media_id").reset_index(drop=True)
        b = again.sort_values("media_id").reset_index(drop=True)
        for f1, f2 in zip(a["feature"], b["feature"]):
            np.testing.assert_array_equal(np.array(f1), np.array(f2))

    def test_resize_and_frames(self, spark):
        media = synthesize_media(spark, n=24)
        thumbs = resize_images(media, width=8, height=8).toPandas()
        assert (thumbs["thumb"].map(len) == 8 * 8 * 3).all()
        frames = sample_frames(media, every_n=2).toPandas()
        assert set(frames["frame_idx"]) == {0, 2, 4, 6}
        assert (frames["frame"].map(len) == 16 * 16 * 3).all()

    def test_stub_contract(self, spark):
        media = synthesize_media(spark, n=3)
        with pytest.raises(NotImplementedError):
            extract_features(media, decoder=None)
