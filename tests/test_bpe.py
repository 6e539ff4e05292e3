"""BPE tokenizer: training must reproduce the textbook merge sequence on
the classic worked example, encoding must replay merges in rank order,
and both must be invariant to corpus partitioning."""

import pytest
from pyspark.sql import Row

from feasts_spark.operators.bpe import bpe_encode, bpe_train, word_freqs

# the classic BPE worked example: word -> corpus frequency
COUNTS = {"hug": 10, "pug": 5, "pun": 12, "bun": 4, "hugs": 5}


def _corpus(spark, counts=COUNTS, docs=7):
    """Spread each word's occurrences across `docs` documents."""
    texts = [[] for _ in range(docs)]
    i = 0
    for w, c in sorted(counts.items()):
        for _ in range(c):
            texts[i % docs].append(w)
            i += 1
    rows = [Row(doc_id=j, text=" ".join(t)) for j, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBpeTrain:
    def test_textbook_merge_sequence(self, spark):
        d = _corpus(spark)
        merges = bpe_train(d, n_merges=4).collect()
        got = [(r["left"], r["right"]) for r in
               sorted(merges, key=lambda r: r["rank"])]
        # (u,g)=20 first; merging it drops (p,u) from pug, so
        # (u,n)=16 beats (p,u)=12; then (h,ug)=15; then (p,un)=12
        assert got == [("u", "g"), ("u", "n"), ("h", "ug"), ("p", "un")]

    def test_partitioning_invariance(self, spark):
        d = _corpus(spark)
        a = sorted(map(tuple, bpe_train(d, 6).collect()))
        b = sorted(map(tuple, bpe_train(d.repartition(5), 6).collect()))
        assert a == b

    def test_min_freq_early_stop(self, spark):
        d = spark.createDataFrame(
            [Row(doc_id=0, text="alpha beta gamma")],
            "doc_id long, text string")
        merges = bpe_train(d, n_merges=50, min_freq=2)
        # every pair occurs once -> no merge reaches min_freq
        assert merges.count() == 0

    def test_word_freqs(self, spark):
        d = _corpus(spark)
        got = {r["word"]: r["count"] for r in word_freqs(d).collect()}
        assert got == COUNTS


class TestBpeEncode:
    def test_encode_replays_merges(self, spark):
        d = _corpus(spark)
        merges = bpe_train(d, n_merges=4)
        q = spark.createDataFrame(
            [Row(doc_id=0, text="hugs pun bug")],
            "doc_id long, text string")
        out = bpe_encode(q, merges, return_tokens=True).first()
        # hugs -> hug+s (rank-order replay); pun -> pun (two merges);
        # bug (unseen word) -> b+ug
        assert out["tokens"] == ["hug", "s", "pun", "b", "ug"]
        assert out["n_ws_tokens"] == 3 and out["n_bpe_tokens"] == 5

    def test_token_concat_reconstructs_words(self, spark):
        d = _corpus(spark)
        merges = bpe_train(d, n_merges=6)
        out = bpe_encode(d, merges, return_tokens=True).collect()
        src = {r["doc_id"]: r["text"] for r in d.collect()}
        for r in out:
            assert "".join(r["tokens"]) == src[r["id"]].replace(" ", "")

    def test_no_merges_means_characters(self, spark):
        q = spark.createDataFrame(
            [Row(doc_id=0, text="ab !?")], "doc_id long, text string")
        empty = bpe_train(
            spark.createDataFrame([Row(doc_id=0, text="x y z")],
                                  "doc_id long, text string"),
            n_merges=3, min_freq=2)
        out = bpe_encode(q, empty, return_tokens=True).first()
        assert out["tokens"] == ["a", "b", "!", "?"]
        assert out["n_bpe_tokens"] == 4
