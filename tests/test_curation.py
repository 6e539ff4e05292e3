"""Curation operators: deterministic sampling, token budgets, dup spans."""

import pytest
from pyspark.sql import functions as F

from feasts_spark.operators.curation import (
    sample_uniform,
    stratified_sample,
    token_budget_cap,
)
from feasts_spark.operators.dedup import dup_span_stats


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


class TestStratifiedSample:
    def test_uniform_matches_duckdb(self, spark):
        """The md5-prefix uniform must be the exact cross-engine value
        (pinned against DuckDB's ('0x'||substr(md5(...),1,8))::BIGINT)."""
        df = spark.range(5).select(F.col("id").alias("doc_id"))
        out = {
            r["doc_id"]: r["u"]
            for r in df.select(
                "doc_id", sample_uniform("doc_id", seed=42).alias("u")
            ).collect()
        }
        assert out[0] == pytest.approx(0.7199947119224817, abs=1e-12)
        assert out[4] == pytest.approx(0.03761036950163543, abs=1e-12)

    def test_deterministic_and_partition_invariant(self, spark, docs):
        frac = {"en": 0.5, "de": 0.8}
        a = stratified_sample(docs, frac).select("doc_id", "sampled")
        b = stratified_sample(docs.repartition(13), frac).select(
            "doc_id", "sampled"
        )
        assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0

    def test_fraction_respected(self, spark):
        df = spark.range(4000).select(
            F.col("id").alias("doc_id"), F.lit("en").alias("lang")
        )
        out = stratified_sample(df, {"en": 0.25})
        rate = out.agg(F.avg("sampled")).first()[0]
        assert rate == pytest.approx(0.25, abs=0.03)

    def test_default_fraction_for_unknown_stratum(self, spark):
        df = spark.range(100).select(
            F.col("id").alias("doc_id"), F.lit("xx").alias("lang")
        )
        none_kept = stratified_sample(df, {"en": 1.0})  # default 0.0
        assert none_kept.agg(F.sum("sampled")).first()[0] == 0
        all_kept = stratified_sample(df, {"en": 0.0}, default_fraction=1.0)
        assert all_kept.agg(F.sum("sampled")).first()[0] == 100

    def test_no_shuffle_in_plan(self, spark, docs):
        plan = stratified_sample(docs, {"en": 0.5})._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Exchange" not in plan


class TestTokenBudgetCap:
    def test_hand_computed(self, spark):
        # quality ordering within src: longer docs score higher (length
        # score dominates below 64 tokens; all-letter words, no punct)
        rows = [
            (0, "s", "alpha beta gamma delta epsilon zeta"),        # 6 tok
            (1, "s", "alpha beta gamma delta"),                     # 4 tok
            (2, "s", "alpha beta"),                                 # 2 tok
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = (
            token_budget_cap(df, budget_tokens=10)
            .orderBy("doc_id")
            .toPandas()
        )
        assert list(out["cum_tokens"]) == [6, 10, 12]
        assert list(out["kept_by_budget"]) == [1, 1, 0]

    def test_budget_is_per_source(self, spark):
        rows = [(i, f"s{i % 2}", "w " * 5) for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = token_budget_cap(df, budget_tokens=12).toPandas()
        # each source holds 4 docs x 5-6 tokens; exactly 2 fit 12 tokens
        kept = out.groupby("source")["kept_by_budget"].sum()
        assert (kept == 2).all()

    def test_deterministic_under_repartition(self, spark, docs):
        a = token_budget_cap(docs, 500).select("doc_id", "kept_by_budget")
        b = token_budget_cap(docs.repartition(17), 500).select(
            "doc_id", "kept_by_budget"
        )
        assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


class TestPiiStats:
    def test_hand_computed(self, spark):
        from feasts_spark.operators.text import pii_stats

        rows = [
            (0, "mail a@b.io and c.d@e-f.org call +1 (555) 010-1234"),
            (1, "host 10.0.0.1 and 192.168.300.5 page https://x.io/p_q"),
            (2, "clean text only"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = pii_stats(df).orderBy("doc_id").toPandas()
        assert list(out["n_emails"]) == [2, 0, 0]
        assert list(out["n_phones"]) == [1, 0, 0]
        # \d{1,3} matches the first 3 digits of "300", so both dotted
        # quads count — PII scrubbing is deliberately recall-leaning
        assert list(out["n_ips"]) == [0, 2, 0]
        assert list(out["n_urls"]) == [0, 1, 0]

    def test_scrub_digest_changes_only_with_pii(self, spark):
        from pyspark.sql import functions as F

        from feasts_spark.operators.text import pii_stats

        df = spark.createDataFrame(
            [(0, "reach me at x@y.com"), (1, "no pii here")],
            "doc_id long, text string",
        )
        out = (
            pii_stats(df)
            .join(df.select("doc_id", F.md5("text").alias("raw_md5")), "doc_id")
            .orderBy("doc_id")
            .toPandas()
        )
        assert out.loc[0, "scrub_md5"] != out.loc[0, "raw_md5"]
        assert out.loc[1, "scrub_md5"] == out.loc[1, "raw_md5"]

    def test_no_shuffle_in_plan(self, spark, docs):
        from feasts_spark.operators.text import pii_stats

        plan = pii_stats(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestDupSpans:
    def test_hand_computed(self, spark):
        rows = [
            (0, "one two three four five"),   # windows(3): 3, shares 1st w/ doc1
            (1, "one two three zz qq"),       # shares "one two three"
            (2, "aa bb cc dd"),               # nothing shared
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = dup_span_stats(df, n=3).orderBy("doc_id").toPandas()
        assert list(out["n_windows"]) == [3, 3, 2]
        assert list(out["n_dup_windows"]) == [1, 1, 0]
        assert out.loc[0, "dup_span_frac"] == pytest.approx(0.3333)
        assert out.loc[2, "dup_span_frac"] == pytest.approx(0.0)

    def test_sub_n_doc_gets_zero_windows_row(self, spark):
        """ADVICE r03: a doc shorter than n tokens has NO n-token windows
        — it must get a (0, 0, 0.0) row, not a truncated shorter window
        that could spuriously match another short doc."""
        df = spark.createDataFrame(
            [(0, "a b"), (1, "a b"), (2, "a b c d e")],
            "doc_id long, text string",
        )
        out = dup_span_stats(df, n=3).orderBy("doc_id").toPandas()
        assert len(out) == 3
        # identical 2-token docs share no 3-token window (there are none)
        assert list(out["n_windows"]) == [0, 0, 3]
        assert list(out["n_dup_windows"]) == [0, 0, 0]
        assert list(out["dup_span_frac"]) == [0.0, 0.0, 0.0]

    def test_within_doc_repeat_not_counted(self, spark):
        # "x y z" twice inside ONE doc is internal repetition, not a
        # cross-document duplicated span
        df = spark.createDataFrame(
            [(0, "x y z x y z"), (1, "p q r s")], "doc_id long, text string"
        )
        out = dup_span_stats(df, n=3).orderBy("doc_id").toPandas()
        assert out.loc[0, "n_dup_windows"] == 0

    def test_corpus_signal(self, spark, docs):
        out = dup_span_stats(docs, n=4).toPandas()
        assert len(out) == docs.count()
        assert (out["dup_span_frac"] >= 0).all()
        assert (out["dup_span_frac"] <= 1).all()
        # the synthetic template-y corpus must share some 4-grams
        assert (out["n_dup_windows"] > 0).any()


class TestReservoirPerGroup:
    @staticmethod
    def _u(doc_id, seed=42):
        import hashlib

        h = hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:8]
        return int(h, 16) / float(1 << 32)

    def test_exact_k_matches_bruteforce(self, docs):
        from feasts_spark.operators.curation import reservoir_per_group

        out = reservoir_per_group(docs, 7, strata_col="lang").collect()
        rows = docs.select("doc_id", "lang").collect()
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r.lang, []).append(r.doc_id)
        for lang, ids in by_lang.items():
            expect = sorted(ids, key=lambda i: (self._u(i), i))[:7]
            got = sorted(
                (r.doc_id for r in out if r.lang == lang),
                key=lambda i: (self._u(i), i),
            )
            assert got == expect, lang
        # ranks are 1..k in u-order within each stratum
        for r in out:
            assert 1 <= r.rs_rank <= 7

    def test_small_stratum_keeps_all(self, spark):
        from feasts_spark.operators.curation import reservoir_per_group

        df = spark.createDataFrame(
            [(i, "xx", "t") for i in range(3)], "doc_id long, lang string, text string"
        )
        out = reservoir_per_group(df, 10)
        assert out.count() == 3

    def test_partitioning_invariance(self, docs):
        from feasts_spark.operators.curation import reservoir_per_group

        a = {
            (r.lang, r.doc_id)
            for r in reservoir_per_group(docs, 5).select("lang", "doc_id").collect()
        }
        b = {
            (r.lang, r.doc_id)
            for r in reservoir_per_group(docs.repartition(17), 5)
            .select("lang", "doc_id")
            .collect()
        }
        assert a == b and len(a) > 0

    def test_underfill_guard_raises(self, spark):
        from feasts_spark.operators.curation import reservoir_per_group

        n, k = 100, 10
        df = spark.createDataFrame(
            [(i, "en") for i in range(n)], "doc_id long, lang string"
        )
        us = sorted(self._u(i) * n for i in range(n))
        # cap between the 2nd and 3rd candidate: exactly 2 candidates < k
        cap = (us[1] + us[2]) / 2.0
        with pytest.raises(Exception, match="reservoir_per_group"):
            reservoir_per_group(
                df, k, oversample=cap / k, candidate_floor=0
            ).collect()

    def test_validation(self, docs):
        from feasts_spark.operators.curation import reservoir_per_group

        with pytest.raises(ValueError):
            reservoir_per_group(docs, 0)

    def test_candidate_prefilter_plan(self, docs):
        from feasts_spark.operators.curation import reservoir_per_group

        plan = (
            reservoir_per_group(docs, 5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # counts side broadcast, candidate filter before the rank window
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


class TestPiiOverlap:
    def test_overlapping_classes_attributed_once(self, spark):
        """An IP or email inside a URL must be attributed to exactly one
        class: counts are sequential (each class counted after earlier
        classes are scrubbed), so sum(n_*) == sentinels in the digest
        (round-3 review finding: raw-text counts double-counted overlaps)."""
        from feasts_spark.operators.text import PII_PATTERNS, pii_stats

        rows = [
            (0, "see http://192.168.0.1/x now"),       # IP inside URL
            (1, "plain 192.168.0.1 and http://a.com"),  # disjoint
            (2, "mail user@host.com via https://user_host.com/x"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in pii_stats(df).collect()}
        # doc 0: the URL swallows the IP -> 1 URL, 0 IPs
        assert (out[0].n_urls, out[0].n_ips) == (1, 0)
        # doc 1: both classes present, disjoint
        assert (out[1].n_urls, out[1].n_ips) == (1, 1)
        # doc 2: email counted first, URL intact
        assert (out[2].n_emails, out[2].n_urls) == (1, 1)
        # invariant: total counts == sentinel occurrences in the scrub
        import re

        for doc_id, text in rows:
            scrubbed = text
            for _n, pat, tag in PII_PATTERNS:
                scrubbed = re.sub(pat, tag, scrubbed)
            r = out[doc_id]
            total = r.n_emails + r.n_urls + r.n_ips + r.n_phones
            assert total == len(re.findall(r"<(EMAIL|URL|IP|PHONE)>", scrubbed))


class TestHashSplit:
    def test_split_matches_uniform_intervals(self, docs):
        from feasts_spark.operators.curation import hash_split, sample_uniform

        w = {"train": 0.8, "test": 0.1, "val": 0.1}
        out = hash_split(docs, w).select(
            "doc_id", "split", sample_uniform("doc_id").alias("u")
        ).collect()
        # sorted names: test, train, val -> intervals [0,.1),[.1,.9),[.9,1)
        for r in out:
            if r.u < 0.1:
                assert r.split == "test"
            elif r.u < 0.9:
                assert r.split == "train"
            else:
                assert r.split == "val"

    def test_partitioning_invariance_and_plan(self, docs):
        from feasts_spark.operators.curation import hash_split

        w = {"train": 0.9, "val": 0.1}
        a = {(r.doc_id, r.split) for r in hash_split(docs, w).collect()}
        b = {
            (r.doc_id, r.split)
            for r in hash_split(docs.repartition(13), w).collect()
        }
        assert a == b
        plan = (
            hash_split(docs, w)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan  # pure projection

    def test_validation(self, docs):
        from feasts_spark.operators.curation import hash_split

        with pytest.raises(ValueError, match="sum to 1"):
            hash_split(docs, {"train": 0.5, "val": 0.1})
        with pytest.raises(ValueError, match="non-negative"):
            hash_split(docs, {"train": 1.5, "val": -0.5})


class TestSynthesizeDocuments:
    def test_deterministic_and_dup_signal(self, spark):
        from feasts_spark.sources.documents import synthesize_documents

        a = synthesize_documents(spark, 200).orderBy("doc_id").toPandas()
        b = synthesize_documents(spark, 200).orderBy("doc_id").toPandas()
        assert (a["text"] == b["text"]).all()
        assert list(a.columns) == ["doc_id", "text", "lang", "source",
                                   "n_chars"]
        # planted exact duplicates: doc 37k clones doc 37k+1's text
        for i in (37, 74, 148):
            assert a.loc[i, "text"] == a.loc[i + 1, "text"]
        assert a.loc[1, "text"] != a.loc[2, "text"]
        # word counts inside the documented band
        wc = a["text"].str.split().map(len)
        assert wc.min() >= 40 and wc.max() <= 90
        assert a["lang"].nunique() == 5 and a["source"].nunique() > 5

    def test_partition_invariant(self, spark):
        from feasts_spark.sources.documents import synthesize_documents

        a = synthesize_documents(spark, 100).repartition(13).orderBy(
            "doc_id").toPandas()
        b = synthesize_documents(spark, 100).coalesce(1).orderBy(
            "doc_id").toPandas()
        assert (a["text"] == b["text"]).all()
