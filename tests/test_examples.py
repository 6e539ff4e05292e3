"""Training-example assembly operators: packing offsets (concat-and-cut),
boundary-respecting greedy packing, and per-turn conversation context
windows — all deterministic under repartitioning (reproducible-training
invariant)."""

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from feasts_spark.operators.examples import (
    conversation_windows,
    doc_stream_offsets,
    pack_sequences_greedy,
)


def _docs(spark, sizes_by_source):
    """Docs with exact whitespace-token counts: doc i of source s has
    sizes[i] tokens 'w'."""
    rows = []
    i = 0
    for src, sizes in sizes_by_source.items():
        for n in sizes:
            rows.append(Row(doc_id=i, source=src, text=" ".join(["w"] * n)))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestDocStreamOffsets:
    def test_exact_offsets_and_bins(self, spark):
        d = _docs(spark, {"a": [3, 4, 5, 2], "b": [10, 1]})
        got = {r["doc_id"]: r for r in
               doc_stream_offsets(d, budget_tokens=6).collect()}
        # source a: offsets 0,3,7,12 -> bins (0,0) (0,1 spans) (1,1) (2,2)
        assert [got[i]["stream_offset"] for i in range(4)] == [0, 3, 7, 12]
        assert [got[i]["bin_first"] for i in range(4)] == [0, 0, 1, 2]
        assert [got[i]["bin_last"] for i in range(4)] == [0, 1, 1, 2]
        assert [got[i]["spans_boundary"] for i in range(4)] == [
            False, True, False, False]
        # source b independent tape
        assert got[4]["stream_offset"] == 0 and got[5]["stream_offset"] == 10

    def test_partitioning_invariance(self, spark):
        d = _docs(spark, {"a": list(range(1, 30)), "b": [7] * 20})
        a = sorted(map(tuple, doc_stream_offsets(d, 16).collect()))
        b = sorted(map(tuple,
                       doc_stream_offsets(d.repartition(13), 16).collect()))
        assert a == b

    def test_rejects_bad_budget(self, spark):
        d = _docs(spark, {"a": [1]})
        with pytest.raises(ValueError, match="positive"):
            doc_stream_offsets(d, 0)

    def test_two_phase_equals_single_window_real_corpus(self, spark):
        """The distributed prefix sum (range chunks + cumulative chunk
        offsets + in-chunk windows) must reproduce the legacy
        single-window tape EXACTLY on the real documents table —
        including with a SINGLE stream, the shape whose parallelism the
        two-phase path exists to unlock."""
        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        legacy = sorted(map(tuple, doc_stream_offsets(
            docs, 2048, n_chunks=1).collect()))
        chunked = sorted(map(tuple, doc_stream_offsets(
            docs, 2048, n_chunks=16).collect()))
        assert legacy == chunked
        one_stream = docs.withColumn("source", F.lit("all"))
        legacy1 = sorted(map(tuple, doc_stream_offsets(
            one_stream, 2048, n_chunks=1).collect()))
        chunked1 = sorted(map(tuple, doc_stream_offsets(
            one_stream, 2048, n_chunks=16).collect()))
        assert legacy1 == chunked1

    def test_two_phase_chunk_count_invariance(self, spark):
        """Offsets are a pure function of the data: any n_chunks (even
        more chunks than rows) yields the identical tape."""
        d = _docs(spark, {"a": list(range(1, 30)), "b": [7] * 20})
        base = sorted(map(tuple, doc_stream_offsets(d, 16, n_chunks=1).collect()))
        for n_chunks in (2, 7, 200):
            assert base == sorted(map(tuple, doc_stream_offsets(
                d, 16, n_chunks=n_chunks).collect()))

    def test_two_phase_in_chunk_windows_parallelize(self, spark):
        """The plan property the rewrite buys: the per-row running-sum
        window partitions by (stream, chunk), never by stream alone —
        no single-task-per-stream sort remains in the chunked plan."""
        d = _docs(spark, {"a": list(range(1, 30))})
        plan = doc_stream_offsets(
            d, 16, n_chunks=8
        )._jdf.queryExecution().optimizedPlan().toString()
        import re

        win_specs = re.findall(
            r"windowspecdefinition\(([^)]*)\)", plan
        )
        assert win_specs, plan
        # every per-row window spec over doc_id must carry _chunk in its
        # partition keys; the only stream-partitioned window left is the
        # tiny cumulative-chunk-offset one (ordered by _chunk, not doc_id)
        assert any("doc_id" in spec for spec in win_specs), plan
        for spec in win_specs:
            if "doc_id" in spec:
                assert "_chunk" in spec, spec


class TestGreedyPacking:
    def test_no_bin_exceeds_budget(self, spark):
        d = _docs(spark, {"a": [5, 9, 3, 8, 2, 7, 1, 6, 4] * 7})
        out = pack_sequences_greedy(d, budget_tokens=12, n_shards=4)
        over = (
            out.groupBy("shard", "bin")
            .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("n"),
                 F.max(F.col("oversize").cast("int")).alias("o"))
            .filter((F.col("t") > 12) & ~((F.col("n") == 1) & (F.col("o") == 1)))
        )
        assert over.count() == 0

    def test_oversize_doc_gets_own_bin(self, spark):
        d = _docs(spark, {"a": [3, 50, 4]})
        out = pack_sequences_greedy(d, budget_tokens=10, n_shards=1)
        rows = {r["n_tokens"]: r for r in out.collect()}
        assert rows[50]["oversize"] is True
        mates = [r for r in out.collect() if r["bin"] == rows[50]["bin"]]
        assert len(mates) == 1

    def test_budget_property_random_sizes(self, spark):
        """Randomized size mixes: every bin respects the budget unless a
        single oversize doc owns it; every doc is assigned exactly once."""
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=12, deadline=None)
        @given(
            sizes=st.lists(st.integers(min_value=0, max_value=40),
                           min_size=1, max_size=120),
            budget=st.integers(min_value=5, max_value=60),
        )
        def check(sizes, budget):
            d = _docs(spark, {"a": sizes})
            out = pack_sequences_greedy(d, budget, n_shards=4).collect()
            assert len(out) == len(sizes)
            bins: dict = {}
            for r in out:
                bins.setdefault((r["shard"], r["bin"]), []).append(r)
            for rows in bins.values():
                tot = sum(r["n_tokens"] for r in rows)
                if tot > budget:
                    assert len(rows) == 1 and rows[0]["oversize"]
                assert all(r["bin_tokens"] == tot for r in rows)

        check()

    def test_bins_contiguous_and_deterministic(self, spark):
        d = _docs(spark, {"a": [((i * 7) % 11) + 1 for i in range(200)]})
        out = pack_sequences_greedy(d, budget_tokens=20, n_shards=8)
        per_shard = (
            out.groupBy("shard")
            .agg(F.min("bin").alias("lo"), F.max("bin").alias("hi"),
                 F.count_distinct("bin").alias("nb"))
            .collect()
        )
        for r in per_shard:
            assert r["lo"] == 0 and r["nb"] == r["hi"] + 1
        again = pack_sequences_greedy(d.repartition(17), 20, n_shards=8)
        assert sorted(map(tuple, out.collect())) == \
            sorted(map(tuple, again.collect()))


class TestConversationWindows:
    def _tr(self, spark):
        rows = [
            Row(conv_id="c1", turn_idx=i, role=("user" if i % 2 == 0
                                                else "assistant"),
                text=f"t{i}")
            for i in range(5)
        ] + [Row(conv_id="c2", turn_idx=0, role="user", text="solo")]
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string")

    def test_exact_windows_k2(self, spark):
        got = {(r["conv_id"], r["turn_idx"]): r
               for r in conversation_windows(self._tr(spark), k=2).collect()}
        assert got[("c1", 0)]["ctx"] == "user: t0"
        assert got[("c1", 1)]["ctx"] == "user: t0\x1eassistant: t1"
        assert got[("c1", 3)]["ctx"] == "user: t2\x1eassistant: t3"
        assert got[("c2", 0)]["ctx"] == "user: solo"
        assert got[("c1", 0)]["n_ctx"] == 1 and got[("c1", 4)]["n_ctx"] == 2
        exp = "user: t2\x1eassistant: t3"
        assert got[("c1", 3)]["ctx_digest"] == \
            hashlib.md5(exp.encode()).hexdigest()
        assert got[("c1", 3)]["ctx_chars"] == len(exp)

    def test_full_history_when_k_large(self, spark):
        got = {r["turn_idx"]: r for r in conversation_windows(
            self._tr(spark).filter(F.col("conv_id") == "c1"), k=99).collect()}
        assert got[4]["n_ctx"] == 5
        assert got[4]["ctx"].startswith("user: t0\x1e")

    def test_partitioning_invariance(self, spark):
        tr = self._tr(spark)
        a = sorted(map(tuple, conversation_windows(tr, 3).collect()))
        b = sorted(map(tuple,
                       conversation_windows(tr.repartition(7), 3).collect()))
        assert a == b


class TestCorpusReport:
    def test_matches_duckdb_on_real_corpus(self, spark):
        """Oracle-grade check without a registry slot: the one-row corpus
        datasheet must value-match DuckDB's independent SQL over the
        same parquet (exact percentile semantics included)."""
        import duckdb

        from feasts_spark.operators.text import corpus_report

        path = "/root/testdata/sf0.01/documents.parquet"
        got = corpus_report(spark.read.parquet(path)).first().asDict()
        exp = duckdb.sql(f"""
            SELECT count(*) AS n_docs,
                   count(DISTINCT source) AS n_sources,
                   count(DISTINCT lang) AS n_langs,
                   sum(len(regexp_split_to_array(trim(lower(text)),
                       '\\s+'))) AS total_ws_tokens,
                   quantile_cont(len(regexp_split_to_array(trim(lower(text)),
                       '\\s+')), 0.5) AS p50_tokens,
                   quantile_cont(len(regexp_split_to_array(trim(lower(text)),
                       '\\s+')), 0.95) AS p95_tokens,
                   sum(length(text)) AS total_chars,
                   sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END)
                     / count(*)::DOUBLE AS empty_frac,
                   1.0 - count(DISTINCT md5(text)) / count(*)::DOUBLE
                     AS exact_dup_frac
            FROM read_parquet('{path}')
        """).fetchone()
        keys = ["n_docs", "n_sources", "n_langs", "total_ws_tokens",
                "p50_tokens", "p95_tokens", "total_chars", "empty_frac",
                "exact_dup_frac"]
        for k, e in zip(keys, exp):
            assert abs(float(got[k]) - float(e)) < 1e-9, (k, got[k], e)
