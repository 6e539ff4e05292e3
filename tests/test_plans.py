"""Physical-plan structure assertions — Catalyst must be doing its job.

These lock in the scale-critical plan properties (SURVEY.md §4.2): column
pruning to the parquet scan, predicate pushdown, broadcast for the
heavy-key dim join, single shuffle for rollups, partial aggregation, and
no extra shuffle in the tier cascade (re-aggregating 1m -> 1h shuffles on
the same key set).
"""

import pytest
from pyspark.sql import functions as F

from feasts_spark.plans import formatted_plan, plan_summary

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def no_aqe(spark):
    """Classic physical plans for inspection (AQE hides WSCG pre-execution)."""
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.adaptive.enabled", old)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_rollup_prunes_scan_columns(spark, events):
    from feasts_spark.operators.rollup import rollup_raw

    r = rollup_raw(events, "1h", "user_id", "ts", "value")
    plan = formatted_plan(r)
    # scan must read only user_id, ts, value — not event_type/props/event_id
    assert "ReadSchema" in plan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "props" not in read and "event_type" not in read
    for col in ("user_id", "ts", "value"):
        assert col in read


def test_rollup_single_shuffle_partial_agg(spark, events):
    from feasts_spark.operators.rollup import rollup_raw

    r = rollup_raw(events, "1h", "user_id", "ts", "value")
    s = plan_summary(r)
    # one shuffle (hash on key+bucket), partial+final HashAggregate
    assert s["n_exchanges"] == 1
    from feasts_spark.plans import count_nodes
    assert count_nodes(s["plan"], "HashAggregate") == 2  # partial + final


def test_filter_pushdown_reaches_scan(spark, events):
    filtered = events.filter(F.col("user_id") == 3).select("user_id", "value")
    s = plan_summary(filtered)
    assert s["pushed_filters"], "predicate not pushed to parquet scan"


def test_salted_rollup_broadcasts_heavy_keys(spark, events):
    from feasts_spark.operators.skew import salted_rollup

    # pin_partials=False exposes the raw Catalyst tree (the default pins
    # the partial aggregate behind a LogicalRDD, hiding the join from
    # explain output; the subtree below the pin is this same plan)
    r = salted_rollup(events, "1m", key_col="user_id", ts_col="ts",
                      value_col="value", heavy_threshold=10,
                      pin_partials=False)
    s = plan_summary(r)
    assert s["has_broadcast"], "heavy-key dim join must broadcast"


def test_salted_rollup_default_pins_partials(spark, events):
    """The default path must NOT clone the source scan into both split
    branches: the partial aggregate is pinned, so the final plan reads a
    single ExistingRDD and no parquet/file scan appears twice."""
    from feasts_spark.operators.skew import salted_rollup

    r = salted_rollup(events, "1m", key_col="user_id", ts_col="ts",
                      value_col="value", heavy_threshold=10)
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan, "partial aggregate should be pinned"
    assert plan.count("FileScan") == 0, (
        "pinned salted rollup must not re-scan the source in a branch"
    )


def test_cascade_no_extra_scan(spark, events):
    """1h-from-1m cascade must not rescan the source table."""
    from feasts_spark.operators.rollup import rollup_cascade, rollup_raw

    r1m = rollup_raw(events, "1m", "user_id", "ts", "value")
    r1h = rollup_cascade(r1m, "1h")
    s = plan_summary(r1h)
    assert s["n_scans"] == 1


def test_feature_pack_single_shuffle(spark, events):
    """groupBy(key).applyInPandas = exactly one exchange over the scan."""
    from feasts_spark.operators.features import features
    from feasts_spark.operators.rollup import rollup_raw

    r = rollup_raw(events, "1h", "user_id", "ts", "value")
    out = features(r, period=24)
    s = plan_summary(out)
    # rollup shuffle + applyInPandas shuffle — no more
    assert s["n_exchanges"] <= 2
    assert s["n_python"] >= 1


def test_gapfill_no_cartesian(spark, events):
    from feasts_spark.operators.gapfill import gapfill_locf
    from feasts_spark.operators.rollup import rollup_raw

    r = rollup_raw(events, "1d", "user_id", "ts", "value")
    g = gapfill_locf(r, "1d", value_cols=("val_avg",))
    plan = formatted_plan(g)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_text_ops_stay_jvm_side(spark):
    """Text analysis must be pure Catalyst expressions — no Python eval."""
    from feasts_spark.operators.text import language_scores, quality_scores, token_stats

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for op in (token_stats, language_scores, quality_scores):
        s = plan_summary(op(docs))
        assert s["n_python"] == 0, f"{op.__name__} fell off the JVM path"
        assert s["n_wscg"] >= 1, f"{op.__name__} not in whole-stage codegen"


def test_curation_ops_plan_shapes(spark):
    """The curation suite's scale contracts: dup spans are ONE lineage
    (one corpus scan, three exchanges, no joins), repetition/PII/sampling
    stay JVM-side, and the contamination semi join never falls back to a
    cartesian product."""
    from feasts_spark.operators.curation import token_budget_cap
    from feasts_spark.operators.dedup import dup_span_stats, ngram_containment
    from feasts_spark.operators.text import pii_stats, repetition_scores

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = plan_summary(dup_span_stats(docs, n=4))
    assert s["n_scans"] == 1 and s["n_exchanges"] == 3 and s["n_python"] == 0
    assert "Join" not in formatted_plan(dup_span_stats(docs, n=4))

    for op in (repetition_scores, pii_stats):
        s = plan_summary(op(docs))
        assert s["n_python"] == 0, f"{op.__name__} fell off the JVM path"

    ev = docs.filter("doc_id % 17 = 0")
    tr = docs.filter("doc_id % 17 <> 0")
    plan = formatted_plan(ngram_containment(ev, tr, n=3))
    assert "CartesianProduct" not in plan and "LeftSemi" in plan

    s = plan_summary(token_budget_cap(docs, 800))
    assert s["n_python"] == 0 and s["n_exchanges"] <= 2


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key join WITHOUT any Exchange —
    the co-located layout repeated joins rely on at 100TB."""
    import pandas as pd

    from feasts_spark.plans import plan_summary
    from feasts_spark.sources.tableio import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        pdf = pd.DataFrame({
            "series_key": list(range(200)) * 5,
            "v": range(1000),
        })
        df = spark.createDataFrame(pdf)
        write_bucketed(spark, df, "t_bucket_a", ("series_key",), 8)
        write_bucketed(spark, df, "t_bucket_b", ("series_key",), 8)
        a = spark.table("t_bucket_a")
        b = spark.table("t_bucket_b").withColumnRenamed("v", "v2")
        joined = a.join(b, "series_key")
        s = plan_summary(joined)
        assert s["n_exchanges"] == 0, s["plan"]
        assert joined.count() == 1000 * 5
        # control: the same join on unbucketed views DOES shuffle
        df.createOrReplaceTempView("t_plain")
        p = spark.table("t_plain").join(
            spark.table("t_plain").withColumnRenamed("v", "v2"), "series_key"
        )
        assert plan_summary(p)["n_exchanges"] >= 2
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_ivfpq_serve_plan_shape(spark):
    """IVFADC serving's scale contract: the codes scan is filtered to the
    probed cells BEFORE the Python ADC stage (partition-prunable when the
    codes table is written partitioned by cell), no join anywhere (the
    LUTs ship in the closure), and exactly one exchange — the final
    top-k window over the Q*k rows each partition emits."""
    from feasts_spark.operators.similarity import (
        ivfpq_build_index,
        ivfpq_query_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents, books, codes = ivfpq_build_index(emb, n_cells=8, m=8, n_codes=32)
    out = ivfpq_query_topk(
        cents, books, codes, emb.filter(F.col("vec_id") < 5), k=5, nprobe=2
    )
    plan = formatted_plan(out)
    assert "Join" not in plan and "CartesianProduct" not in plan
    s = plan_summary(out)
    assert s["n_exchanges"] == 1, s["plan"]
    # the probed-cell filter must sit BELOW the ADC serve stage (so a
    # cell-partitioned codes table would prune at the scan) — in the tree
    # section, top-down: serve MapInPandas, then the Filter, then the
    # build-time encode MapInPandas (codes is in-flight in this test; a
    # persisted codes table replaces everything below the Filter with a
    # pruned scan)
    tree = plan.split("\n\n")[0].splitlines()
    py_idx = [i for i, ln in enumerate(tree) if "MapInPandas" in ln]
    filt_idx = [i for i, ln in enumerate(tree) if "Filter" in ln]
    assert len(py_idx) == 2, tree
    assert any(py_idx[0] < i < py_idx[1] for i in filt_idx), \
        "cell filter not between the ADC serve stage and the codes source"
    # and that in-tree Filter is really the probed-cell pruning predicate
    assert any("Condition" in ln and "cell#" in ln and " IN " in ln
               for ln in plan.splitlines()), plan


def test_conv_flow_single_scan_no_python(spark, events):
    """The GROUPING SETS pack must keep ONE source scan (the naive
    union shape re-scans per leg) and stay fully JVM-side."""
    from feasts_spark.operators.flow import conv_flow

    tr = events.select(
        F.col("user_id").alias("conv_id"),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.when(F.col("event_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant")).alias("role"),
        F.col("event_type").alias("tool"),
        F.col("ts"),
    )
    s = plan_summary(conv_flow(tr))
    assert s["n_scans"] == 1, s
    assert s["n_python"] == 0, s
    plan = formatted_plan(conv_flow(tr))
    assert "Expand" in plan  # grouping sets, not a per-leg re-aggregate


def test_conv_flow_sketch_single_scan_no_join(spark, events):
    """The bounded-state sketch path must ALSO keep one source scan:
    assembling edge scalars and histograms as two frames + a join
    re-executes the raw scan/window/grouping-sets subtree (column
    pruning defeats exchange reuse), so the operator fuses them into
    one re-aggregation — no join node anywhere in the plan."""
    from feasts_spark.operators.flow import conv_flow_sketch

    tr = events.select(
        F.col("user_id").alias("conv_id"),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.when(F.col("event_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant")).alias("role"),
        F.col("event_type").alias("tool"),
        F.col("ts"),
    )
    s = plan_summary(conv_flow_sketch(tr))
    assert s["n_scans"] == 1, s
    assert s["n_python"] == 0, s
    plan = formatted_plan(conv_flow_sketch(tr))
    assert "Expand" in plan
    assert "Join" not in plan, plan


def test_stitch_range_serving_plan(spark, events, tmp_path):
    """Over MATERIALIZED tiers the stitched range read must be: 3
    column-pruned tier scans with the bucket_ts span filters pushed
    down, no raw scan, and exactly ONE exchange (the final series agg —
    partial+final, so tier rows combine map-side)."""
    import datetime as dt

    from feasts_spark.operators.rollup import (
        rollup_cascade,
        rollup_raw,
        stitch_range,
    )

    r1m = rollup_raw(events, "1m", "user_id", "ts", "value")
    tiers = {}
    for name, df in (("1m", r1m), ("1h", rollup_cascade(r1m, "1h")),
                     ("1d", rollup_cascade(rollup_cascade(r1m, "1h"),
                                           "1d"))):
        df.write.parquet(str(tmp_path / name))
        tiers[name] = spark.read.parquet(str(tmp_path / name))
    got = stitch_range(tiers, dt.datetime(2024, 1, 3, 5, 17),
                       dt.datetime(2024, 1, 27, 21, 43))
    s = plan_summary(got)
    assert s["n_scans"] == 3, s      # one per tier, never the raw events
    assert s["n_exchanges"] == 1, s  # only the final series aggregate
    assert s["n_python"] == 0, s
    assert s["pushed_filters"], "bucket_ts span not pushed into tier scans"
    from feasts_spark.plans import count_nodes
    assert count_nodes(s["plan"], "HashAggregate") >= 2  # partial + final
