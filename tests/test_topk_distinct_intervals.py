"""Tests for topk, distinct-cascade, interval, and integrity operators."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from feasts_spark.operators.distinct import distinct_rollup, hll_distinct_tiers
from feasts_spark.operators.integrity import turn_digest
from feasts_spark.operators.intervals import activity_episodes, interval_join
from feasts_spark.operators.rollup import rollup_raw
from feasts_spark.operators.topk import topk_by_group

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


# ---------------------------------------------------------------- topk ----

def test_topk_exact_counts_and_tie_break(spark):
    rows = (
        [("a", "x")] * 5 + [("a", "y")] * 3 + [("a", "z")] * 3
        + [("a", "w")] * 1 + [("b", "q")] * 2
    )
    df = spark.createDataFrame(rows, "grp string, item string")
    out = topk_by_group(df, 2, ["grp"], "item").orderBy("grp", "rnk")
    got = [(r.grp, r.item, r.cnt, r.rnk) for r in out.collect()]
    # tie between y and z at 3 -> 'y' wins lexicographically
    assert got == [("a", "x", 5, 1), ("a", "y", 3, 2), ("b", "q", 2, 1)]


def test_topk_k_validation(spark):
    df = spark.createDataFrame([("a", "x")], "grp string, item string")
    with pytest.raises(ValueError):
        topk_by_group(df, 0, ["grp"], "item")


# ------------------------------------------------------------- distinct ----

def test_distinct_rollup_exact(spark):
    rows = [
        (_ts(0), 1), (_ts(0), 1), (_ts(0), 2),          # minute 0: {1,2}
        (_ts(1), 3),                                     # minute 1: {3}
        (_ts(60), 1), (_ts(60), 4),                      # hour 1:   {1,4}
    ]
    df = spark.createDataFrame(rows, "ts timestamp, uid long")
    got = {
        r.bucket_ts: (r.n_points, r.n_distinct)
        for r in distinct_rollup(df, "1h", "uid").collect()
    }
    assert got == {T0: (4, 3), _ts(60): (2, 2)}


def test_hll_cascade_equals_direct_sketch(spark):
    # cascaded 1d estimate must land within a hair of sketching the day
    # directly from raw (union keeps HLL_8 registers vs HLL_4 compact,
    # so bit-equality is not guaranteed) and within ~2% of exact.
    n = 5000
    df = spark.range(n).select(
        (F.col("id") % 997).alias("uid"),
        F.to_timestamp(
            F.lit("2024-01-01 00:00:00")
        ).cast("timestamp").alias("base"),
    ).select(
        "uid",
        (F.col("base") + F.make_interval(secs=(F.col("uid") * 61) % 86000))
        .alias("ts"),
    )
    tiers = hll_distinct_tiers(df, "uid", "ts", lgk=12)
    day = {r.bucket_ts: r.n_est for r in tiers.filter(F.col("tier") == "1d").collect()}
    direct = (
        df.groupBy(F.date_trunc("day", "ts").alias("bucket_ts"))
        .agg(
            F.round(
                F.hll_sketch_estimate(F.hll_sketch_agg("uid", F.lit(12)))
            ).cast("long").alias("n_est"),
            F.count_distinct("uid").alias("n_exact"),
        )
    )
    for r in direct.collect():
        assert abs(day[r.bucket_ts] - r.n_est) / r.n_exact < 0.005
        assert abs(day[r.bucket_ts] - r.n_exact) / r.n_exact < 0.02
    # determinism: re-running the cascade reproduces identical estimates
    again = {
        r.bucket_ts: r.n_est
        for r in hll_distinct_tiers(df, "uid", "ts", lgk=12)
        .filter(F.col("tier") == "1d").collect()
    }
    assert again == day


def test_hll_tier_sums_consistent(spark):
    df = spark.createDataFrame(
        [(_ts(m), m % 7) for m in range(0, 180, 3)], "ts timestamp, uid long"
    )
    out = hll_distinct_tiers(df, "uid", "ts")
    by_tier = {t: c for t, c in out.groupBy("tier").count().collect()}
    assert by_tier["1m"] == 60 and by_tier["1h"] == 3 and by_tier["1d"] == 1
    # small-cardinality estimates are exact in HLL's hash-set warmup mode
    d = out.filter("tier = '1d'").collect()[0]
    assert d.n_est == 7


# ------------------------------------------------------------ intervals ----

def test_activity_episodes_islands(spark):
    # series 'a': active buckets at hours 0,1,2 and 5,6 (gap at 3-4)
    rows = []
    for h in (0, 1, 2, 5, 6):
        rows += [("a", _ts(h * 60 + m), 1.0) for m in range(3)]
    rows += [("a", _ts(9 * 60), 1.0)]  # hour 9: only 1 point, below min
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    rolled = rollup_raw(df, "1h", "k", "ts", "value")
    eps = activity_episodes(rolled, "1h", min_points=2).orderBy("episode_start")
    got = [
        (r.episode_start, r.episode_end, r.n_buckets, r.total_points)
        for r in eps.collect()
    ]
    assert got == [
        (T0, _ts(3 * 60), 3, 9),
        (_ts(5 * 60), _ts(7 * 60), 2, 6),
    ]


def test_interval_join_matches_naive_range_join(spark):
    rows = []
    for h in (0, 1, 2, 5, 6):
        rows += [("a", _ts(h * 60 + 10 * m), float(m)) for m in range(3)]
    probes = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    ivals = spark.createDataFrame(
        [("a", T0, _ts(90)), ("a", _ts(5 * 60), _ts(6 * 60 + 15))],
        "k string, episode_start timestamp, episode_end timestamp",
    )
    got = interval_join(probes, ivals, "k", "ts", tier="1h")
    naive = probes.alias("p").join(
        ivals.alias("i"),
        (F.col("p.k") == F.col("i.k"))
        & (F.col("p.ts") >= F.col("i.episode_start"))
        & (F.col("p.ts") < F.col("i.episode_end")),
    )
    # [0:00,1:30) covers 6 probes; [5:00,6:15) covers 5
    assert got.count() == naive.count() == 11
    a = sorted((r.ts, r.episode_start) for r in got.collect())
    b = sorted((r["ts"], r["episode_start"]) for r in naive.collect())
    assert a == b


def test_interval_join_left_keeps_unmatched(spark):
    probes = spark.createDataFrame(
        [("a", _ts(0)), ("a", _ts(500))], "k string, ts timestamp"
    )
    ivals = spark.createDataFrame(
        [("a", T0, _ts(60))],
        "k string, episode_start timestamp, episode_end timestamp",
    )
    out = interval_join(probes, ivals, "k", "ts", tier="1h", how="left")
    rows = {r.ts: r.episode_start for r in out.collect()}
    assert rows[_ts(0)] == T0 and rows[_ts(500)] is None


# ------------------------------------------------------------ integrity ----

def test_turn_digest_order_sensitive_and_contiguous(spark):
    a = spark.createDataFrame(
        [("c1", 0, "hello"), ("c1", 1, "world"), ("c2", 0, "x")],
        "conv_id string, turn_idx int, text string",
    )
    # same rows, different insertion order -> identical digest
    b = spark.createDataFrame(
        [("c2", 0, "x"), ("c1", 1, "world"), ("c1", 0, "hello")],
        "conv_id string, turn_idx int, text string",
    )
    da = {r.conv_id: (r.digest, r.contiguous) for r in turn_digest(a).collect()}
    db = {r.conv_id: (r.digest, r.contiguous) for r in turn_digest(b).collect()}
    assert da == db
    assert all(c for _, c in da.values())
    # swapped text order -> different digest
    c = spark.createDataFrame(
        [("c1", 0, "world"), ("c1", 1, "hello")],
        "conv_id string, turn_idx int, text string",
    )
    dc = turn_digest(c).collect()[0]
    assert dc.digest != da["c1"][0]


def test_turn_digest_flags_non_contiguous(spark):
    df = spark.createDataFrame(
        [("c1", 0, "a"), ("c1", 2, "b"), ("c2", 1, "a"), ("c2", 2, "b")],
        "conv_id string, turn_idx int, text string",
    )
    got = {r.conv_id: r.contiguous for r in turn_digest(df).collect()}
    assert got == {"c1": False, "c2": False}


def test_turn_digest_matches_duckdb(spark):
    import duckdb

    rows = [("c1", 0, "alpha"), ("c1", 1, "beta"), ("c1", 2, "gamma"),
            ("c9", 0, "solo")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {r.conv_id: r.digest for r in turn_digest(df).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(conv_id VARCHAR, turn_idx INT, text VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    want = dict(
        con.execute(
            "SELECT conv_id, md5(string_agg(md5(text), '' ORDER BY turn_idx)) "
            "FROM t GROUP BY conv_id"
        ).fetchall()
    )
    assert got == want


def test_interval_join_tolerates_degenerate_intervals(spark):
    """Empty intervals match nothing (like a range join); a sub-bucket
    interval starting on a bucket boundary must not crash sequence()."""
    probes = spark.createDataFrame(
        [("a", _ts(0)), ("a", _ts(60))], "k string, ts timestamp"
    )
    ivals = spark.createDataFrame(
        [
            ("a", T0, T0),                                   # empty
            ("a", _ts(60), _ts(60) + dt.timedelta(seconds=30)),  # sub-bucket
        ],
        "k string, episode_start timestamp, episode_end timestamp",
    )
    out = interval_join(probes, ivals, "k", "ts", tier="1h").collect()
    assert [(r.ts, r.episode_start) for r in out] == [(_ts(60), _ts(60))]


def test_interval_join_subsecond_end_covers_final_bucket(spark):
    """An interval ending 400ms into an hour must still cover that hour's
    bucket: a probe at 11:00:00.1 inside [10:59:00, 11:00:00.4) has to
    match, exactly as the naive range join would (round-3 review finding:
    a 1-second stepback dropped the final bucket for sub-second ends)."""
    import datetime as dt

    from feasts_spark.operators.intervals import interval_join

    iv = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 59, 0),
          dt.datetime(2024, 1, 1, 11, 0, 0, 400_000))],
        "user_id long, episode_start timestamp, episode_end timestamp",
    )
    probes = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 11, 0, 0, 100_000)),   # inside
         (1, dt.datetime(2024, 1, 1, 11, 0, 0, 500_000)),   # past end
         (1, dt.datetime(2024, 1, 1, 10, 59, 30))],          # inside
        "user_id long, ts timestamp",
    )
    got = interval_join(probes, iv, "user_id", "ts", tier="1h").collect()
    assert sorted(r.ts.microsecond for r in got) == [0, 100_000]
