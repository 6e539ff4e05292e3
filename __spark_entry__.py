"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship pipeline on sf0.001: events -> tier rollups ->
                gap-fill -> per-series feature pack.
queries()     — one entry per implemented operator (SURVEY.md §2);
                each callable (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent ANSI SQL for every SQL-expressible query.

Convention: every float aggregate is rounded to 4dp IN BOTH the Spark
query and the oracle so the driver's value-hash comparison is robust to
summation-order ULP differences between engines. Column names are aliased
identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _round_cols(df: DataFrame, cols: list[str], nd: int = 4) -> DataFrame:
    # Tie-stable rounding: floor(x*10^nd + 0.500001)/10^nd, mirrored
    # verbatim in the oracle SQL. Two failure modes this kills:
    #   (a) Spark round() HALF_UPs the exact binary while DuckDB rounds the
    #       shortest decimal repr — .xxxx5 ties flip between engines;
    #   (b) summation-order ULP differences (cascade re-agg vs direct agg)
    #       put the two engines' doubles on opposite sides of an EXACT .5
    #       boundary. The 1e-6 nudge moves the boundary off the decimal tie
    #       so ULP-scale (~1e-10) divergence cannot straddle it.
    p = float(10**nd)
    for c in cols:
        df = df.withColumn(c, F.floor(F.col(c) * p + F.lit(0.500001)) / p)
    return df


def _sql_r4(expr: str) -> str:
    """The oracle-side twin of _round_cols for 4dp."""
    return f"floor(({expr}) * 1e4 + 0.500001::DOUBLE) / 1e4"


def _r4(col: str):
    """Spark-side tie-stable 4dp rounding — THE single definition (twin of
    _sql_r4); every query must use this rather than re-inlining the
    expression so the 0.500001 nudge stays identical everywhere."""
    return F.floor(F.col(col) * 1e4 + F.lit(0.500001)) / 1e4


# ---------------------------------------------------------------------------
# Rollups (SURVEY.md §2.5)
# ---------------------------------------------------------------------------




def _cascade_oracle(trunc: str) -> str:
    # oracle computes the tier DIRECTLY from raw rows — the cascade must
    # re-aggregate to the same values (arg-min/arg-max by ts for first/last)
    return f"""
    SELECT user_id AS series_key, date_trunc('{trunc}', ts) AS bucket_ts,
           count(*) AS n_points, {_sql_r4('sum(value)')} AS val_sum,
           min(value) AS val_min, max(value) AS val_max,
           {_sql_r4('avg(value)')} AS val_avg,
           arg_min(value, ts) AS val_first, arg_max(value, ts) AS val_last
    FROM events GROUP BY 1, 2
    """


_ROLLUP_PACK_COLS = ["series_key", "bucket_ts", "n_points", "val_sum",
                     "val_min", "val_max", "val_avg", "val_first", "val_last"]


def q_rollup_pack(spark, sf_dir):
    """The full rollup surface in one tier-tagged driver row: the plain
    1m rollup straight from raw, the SAME minute tier through the salted
    two-phase skew path (operators/skew.py, heavy_threshold=40 so most
    keys take the salted route at sf0.01), the 1m->1h->1d cascade
    re-aggregation, and the 1h tier rebuilt via LATE-DATA INCREMENTAL
    REFRESH (a deterministic ~10% of events withheld as the late batch,
    then rollup_refresh merges only the invalidated buckets — the
    continuous-aggregate out-of-order path). Every tier's oracle
    recomputes DIRECTLY from raw events, so one green row proves (a) the
    base rollup, (b) salted == plain, (c) cascade re-aggregation exact at
    every hop, (d) refresh == full recompute, and (e) the STORAGE LOOP —
    the same withheld 10% lands in the `1h_realtime` tag as a second
    snapshot-table commit that a ContinuousAggregate has NOT refreshed,
    and `read_fresh()` (the read-only real-time view over the versioned
    delta) must still equal the full recompute, proving snapshot
    append/commit, the cagg refresh cursor, and the version-addressed
    merge view end-to-end against DuckDB, and (f) range SERVING — a
    24.7-day awkwardly-aligned window answered by stitch_range from the
    coarsest covering tiers equals DuckDB's direct aggregate of the raw
    events in the window. Plain decomposable aggregates — safe to pack
    (see the Catalyst CASE-packing hazard note on q_usage_1h)."""
    from feasts_spark.operators.rollup import (
        rollup_cascade,
        rollup_raw,
        rollup_refresh,
    )
    from feasts_spark.operators.skew import salted_rollup

    _utc(spark)
    e = _events(spark, sf_dir)
    r1m = rollup_raw(e, "1m", "user_id", "ts", "value")
    salted = salted_rollup(
        e, "1m", key_col="user_id", ts_col="ts", value_col="value",
        heavy_threshold=40,
    )
    r1h = rollup_cascade(r1m, "1h")
    r1d = rollup_cascade(r1h, "1d")
    is_late = F.pmod(F.xxhash64("event_id"), F.lit(10)) == 0
    refreshed = rollup_refresh(
        rollup_raw(e.filter(~is_late), "1h", "user_id", "ts", "value"),
        e.filter(is_late), "1h", "user_id", "ts", "value",
    )

    # (e) the same on-time/late split through the REAL storage loop:
    # two snapshot commits, one refreshed, one only visible to the
    # version-addressed real-time view
    import tempfile

    from feasts_spark.operators.continuous import ContinuousAggregate
    from feasts_spark.sources.snapshots import SnapshotTable

    root = tempfile.mkdtemp(prefix="feasts_rt_view_")
    snap_src = SnapshotTable(spark, root, "raw", stats_cols=("ts",))
    snap_tgt = SnapshotTable(spark, root, "tier_1h",
                             stats_cols=("bucket_ts",))
    cols = ["user_id", "ts", "value"]
    snap_src.append(e.filter(~is_late).select(cols))
    cagg = ContinuousAggregate(snap_src, snap_tgt, "1h",
                               key_col="user_id", ts_col="ts",
                               value_col="value")
    cagg.refresh()
    snap_src.append(e.filter(is_late).select(cols))
    realtime = cagg.read_fresh()

    # (f) range SERVING: an awkwardly-aligned 24.7-day window answered
    # from the coarsest covering tiers (interior days from the 1d frame,
    # ragged edges from 1h then 1m — raw points never touched) must
    # equal DuckDB aggregating raw events in the window directly
    import datetime as _dtm

    from feasts_spark.operators.rollup import stitch_range

    rng_lo = _dtm.datetime(2024, 1, 3, 5, 17)
    rng_hi = _dtm.datetime(2024, 1, 27, 21, 43)
    stitched = stitch_range(
        {"1m": r1m, "1h": r1h, "1d": r1d}, rng_lo, rng_hi
    ).withColumn(
        "bucket_ts", F.lit(rng_lo).cast(r1m.schema["bucket_ts"].dataType)
    )

    out = None
    for tag, df in (("1m", r1m), ("1m_salted", salted), ("1h", r1h),
                    ("1d", r1d), ("1h_refresh", refreshed),
                    ("1h_realtime", realtime), ("range_agg", stitched)):
        part = df.select(F.lit(tag).alias("tier"), *_ROLLUP_PACK_COLS)
        out = part if out is None else out.unionByName(part)
    return _round_cols(out, ["val_sum", "val_avg"])


def _rollup_pack_oracle() -> str:
    parts = [
        f"SELECT '{tag}' AS tier, * FROM ({_cascade_oracle(trunc)})"
        for tag, trunc in (("1m", "minute"), ("1m_salted", "minute"),
                           ("1h", "hour"), ("1d", "day"),
                           # refresh == full recompute: same hourly oracle
                           ("1h_refresh", "hour"),
                           # the snapshot-table real-time view likewise
                           ("1h_realtime", "hour"))
    ]
    # tier-stitched range aggregate == direct aggregate of raw events in
    # the window (same summary algebra, one row per series)
    parts.append(f"""
    SELECT 'range_agg' AS tier, user_id AS series_key,
           TIMESTAMP '2024-01-03 05:17:00' AS bucket_ts,
           count(*) AS n_points, {_sql_r4('sum(value)')} AS val_sum,
           min(value) AS val_min, max(value) AS val_max,
           {_sql_r4('avg(value)')} AS val_avg,
           arg_min(value, ts) AS val_first, arg_max(value, ts) AS val_last
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-03 05:17:00'
      AND ts <  TIMESTAMP '2024-01-27 21:43:00'
    GROUP BY 1, 2, 3
    """)
    return "\nUNION ALL\n".join(parts)


def q_props_rollup(spark, sf_dir):
    """Hourly tier rollup over the numeric `k` field inside the events
    table's JSON `props` column (operators/rollup.py props_field_rollup)
    — metrics living in the property bag, not a typed column. Oracled by
    DuckDB's json_extract_string; NULL/missing fields drop out on both
    engines."""
    from feasts_spark.operators.rollup import props_field_rollup

    _utc(spark)
    r = props_field_rollup(
        _events(spark, sf_dir), "1h", "k", "user_id", "ts", "props"
    )
    return _round_cols(
        r.select("series_key", "bucket_ts", "n_points", "val_sum", "val_min",
                 "val_max", "val_avg", "val_first", "val_last"),
        ["val_sum", "val_avg"],
    )


ORACLE_PROPS_ROLLUP = f"""
WITH v AS (
  SELECT user_id, ts,
         TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS pv
  FROM events
)
SELECT user_id AS series_key, date_trunc('hour', ts) AS bucket_ts,
       count(*) AS n_points, {_sql_r4('sum(pv)')} AS val_sum,
       min(pv) AS val_min, max(pv) AS val_max,
       {_sql_r4('avg(pv)')} AS val_avg,
       arg_min(pv, ts) AS val_first, arg_max(pv, ts) AS val_last
FROM v WHERE pv IS NOT NULL GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Gap-fill (locf + linear)
# ---------------------------------------------------------------------------

def q_retention_1m(spark, sf_dir):
    """Tiered retention window on the 1m rollup: only buckets within the
    last 2 days of the corpus survive. The filter is a pushed-down scan
    predicate (partition-pruned on dt-partitioned tables at scale)."""
    import datetime as dt

    from feasts_spark.operators.retention import enforce_retention
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    ev = _events(spark, sf_dir)
    # deterministic "now": corpus max ts (driver-side scalar, O(1) agg)
    now = ev.agg(F.max("ts")).collect()[0][0]
    r = rollup_raw(ev, "1m", "user_id", "ts", "value")
    kept = enforce_retention(
        r, "1m", now, policy={"1m": "2 days"}, ts_col="bucket_ts"
    )
    return _round_cols(
        kept.select("series_key", "bucket_ts", "n_points", "val_sum",
                    "val_min", "val_max", "val_avg"),
        ["val_sum", "val_avg"],
    )


ORACLE_RETENTION_1M = """
WITH now_t AS (SELECT max(ts) AS now FROM events),
r AS (
  SELECT user_id AS series_key, date_trunc('minute', ts) AS bucket_ts,
         count(*) AS n_points,
         floor(sum(value) * 1e4 + 0.500001::DOUBLE) / 1e4 AS val_sum,
         min(value) AS val_min, max(value) AS val_max,
         floor(avg(value) * 1e4 + 0.500001::DOUBLE) / 1e4 AS val_avg
  FROM events GROUP BY 1, 2
)
SELECT r.* FROM r, now_t
WHERE r.bucket_ts >= now_t.now - INTERVAL 2 DAY
"""


_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 350.0, 64


def q_hist_quantile_1d(spark, sf_dir):
    """Mergeable histogram-sketch rollup: 1m histograms cascaded to 1d
    (array sums — never rescanning raw), then q50/q95 from the merged
    sketch. The oracle recomputes the identical sketch math directly from
    raw rows, so it verifies the cascade end to end."""
    from feasts_spark.operators.sketch import (
        hist_cascade,
        hist_quantile,
        hist_rollup,
    )

    _utc(spark)
    h1m = hist_rollup(
        _events(spark, sf_dir), "1m", _HIST_LO, _HIST_HI, _HIST_BINS,
        key_col="user_id",
    )
    h1d = hist_cascade(hist_cascade(h1m, "1h", _HIST_BINS), "1d", _HIST_BINS)
    out = hist_quantile(h1d, 0.5, _HIST_LO, _HIST_HI, out_col="q50")
    out = hist_quantile(out, 0.95, _HIST_LO, _HIST_HI, out_col="q95")
    return out.select(
        "series_key", "bucket_ts", "n_points", _r4("q50").alias("q50"),
        _r4("q95").alias("q95")
    )


def _hist_oracle() -> str:
    lo, hi, nb = _HIST_LO, _HIST_HI, _HIST_BINS
    width_lit = repr((hi - lo) / nb)  # same double literal Spark bins with
    width_sql = f"((CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE)) / {nb})"

    def qsel(q: float, name: str) -> str:
        rank = f"CAST(ceil(CAST({q} AS DOUBLE) * n) AS BIGINT)"
        return f"""
  SELECT user_id, d, {rank} AS rank, bin, c, cm,
         row_number() OVER (PARTITION BY user_id, d ORDER BY bin) AS rn
  FROM cum WHERE cm >= {rank}
"""

    def qval(name: str) -> str:
        # value = lo + width * (bin + (rank - cum_before)/in_bin)
        return f"""CAST({lo} AS DOUBLE) + {width_sql} *
      (CAST(bin AS DOUBLE) + (CAST(rank AS DOUBLE) - CAST(cm - c AS DOUBLE))
                             / CAST(greatest(c, 1) AS DOUBLE))"""

    return f"""
WITH binned AS (
  SELECT user_id, date_trunc('day', ts) AS d,
         least(greatest(CAST(floor((value - CAST({lo} AS DOUBLE)) / {width_lit}) AS INT), 0), {nb - 1}) AS bin
  FROM events
), pb AS (
  SELECT user_id, d, bin, count(*) AS c FROM binned GROUP BY 1, 2, 3
), cum AS (
  SELECT user_id, d, bin, c,
         sum(c) OVER (PARTITION BY user_id, d ORDER BY bin) AS cm,
         sum(c) OVER (PARTITION BY user_id, d) AS n
  FROM pb
), s50 AS ({qsel(0.5, "q50")}), s95 AS ({qsel(0.95, "q95")}),
p50 AS (
  SELECT user_id, d, {qval("q50")} AS q50 FROM s50 WHERE rn = 1
), p95 AS (
  SELECT user_id, d, {qval("q95")} AS q95 FROM s95 WHERE rn = 1
), np AS (
  SELECT user_id, d, CAST(sum(c) AS BIGINT) AS n_points FROM pb GROUP BY 1, 2
)
SELECT np.user_id AS series_key, np.d AS bucket_ts, np.n_points,
       floor(p50.q50 * 1e4 + 0.500001::DOUBLE) / 1e4 AS q50,
       floor(p95.q95 * 1e4 + 0.500001::DOUBLE) / 1e4 AS q95
FROM np
JOIN p50 ON p50.user_id = np.user_id AND p50.d = np.d
JOIN p95 ON p95.user_id = np.user_id AND p95.d = np.d
"""


def q_anomaly_1d(spark, sf_dir):
    """Tukey-fence anomaly flags on classical-decomposition remainders
    (median ± 2*IQR, exact type-7 quantiles) — all SQL, oracle-replayed."""
    from feasts_spark.operators.anomaly import anomaly_flags
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1d", "user_id", "ts", "value")
    out = anomaly_flags(r, period=7, k=2.0)
    # int flag (-1 = MA-edge row with no remainder): nullable booleans
    # round-trip differently through Arrow in the two engines
    flag = (
        F.when(F.col("is_anomaly").isNull(), F.lit(-1))
        .when(F.col("is_anomaly"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_anomaly")
    )
    return out.select(
        "series_key", "bucket_ts",
        _r4("value").alias("value"), _r4("remainder").alias("remainder"),
        _r4("fence_lo").alias("fence_lo"), _r4("fence_hi").alias("fence_hi"),
        flag,
    )


def _anomaly_oracle() -> str:
    def t7(q: str, pre: str) -> tuple[str, str]:
        """(aggregate columns, final value expr) for a type-7 quantile."""
        rank = f"(qn - 1) * {q}::DOUBLE + 1"
        aggs = (
            f"min(CASE WHEN qrn = floor({rank}) THEN remainder END) AS {pre}lo,\n"
            f"    min(CASE WHEN qrn = floor({rank}) + 1 THEN remainder END) AS {pre}hi"
        )
        val = (
            f"({pre}lo + ((qn - 1) * {q}::DOUBLE + 1 - floor((qn - 1) * {q}::DOUBLE + 1))"
            f" * (coalesce({pre}hi, {pre}lo) - {pre}lo))"
        )
        return aggs, val

    a1, v1 = t7("0.25", "a")
    a2, v2 = t7("0.5", "b")
    a3, v3 = t7("0.75", "c")
    return f"""
WITH r AS (
  SELECT user_id, date_trunc('day', ts) AS bucket_ts, avg(value) AS v
  FROM events GROUP BY 1, 2
), s AS (
  SELECT user_id, bucket_ts, v,
         row_number() OVER w AS rn,
         CASE WHEN count(v) OVER (w ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) = 7
              THEN avg(v) OVER (w ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) END
           AS trend
  FROM r WINDOW w AS (PARTITION BY user_id ORDER BY bucket_ts)
), d AS (
  SELECT *, v - trend AS detr, (rn - 1) % 7 AS pos FROM s
), fig0 AS (
  SELECT user_id, pos, avg(detr) AS fr FROM d GROUP BY 1, 2
), fig AS (
  SELECT user_id, pos, fr - avg(fr) OVER (PARTITION BY user_id) AS figure
  FROM fig0
), rem AS (
  SELECT d.user_id, d.bucket_ts, d.v AS value,
         d.v - d.trend - fig.figure AS remainder
  FROM d JOIN fig ON fig.user_id = d.user_id AND fig.pos = d.pos
), nn AS (
  SELECT user_id, remainder,
         row_number() OVER (PARTITION BY user_id ORDER BY remainder) AS qrn,
         count(*) OVER (PARTITION BY user_id) AS qn
  FROM rem WHERE remainder IS NOT NULL
), qa AS (
  SELECT user_id, max(qn) AS qn,
    {a1},
    {a2},
    {a3}
  FROM nn GROUP BY user_id
), fences AS (
  SELECT user_id,
    ({v2} - 2.0::DOUBLE * ({v3} - {v1})) AS fence_lo,
    ({v2} + 2.0::DOUBLE * ({v3} - {v1})) AS fence_hi
  FROM qa
)
SELECT rem.user_id AS series_key, rem.bucket_ts,
  floor(rem.value * 1e4 + 0.500001::DOUBLE) / 1e4 AS value,
  floor(rem.remainder * 1e4 + 0.500001::DOUBLE) / 1e4 AS remainder,
  floor(f.fence_lo * 1e4 + 0.500001::DOUBLE) / 1e4 AS fence_lo,
  floor(f.fence_hi * 1e4 + 0.500001::DOUBLE) / 1e4 AS fence_hi,
  CASE WHEN rem.remainder IS NULL THEN -1
       WHEN rem.remainder < f.fence_lo OR rem.remainder > f.fence_hi THEN 1
       ELSE 0 END AS is_anomaly
FROM rem JOIN fences f ON f.user_id = rem.user_id
"""


ORACLE_LTTB_1H = """
WITH RECURSIVE base AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts, avg(value) AS v
  FROM events GROUP BY 1, 2
), o AS (
  SELECT user_id, bucket_ts, v,
         row_number() OVER (PARTITION BY user_id ORDER BY bucket_ts) - 1 AS idx,
         count(*) OVER (PARTITION BY user_id) AS n,
         -- the Spark kernel sees datetime64[ns].astype(float64): ns ticks
         -- rounded to the nearest representable double
         CAST(epoch_ns(bucket_ts) AS DOUBLE) AS tf
  FROM base
), small AS (
  SELECT user_id, bucket_ts, v, n FROM o WHERE n <= 24
), big AS (
  SELECT * FROM o WHERE n > 24
), edges AS (
  -- numpy linspace(1, n-1, 23).astype(int64): interior = trunc(start+i*step)
  -- in float64, endpoint pinned EXACTLY to stop (linspace sets y[-1] = stop)
  SELECT b.user_id, i.i,
         CASE WHEN i.i = 22 THEN b.n - 1
              ELSE CAST(trunc(CAST(i.i AS DOUBLE)
                   * ((CAST(b.n AS DOUBLE) - 2) / 22.0) + 1) AS BIGINT) END AS e
  FROM (SELECT DISTINCT user_id, n FROM big) b
  CROSS JOIN (SELECT unnest(generate_series(0, 22)) AS i) i
), bkt AS (
  SELECT e0.user_id, e0.i AS b, e0.e AS lo, e1.e AS hi,
         e1.e AS nlo, coalesce(e2.e, bn.n) AS nhi
  FROM edges e0
  JOIN edges e1 ON e1.user_id = e0.user_id AND e1.i = e0.i + 1
  LEFT JOIN edges e2 ON e2.user_id = e0.user_id AND e2.i = e0.i + 2
  JOIN (SELECT DISTINCT user_id, n FROM big) bn ON bn.user_id = e0.user_id
  WHERE e0.i <= 21
), nbavg AS (
  SELECT bkt.user_id, bkt.b, avg(big.tf) AS avg_t, avg(big.v) AS avg_v
  FROM bkt JOIN big ON big.user_id = bkt.user_id
                   AND big.idx >= bkt.nlo AND big.idx < bkt.nhi
  GROUP BY bkt.user_id, bkt.b
), sel AS (
  -- sequential LTTB walk: bucket b's pick depends on bucket b-1's pick
  SELECT user_id, -1 AS b, CAST(0 AS BIGINT) AS prev
  FROM (SELECT DISTINCT user_id FROM big)
  UNION ALL
  SELECT s.user_id, s.b + 1 AS b,
         first(c.idx ORDER BY abs((p.tf - nb.avg_t) * (c.v - p.v)
                 - (p.tf - c.tf) * (nb.avg_v - p.v)) DESC, c.idx ASC) AS prev
  FROM sel s
  JOIN bkt ON bkt.user_id = s.user_id AND bkt.b = s.b + 1
  JOIN big c ON c.user_id = s.user_id AND c.idx >= bkt.lo AND c.idx < bkt.hi
  JOIN big p ON p.user_id = s.user_id AND p.idx = s.prev
  JOIN nbavg nb ON nb.user_id = s.user_id AND nb.b = s.b + 1
  WHERE s.b < 21
  GROUP BY s.user_id, s.b
), kept AS (
  SELECT user_id, prev AS idx FROM sel WHERE b >= 0
  UNION ALL
  SELECT user_id, CAST(0 AS BIGINT) FROM (SELECT DISTINCT user_id FROM big)
  UNION ALL
  SELECT user_id, n - 1 FROM (SELECT DISTINCT user_id, n FROM big)
)
SELECT big.user_id AS series_key, big.bucket_ts,
       floor(big.v * 1e4 + 0.500001::DOUBLE) / 1e4 AS val_avg,
       big.n AS orig_n
FROM kept JOIN big ON big.user_id = kept.user_id AND big.idx = kept.idx
UNION ALL
SELECT user_id, bucket_ts,
       floor(v * 1e4 + 0.500001::DOUBLE) / 1e4 AS val_avg, n
FROM small
"""


def q_lttb_1h(spark, sf_dir):
    """LTTB visual downsampling of each hourly series to <= 24 points —
    oracled by ORACLE_LTTB_1H's recursive-CTE replay of the sequential
    bucket walk (the argmax selection is deterministic, so DuckDB can
    re-run it step by step)."""
    from feasts_spark.operators.downsample import lttb_downsample
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1h", "user_id", "ts", "value")
    out = lttb_downsample(r, n_out=24)
    return out.select(
        "series_key", "bucket_ts",
        _r4("val_avg").alias("val_avg"),
        "orig_n",
    )


def q_sessionize_1h(spark, sf_dir):
    """Gap-based sessionization (1h inactivity gap) + per-session stats —
    pure window SQL, one shuffle on the key."""
    from feasts_spark.operators.sessionize import session_stats

    _utc(spark)
    out = session_stats(
        _events(spark, sf_dir), gap_seconds=3600, key_col="user_id",
        ts_col="ts", value_col="value", order_cols=["ts", "event_id"],
    )
    return out.select(
        "series_key", "session_id", "n_events", "session_start",
        "session_end", "duration_s",
        _r4("val_sum").alias("val_sum"),
    )


ORACLE_SESSIONIZE_1H = """
WITH s AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 3600
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
           AS BIGINT) AS session_id
  FROM s
)
SELECT user_id AS series_key, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       max(CAST(floor(epoch(ts)) AS BIGINT))
         - min(CAST(floor(epoch(ts)) AS BIGINT)) AS duration_s,
       floor(sum(value) * 1e4 + 0.500001::DOUBLE) / 1e4 AS val_sum
FROM sess GROUP BY 1, 2
"""


def q_gapfill_locf_1d(spark, sf_dir):
    from feasts_spark.operators.gapfill import gapfill_locf
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1d", "user_id", "ts", "value")
    g = gapfill_locf(r, "1d", value_cols=("val_avg",))
    return g.select(
        "series_key", "bucket_ts", "is_gap",
        _r4("val_avg_filled").alias("val_filled"),
    )


ORACLE_LOCF_1D = """
WITH r AS (
  SELECT user_id, date_trunc('day', ts) AS bucket_ts, avg(value) AS val_avg
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT user_id, min(bucket_ts) AS b0, max(bucket_ts) AS b1 FROM r GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 DAY)) AS bucket_ts
  FROM spans
)
SELECT g.user_id AS series_key, g.bucket_ts,
       r.val_avg IS NULL AS is_gap,
       floor(last_value(r.val_avg IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.bucket_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1e4
         + 0.500001::DOUBLE) / 1e4 AS val_filled
FROM grid g LEFT JOIN r ON r.user_id = g.user_id AND r.bucket_ts = g.bucket_ts
"""


def q_gapfill_linear_1d(spark, sf_dir):
    from feasts_spark.operators.gapfill import gapfill_linear
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1d", "user_id", "ts", "value")
    g = gapfill_linear(r, "1d", value_col="val_avg")
    # Tie-stable 4dp rounding (floor(x*1e4+0.5)) on BOTH engine sides:
    # Spark round() HALF_UPs the exact binary while DuckDB rounds the
    # shortest decimal repr, flipping .xxxx5 ties (see quality_scores).
    return g.select(
        "series_key", "bucket_ts", "is_gap",
        _r4("val_avg_interp").alias("val_interp"),
    )


ORACLE_LINEAR_1D = """
WITH r AS (
  SELECT user_id, date_trunc('day', ts) AS bucket_ts, avg(value) AS val_avg
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT user_id, min(bucket_ts) AS b0, max(bucket_ts) AS b1 FROM r GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 DAY)) AS bucket_ts
  FROM spans
), j AS (
  SELECT g.user_id AS series_key, g.bucket_ts, r.val_avg AS v,
    last_value(r.val_avg IGNORE NULLS) OVER wb AS pv,
    first_value(r.val_avg IGNORE NULLS) OVER wf AS nv,
    last_value(CASE WHEN r.val_avg IS NOT NULL THEN g.bucket_ts END IGNORE NULLS)
      OVER wb AS pt,
    first_value(CASE WHEN r.val_avg IS NOT NULL THEN g.bucket_ts END IGNORE NULLS)
      OVER wf AS nt
  FROM grid g LEFT JOIN r ON r.user_id = g.user_id AND r.bucket_ts = g.bucket_ts
  WINDOW wb AS (PARTITION BY g.user_id ORDER BY g.bucket_ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY g.user_id ORDER BY g.bucket_ts
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT series_key, bucket_ts, v IS NULL AS is_gap,
  floor((CASE WHEN v IS NOT NULL THEN v
              WHEN pv IS NULL THEN nv
              WHEN nv IS NULL THEN pv
              ELSE pv + (nv - pv) * (epoch(bucket_ts) - epoch(pt))
                                    / (epoch(nt) - epoch(pt)) END) * 1e4
        + 0.500001::DOUBLE) / 1e4 AS val_interp
FROM j
"""


# ---------------------------------------------------------------------------
# Correlation tables (reference ACF/PACF, acf.R:61-170)
# ---------------------------------------------------------------------------

def q_acf_table_1h(spark, sf_dir):
    from feasts_spark.operators.cf import acf_table
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1h", "user_id", "ts", "value")
    # short-series filter INSIDE the UDF group: same semantics as a
    # count semi-join (count > 11) without its aggregate + join shuffles
    out = acf_table(r, lag_max=10, min_points=12)
    return out.select("series_key", "lag", _r4("acf").alias("acf"))


ORACLE_ACF_1H = """
WITH r AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts, avg(value) AS v
  FROM events GROUP BY 1, 2
), keyed AS (
  SELECT user_id FROM r GROUP BY 1 HAVING count(*) > 11
), s AS (
  SELECT r.user_id, v,
         row_number() OVER (PARTITION BY r.user_id ORDER BY bucket_ts) AS rn,
         avg(v) OVER (PARTITION BY r.user_id) AS m,
         count(*) OVER (PARTITION BY r.user_id) AS n
  FROM r JOIN keyed USING (user_id)
), c0 AS (
  SELECT user_id, sum((v - m) * (v - m)) / any_value(n) AS acvf0
  FROM s GROUP BY user_id
), lags AS (SELECT unnest(generate_series(1, 10)) AS lag)
SELECT a.user_id AS series_key, lags.lag AS lag,
       floor(((sum((a.v - a.m) * (b.v - b.m)) / any_value(a.n))
              / any_value(c0.acvf0)) * 1e4 + 0.500001::DOUBLE) / 1e4 AS acf
FROM s a
CROSS JOIN lags
JOIN s b ON b.user_id = a.user_id AND b.rn = a.rn + lags.lag
JOIN c0 ON c0.user_id = a.user_id
GROUP BY a.user_id, lags.lag
"""


def q_pacf_table_1h(spark, sf_dir):
    """Full-lag PACF table (Durbin-Levinson over the divisor-n ACF,
    acf.R:111-170) — oracled by _pacf_oracle's UNROLLED D-L recursion in
    DuckDB (pev-chain identical to kernels.acf.durbin_levinson_pacf)."""
    from feasts_spark.operators.cf import pacf_table
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1h", "user_id", "ts", "value")
    return pacf_table(r, lag_max=10, min_points=12).select(
        "series_key", "lag", _r4("pacf").alias("pacf")
    )


def _pacf_oracle(lag_max: int = 10) -> str:
    """Durbin-Levinson PACF unrolled to `lag_max` as plain (non-recursive)
    SQL — an independent DuckDB replay of kernels/acf.py:durbin_levinson_pacf.

    Mirrors the kernel exactly, including the prediction-error-variance
    chain pev_k = pev_{k-1} * (1 - phi_kk^2) as the denominator (NOT the
    algebraically-equal 1 - sum(phi*rho) form — same float op order) and
    the dot-product order phi_{k-1,1}*rho_{k-1} + ... + phi_{k-1,k-1}*rho_1.
    """
    # rho pivot: one column per lag, raw (unrounded) divisor-n ACF
    rho_cols = ",\n    ".join(
        f"max(CASE WHEN lag = {k} THEN rho END) AS r{k}"
        for k in range(1, lag_max + 1)
    )
    # unrolled D-L: a{k} computes phi_kk, b{k} the updated phi vector + pev
    levels = []
    for k in range(2, lag_max + 1):
        dot = " + ".join(f"p{k-1}_{j} * r{k-j}" for j in range(1, k))
        levels.append(
            f"a{k} AS (\n  SELECT *, (r{k} - ({dot})) / pev{k-1} AS p{k}_{k}"
            f" FROM b{k-1}\n)"
        )
        upd = ",\n    ".join(
            f"p{k-1}_{j} - p{k}_{k} * p{k-1}_{k-j} AS p{k}_{j}"
            for j in range(1, k)
        )
        levels.append(
            f"b{k} AS (\n  SELECT *,\n    {upd},\n"
            f"    pev{k-1} * (1.0::DOUBLE - p{k}_{k} * p{k}_{k}) AS pev{k}"
            f" FROM a{k}\n)"
        )
    unroll = ", ".join(levels)
    out = "\nUNION ALL\n".join(
        f"SELECT user_id AS series_key, {k} AS lag,"
        f" floor(p{k}_{k} * 1e4 + 0.500001::DOUBLE) / 1e4 AS pacf"
        f" FROM b{lag_max}"
        for k in range(1, lag_max + 1)
    )
    return f"""
WITH r AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts, avg(value) AS v
  FROM events GROUP BY 1, 2
), keyed AS (
  SELECT user_id FROM r GROUP BY 1 HAVING count(*) > 11
), s AS (
  SELECT r.user_id, v,
         row_number() OVER (PARTITION BY r.user_id ORDER BY bucket_ts) AS rn,
         avg(v) OVER (PARTITION BY r.user_id) AS m,
         count(*) OVER (PARTITION BY r.user_id) AS n
  FROM r JOIN keyed USING (user_id)
), c0 AS (
  SELECT user_id, sum((v - m) * (v - m)) / any_value(n) AS acvf0
  FROM s GROUP BY user_id
), lags AS (SELECT unnest(generate_series(1, {lag_max})) AS lag),
lagd AS (
  SELECT a.user_id, lags.lag AS lag,
         (sum((a.v - a.m) * (b.v - b.m)) / any_value(a.n))
           / any_value(c0.acvf0) AS rho
  FROM s a
  CROSS JOIN lags
  JOIN s b ON b.user_id = a.user_id AND b.rn = a.rn + lags.lag
  JOIN c0 ON c0.user_id = a.user_id
  GROUP BY a.user_id, lags.lag
), piv AS (
  SELECT user_id,
    {rho_cols}
  FROM lagd GROUP BY user_id
), b1 AS (
  SELECT *, r1 AS p1_1, 1.0::DOUBLE - r1 * r1 AS pev1 FROM piv
), {unroll}
{out}
"""


# ---------------------------------------------------------------------------
# SQL-native features (F1, F8, F11, F12 — SURVEY.md §2.1 "SQL alt")
# ---------------------------------------------------------------------------

def q_crossing_points(spark, sf_dir):
    from feasts_spark.functions import crossing_points_df

    _utc(spark)
    return crossing_points_df(
        _events(spark, sf_dir), "user_id", ["ts", "event_id"], "value"
    )


ORACLE_CROSSING = """
WITH v AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value) AS vrn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
), m AS (
  -- Order-statistics median, same formula as the Spark side: engine
  -- percentile interpolation differs in the last ULP for even n.
  SELECT user_id, avg(value) AS med FROM v
  WHERE vrn = (n + 1) // 2 OR vrn = n // 2 + 1 GROUP BY 1
), s AS (
  SELECT e.user_id, (e.value <= m.med) AS ab,
         lead(e.value <= m.med) OVER (PARTITION BY e.user_id
                                      ORDER BY e.ts, e.event_id) AS ab_next
  FROM events e JOIN m USING (user_id)
)
SELECT user_id AS series_key,
       CAST(sum(CASE WHEN ab <> ab_next THEN 1 ELSE 0 END) AS BIGINT)
         AS n_crossing_points
FROM s WHERE ab_next IS NOT NULL GROUP BY 1
"""


def q_shift_level_max(spark, sf_dir):
    from feasts_spark.functions import shift_level_df

    _utc(spark)
    out = shift_level_df(
        _events(spark, sf_dir), "user_id", ["ts", "event_id"], "value", size=10
    )
    return out.select(
        "series_key",
        _r4("shift_level_max").alias("shift_level_max"),
        "shift_level_index",
    )


ORACLE_SHIFT_LEVEL = """
WITH s AS (
  SELECT user_id, value,
         row_number() OVER w AS rn,
         avg(value) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS a10
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), d AS (
  SELECT user_id, rn, a10,
         abs(a10 - lag(a10, 10) OVER (PARTITION BY user_id ORDER BY rn)) AS diff
  FROM s
), ranked AS (
  SELECT user_id, rn, diff,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY floor(diff * 1e6 + 0.500001::DOUBLE) DESC, rn ASC) AS rk
  FROM d WHERE diff IS NOT NULL
)
SELECT user_id AS series_key,
       floor(diff * 1e4 + 0.500001::DOUBLE) / 1e4 AS shift_level_max,
       rn - 9 AS shift_level_index
FROM ranked WHERE rk = 1
"""


def q_shift_var_max(spark, sf_dir):
    from feasts_spark.functions import shift_var_df

    _utc(spark)
    out = shift_var_df(
        _events(spark, sf_dir), "user_id", ["ts", "event_id"], "value", size=10
    )
    # floor(x*1e4+0.5) tie-stable rounding on both engines (Spark HALF_UP
    # vs DuckDB shortest-repr flips .xxxx5 ties, e.g. 3533.76495).
    return out.select(
        "series_key",
        _r4("shift_var_max").alias("shift_var_max"),
        "shift_var_index",
    )


ORACLE_SHIFT_VAR = """
WITH s AS (
  SELECT user_id, value,
         row_number() OVER w AS rn,
         var_samp(value) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
           AS v10
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), d AS (
  SELECT user_id, rn, v10,
         abs(v10 - lag(v10, 10) OVER (PARTITION BY user_id ORDER BY rn)) AS diff
  FROM s
), ranked AS (
  SELECT user_id, rn, diff,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY floor(diff * 1e6 + 0.500001::DOUBLE) DESC, rn ASC) AS rk
  FROM d WHERE diff IS NOT NULL
)
SELECT user_id AS series_key,
       floor(diff * 1e4 + 0.500001::DOUBLE) / 1e4 AS shift_var_max,
       rn - 9 AS shift_var_index
FROM ranked WHERE rk = 1
"""


def q_var_tiled(spark, sf_dir):
    """var_tiled_mean (stability) + var_tiled_var (lumpiness), size=10."""
    from feasts_spark.functions import var_tiled_df

    _utc(spark)
    out = var_tiled_df(
        _events(spark, sf_dir), "user_id", ["ts", "event_id"], "value", size=10
    )
    return out.select(
        "series_key",
        _r4("var_tiled_mean").alias("var_tiled_mean"),
        _r4("var_tiled_var").alias("var_tiled_var"),
    )


ORACLE_VAR_TILED = """
WITH s AS (
  SELECT user_id, value,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY user_id) AS n,
         avg(value) OVER (PARTITION BY user_id) AS m,
         stddev_samp(value) OVER (PARTITION BY user_id) AS sd
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), z AS (
  SELECT user_id, (value - m) / sd AS z, ((rn - 1) // 10) AS tile, n FROM s
), tiles AS (
  SELECT user_id, tile, avg(z) AS tmean, var_samp(z) AS tvar,
         count(*) AS tn, max(n) AS n
  FROM z GROUP BY 1, 2
)
SELECT user_id AS series_key,
       floor((CASE WHEN max(n) < 20 THEN 0.0 ELSE var_samp(tmean) END) * 1e4 + 0.500001::DOUBLE) / 1e4
         AS var_tiled_mean,
       floor((CASE WHEN max(n) < 20 THEN 0.0
                  ELSE var_samp(CASE WHEN tn = 10 THEN tvar END) END) * 1e4 + 0.500001::DOUBLE) / 1e4
         AS var_tiled_var
FROM tiles GROUP BY 1
"""


def q_sql_features_basic(spark, sf_dir):
    """Merged registry row for three SQL-native features — crossing points
    (features.R:260-264), longest flat spot (features.R:349-353) and
    tiled-variance stability/lumpiness (features.R:277-299) — one row per
    series, one driver slot. Each component keeps its own single-shuffle
    plan; the join keys are the tiny per-series outputs (AQE broadcasts
    them), so the merge adds no data-sized shuffle."""
    cp = q_crossing_points(spark, sf_dir)
    fs = q_longest_flat_spot(spark, sf_dir)
    vt = q_var_tiled(spark, sf_dir)
    return cp.join(fs, "series_key").join(vt, "series_key")


def _sql_features_basic_oracle() -> str:
    return (
        f"WITH cp AS ({ORACLE_CROSSING}),\n"
        f"fs AS ({ORACLE_FLAT_SPOT}),\n"
        f"vt AS ({ORACLE_VAR_TILED})\n"
        "SELECT cp.series_key, cp.n_crossing_points, fs.longest_flat_spot,\n"
        "       vt.var_tiled_mean, vt.var_tiled_var\n"
        "FROM cp JOIN fs USING (series_key) JOIN vt USING (series_key)"
    )


def q_shift_features(spark, sf_dir):
    """Merged registry row for the two rolling-window shift features
    (features.R:395-417 / 420-441): max level shift and max variance shift
    with their indices."""
    lvl = q_shift_level_max(spark, sf_dir)
    vr = q_shift_var_max(spark, sf_dir)
    return lvl.join(vr, "series_key")


def _shift_features_oracle() -> str:
    return (
        f"WITH lvl AS ({ORACLE_SHIFT_LEVEL}),\n"
        f"vr AS ({ORACLE_SHIFT_VAR})\n"
        "SELECT lvl.series_key, lvl.shift_level_max, lvl.shift_level_index,\n"
        "       vr.shift_var_max, vr.shift_var_index\n"
        "FROM lvl JOIN vr USING (series_key)"
    )


# ---------------------------------------------------------------------------
# Time-join / downsample / rate / smoothing operators (no feasts analogue —
# rollup-engine surface: TimescaleDB counter_agg, kdb aj, M4 VLDB'14)
# ---------------------------------------------------------------------------

def q_asof_enrich_1h(spark, sf_dir):
    """Backward as-of join: each 'error' event picks up the most recent 1h
    rollup average for its series (union-merge algorithm, one shuffle —
    operators/asof.py). Oracle is DuckDB's native ASOF LEFT JOIN, so the
    inclusive tie semantics are cross-checked engine-to-engine."""
    from feasts_spark.operators.asof import asof_join
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    e = _events(spark, sf_dir)
    r = rollup_raw(e, "1h", "user_id", "ts", "value").select(
        F.col("series_key").alias("user_id"), "bucket_ts", "val_avg"
    )
    probes = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(probes, r, "user_id", "ts", "bucket_ts", ["val_avg"])
    return out.select(
        F.col("user_id").alias("series_key"), "ts", "event_id", "value",
        _r4("val_avg").alias("ref_avg"), "match_ts",
    )


ORACLE_ASOF_1H = """
WITH r AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts, avg(value) AS val_avg
  FROM events GROUP BY 1, 2
), p AS (
  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'error'
)
SELECT p.user_id AS series_key, p.ts, p.event_id, p.value,
       floor(r.val_avg * 1e4 + 0.500001::DOUBLE) / 1e4 AS ref_avg,
       r.bucket_ts AS match_ts
FROM p ASOF LEFT JOIN r ON p.user_id = r.user_id AND p.ts >= r.bucket_ts
"""


def q_m4_1h(spark, sf_dir):
    """M4 downsampling at the 1h tier (operators/downsample.py): the four
    pixel-defining points per bucket as one decomposable struct-min/max
    aggregate. The oracle replays the identical lexicographic struct trick
    in DuckDB (struct_pack min/max), so tie-breaks match exactly."""
    from feasts_spark.operators.downsample import m4_downsample

    _utc(spark)
    return m4_downsample(
        _events(spark, sf_dir), "1h", "user_id", "ts", "value", "event_id"
    )


ORACLE_M4_1H = """
SELECT user_id AS series_key, date_trunc('hour', ts) AS bucket_ts,
       count(*) AS n_points,
       (min(struct_pack(t := ts, e := event_id, v := value))).t AS first_ts,
       (min(struct_pack(t := ts, e := event_id, v := value))).v AS first_val,
       (max(struct_pack(t := ts, e := event_id, v := value))).t AS last_ts,
       (max(struct_pack(t := ts, e := event_id, v := value))).v AS last_val,
       (min(struct_pack(v := value, t := ts, e := event_id))).v AS min_val,
       (min(struct_pack(v := value, t := ts, e := event_id))).t AS min_ts,
       (max(struct_pack(v := value, t := ts, e := event_id))).v AS max_val,
       (max(struct_pack(v := value, t := ts, e := event_id))).t AS max_ts
FROM events GROUP BY 1, 2
"""


def q_counter_rate_1h(spark, sf_dir):
    """Per-bucket counter increase with reset detection (operators/rate.py
    — the PromQL increase() model): one lag window + one hash aggregate
    sharing the same key partitioning."""
    from feasts_spark.operators.rate import counter_increase

    _utc(spark)
    out = counter_increase(
        _events(spark, sf_dir), "1h", "user_id", "ts", "value", ["event_id"]
    )
    return out.select(
        "series_key", "bucket_ts",
        _r4("increase").alias("increase"), "n_resets", "n_samples",
    )


ORACLE_COUNTER_RATE_1H = """
WITH d AS (
  SELECT user_id, ts, value,
         value - lag(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS delta
  FROM events
)
SELECT user_id AS series_key, date_trunc('hour', ts) AS bucket_ts,
       floor(sum(CASE WHEN delta IS NULL THEN 0.0::DOUBLE
                      WHEN delta < 0 THEN value
                      ELSE delta END) * 1e4 + 0.500001::DOUBLE) / 1e4
         AS increase,
       CAST(sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
       count(*) AS n_samples
FROM d GROUP BY 1, 2
"""


def q_ewma_1h(spark, sf_dir):
    """EWMA (alpha=0.3, adjust=False recursion) over the 1h tier averages
    (operators/smooth.py — block-rescaled vectorized prefix scan). The
    oracle replays the recursion literally via a DuckDB recursive CTE, so
    the vectorized kernel is value-checked against the sequential
    definition on every series."""
    from feasts_spark.operators.rollup import rollup_raw
    from feasts_spark.operators.smooth import ewma

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1h", "user_id", "ts", "value")
    out = ewma(r, 0.3)
    return out.select(
        "series_key", "bucket_ts",
        _r4("val_avg").alias("val_avg"), _r4("ewma").alias("ewma"),
    )


ORACLE_EWMA_1H = """
WITH RECURSIVE a AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts, avg(value) AS v
  FROM events GROUP BY 1, 2
), s AS (
  SELECT user_id, bucket_ts, v,
         row_number() OVER (PARTITION BY user_id ORDER BY bucket_ts) AS rn
  FROM a
), rec AS (
  SELECT user_id, bucket_ts, v, rn, v AS ewma FROM s WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.bucket_ts, s.v, s.rn,
         0.3::DOUBLE * s.v + 0.7::DOUBLE * rec.ewma
  FROM s JOIN rec ON s.user_id = rec.user_id AND s.rn = rec.rn + 1
)
SELECT user_id AS series_key, bucket_ts,
       floor(v * 1e4 + 0.500001::DOUBLE) / 1e4 AS val_avg,
       floor(ewma * 1e4 + 0.500001::DOUBLE) / 1e4 AS ewma
FROM rec
"""


def q_timeweight_1h(spark, sf_dir):
    """Time-weighted mean (LOCF + linear trapezoid) and dominant-state
    occupancy per hourly bucket over the RAW irregular event stream
    (operators/timeweight.py — the TimescaleDB time_weight()/state_agg()
    semantics; feasts has no irregular-series path at all, this is what
    makes one aggregable without gap-filling first). Segments split
    across bucket boundaries; ties on ts pair deterministically by
    event_id on both engines."""
    from feasts_spark.operators.timeweight import state_top, time_weighted

    _utc(spark)
    ev = _events(spark, sf_dir)
    tw = time_weighted(ev, "1h", "user_id", "ts", "value",
                       tie_col="event_id")
    st = state_top(ev, "1h", "user_id", "ts", "event_type",
                   tie_col="event_id")
    # same segment algebra on both sides -> identical bucket grain, 1:1
    return tw.join(st, ["series_key", "bucket_ts"]).select(
        "series_key", "bucket_ts",
        _r4("twa_locf").alias("twa_locf"),
        _r4("twa_linear").alias("twa_linear"),
        "covered_us", "state_top", "state_top_us", "n_states",
    )


ORACLE_TIMEWEIGHT_1H = """
WITH seg AS (
  SELECT user_id, ts AS t0, lead(ts) OVER w AS t1, value AS v0,
         lead(value) OVER w AS v1, event_type AS s0
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), segb AS (
  SELECT user_id, t0, t1, v0, v1, s0,
         unnest(generate_series(date_trunc('hour', t0),
                                date_trunc('hour', t1),
                                INTERVAL 1 HOUR)) AS bucket_ts
  FROM seg WHERE t1 > t0
), w AS (
  SELECT user_id, bucket_ts, v0, v1, s0,
         epoch_us(least(t1, bucket_ts + INTERVAL 1 HOUR))
           - epoch_us(greatest(t0, bucket_ts)) AS w_us,
         epoch_us(greatest(t0, bucket_ts)) - epoch_us(t0) AS off_a,
         epoch_us(least(t1, bucket_ts + INTERVAL 1 HOUR))
           - epoch_us(t0) AS off_b,
         epoch_us(t1) - epoch_us(t0) AS dur_us
  FROM segb
), wpos AS (
  SELECT * FROM w WHERE w_us > 0
), tw AS (
  SELECT user_id, bucket_ts,
         sum(w_us * v0) / sum(w_us) AS twa_locf,
         sum(w_us * (v0 + (v1 - v0) * off_a / dur_us
                     + v0 + (v1 - v0) * off_b / dur_us)
             / 2.0::DOUBLE) / sum(w_us) AS twa_linear,
         CAST(sum(w_us) AS BIGINT) AS covered_us
  FROM wpos GROUP BY 1, 2
), sd AS (
  SELECT user_id, bucket_ts, s0 AS state, sum(w_us) AS state_us
  FROM wpos GROUP BY 1, 2, 3
), st AS (
  SELECT user_id, bucket_ts, state AS state_top,
         CAST(state_us AS BIGINT) AS state_top_us,
         CAST(count(*) OVER (PARTITION BY user_id, bucket_ts)
              AS BIGINT) AS n_states,
         row_number() OVER (PARTITION BY user_id, bucket_ts
                            ORDER BY state_us DESC, state ASC) AS rn
  FROM sd
)
SELECT tw.user_id AS series_key, tw.bucket_ts,
       floor(tw.twa_locf * 1e4 + 0.500001::DOUBLE) / 1e4 AS twa_locf,
       floor(tw.twa_linear * 1e4 + 0.500001::DOUBLE) / 1e4 AS twa_linear,
       tw.covered_us, st.state_top, st.state_top_us, st.n_states
FROM tw JOIN st ON tw.user_id = st.user_id
               AND tw.bucket_ts = st.bucket_ts
WHERE st.rn = 1
"""


def q_rate_ewma_1h(spark, sf_dir):
    """Counter-rate, EWMA and time-weighted siblings on their shared
    hourly key — one registry row keeps all the value-exact oracles
    inside the driver's checked window. cr/ew bucket exactly the
    sample-carrying hours; the time-weighted frame ALSO covers gap hours
    a LOCF segment crosses and MISSES a bucket whose only sample is the
    series-final one (nothing closes it), so the FULL OUTER join checks
    every grain — gap hours carry NULL cr/ew columns, final-sample hours
    NULL tw columns — identically on both engines."""
    cr = q_counter_rate_1h(spark, sf_dir)
    ew = q_ewma_1h(spark, sf_dir)
    tw = q_timeweight_1h(spark, sf_dir)
    return cr.join(ew, ["series_key", "bucket_ts"]) \
             .join(tw, ["series_key", "bucket_ts"], "full")


def _rate_ewma_oracle() -> str:
    return (
        f"WITH cr AS ({ORACLE_COUNTER_RATE_1H}),\n"
        f"ew AS ({ORACLE_EWMA_1H}),\n"
        f"tw AS ({ORACLE_TIMEWEIGHT_1H})\n"
        "SELECT series_key, bucket_ts, cr.increase, cr.n_resets,\n"
        "       cr.n_samples, ew.val_avg, ew.ewma,\n"
        "       tw.twa_locf, tw.twa_linear, tw.covered_us,\n"
        "       tw.state_top, tw.state_top_us, tw.n_states\n"
        "FROM cr JOIN ew USING (series_key, bucket_ts)\n"
        "        FULL JOIN tw USING (series_key, bucket_ts)"
    )


def q_calendar_profile(spark, sf_dir):
    """Hour-of-day / day-of-week seasonal fingerprints per series
    (operators/smooth.py calendar_profile) — two map-combined aggregates
    over one scan."""
    from feasts_spark.operators.smooth import calendar_profile

    _utc(spark)
    out = calendar_profile(_events(spark, sf_dir), "user_id", "ts", "value")
    return out.select(
        "series_key", "dim", "idx", "n_points",
        _r4("val_avg").alias("val_avg"), _r4("val_std").alias("val_std"),
    )


ORACLE_CALENDAR_PROFILE = """
SELECT user_id AS series_key, 'hod' AS dim,
       CAST(extract(hour FROM ts) AS INTEGER) AS idx,
       count(*) AS n_points,
       floor(avg(value) * 1e4 + 0.500001::DOUBLE) / 1e4 AS val_avg,
       floor(stddev_samp(value) * 1e4 + 0.500001::DOUBLE) / 1e4 AS val_std
FROM events GROUP BY 1, 3
UNION ALL
SELECT user_id AS series_key, 'dow' AS dim,
       CAST(extract(dow FROM ts) + 1 AS INTEGER) AS idx,
       count(*) AS n_points,
       floor(avg(value) * 1e4 + 0.500001::DOUBLE) / 1e4 AS val_avg,
       floor(stddev_samp(value) * 1e4 + 0.500001::DOUBLE) / 1e4 AS val_std
FROM events GROUP BY 1, 3
"""


# ---------------------------------------------------------------------------
# Decompositions
# ---------------------------------------------------------------------------

def q_decomp_methods_1d(spark, sf_dir):
    """Classical + X-11-method decomposition of the daily rollup, one row
    per (series, bucket, method). Classical covers reference
    classical_decomposition() (decomposition.R); the x11 leg covers the
    X-11 METHOD itself (reference X11(), x11.R:19-91, shells to the
    external Census binary — provenance and algorithm in kernels/x11.py).
    Both legs are all-JVM window/broadcast plans; the oracle twin
    re-derives the full B1-B12 iteration INCLUDING the Henderson/Musgrave
    weights from their closed forms in pure SQL."""
    from feasts_spark.operators.decompose import (
        classical_decomposition,
        x11_decomposition,
    )
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1d", "user_id", "ts", "value")
    cl = classical_decomposition(r, period=7, type="additive", value_col="val_avg")
    cl = cl.select(
        "series_key", "bucket_ts", F.lit("classical").alias("method"),
        _r4("trend").alias("trend"),
        _r4("seasonal").alias("seasonal"),
        _r4("random").alias("irregular"),
        _r4("season_adjust").alias("season_adjust"),
    )
    x11 = x11_decomposition(r, period=7, value_col="val_avg")
    x11 = x11.select(
        "series_key", "bucket_ts", F.lit("x11").alias("method"),
        _r4("trend").alias("trend"),
        _r4("seasonal").alias("seasonal"),
        _r4("irregular").alias("irregular"),
        _r4("season_adjust").alias("season_adjust"),
    )
    return cl.unionByName(x11)


# Classical leg (rows with method='classical') is the round-1 oracle; the
# x11 leg re-derives the FULL X-11 B1-B12 iteration independently in SQL,
# including the 9-term Henderson weights from the classical closed form
# (n = p+2 = 6; denominator 8n(n^2-1)(4n^2-1)(4n^2-9)(4n^2-25) = 3859455600)
# and the Musgrave asymmetric end weights (R = 1.0 for H<=9, D = 4/pi R^2).
# The Henderson convolution is a range self-join against the derived
# (a,b,j,w) weight table — an intentionally different plan shape from the
# Spark operator's broadcast zip_with, so agreement checks the algorithm.
ORACLE_DECOMP_1D = """
WITH r AS (
  SELECT user_id, date_trunc('day', ts) AS bucket_ts, avg(value) AS v
  FROM events GROUP BY 1, 2
), s AS (
  SELECT user_id, bucket_ts, v,
         row_number() OVER w AS rn,
         CASE WHEN count(v) OVER (w ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) = 7
              THEN avg(v) OVER (w ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) END
           AS trend
  FROM r WINDOW w AS (PARTITION BY user_id ORDER BY bucket_ts)
), d AS (
  SELECT *, v - trend AS detr, (rn - 1) % 7 AS pos FROM s
), fig0 AS (
  SELECT user_id, pos, avg(detr) AS fr FROM d GROUP BY 1, 2
), fig AS (
  SELECT user_id, pos, fr - avg(fr) OVER (PARTITION BY user_id) AS figure
  FROM fig0
), xs AS (
  SELECT * FROM (
    SELECT user_id, bucket_ts, v,
           row_number() OVER (PARTITION BY user_id ORDER BY bucket_ts) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM r
  ) WHERE n >= 14
), xb2 AS (
  SELECT *, (rn - 1) % 7 AS pos,
         v - avg(v) OVER wk7 AS si1
  FROM xs
  WINDOW wk7 AS (PARTITION BY user_id ORDER BY rn
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), xb3 AS (
  SELECT *,
    (coalesce(lag(si1, 2) OVER wp, 0) + 2 * coalesce(lag(si1, 1) OVER wp, 0)
     + 3 * si1
     + 2 * coalesce(lead(si1, 1) OVER wp, 0) + coalesce(lead(si1, 2) OVER wp, 0))
    / (CASE WHEN lag(si1, 2) OVER wp IS NULL THEN 0 ELSE 1 END
       + CASE WHEN lag(si1, 1) OVER wp IS NULL THEN 0 ELSE 2 END + 3
       + CASE WHEN lead(si1, 1) OVER wp IS NULL THEN 0 ELSE 2 END
       + CASE WHEN lead(si1, 2) OVER wp IS NULL THEN 0 ELSE 1 END) AS s1r
  FROM xb2
  WINDOW wp AS (PARTITION BY user_id, pos ORDER BY rn)
), xb5 AS (
  SELECT user_id, bucket_ts, v, rn, n, pos,
         v - (s1r - avg(s1r) OVER wk7) AS sa1
  FROM xb3
  WINDOW wk7 AS (PARTITION BY user_id ORDER BY rn
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), hbase AS (
  SELECT j, 315.0 * (25 - j*j) * (36 - j*j) * (49 - j*j) * (92 - 11*j*j)
            / 3859455600.0 AS w
  FROM range(-4, 5) t(j)
), hdrops AS (
  SELECT q, sum(w) AS s, sum(w * (j - (q - 4) / 2.0)) AS t
  FROM range(0, 4) t(q), hbase WHERE j > q GROUP BY q
), hmusg AS (
  SELECT d.q, b.j,
         b.w + d.s / (d.q + 5)
             + (b.j - (d.q - 4) / 2.0)
               * ((4.0 / pi())
                  / (1.0 + (4.0 / pi()) * (d.q + 5)
                           * ((d.q + 5) * (d.q + 5) - 1) / 12.0))
               * d.t AS w
  FROM hdrops d JOIN hbase b ON b.j <= d.q
), hwtab AS (
  SELECT 4 AS a, 4 AS b, j, w FROM hbase
  UNION ALL SELECT 4 AS a, q AS b, j, w FROM hmusg
  UNION ALL SELECT q AS a, 4 AS b, -j AS j, w FROM hmusg
), xt2 AS (
  SELECT t.user_id, t.rn, sum(u.sa1 * wt.w) AS t2
  FROM xb5 t
  JOIN hwtab wt ON wt.a = least(t.rn - 1, 4) AND wt.b = least(t.n - t.rn, 4)
  JOIN xb5 u ON u.user_id = t.user_id AND u.rn = t.rn + wt.j
  GROUP BY 1, 2
), xb8 AS (
  SELECT b.*, b.v - x.t2 AS si2
  FROM xb5 b JOIN xt2 x ON x.user_id = b.user_id AND x.rn = b.rn
), xb8b AS (
  SELECT *,
    (coalesce(lag(si2, 3) OVER wp, 0) + 2 * coalesce(lag(si2, 2) OVER wp, 0)
     + 3 * coalesce(lag(si2, 1) OVER wp, 0) + 3 * si2
     + 3 * coalesce(lead(si2, 1) OVER wp, 0)
     + 2 * coalesce(lead(si2, 2) OVER wp, 0)
     + coalesce(lead(si2, 3) OVER wp, 0))
    / (CASE WHEN lag(si2, 3) OVER wp IS NULL THEN 0 ELSE 1 END
       + CASE WHEN lag(si2, 2) OVER wp IS NULL THEN 0 ELSE 2 END
       + CASE WHEN lag(si2, 1) OVER wp IS NULL THEN 0 ELSE 3 END + 3
       + CASE WHEN lead(si2, 1) OVER wp IS NULL THEN 0 ELSE 3 END
       + CASE WHEN lead(si2, 2) OVER wp IS NULL THEN 0 ELSE 2 END
       + CASE WHEN lead(si2, 3) OVER wp IS NULL THEN 0 ELSE 1 END) AS s2r
  FROM xb8
  WINDOW wp AS (PARTITION BY user_id, pos ORDER BY rn)
), xfin AS (
  SELECT user_id, bucket_ts, rn, n, v,
         s2r - avg(s2r) OVER wk7 AS seas,
         v - (s2r - avg(s2r) OVER wk7) AS sa2
  FROM xb8b
  WINDOW wk7 AS (PARTITION BY user_id ORDER BY rn
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), xtr AS (
  SELECT t.user_id, t.rn, sum(u.sa2 * wt.w) AS trend
  FROM xfin t
  JOIN hwtab wt ON wt.a = least(t.rn - 1, 4) AND wt.b = least(t.n - t.rn, 4)
  JOIN xfin u ON u.user_id = t.user_id AND u.rn = t.rn + wt.j
  GROUP BY 1, 2
)
SELECT d.user_id AS series_key, d.bucket_ts, 'classical' AS method,
       floor(d.trend * 1e4 + 0.500001::DOUBLE) / 1e4 AS trend,
       floor(fig.figure * 1e4 + 0.500001::DOUBLE) / 1e4 AS seasonal,
       floor((d.v - d.trend - fig.figure) * 1e4 + 0.500001::DOUBLE) / 1e4 AS irregular,
       floor((d.v - fig.figure) * 1e4 + 0.500001::DOUBLE) / 1e4 AS season_adjust
FROM d JOIN fig ON fig.user_id = d.user_id AND fig.pos = d.pos
UNION ALL
SELECT b.user_id AS series_key, b.bucket_ts, 'x11' AS method,
       floor(x.trend * 1e4 + 0.500001::DOUBLE) / 1e4 AS trend,
       floor(b.seas * 1e4 + 0.500001::DOUBLE) / 1e4 AS seasonal,
       floor((b.sa2 - x.trend) * 1e4 + 0.500001::DOUBLE) / 1e4 AS irregular,
       floor(b.sa2 * 1e4 + 0.500001::DOUBLE) / 1e4 AS season_adjust
FROM xfin b JOIN xtr x ON x.user_id = b.user_id AND x.rn = b.rn
"""


def q_stl_components_1d(spark, sf_dir):
    # iterated loess is not SQL-expressible — rows-only check; exactness is
    # covered by the golden kernel tests (test-stl.R transcriptions).
    from feasts_spark.operators.decompose import stl_components
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1d", "user_id", "ts", "value")
    counts = r.groupBy("series_key").count().filter(F.col("count") > 14)
    r = r.join(counts.select("series_key"), "series_key")
    out = stl_components(r, periods=(7,), value_col="val_avg")
    # unrounded + value: see the q_stl_multi_1h note (suite rounds after
    # certifying the reconstruction identity on the raw components)
    return out.select(
        "series_key", "bucket_ts", "val_avg",
        "trend", "season_7", "remainder", "season_adjust",
    )


def q_feature_pack(spark, sf_dir):
    # full per-series feature extraction — rows-only check (golden-tested).
    from feasts_spark.operators.features import features
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1h", "user_id", "ts", "value")
    out = features(r, period=24, min_points=20)
    ncols = [c for c in out.columns if c != "series_key"]
    sel = [F.col("series_key")] + [_r4(c).alias(c) for c in ncols]
    return out.select(*sel)


def q_feature_pack_multi(spark, sf_dir):
    """Multi-seasonality pack: per-period seasonal_strength_6/_24 +
    peaks/troughs via MSTL (features.R:95-108) — rows-only (iterated
    loess). Periods 6h/24h because the testdata spans only ~4 days of
    hourly points per user."""
    from feasts_spark.operators.features import features
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1h", "user_id", "ts", "value")
    out = features(r, period=(6, 24), min_points=50)
    ncols = [c for c in out.columns if c != "series_key"]
    sel = [F.col("series_key")] + [_r4(c).alias(c) for c in ncols]
    return out.select(*sel)


# ---------------------------------------------------------------------------
# Training-data-pipeline operators: dedup / text stats / similarity
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """exact_dedup operator: per distinct text, representative id, exact
    dup count, and a BOUNDED sorted member sample (max_members=32) —
    joined to a comma string so the value-hash sees a scalar column."""
    from feasts_spark.operators.dedup import exact_dedup

    _utc(spark)
    out = exact_dedup(_docs(spark, sf_dir), id_col="doc_id")
    return out.select(
        "text_hash",
        F.col("rep_id").alias("rep_doc_id"),
        "n_dups",
        F.array_join("member_ids", ",").alias("member_sample"),
    )


ORACLE_DEDUP_EXACT = """
WITH s AS (
  SELECT md5(text) AS text_hash, doc_id,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
)
SELECT text_hash, min(doc_id) AS rep_doc_id, count(*) AS n_dups,
       array_to_string(list_sort(list(doc_id) FILTER (WHERE rn <= 32)), ',')
         AS member_sample
FROM s GROUP BY 1
"""


def q_text_stats(spark, sf_dir):
    _utc(spark)
    d = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        (F.floor(
            F.length(F.regexp_replace(F.col("text"), r"[a-zA-Z ]", ""))
            / F.length("text") * 1e4 + F.lit(0.500001)
        ) / 1e4).alias("non_alpha_ratio"),
    )


ORACLE_TEXT_STATS = r"""
SELECT doc_id, length(text) AS n_chars_calc,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
       len(list_distinct(regexp_split_to_array(trim(text), '\s+')))
         AS n_uniq_tokens,
       floor((length(regexp_replace(text, '[a-zA-Z ]', '', 'g'))
             / length(text)) * 1e4 + 0.500001::DOUBLE) / 1e4 AS non_alpha_ratio
FROM documents
"""


def q_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs over the first 80 documents."""
    from feasts_spark.operators.dedup import ngram_jaccard_pairs

    _utc(spark)
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 80)
    out = ngram_jaccard_pairs(d, n=3, threshold=0.0)
    return out.select("id_a", "id_b", _r4("jaccard").alias("jaccard"))


ORACLE_NGRAM_JACCARD = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents WHERE doc_id < 80
), dims AS (
  SELECT unnest(generate_series(1, (SELECT max(len(t)) FROM toks))) AS k
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[k:k+2], ' ') AS gram
  FROM toks CROSS JOIN dims
  WHERE k <= greatest(len(t) - 2, 1)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY 1
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       floor((ni / (sa.n + sb.n - ni)) * 1e4 + 0.500001::DOUBLE) / 1e4 AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
"""


def q_feature_pack_all(spark, sf_dir):
    """Single-period (24h) and multi-seasonality (6h+24h MSTL) feature
    packs joined on series_key (multi columns prefixed `m_`; left join —
    the multi pack's higher min_points drops short series, which then
    carry NULL m_* columns). One registry row keeps the full feature
    surface under driver evidence.

    Rows-only (the pack's loess/Burg/ARFIMA kernels are not
    SQL-expressible) — but the SQL-expressible SLICE of the UDF pack is
    certified IN-PLAN: acf1, n_crossing_points, shift_level_max,
    var_tiled_var/mean and kpss_stat are recomputed by the pure-SQL
    twins in functions/sql_features.py (each independently value-oracled
    against DuckDB in its own registry row) over the SAME hourly series
    with the pack's kernel parameters (size=period=24), and every
    emitted value of those columns passes a `raise_error` guard on
    |Δ| > 1e-6·max(1, |twin|) — a green driver row proves the Arrow UDF
    agreed with the oracled SQL path at run time (the q_stl_decomp_suite
    certificate pattern). A corrupted kernel makes the query THROW
    (pinned in tests/test_entry_contract.py)."""
    from feasts_spark.functions import (
        acf1_expr,
        crossing_points_df,
        kpss_df,
        shift_level_df,
        var_tiled_df,
    )
    from feasts_spark.operators.features import features
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1h", "user_id", "ts", "value")
    pack = features(r, period=24, min_points=20)
    args = ("series_key", ["bucket_ts"], "val_avg")
    twins = (
        acf1_expr(r, *args)
        .withColumnRenamed("acf1", "c_acf1")
        .join(crossing_points_df(r, *args).withColumnRenamed(
            "n_crossing_points", "c_ncross"), "series_key", "full")
        .join(shift_level_df(r, *args, size=24).select(
            "series_key", F.col("shift_level_max").alias("c_shift")),
            "series_key", "full")
        .join(var_tiled_df(r, *args, size=24).select(
            "series_key",
            F.col("var_tiled_var").alias("c_vtv"),
            F.col("var_tiled_mean").alias("c_vtm")), "series_key", "full")
        .join(kpss_df(r, *args).select(
            "series_key", F.col("kpss_stat").alias("c_kpss")),
            "series_key", "full")
    )
    certified = {
        "acf1": "c_acf1",
        "n_crossing_points": "c_ncross",
        "shift_level_max": "c_shift",
        "var_tiled_var": "c_vtv",
        "var_tiled_mean": "c_vtm",
        "kpss_stat": "c_kpss",
    }

    def _guarded(col: str) -> F.Column:
        twin = F.col(certified[col])
        udf = F.col(col)
        # NaN is NOT a free pass: a kernel whose failure mode is NaN
        # (0/0, empty window) must fail the certificate when the SQL
        # twin holds a real value — NaN certifies only against a NULL
        # or NaN twin (both mean "undefined for this series"). A NULL
        # UDF value against a non-NULL twin also throws (ok -> SQL
        # NULL routes to the guard): the kernel lost a value the SQL
        # path could compute.
        ok = (
            twin.isNull()
            | (F.isnan(udf) & F.isnan(twin))
            | (~F.isnan(udf)
               & (F.abs(udf - twin)
                  <= F.lit(1e-6) * F.greatest(F.lit(1.0), F.abs(twin))))
        )
        guard = F.raise_error(
            F.format_string(
                f"feature certificate violated: {col} UDF=%s SQL twin=%s "
                "series=%s",
                F.col(col).cast("string"),
                twin.cast("string"),
                F.col("series_key").cast("string"),
            )
        ).cast("double")
        return F.when(ok, _r4(col)).otherwise(guard).alias(col)

    ncols = [c for c in pack.columns if c != "series_key"]
    single = pack.join(twins, "series_key", "left").select(
        F.col("series_key"),
        *[_guarded(c) if c in certified else _r4(c).alias(c) for c in ncols],
    )
    multi = q_feature_pack_multi(spark, sf_dir)
    multi = multi.select(
        "series_key",
        *[F.col(c).alias(f"m_{c}") for c in multi.columns if c != "series_key"],
    )
    return single.join(multi, "series_key", "left")


def q_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup candidates with estimated Jaccard — rows-only
    (the LSH construction is probabilistic banding, not SQL-expressible;
    exactness of the estimate is covered in tests/test_dedup_multimodal)."""
    from feasts_spark.operators.dedup import (
        minhash_estimate,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    _utc(spark)
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 500)
    sigs = minhash_signatures(d)
    cands = minhash_lsh_candidates(sigs)
    return minhash_estimate(sigs, cands).select(
        "id_a", "id_b", _r4("est_jaccard").alias("est_jaccard")
    )


def q_minhash_oph_lsh(spark, sf_dir):
    """Same LSH pipeline over one-permutation (O(S)-hash) signatures —
    the 10^9-document scale path; rows-only like minhash_lsh."""
    from feasts_spark.operators.dedup import (
        minhash_estimate,
        minhash_lsh_candidates,
        minhash_signatures_oph,
    )

    _utc(spark)
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 500)
    sigs = minhash_signatures_oph(d)
    cands = minhash_lsh_candidates(sigs)
    return minhash_estimate(sigs, cands).select(
        "id_a", "id_b", _r4("est_jaccard").alias("est_jaccard")
    )


def q_minhash_pack(spark, sf_dir):
    """The full MinHash surface in one variant-tagged driver row: both
    signature constructions (classic k-hash `mh` and one-permutation
    `oph`, the 10^9-doc scale path) through the same LSH banding +
    estimate pipeline, plus the snapshot-delta incremental crawl dedup
    (q_dedup_incremental, variants `inc_<kind>`). Rows-only — banding is
    hash-based — but the row carries an IN-PLAN RECALL CERTIFICATE:
    the banded candidate set of BOTH variants must be a SUPERSET of the
    exact n-gram-Jaccard pairs at >= 0.7 over the same 500-doc corpus
    (computed by ngram_jaccard_pairs, the operator value-oracled against
    DuckDB in its own registry row; at 32 bands x 4 rows the S-curve
    miss probability at j=0.7 is 1.5e-4 per pair, and zero misses is
    pinned for this seeded corpus). Every emitted est_jaccard passes a
    raise_error guard on the miss counts, and the scalar
    `cert_recall_ok` column reports the checked fact — a green driver
    row proves the banding recalled every true near-dup pair at run
    time. pytest additionally pins estimate error bounds, determinism,
    and exact full==incremental pair-set equivalence."""
    from feasts_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        minhash_signatures_oph,
        ngram_jaccard_pairs,
    )

    a = q_minhash_lsh(spark, sf_dir).select(
        F.lit("mh").alias("variant"), "id_a", "id_b", "est_jaccard"
    )
    b = q_minhash_oph_lsh(spark, sf_dir).select(
        F.lit("oph").alias("variant"), "id_a", "id_b", "est_jaccard"
    )
    c = q_dedup_incremental(spark, sf_dir).select(
        F.concat(F.lit("inc_"), F.col("kind")).alias("variant"),
        "id_a", "id_b", "est_jaccard",
    )
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 500)
    true_pairs = ngram_jaccard_pairs(d, n=3, threshold=0.7).select(
        "id_a", "id_b")
    miss = [
        true_pairs.join(
            minhash_lsh_candidates(sig).select("id_a", "id_b"),
            ["id_a", "id_b"], "left_anti",
        ).agg(F.count(F.lit(1)).alias(f"_miss_{tag}"))
        for tag, sig in (
            ("mh", minhash_signatures(d)),
            ("oph", minhash_signatures_oph(d)),
        )
    ]
    cert = miss[0].crossJoin(miss[1])
    packed = a.unionByName(b).unionByName(c).crossJoin(F.broadcast(cert))
    ok = (F.col("_miss_mh") == 0) & (F.col("_miss_oph") == 0)
    guard = F.raise_error(
        F.format_string(
            "minhash recall certificate violated: %s/%s true pairs at "
            "jaccard>=0.7 missed by mh/oph banding",
            F.col("_miss_mh").cast("string"),
            F.col("_miss_oph").cast("string"),
        )
    ).cast("double")
    return packed.select(
        "variant", "id_a", "id_b",
        F.when(ok, F.col("est_jaccard")).otherwise(guard)
        .alias("est_jaccard"),
        ok.alias("cert_recall_ok"),
    )


def q_dedup_incremental(spark, sf_dir):
    """Snapshot-delta dedup over docs < 500: docs >= 300 are the 'new
    crawl', docs < 300 the indexed corpus — LSH pairs for new docs only,
    never re-pairing
    old x old (operators/dedup.py minhash_lsh_incremental; rows-only:
    banding is hash-based, but full==incremental equivalence is asserted
    exactly in tests/test_dedup_multimodal.py)."""
    from feasts_spark.operators.dedup import (
        minhash_lsh_incremental,
        minhash_signatures,
    )

    _utc(spark)
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 500)
    # split at 300: the synthetic corpus has cross-split near-dups here
    # (e.g. 45~413, 72~377 at sf0.01), so the driver row carries signal
    sig_old = minhash_signatures(d.filter(F.col("doc_id") < 300))
    sig_new = minhash_signatures(d.filter(F.col("doc_id") >= 300))
    out = minhash_lsh_incremental(sig_old, sig_new, broadcast_new=True)
    return out.select(
        "kind", "id_a", "id_b", _r4("est_jaccard").alias("est_jaccard")
    )


def q_dup_clusters(spark, sf_dir):
    """Connected-components duplicate clustering over exact 3-gram Jaccard
    pairs (threshold 0.01): each doc labeled with its group's minimum id.
    The oracle replays the clustering with a recursive CTE — an
    independent fixpoint computation over the same pair set."""
    from feasts_spark.operators.dedup import dup_clusters, ngram_jaccard_pairs

    _utc(spark)
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 80)
    # threshold 0.01: this synthetic corpus has no strong near-dups below
    # doc 80 (max J ~ 0.03) — the low bar yields a multi-hop pair graph
    # that actually exercises label propagation; the threshold compare is
    # a ratio of integers, identical in both engines
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.01)
    return dup_clusters(pairs).select("id", "label")


ORACLE_DUP_CLUSTERS = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents WHERE doc_id < 80
), dims AS (
  SELECT unnest(generate_series(1, (SELECT max(len(t)) FROM toks))) AS k
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[k:k+2], ' ') AS gram
  FROM toks CROSS JOIN dims
  WHERE k <= greatest(len(t) - 2, 1)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY 1
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE ni / (sa.n + sb.n - ni) >= 0.01
), reach(id, r) AS (
  SELECT v, v FROM (SELECT id_a FROM pairs UNION SELECT id_b FROM pairs) t(v)
  UNION
  SELECT reach.id,
         CASE WHEN reach.r = pairs.id_a THEN pairs.id_b ELSE pairs.id_a END
  FROM reach JOIN pairs ON reach.r = pairs.id_a OR reach.r = pairs.id_b
)
SELECT id, min(r) AS label FROM reach GROUP BY id
"""


def q_simhash_pairs(spark, sf_dir):
    """ALL SimHash near-dup pairs with Hamming <= 16 (of 60 bits).

    Banding into max_hamming+1 chunks is pigeonhole-complete, so the
    banded join computes exactly the brute-force semantics the oracle
    checks (round 1's fixed 4-chunk banding silently missed distances
    4-16)."""
    from feasts_spark.operators.dedup import simhash_near_pairs, simhash_signatures

    _utc(spark)
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    return simhash_near_pairs(simhash_signatures(d), max_hamming=16)


def _oracle_simhash_pairs() -> str:
    from feasts_spark.operators.dedup import simhash_oracle_sql

    # The signature CTE is the engine's own cross-engine hash formula; the
    # pair semantics are verified brute-force (banding must equal it).
    return f"""
WITH sigs AS ({simhash_oracle_sql("(SELECT * FROM documents WHERE doc_id < 200)")})
SELECT a.id AS id_a, b.id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sigs a JOIN sigs b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 16
"""


def q_cosine_pairs(spark, sf_dir):
    """All embedding pairs with cosine >= 0.2 among the first 20 vectors —
    brute-force double-precision cosine, the dedup/similarity baseline."""
    _utc(spark)
    e = _emb(spark, sf_dir).filter(F.col("vec_id") < 20)
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    dot = "aggregate(zip_with(cast(ea as array<double>), cast(eb as array<double>), (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    na = "aggregate(cast(ea as array<double>), 0D, (acc, x) -> acc + x * x)"
    nb = "aggregate(cast(eb as array<double>), 0D, (acc, x) -> acc + x * x)"
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.expr(f"{dot} / sqrt(({na}) * ({nb}))"))
        .withColumn("cos", _r4("cos"))
        .filter(F.col("cos") >= 0.2)
        .select("id_a", "id_b", "cos")
    )
    return pairs


ORACLE_COSINE_PAIRS = """
WITH dims AS (
  SELECT unnest(generate_series(1, (SELECT max(len(embedding)) FROM embeddings)))
    AS k
), flat AS (
  SELECT vec_id, k, embedding[k]::DOUBLE AS v
  FROM embeddings CROSS JOIN dims
  WHERE vec_id < 20 AND k <= len(embedding)
), dots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         sum(a.v * b.v) AS dot,
         sum(a.v * a.v) AS na, sum(b.v * b.v) AS nb
  FROM flat a JOIN flat b ON a.k = b.k AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, floor((dot / sqrt(na * nb)) * 1e4 + 0.500001::DOUBLE) / 1e4 AS cos
FROM dots WHERE floor((dot / sqrt(na * nb)) * 1e4 + 0.500001::DOUBLE) / 1e4 >= 0.2
"""


def q_semantic_dup_clusters(spark, sf_dir):
    """Embedding-cosine near-duplicate clusters over the first 100 vectors
    (brute candidate set, tie-stable 4dp cosine threshold) — min-label
    connected components, oracled by a DuckDB recursive CTE."""
    from feasts_spark.operators.similarity import embedding_dup_clusters

    _utc(spark)
    e = _emb(spark, sf_dir).filter(F.col("vec_id") < 100)
    return embedding_dup_clusters(
        e, threshold=0.3, method="brute", tie_stable_round=True
    )


ORACLE_SEMANTIC_DUP = """
WITH RECURSIVE dims AS (
  SELECT unnest(generate_series(1, (SELECT max(len(embedding)) FROM embeddings)))
    AS k
), flat AS (
  SELECT vec_id, k, embedding[k]::DOUBLE AS v
  FROM embeddings CROSS JOIN dims
  WHERE vec_id < 100 AND k <= len(embedding)
), dots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         sum(a.v * b.v) AS dot,
         sum(a.v * a.v) AS na, sum(b.v * b.v) AS nb
  FROM flat a JOIN flat b ON a.k = b.k AND a.vec_id < b.vec_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b FROM dots
  WHERE floor((dot / sqrt(na * nb)) * 1e4 + 0.500001::DOUBLE) / 1e4 >= 0.3
), reach(id, r) AS (
  SELECT v, v FROM (SELECT id_a FROM pairs UNION SELECT id_b FROM pairs) t(v)
  UNION
  SELECT reach.id,
         CASE WHEN reach.r = pairs.id_a THEN pairs.id_b ELSE pairs.id_a END
  FROM reach JOIN pairs ON reach.r = pairs.id_a OR reach.r = pairs.id_b
)
SELECT id, min(r) AS label FROM reach GROUP BY id
"""


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-5 neighbors for the first 10 query vectors.

    Ranking orders by the 6dp-rounded (tie-stable) cosine with cand_id as
    the tie-break, so the cross-engine DuckDB oracle ranks identically
    even when sequential double dot-products diverge in the last ULP."""
    _utc(spark)
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("eq")
    )
    c = e.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ec"))
    dot = "aggregate(zip_with(cast(eq as array<double>), cast(ec as array<double>), (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    nq = "aggregate(cast(eq as array<double>), 0D, (acc, x) -> acc + x * x)"
    nc = "aggregate(cast(ec as array<double>), 0D, (acc, x) -> acc + x * x)"
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos", F.expr(f"{dot} / sqrt(({nq}) * ({nc}))"))
    )
    wrank = W.partitionBy("query_id").orderBy(
        F.desc(F.floor(F.col("cos") * 1e6 + F.lit(0.500001))), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= 5)
        .select("query_id", "cand_id", "rank", _r4("cos").alias("cos"))
    )


ORACLE_ANN_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS eq
  FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS ec
  FROM embeddings
), s AS (
  SELECT query_id, cand_id,
    list_dot_product(eq, ec)
      / sqrt(list_dot_product(eq, eq) * list_dot_product(ec, ec)) AS cos
  FROM q, c WHERE query_id <> cand_id
), r AS (
  SELECT query_id, cand_id, cos,
    row_number() OVER (PARTITION BY query_id
      ORDER BY floor(cos * 1e6 + 0.500001::DOUBLE) DESC, cand_id) AS rank
  FROM s
)
SELECT query_id, cand_id, rank,
       floor(cos * 1e4 + 0.500001::DOUBLE) / 1e4 AS cos
FROM r WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# Correlation / portmanteau / flat-spot / intermittency (SURVEY.md §2.1, §2.3)
# ---------------------------------------------------------------------------

def _hourly_pair(spark, sf_dir):
    """1h rollup restricted to keys with enough buckets: two aligned series
    per user — y = val_avg, x = n_points."""
    from feasts_spark.operators.rollup import rollup_raw

    r = rollup_raw(_events(spark, sf_dir), "1h", "user_id", "ts", "value")
    counts = r.groupBy("series_key").count().filter(F.col("count") > 11)
    return r.join(counts.select("series_key"), "series_key")


def q_ccf_table_1h(spark, sf_dir):
    """CCF(y=val_avg, x=n_points) per user over the 1h tier (acf.R:184-221)."""
    from feasts_spark.operators.cf import ccf_table

    _utc(spark)
    r = _hourly_pair(spark, sf_dir).select(
        "series_key", "bucket_ts",
        F.col("val_avg").alias("y"),
        F.col("n_points").cast("double").alias("x"),
    )
    out = ccf_table(r, lag_max=10)
    return out.select("series_key", "lag", _r4("ccf").alias("ccf"))


ORACLE_CCF_1H = """
WITH r AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
         avg(value) AS y, count(*)::DOUBLE AS x
  FROM events GROUP BY 1, 2
), keyed AS (
  SELECT user_id FROM r GROUP BY 1 HAVING count(*) > 11
), s AS (
  SELECT r.user_id, x, y,
         row_number() OVER (PARTITION BY r.user_id ORDER BY bucket_ts) AS rn,
         avg(x) OVER (PARTITION BY r.user_id) AS mx,
         avg(y) OVER (PARTITION BY r.user_id) AS my,
         count(*) OVER (PARTITION BY r.user_id) AS n
  FROM r JOIN keyed USING (user_id)
), c0 AS (
  SELECT user_id,
         sum((x - mx) * (x - mx)) / any_value(n) AS cxx0,
         sum((y - my) * (y - my)) / any_value(n) AS cyy0
  FROM s GROUP BY user_id
), lags AS (SELECT unnest(generate_series(-10, 10)) AS lag)
SELECT a.user_id AS series_key, lags.lag AS lag,
       floor(((sum((a.x - a.mx) * (b.y - b.my)) / any_value(a.n))
              / sqrt(any_value(c0.cxx0) * any_value(c0.cyy0))) * 1e4
             + 0.500001::DOUBLE) / 1e4 AS ccf
FROM s a
CROSS JOIN lags
JOIN s b ON b.user_id = a.user_id AND a.rn = b.rn + lags.lag
JOIN c0 ON c0.user_id = a.user_id
GROUP BY a.user_id, lags.lag
"""


def q_portmanteau_1h(spark, sf_dir):
    """Ljung-Box + Box-Pierce statistics at lag 10 per 1h series
    (tests.R:19-31). P-values need the chi-square survival function (not
    SQL-expressible) — they are golden-tested in pytest; this query
    cross-checks the Q statistics end-to-end against SQL."""
    from feasts_spark.kernels.stat_tests import box_pierce, ljung_box
    from feasts_spark.operators.series_stats import series_stats

    _utc(spark)
    r = _hourly_pair(spark, sf_dir)

    def kernel(x, lag=10):
        return {**ljung_box(x, lag=lag), **box_pierce(x, lag=lag)}

    out = series_stats(r, kernel, ["lb_stat", "bp_stat"])
    return out.select(
        "series_key",
        _r4("lb_stat").alias("lb_stat"),
        _r4("bp_stat").alias("bp_stat"),
    )


ORACLE_PORTMANTEAU_1H = """
WITH r AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts, avg(value) AS v
  FROM events GROUP BY 1, 2
), keyed AS (
  SELECT user_id FROM r GROUP BY 1 HAVING count(*) > 11
), s AS (
  SELECT r.user_id, v,
         row_number() OVER (PARTITION BY r.user_id ORDER BY bucket_ts) AS rn,
         avg(v) OVER (PARTITION BY r.user_id) AS m,
         count(*) OVER (PARTITION BY r.user_id) AS n
  FROM r JOIN keyed USING (user_id)
), c0 AS (
  SELECT user_id, sum((v - m) * (v - m)) / any_value(n) AS acvf0,
         any_value(n) AS n
  FROM s GROUP BY user_id
), lags AS (SELECT unnest(generate_series(1, 10)) AS lag),
rk AS (
  SELECT a.user_id, lags.lag,
         (sum((a.v - a.m) * (b.v - b.m)) / any_value(a.n))
           / any_value(c0.acvf0) AS r
  FROM s a CROSS JOIN lags
  JOIN s b ON b.user_id = a.user_id AND b.rn = a.rn + lags.lag
  JOIN c0 ON c0.user_id = a.user_id
  GROUP BY a.user_id, lags.lag
)
SELECT rk.user_id AS series_key,
       floor((any_value(c0.n) * (any_value(c0.n) + 2)
             * sum(r * r / (c0.n - lag))) * 1e4 + 0.500001::DOUBLE) / 1e4 AS lb_stat,
       floor((any_value(c0.n) * sum(r * r)) * 1e4 + 0.500001::DOUBLE) / 1e4 AS bp_stat
FROM rk JOIN c0 ON c0.user_id = rk.user_id
GROUP BY rk.user_id
"""


def q_longest_flat_spot(spark, sf_dir):
    """longest_flat_spot (features.R:349-353) as native SQL: R-style cut()
    into 10 equal-width bins, then gaps-and-islands max run length."""
    _utc(spark)
    e = _events(spark, sf_dir)
    stats = e.groupBy("user_id").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    binned = (
        e.join(stats, "user_id")
        .withColumn(
            "bin",
            F.when(F.col("mx") == F.col("mn"), F.lit(1)).otherwise(
                F.least(
                    F.greatest(
                        F.ceil((F.col("value") - F.col("mn"))
                               / ((F.col("mx") - F.col("mn")) / 10)),
                        F.lit(1),
                    ),
                    F.lit(10),
                )
            ),
        )
        .withColumn("rn", F.row_number().over(w_ord))
    )
    w_bin = W.partitionBy("user_id", "bin").orderBy("rn")
    runs = binned.withColumn("grp", F.col("rn") - F.row_number().over(w_bin))
    return (
        runs.groupBy("user_id", "bin", "grp")
        .count()
        .groupBy(F.col("user_id").alias("series_key"))
        .agg(F.max("count").alias("longest_flat_spot"))
    )


ORACLE_FLAT_SPOT = """
WITH stats AS (
  SELECT user_id, min(value) AS mn, max(value) AS mx FROM events GROUP BY 1
), binned AS (
  SELECT e.user_id,
         CASE WHEN s.mx = s.mn THEN 1
              ELSE least(greatest(ceil((e.value - s.mn) / ((s.mx - s.mn) / 10)),
                                  1), 10) END AS bin,
         row_number() OVER (PARTITION BY e.user_id
                            ORDER BY e.ts, e.event_id) AS rn
  FROM events e JOIN stats s USING (user_id)
), runs AS (
  SELECT user_id, bin,
         rn - row_number() OVER (PARTITION BY user_id, bin ORDER BY rn) AS grp
  FROM binned
), lens AS (
  SELECT user_id, count(*) AS len FROM runs GROUP BY user_id, bin, grp
)
SELECT user_id AS series_key, max(len) AS longest_flat_spot
FROM lens GROUP BY 1
"""


def q_intermittent_daily(spark, sf_dir):
    """feat_intermittent (features.R:716-726) over each user's daily event
    counts with gap days as zeros — the intermittent-demand shape."""
    from feasts_spark.kernels.features_basic import feat_intermittent
    from feasts_spark.operators.gapfill import dense_grid
    from feasts_spark.operators.rollup import rollup_raw
    from feasts_spark.operators.series_stats import series_stats

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1d", "user_id", "ts", "value")
    grid = dense_grid(r, "1d")
    daily = grid.join(
        r.select("series_key", "bucket_ts", "n_points"),
        ["series_key", "bucket_ts"],
        "left",
    ).withColumn("cnt", F.coalesce(F.col("n_points"), F.lit(0)).cast("double"))
    out = series_stats(
        daily, feat_intermittent,
        ["zero_run_mean", "nonzero_squared_cv", "zero_start_prop", "zero_end_prop"],
        value_col="cnt",
    )
    return out.select(
        "series_key",
        _r4("zero_run_mean").alias("zero_run_mean"),
        _r4("nonzero_squared_cv").alias("nonzero_squared_cv"),
        _r4("zero_start_prop").alias("zero_start_prop"),
        _r4("zero_end_prop").alias("zero_end_prop"),
    )


ORACLE_INTERMITTENT = """
WITH r AS (
  SELECT user_id, date_trunc('day', ts) AS bucket_ts, count(*) AS cnt
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT user_id, min(bucket_ts) AS b0, max(bucket_ts) AS b1 FROM r GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 DAY)) AS bucket_ts
  FROM spans
), daily AS (
  SELECT g.user_id, g.bucket_ts, coalesce(r.cnt, 0)::DOUBLE AS cnt,
         row_number() OVER (PARTITION BY g.user_id ORDER BY g.bucket_ts) AS rn,
         count(*) OVER (PARTITION BY g.user_id) AS n
  FROM grid g LEFT JOIN r ON r.user_id = g.user_id AND r.bucket_ts = g.bucket_ts
), runs AS (
  SELECT user_id, cnt = 0 AS is_zero, n,
         rn - row_number() OVER (PARTITION BY user_id, cnt = 0 ORDER BY rn) AS grp,
         min(rn) OVER (PARTITION BY user_id) AS rn0,
         max(rn) OVER (PARTITION BY user_id) AS rn1, rn
  FROM daily
), runlens AS (
  SELECT user_id, is_zero, grp, count(*) AS len,
         min(rn) AS lo, max(rn) AS hi, any_value(n) AS n
  FROM runs GROUP BY 1, 2, 3
), zr AS (
  SELECT user_id, coalesce(avg(len) FILTER (is_zero), 0) AS zero_run_mean,
         coalesce(max(CASE WHEN is_zero AND lo = 1 THEN len END), 0)
           / any_value(n)::DOUBLE AS zero_start_prop,
         coalesce(max(CASE WHEN is_zero AND hi = n THEN len END), 0)
           / any_value(n)::DOUBLE AS zero_end_prop
  FROM runlens GROUP BY 1
), nz AS (
  SELECT user_id,
         (stddev_samp(cnt) / avg(cnt)) ^ 2 AS nonzero_squared_cv
  FROM daily WHERE cnt <> 0 GROUP BY 1
)
SELECT zr.user_id AS series_key,
       floor((zr.zero_run_mean) * 1e4 + 0.500001::DOUBLE) / 1e4 AS zero_run_mean,
       floor((nz.nonzero_squared_cv) * 1e4 + 0.500001::DOUBLE) / 1e4 AS nonzero_squared_cv,
       floor((zr.zero_start_prop) * 1e4 + 0.500001::DOUBLE) / 1e4 AS zero_start_prop,
       floor((zr.zero_end_prop) * 1e4 + 0.500001::DOUBLE) / 1e4 AS zero_end_prop
FROM zr JOIN nz USING (user_id)
"""


# ---------------------------------------------------------------------------
# Engine invariant queries: Gorilla round-trip, salted aggregation, heavy keys
# ---------------------------------------------------------------------------

def q_gorilla_roundtrip_1h(spark, sf_dir):
    """1h tier -> Gorilla chunks (delta-of-delta ts + XOR floats, BinaryType)
    -> decode. The oracle is the DIRECT rollup SQL: encode∘decode must be
    the identity, so matching it proves bit-level correctness end-to-end."""
    from feasts_spark.operators.compression import compress_chunks, decompress_chunks
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1h", "user_id", "ts", "value")
    chunks = compress_chunks(r, "1h", key_col="series_key", value_col="val_avg")
    back = decompress_chunks(chunks)
    return back.select(
        "series_key", "bucket_ts",
        _r4("value").alias("val_avg"),
    )


ORACLE_GORILLA_1H = """
SELECT user_id::VARCHAR AS series_key, date_trunc('hour', ts) AS bucket_ts,
       floor(avg(value) * 1e4 + 0.500001::DOUBLE) / 1e4 AS val_avg
FROM events GROUP BY 1, 2
"""



def q_heavy_keys(spark, sf_dir):
    """Heavy-key detection: users with > 40 events (skew routing input)."""
    from feasts_spark.operators.skew import detect_heavy_keys

    _utc(spark)
    return detect_heavy_keys(_events(spark, sf_dir), "user_id", threshold=40)


ORACLE_HEAVY_KEYS = """
SELECT user_id FROM events GROUP BY 1 HAVING count(*) > 40
"""


# ---------------------------------------------------------------------------
# Text analysis: tokens / language-ID / quality / fingerprints
# ---------------------------------------------------------------------------

def q_token_stats(spark, sf_dir):
    from feasts_spark.operators.text import token_stats

    _utc(spark)
    return token_stats(_docs(spark, sf_dir))


ORACLE_TOKEN_STATS = r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
         AS n_bpe_pieces,
       len(regexp_extract_all(text, '[0-9]+')) AS n_number_runs,
       len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct
FROM documents
"""


def q_language_id(spark, sf_dir):
    from feasts_spark.operators.text import language_scores

    _utc(spark)
    return language_scores(_docs(spark, sf_dir))


ORACLE_LANGUAGE_ID = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
    len(list_filter(toks, x -> x IN ('der','die','und','das','ist','nicht','von','mit','auf','ein'))) AS score_de,
    len(list_filter(toks, x -> x IN ('the','of','and','to','in','is','that','for','with','as'))) AS score_en,
    len(list_filter(toks, x -> x IN ('el','la','los','de','y','un','una','es','que','por'))) AS score_es,
    len(list_filter(toks, x -> x IN ('le','la','les','de','et','un','une','est','que','pour'))) AS score_fr
  FROM t
)
SELECT doc_id, score_de, score_en, score_es, score_fr,
       CASE WHEN score_fr > greatest(score_de, score_en, score_es) THEN 'fr'
            WHEN score_es > greatest(score_de, score_en) THEN 'es'
            WHEN score_en > score_de THEN 'en'
            ELSE 'de' END AS pred_lang
FROM s
"""


def q_quality_scores(spark, sf_dir):
    from feasts_spark.operators.text import quality_scores

    _utc(spark)
    return quality_scores(_docs(spark, sf_dir))


ORACLE_QUALITY = r"""
WITH b AS (
  SELECT doc_id, text,
         len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tok,
         length(text) AS n_chars,
         len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> x IN ('the','of','and','to','in','is','that','for','with','as')))
           AS stop_hits,
         len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS punct
  FROM documents
), m AS (
  SELECT doc_id, n_tok,
         length(regexp_replace(trim(text), '\s+', '', 'g'))
           / greatest(n_tok, 1)::DOUBLE AS mean_word_len,
         stop_hits / n_tok::DOUBLE AS stop_ratio,
         punct / greatest(n_chars, 1)::DOUBLE AS punct_ratio,
         least(n_tok / 64.0::DOUBLE, 1.0::DOUBLE) AS length_score
  FROM b
)
SELECT doc_id, n_tok AS n_tokens,
       floor((mean_word_len) * 1e4 + 0.500001::DOUBLE) / 1e4 AS mean_word_len,
       floor((stop_ratio) * 1e4 + 0.500001::DOUBLE) / 1e4 AS stopword_ratio,
       floor((punct_ratio) * 1e4 + 0.500001::DOUBLE) / 1e4 AS punct_ratio,
       floor((0.4::DOUBLE * length_score
              + 0.3::DOUBLE * least(stop_ratio * 5, 1.0::DOUBLE)
              + 0.3::DOUBLE * (1.0::DOUBLE - least(punct_ratio * 4, 1.0::DOUBLE)))
             * 10000 + 0.500001::DOUBLE) / 10000 AS quality_score
FROM m
"""


def q_fingerprints(spark, sf_dir):
    from feasts_spark.operators.text import fingerprints

    _utc(spark)
    return fingerprints(_docs(spark, sf_dir))


ORACLE_FINGERPRINTS = """
WITH t AS (
  SELECT doc_id, lower(text) AS t FROM documents
), g AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(length(t) - 7, 1))) AS i
  FROM t
)
SELECT doc_id, min(md5(substring(t, i, 8))) AS fingerprint,
       count(DISTINCT substring(t, i, 8)) AS n_shingles,
       any_value(length(t)) AS n_chars_norm
FROM g GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# ANN scale path + remaining rows-only operators
# ---------------------------------------------------------------------------

def q_ann_recall(spark, sf_dir):
    """Recall@5 of all four approximate ANN paths against the
    brute-force top-5, computed in-Spark per method — the accuracy/scan
    trade-off as a first-class per-round metric (rows-only: the
    approximate methods are probabilistic by design; the brute baseline
    itself is oracled via ann_topk). The per-neighbor detail rows (the
    former q_ann_approx_topk registry row) derive from the SAME method
    DataFrames as the recall aggregates, so each index is trained/built
    exactly once per run and detail rows always describe the exact
    configuration the recall rows score.

    The row carries an in-plan `cert_ok` certificate (raise_error on
    violation), so a green driver row is machine-checked evidence:

    - detail rows: the reported cosine must equal an independent
      recomputation from the RAW embedding vectors joined back by
      (query_id, cand_id) — a method reporting approximate/ADC distances
      as cos, or attaching scores to the wrong candidate ids, throws —
      and cos must be non-increasing in rank within each (method, query).
    - recall rows: each method must clear a calibrated floor on this
      deterministic corpus (lsh .85 / pq .80 / ivfpq .50 / ivf .40 —
      measured .90-.96 / .86-.88 / .60-.78 / .46-.52 at sf0.001/sf0.01;
      the small-corpus IVF params scan nprobe/n_cells of the cells, so
      the pruning-limited floors are intentionally lower), and n_hits
      can never exceed the brute-force row count.

    A corrupted method makes the query THROW (pinned in
    tests/test_entry_contract.py)."""
    from feasts_spark.operators.similarity import (
        ann_ivf_topk,
        ann_ivfpq_topk,
        ann_lsh_topk,
        ann_pq_topk,
    )

    _utc(spark)
    e = _emb(spark, sf_dir)
    qf = lambda c: c < 10  # noqa: E731
    brute = q_ann_topk(spark, sf_dir).select("query_id", "cand_id")
    methods = (
        ("lsh", ann_lsh_topk(e, k=5, n_planes=4, query_filter=qf)),
        ("ivf", ann_ivf_topk(e, k=5, n_cells=8, nprobe=2, query_filter=qf)),
        # PQ/ADC memory-bound path: 64-d float -> 16 uint8 codes (16x),
        # 4k-shortlist exact re-rank (the Jégou serving recipe)
        ("pq", ann_pq_topk(e, k=5, m=16, n_codes=64, query_filter=qf)),
        # IVFADC composed path: cell pruning + residual codes + re-rank
        ("ivfpq", ann_ivfpq_topk(
            e, k=5, n_cells=8, nprobe=4, m=16, n_codes=64, query_filter=qf,
        )),
    )
    out = None
    for method, df in methods:
        hits = df.select("query_id", "cand_id").join(
            brute, ["query_id", "cand_id"]
        )
        row = hits.agg(F.count(F.lit(1)).alias("n_hits")).withColumn(
            "method", F.lit(method)
        )
        out = row if out is None else out.unionByName(row)
    # denominator from the data, not a literal: if the corpus yields fewer
    # than 10 queries or fewer than 5 candidates per query, recall@5 must
    # reflect the actual brute-force row count (one-row crossJoin, no
    # driver collect)
    n_brute = brute.agg(F.count(F.lit(1)).alias("n_brute"))
    floors = {"lsh": 0.85, "ivf": 0.40, "pq": 0.80, "ivfpq": 0.50}
    floor_col = F.lit(None).cast("double")
    for meth, fl in floors.items():
        floor_col = F.when(
            F.col("method") == F.lit(f"{meth}_recall"), F.lit(fl)
        ).otherwise(floor_col)
    recall = out.crossJoin(n_brute).select(
        F.concat(F.col("method"), F.lit("_recall")).alias("method"),
        F.lit(None).cast("long").alias("query_id"),
        F.lit(None).cast("long").alias("cand_id"),
        F.lit(None).cast("int").alias("rank"),
        F.lit(None).cast("double").alias("cos"),
        "n_hits",
        (
            F.floor(F.col("n_hits") / F.col("n_brute") * 1e4 + F.lit(0.500001))
            / 1e4
        ).alias("recall_at_5"),
        "n_brute",
    )
    recall_guard = F.raise_error(
        F.format_string(
            "ann recall certificate violated: %s recall=%s floor=%s "
            "n_hits=%s n_brute=%s",
            F.col("method"),
            F.col("recall_at_5").cast("string"),
            floor_col.cast("string"),
            F.col("n_hits").cast("string"),
            F.col("n_brute").cast("string"),
        )
    ).cast("boolean")
    recall = recall.select(
        "method", "query_id", "cand_id", "rank", "cos", "n_hits",
        "recall_at_5",
        F.when(
            (F.col("recall_at_5") >= floor_col)
            & (F.col("n_hits") <= F.col("n_brute")),
            F.lit(True),
        ).otherwise(recall_guard).alias("cert_ok"),
    )
    # per-neighbor detail rows (formerly the q_ann_approx_topk registry
    # row): method-tagged union over the SAME frames under one schema,
    # aggregate rows tagged `<method>_recall`
    detail = None
    for method, df in methods:
        part = df.select(
            F.lit(method).alias("method"), "query_id", "cand_id", "rank",
            _r4("cos").alias("cos"),
            F.lit(None).cast("long").alias("n_hits"),
            F.lit(None).cast("double").alias("recall_at_5"),
        )
        detail = part if detail is None else detail.unionByName(part)
    # detail certificate: recompute cosine from the RAW vectors joined
    # back by id, and pin within-query rank monotonicity of the reported
    # (tie-stable-rounded) cos
    eq = e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("eq"))
    ec = e.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ec"))
    dot = "aggregate(zip_with(cast(eq as array<double>), cast(ec as array<double>), (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    nq = "aggregate(cast(eq as array<double>), 0D, (acc, x) -> acc + x * x)"
    nc = "aggregate(cast(ec as array<double>), 0D, (acc, x) -> acc + x * x)"
    wmono = W.partitionBy("method", "query_id").orderBy("rank")
    # detail is bounded by |methods| x |queries| x k — broadcast IT against
    # the (potentially 10^9-row) embeddings table, never the reverse
    chk = (
        F.broadcast(detail.join(F.broadcast(eq), "query_id"))
        .join(ec, "cand_id")
        .withColumn("cos_exact", F.expr(f"{dot} / sqrt(({nq}) * ({nc}))"))
        .withColumn("cos_prev", F.lag("cos").over(wmono))
    )
    cos_ok = (
        (F.abs(F.col("cos") - F.col("cos_exact")) <= F.lit(1e-4))
        & (
            F.col("cos_prev").isNull()
            | (F.col("cos") <= F.col("cos_prev") + F.lit(1e-9))
        )
    )
    detail_guard = F.raise_error(
        F.format_string(
            "ann cosine certificate violated: %s query=%s cand=%s rank=%s "
            "cos=%s exact=%s prev=%s",
            F.col("method"),
            F.col("query_id").cast("string"),
            F.col("cand_id").cast("string"),
            F.col("rank").cast("string"),
            F.col("cos").cast("string"),
            F.col("cos_exact").cast("string"),
            F.col("cos_prev").cast("string"),
        )
    ).cast("boolean")
    detail = chk.select(
        "method", "query_id", "cand_id", "rank", "cos", "n_hits",
        "recall_at_5",
        F.when(cos_ok, F.lit(True)).otherwise(detail_guard).alias("cert_ok"),
    )
    return recall.unionByName(detail)


def q_guerrero_1d(spark, sf_dir):
    """Box-Cox lambda (guerrero.R:30-60) per user over the 1d tier, weekly
    subseries — grid-argmin over the Guerrero CV objective on a 0.1-step
    lambda grid, SAME SQL text both engines (the continuous Brent
    optimizer stays in the golden-tested numpy kernel / feature_pack)."""
    from feasts_spark.functions.sql_features import guerrero_argmin_sql

    _utc(spark)
    _events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(guerrero_argmin_sql())


def q_kpss_sql_1d(spark, sf_dir):
    """KPSS statistic + p-value computed entirely in SQL (kpss_df) —
    independently value-matched by the DuckDB oracle, unlike the
    kernel-path unitroot_1d which is golden-tested only."""
    from feasts_spark.functions import kpss_df
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1d", "user_id", "ts", "value")
    counts = r.groupBy("series_key").count().filter(F.col("count") >= 14)
    r = r.join(counts.select("series_key"), "series_key")
    out = kpss_df(r, "series_key", ["bucket_ts"], "val_avg")
    return out.select(
        "series_key",
        _r4("kpss_stat").alias("kpss_stat"),
        _r4("kpss_pvalue").alias("kpss_pvalue"),
    )


def _kpss_oracle(l_max: int = 12) -> str:
    lag_cols = ",\n         ".join(
        f"lag(e, {k}) OVER (PARTITION BY k ORDER BY rn) AS el{k}"
        for k in range(1, l_max + 1)
    )
    g_cols = ",\n         ".join(
        f"sum(e * el{k}) AS g{k}" for k in range(1, l_max + 1)
    )
    g_pass = ", ".join(f"g{k}" for k in range(1, l_max + 1))
    s2_terms = "\n      ".join(
        f"+ CASE WHEN {k} <= l THEN 2.0::DOUBLE * (1.0::DOUBLE - "
        f"{k}.0::DOUBLE / (l + 1.0::DOUBLE)) * g{k} / n ELSE 0.0::DOUBLE END"
        for k in range(1, l_max + 1)
    )
    return f"""
WITH r AS (
  SELECT user_id, date_trunc('day', ts) AS bucket_ts, avg(value) AS v
  FROM events GROUP BY 1, 2
), keyed AS (
  SELECT user_id FROM r GROUP BY 1 HAVING count(*) >= 14
), s AS (
  SELECT r.user_id AS k, v,
         row_number() OVER (PARTITION BY r.user_id ORDER BY bucket_ts) AS rn,
         v - avg(v) OVER (PARTITION BY r.user_id) AS e
  FROM r JOIN keyed USING (user_id)
), s2 AS (
  SELECT k, rn, e,
         sum(e) OVER (PARTITION BY k ORDER BY rn
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS S,
         {lag_cols}
  FROM s
), agg AS (
  SELECT k AS series_key, count(*)::DOUBLE AS n,
         sum(e * e) AS g0, sum(S * S) AS ss,
         {g_cols}
  FROM s2 GROUP BY k
), st AS (
  SELECT series_key, n, ss,
    floor(4.0::DOUBLE * power(n / 100.0::DOUBLE, 0.25::DOUBLE)) AS l,
    g0, {g_pass}
  FROM agg
), lr AS (
  SELECT series_key, n, ss, l,
    g0 / n
      {s2_terms} AS s2v
  FROM st
), stat AS (
  -- mirrors kpss_df's l_max guard: NULL stat once l exceeds the
  -- materialized lag columns, never a silently truncated Bartlett sum
  SELECT series_key,
         CASE WHEN l <= {l_max} THEN ss / (n * n * s2v) ELSE NULL END
           AS kpss_stat
  FROM lr
)
SELECT series_key,
  floor(kpss_stat * 1e4 + 0.500001::DOUBLE) / 1e4 AS kpss_stat,
  floor((CASE
    WHEN kpss_stat IS NULL THEN NULL
    WHEN kpss_stat <= 0.347::DOUBLE THEN 0.10::DOUBLE
    WHEN kpss_stat <= 0.463::DOUBLE THEN 0.10::DOUBLE + (kpss_stat - 0.347::DOUBLE)
      * (0.05::DOUBLE - 0.10::DOUBLE) / (0.463::DOUBLE - 0.347::DOUBLE)
    WHEN kpss_stat <= 0.574::DOUBLE THEN 0.05::DOUBLE + (kpss_stat - 0.463::DOUBLE)
      * (0.025::DOUBLE - 0.05::DOUBLE) / (0.574::DOUBLE - 0.463::DOUBLE)
    WHEN kpss_stat <= 0.739::DOUBLE THEN 0.025::DOUBLE + (kpss_stat - 0.574::DOUBLE)
      * (0.01::DOUBLE - 0.025::DOUBLE) / (0.739::DOUBLE - 0.574::DOUBLE)
    ELSE 0.01::DOUBLE END) * 1e4 + 0.500001::DOUBLE) / 1e4 AS kpss_pvalue
FROM stat
"""


def q_acf_features_1h(spark, sf_dir):
    """feat_acf feature pack (acf1/acf10, diff1/diff2 variants,
    season_acf1) in pure SQL — same text as the DuckDB oracle."""
    from feasts_spark.functions.sql_features import acf_features_sql

    _utc(spark)
    _events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(acf_features_sql())


def q_pp_sql_1d(spark, sf_dir):
    """Phillips-Perron Z-tau in pure SQL — the SAME SQL text is the DuckDB
    oracle (pp_sql), so cross-engine parity is textual."""
    from feasts_spark.functions.sql_features import pp_sql

    _utc(spark)
    _events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(pp_sql())


def q_stl_multi_1h(spark, sf_dir):
    """MSTL with daily + weekly seasons over the 1h tier (stl.R:63-78) —
    rows-only (iterated loess)."""
    from feasts_spark.operators.decompose import stl_components
    from feasts_spark.operators.gapfill import gapfill_locf
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1h", "user_id", "ts", "value")
    filled = gapfill_locf(r, "1h", value_cols=("val_avg",))
    counts = filled.groupBy("series_key").count().filter(F.col("count") >= 2 * 168)
    filled = filled.join(counts.select("series_key"), "series_key")
    out = stl_components(filled, periods=(24, 168), value_col="val_avg_filled")
    # UNROUNDED components + the decomposed value: the stl_decomp_suite
    # consumer rounds at melt time, after checking the reconstruction
    # identity at 1e-9 on these raw values (rounding first would destroy
    # the invariant)
    return out.select(
        "series_key", "bucket_ts", "val_avg_filled",
        "trend", "season_24", "season_168", "remainder",
    )


def q_supsmu_trend_1d(spark, sf_dir):
    """Non-seasonal decomposition branch: trend = supsmu (Friedman 1984,
    stl.R:80) — rows-only; oracle-equivalence vs R supsmu is golden-tested."""
    from feasts_spark.operators.decompose import stl_components
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1d", "user_id", "ts", "value")
    counts = r.groupBy("series_key").count().filter(F.col("count") >= 10)
    r = r.join(counts.select("series_key"), "series_key")
    out = stl_components(r, periods=(), value_col="val_avg")
    # unrounded + value: see the q_stl_multi_1h note
    return out.select(
        "series_key", "bucket_ts", "val_avg", "trend", "remainder",
    )


def q_multimodal_features(spark, sf_dir):
    """Multimodal decode + feature extraction with REAL-codec evidence:
    the driver corpus is synthesized deterministically from documents'
    text so that 70% of rows carry genuinely encoded payloads — 40% real
    16x16 24-bit BMP images and 30% real PCM16 WAV clips, both derived
    from md5(text) so the pixels/samples are content-dependent — and 30%
    carry opaque text bytes exercising the documented fake-codec fallback
    (JPEG/MP4 codecs are env-absent). Each output row's `codec` column
    records which decode path ACTUALLY ran (real_bmp/real_wav/fake,
    emitted by extract_features itself, not assumed from the input), and
    the scalar `real_frac` column aggregates the corpus-wide real-decode
    fraction — so the driver row shows how much of this query is real
    codec work. Rows-only (binary codecs have no DuckDB twin); codec
    byte-spec round-trips are pinned in tests/test_dedup_multimodal.py."""
    import hashlib as _hl

    import numpy as _np
    import pandas as _pd

    from feasts_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        encode_wav,
        extract_features,
    )

    _utc(spark)
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 120).select(
        "doc_id", "text"
    )

    def gen(batches):
        for pdf in batches:
            ids, kinds, payloads, meta = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(doc_id)
                # content-dependent deterministic seed: the media bytes
                # change when the document text changes
                seed = int.from_bytes(
                    _hl.md5(text.encode()).digest()[:4], "big"
                )
                rng = _np.random.RandomState(seed)
                m = i % 10
                if m < 4:  # 40%: real BMP
                    kind = "image"
                    p = encode_bmp(
                        rng.randint(0, 256, (16, 16, 3)).astype(_np.uint8)
                    )
                    codec = "bmp24"
                elif m < 7:  # 30%: real WAV
                    kind = "audio"
                    p = encode_wav(
                        _np.clip(rng.standard_normal(1024) * 0.1, -1, 1),
                        16000,
                    )
                    codec = "pcm16"
                else:  # 30%: opaque bytes -> fake-codec fallback
                    kind = "video"
                    p = text.encode()
                    codec = "fake"
                ids.append(i)
                kinds.append(kind)
                payloads.append(p)
                meta.append({
                    "width": 16, "height": 16,
                    "n_frames": 8 if kind == "video" else 1,
                    "sample_rate": 16000 if kind == "audio" else 0,
                    "codec": codec,
                })
            yield _pd.DataFrame({
                "media_id": ids, "kind": kinds, "payload": payloads,
                "meta": meta,
            })

    media = d.mapInPandas(gen, schema=MEDIA_SCHEMA)
    out = extract_features(media)
    real_frac = out.agg(
        (
            F.floor(
                F.avg(F.col("codec").startswith("real").cast("double")) * 1e4
                + F.lit(0.500001)
            )
            / 1e4
        ).alias("real_frac")
    )
    # in-plan codec certificate: every real-codec payload must round-trip
    # encode∘decode (byte-exact for BMP, one-PCM16-quantum for WAV) — a
    # decoder regression turns this driver row into a hard failure
    # instead of plausible features over garbled pixels/samples
    from feasts_spark.operators.multimodal import roundtrip_certify

    cert = roundtrip_certify(media).select(
        "media_id", F.col("rt_ok").alias("cert_roundtrip_ok"))
    guard = F.raise_error(
        F.format_string(
            "multimodal codec certificate violated: media_id=%s codec=%s "
            "failed encode-decode round-trip",
            F.col("media_id").cast("string"),
            F.col("codec").cast("string"),
        )
    ).cast("double")
    return out.join(cert, "media_id").select(
        "media_id", "kind", "codec", "feat_dim",
        F.when(
            F.col("cert_roundtrip_ok"),
            F.floor(
                F.expr("aggregate(feature, 0D, (a, x) -> a + x)") * 1e4
                + F.lit(0.500001)
            ) / 1e4,
        ).otherwise(guard).alias("feat_sum"),
        "cert_roundtrip_ok",
    ).crossJoin(real_frac)


def q_johansen_1h(spark, sf_dir):
    """Johansen cointegration (features.R:249-261) of each user's paired
    hourly series (val_avg vs n_points) — rows-only (reduced-rank
    regression + Osterwald-Lenum critical tables; statistically sane
    behavior pinned in tests/test_cointegration.py)."""
    import numpy as np
    import pandas as pd

    from feasts_spark.kernels.cointegration import cointegration_johansen

    _utc(spark)
    r = _hourly_pair(spark, sf_dir).select(
        "series_key", "bucket_ts",
        F.col("val_avg").alias("y"),
        F.col("n_points").cast("double").alias("x"),
    )
    cols = ["johansen_stat_r0", "johansen_stat_r1", "johansen_pvalue_r0",
            "johansen_pvalue_r1", "johansen_trace_r0",
            "johansen_trace_pvalue_r0"]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts", kind="mergesort")
        try:
            res = cointegration_johansen(
                pdf["y"].to_numpy(np.float64), pdf["x"].to_numpy(np.float64)
            )
        except Exception:
            res = {}
        row = {"series_key": pdf["series_key"].iloc[0]}
        row.update({c: round(res[c], 4) if c in res else None for c in cols})
        return pd.DataFrame([row])

    schema = ", ".join(["series_key long"] + [f"{c} double" for c in cols])
    return r.groupBy("series_key").applyInPandas(fn, schema=schema)


def q_phillips_ouliaris_1h(spark, sf_dir):
    """Phillips-Ouliaris Pu cointegration (features.R:268-335) of each
    user's paired hourly series — rows-only (matrix OLS + long-run
    covariance + Monte Carlo critical tables; pinned in
    tests/test_cointegration.py)."""
    import numpy as np
    import pandas as pd

    from feasts_spark.kernels.cointegration import cointegration_phillips_ouliaris

    _utc(spark)
    r = _hourly_pair(spark, sf_dir).select(
        "series_key", "bucket_ts",
        F.col("val_avg").alias("y"),
        F.col("n_points").cast("double").alias("x"),
    )
    cols = ["phillips_ouliaris_stat", "phillips_ouliaris_pvalue"]
    # unrounded SQL-expressible intermediates for the in-plan certificate
    # joined on by q_cointegration_1h (dropped from its final output)
    icols = ["po_n", "po_lmax", "po_ssr", "po_beta", "po_sum_dy2",
             "po_sum_dydy1"]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts", kind="mergesort")
        try:
            res = cointegration_phillips_ouliaris(
                pdf["y"].to_numpy(np.float64), pdf["x"].to_numpy(np.float64),
                internals=True,
            )
        except Exception:
            res = {}
        row = {"series_key": pdf["series_key"].iloc[0]}
        row.update({c: round(res[c], 4) if c in res else None for c in cols})
        row.update({c: res.get(c) for c in icols})
        return pd.DataFrame([row])

    schema = ", ".join(
        ["series_key long"] + [f"{c} double" for c in cols + icols]
    )
    return r.groupBy("series_key").applyInPandas(fn, schema=schema)


def q_stl_generate_1d(spark, sf_dir):
    """generate.stl_decomposition (stl.R:171-197): 2 bootstrap replicates
    per user via seeded moving-block bootstrap of the STL remainder —
    rows-only (MBB is sampling; determinism is pinned by the fixed seed and
    asserted by the driver's repeated-run hash)."""
    import numpy as np
    import pandas as pd

    from feasts_spark.kernels.extras import generate_stl
    from feasts_spark.kernels.stl import estimate_stl
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1d", "user_id", "ts", "value")
    counts = r.groupBy("series_key").count().filter(F.col("count") >= 15)
    r = r.join(counts.select("series_key"), "series_key")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts", kind="mergesort")
        y = pdf["val_avg"].to_numpy(dtype=np.float64)
        d = estimate_stl(y, periods=(7,), s_windows=None, period_names=("7",))
        sims = generate_stl(
            d["trend"], [d["season_7"]], d["remainder"], period=7, times=2,
            seed=42,
        )
        frames = []
        for rep, sim in enumerate(sims):
            frames.append(pd.DataFrame({
                "series_key": pdf["series_key"].iloc[0],
                "bucket_ts": pdf["bucket_ts"].to_numpy(),
                "rep": rep,
                "sim": np.round(sim, 4),
            }))
        return pd.concat(frames, ignore_index=True)

    return r.groupBy("series_key").applyInPandas(
        fn, schema="series_key long, bucket_ts timestamp, rep int, sim double"
    )


def q_tacf_1h(spark, sf_dir):
    """Tapered/banded ACF with eigenvalue shrinkage (acf.R:252-300) —
    rows-only."""
    from feasts_spark.operators.cf import acf_table

    _utc(spark)
    r = _hourly_pair(spark, sf_dir)
    out = acf_table(r, lag_max=10, tapered=True)
    return out.select("series_key", "lag", _r4("acf").alias("acf"))


def q_pacf_tapered_1h(spark, sf_dir):
    """Tapered PACF: Durbin-Levinson on the tacf estimate
    (acf.R:118-138, PACF(tapered=TRUE)) — rows-only."""
    from feasts_spark.operators.cf import pacf_table

    _utc(spark)
    r = _hourly_pair(spark, sf_dir)
    out = pacf_table(r, lag_max=10, tapered=True)
    return out.select("series_key", "lag", _r4("pacf").alias("pacf"))


# ---------------------------------------------------------------------------
# Merged packs (one registry slot each; components individually oracled in
# rounds 1-2, now joined on their natural key so the 50-query driver window
# holds every oracled row) + round-3 operators
# ---------------------------------------------------------------------------

def q_text_pack(spark, sf_dir):
    """All four per-document text analyses — token stats, language-ID,
    quality scores, fingerprints — as one doc_id-keyed row. Each component
    keeps its own all-JVM single-pass plan; the joins are per-doc scalar
    outputs on the same key (AQE picks broadcast/shuffle as cardinality
    dictates), so the merge adds no data-sized shuffle."""
    ts = q_token_stats(spark, sf_dir)
    li = q_language_id(spark, sf_dir)
    qs = q_quality_scores(spark, sf_dir)
    fp = q_fingerprints(spark, sf_dir)
    return ts.join(li, "doc_id").join(qs, "doc_id").join(fp, "doc_id")


def _text_pack_oracle() -> str:
    return (
        f"WITH t AS ({ORACLE_TOKEN_STATS}),\n"
        f"l AS ({ORACLE_LANGUAGE_ID}),\n"
        f"q AS ({ORACLE_QUALITY}),\n"
        f"f AS ({ORACLE_FINGERPRINTS})\n"
        "SELECT t.*, l.score_de, l.score_en, l.score_es, l.score_fr,\n"
        "       l.pred_lang, q.n_tokens, q.mean_word_len, q.stopword_ratio,\n"
        "       q.punct_ratio, q.quality_score, f.fingerprint, f.n_shingles,\n"
        "       f.n_chars_norm\n"
        "FROM t JOIN l USING (doc_id) JOIN q USING (doc_id)\n"
        "JOIN f USING (doc_id)"
    )


def q_repetition_docs(spark, sf_dir):
    """Gopher-style within-document repetition quality features (duplicate
    n-gram fraction + top-n-gram char coverage for n=2,3) over the full
    documents table — exact DuckDB twin below."""
    from feasts_spark.operators.text import repetition_scores

    _utc(spark)
    return repetition_scores(_docs(spark, sf_dir), ns=(2, 3))


def _repetition_oracle() -> str:
    per_n = []
    for n in (2, 3):
        per_n.append(f"""
g{n} AS (
  SELECT doc_id, array_to_string(t[k:k+{n - 1}], ' ') AS gram
  FROM toks CROSS JOIN dims
  WHERE k <= greatest(len(t) - {n - 1}, 1)
), c{n} AS (
  SELECT doc_id, gram, count(*) AS cnt FROM g{n} GROUP BY 1, 2
), top{n} AS (
  SELECT doc_id, gram, cnt FROM (
    SELECT doc_id, gram, cnt,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY cnt DESC, gram ASC) AS rn
    FROM c{n}
  ) WHERE rn = 1
), p{n} AS (
  SELECT c.doc_id,
         CAST(sum(c.cnt) AS BIGINT) AS total_{n}grams,
         floor((1.0 - count(*) / sum(c.cnt)) * 1e4 + 0.500001::DOUBLE) / 1e4
           AS dup_{n}gram_frac,
         any_value(tp.gram) AS top_{n}gram,
         CAST(any_value(tp.cnt) AS BIGINT) AS top_{n}gram_count
  FROM c{n} c JOIN top{n} tp USING (doc_id)
  GROUP BY 1
)""")
    return (
        r"""WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t,
         length(regexp_replace(trim(lower(text)), '\s+', '', 'g')) AS wc
  FROM documents
), dims AS (
  SELECT unnest(generate_series(1, (SELECT max(len(t)) FROM toks))) AS k
),"""
        + ",".join(per_n)
        + """
SELECT toks.doc_id,
       p2.total_2grams, p2.dup_2gram_frac, p2.top_2gram, p2.top_2gram_count,
       floor((p2.top_2gram_count
              * length(regexp_replace(p2.top_2gram, '\\s+', '', 'g'))
              / greatest(wc, 1)) * 1e4 + 0.500001::DOUBLE) / 1e4
         AS top_2gram_char_frac,
       p3.total_3grams, p3.dup_3gram_frac, p3.top_3gram, p3.top_3gram_count,
       floor((p3.top_3gram_count
              * length(regexp_replace(p3.top_3gram, '\\s+', '', 'g'))
              / greatest(wc, 1)) * 1e4 + 0.500001::DOUBLE) / 1e4
         AS top_3gram_char_frac
FROM toks JOIN p2 USING (doc_id) JOIN p3 USING (doc_id)"""
    )


def q_contamination(spark, sf_dir):
    """Train/eval n-gram contamination: eval slice = doc_id % 17 == 0,
    train = the rest; per-eval-doc fraction of distinct word 3-grams found
    anywhere in the train corpus (GPT-3-style decontamination overlap)."""
    from feasts_spark.operators.dedup import ngram_containment

    _utc(spark)
    d = _docs(spark, sf_dir)
    ev = d.filter(F.col("doc_id") % 17 == 0)
    tr = d.filter(F.col("doc_id") % 17 != 0)
    out = ngram_containment(ev, tr, n=3)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_hits").cast("long").alias("n_hits"),
        "containment",
    )


ORACLE_CONTAMINATION = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
), dims AS (
  SELECT unnest(generate_series(1, (SELECT max(len(t)) FROM toks))) AS k
), eg AS (
  SELECT DISTINCT doc_id, array_to_string(t[k:k+2], ' ') AS gram
  FROM toks CROSS JOIN dims
  WHERE doc_id % 17 = 0 AND k <= len(t) - 2
), tg AS (
  SELECT DISTINCT array_to_string(t[k:k+2], ' ') AS gram
  FROM toks CROSS JOIN dims
  WHERE doc_id % 17 <> 0 AND k <= len(t) - 2
), tot AS (
  SELECT doc_id, count(*) AS n_grams FROM eg GROUP BY 1
), hit AS (
  SELECT doc_id, count(*) AS n_hits FROM eg
  WHERE gram IN (SELECT gram FROM tg) GROUP BY 1
)
SELECT t.doc_id,
       CAST(t.n_grams AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       floor(coalesce(h.n_hits, 0) / t.n_grams * 1e4 + 0.500001::DOUBLE) / 1e4
         AS containment
FROM tot t LEFT JOIN hit h USING (doc_id)
"""


CURATION_FRACTIONS = {"en": 0.5, "zh": 0.8, "es": 0.8, "de": 0.8, "fr": 0.8}
CURATION_BUDGET = 800  # tokens per source; sf0.01 sources carry ~1.1-1.6k
CURATION_RESERVOIR_K = 25  # exact-k per-lang reservoir in the pack
CURATION_SPLITS = {"train": 0.8, "test": 0.1, "val": 0.1}
CURATION_PACK_BUDGET = 400  # concat-and-cut context-window token budget


def q_curation_pack(spark, sf_dir):
    """Corpus-curation pack, one doc_id-keyed row: deterministic stratified
    sampling flags (seeded md5-uniform per lang), per-source token-budget
    capping (highest quality_score first), cross-document duplicated
    4-token-span stats (Lee et al. 2021-style substring dedup summary),
    PII detection + scrub digests over deterministically injected
    synthetic PII, and concat-and-cut PACKING offsets (doc_stream_offsets:
    per-source token-tape position, first/last context-window bin, and
    whether the doc spans a cut — the training-example assembly step,
    oracled by the same window arithmetic in DuckDB). Each component
    keeps its own plan (sampler and PII are shuffle-free projections;
    budget and packing are one source-keyed window each; spans are a
    single-lineage gram-window pipeline); the merge joins per-doc
    scalars on doc_id."""
    from feasts_spark.operators.curation import (
        hash_split,
        reservoir_per_group,
        stratified_sample,
        token_budget_cap,
    )
    from feasts_spark.operators.dedup import dup_span_stats
    from feasts_spark.operators.examples import doc_stream_offsets
    from feasts_spark.operators.text import pii_stats

    _utc(spark)
    d = _docs(spark, sf_dir)
    samp = stratified_sample(
        d, CURATION_FRACTIONS, strata_col="lang", default_fraction=0.25
    ).select(
        "doc_id",
        "lang",
        (F.floor(F.col("sample_u") * 1e4 + F.lit(0.500001)) / 1e4).alias(
            "sample_u"
        ),
        "sampled",
    )
    cap = token_budget_cap(d, budget_tokens=CURATION_BUDGET)
    spans = dup_span_stats(d, n=4)
    # PII detection/scrub gets real signal by deterministically appending
    # synthetic PII to every 7th document (the raw corpus has none); the
    # oracle replays the identical injection expression
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.format_string(
                    " Contact user%d@example.com or +1 (555) 010-%04d"
                    " at 192.168.%d.%d see https://example.com/u/%d",
                    F.col("doc_id"),
                    (F.col("doc_id") % 10000).cast("int"),
                    (F.col("doc_id") % 256).cast("int"),
                    (F.col("doc_id") % 100).cast("int"),
                    F.col("doc_id"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    pii = pii_stats(injected)
    # exact-k per-lang reservoir rank (0 = not selected); shares the seeded
    # uniform with the stratified sampler so the oracle replays one u
    res = reservoir_per_group(
        d, CURATION_RESERVOIR_K, strata_col="lang"
    ).select("doc_id", "rs_rank")
    pk = doc_stream_offsets(d, CURATION_PACK_BUDGET).select(
        "doc_id", "stream_offset", "bin_first",
        F.col("spans_boundary").cast("int").alias("spans_boundary"),
    )
    # deterministic train/val/test assignment from the same seeded uniform
    # — hash_split is a pure projection of doc_id, so apply it to the
    # final joined frame instead of paying an extra join
    return hash_split(
        samp.join(cap, "doc_id")
        .join(spans, "doc_id")
        .join(pii, "doc_id")
        .join(res, "doc_id", "left")
        .join(pk, "doc_id")
        .withColumn(
            "rs_rank", F.coalesce(F.col("rs_rank"), F.lit(0)).cast("long")
        ),
        CURATION_SPLITS,
    )


def _curation_oracle() -> str:
    from feasts_spark.operators.text import PII_PATTERNS

    frac_case = " ".join(
        f"WHEN '{k}' THEN {v}::DOUBLE" for k, v in CURATION_FRACTIONS.items()
    )
    # sequential counting, matching pii_stats: class k is counted on the
    # text with classes 1..k-1 already scrubbed (overlap attribution)
    count_parts = []
    running = "text"
    for name, pat, tag in PII_PATTERNS:
        count_parts.append(
            "len(regexp_extract_all(" + running + ", '" + pat + "')) AS n_"
            + name + "s"
        )
        running = (
            "regexp_replace(" + running + ", '" + pat + "', '" + tag + "', 'g')"
        )
    pii_counts = ",\n         ".join(count_parts)
    scrub = running
    pii_cte = (
        """
pii_in AS (
  SELECT doc_id,
         d.text || CASE WHEN d.doc_id % 7 = 0 THEN
           ' Contact user' || d.doc_id || '@example.com or +1 (555) 010-'
           || lpad((d.doc_id % 10000)::VARCHAR, 4, '0')
           || ' at 192.168.' || (d.doc_id % 256) || '.' || (d.doc_id % 100)
           || ' see https://example.com/u/' || d.doc_id
         ELSE '' END AS text
  FROM documents d
),
pii AS (
  SELECT doc_id,
         """
        + pii_counts
        + ",\n         md5("
        + scrub
        + ") AS scrub_md5\n  FROM pii_in\n)"
    )
    return f"""
WITH q AS ({ORACLE_QUALITY}),
base AS (
  SELECT d.doc_id, d.lang, d.source,
         len(regexp_split_to_array(trim(lower(d.text)), '\\s+')) AS n_tokens,
         q.quality_score,
         ('0x' || substr(md5('42|' || d.doc_id), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents d JOIN q USING (doc_id)
),
cap AS (
  SELECT doc_id,
         CAST(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY quality_score DESC, doc_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM base
),
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
),
dims AS (
  SELECT unnest(generate_series(1, (SELECT max(len(t)) FROM toks))) AS k
),
g AS (
  SELECT doc_id, array_to_string(t[k:k+3], ' ') AS gram
  FROM toks CROSS JOIN dims
  WHERE k <= len(t) - 3
),
c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
sh AS (SELECT gram FROM c GROUP BY gram HAVING count(*) >= 2),
dup AS (
  SELECT doc_id, sum(cnt) AS n_dup FROM c
  WHERE gram IN (SELECT gram FROM sh) GROUP BY 1
),
tot AS (SELECT doc_id, sum(cnt) AS n_win FROM c GROUP BY 1),
res AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rn
  FROM base
),
pk AS (
  SELECT doc_id, n_tokens AS pk_n,
         coalesce(CAST(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS stream_offset
  FROM base
),
{pii_cte}
SELECT b.doc_id, b.lang,
       floor(b.u * 1e4 + 0.500001::DOUBLE) / 1e4 AS sample_u,
       CASE WHEN b.u < (CASE b.lang {frac_case} ELSE 0.25::DOUBLE END)
            THEN 1 ELSE 0 END AS sampled,
       b.source, CAST(b.n_tokens AS BIGINT) AS n_tokens, b.quality_score,
       cap.cum_tokens,
       CASE WHEN cap.cum_tokens <= {CURATION_BUDGET} THEN 1 ELSE 0 END
         AS kept_by_budget,
       CAST(coalesce(tot.n_win, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(dup.n_dup, 0) AS BIGINT) AS n_dup_windows,
       floor(coalesce(dup.n_dup, 0) / greatest(coalesce(tot.n_win, 0), 1)
             * 1e4 + 0.500001::DOUBLE)
         / 1e4 AS dup_span_frac,
       pii.n_emails, pii.n_urls, pii.n_ips, pii.n_phones, pii.scrub_md5,
       CAST(CASE WHEN res.rn <= {CURATION_RESERVOIR_K} THEN res.rn
                 ELSE 0 END AS BIGINT) AS rs_rank,
       pk.stream_offset,
       CAST(floor(pk.stream_offset / {CURATION_PACK_BUDGET}) AS BIGINT)
         AS bin_first,
       CASE WHEN floor((pk.stream_offset + greatest(pk.pk_n - 1, 0))
                       / {CURATION_PACK_BUDGET})
                 > floor(pk.stream_offset / {CURATION_PACK_BUDGET})
            THEN 1 ELSE 0 END AS spans_boundary,
       CASE WHEN b.u < 0.1 THEN 'test' WHEN b.u < 0.9 THEN 'train'
            ELSE 'val' END AS split
FROM base b
JOIN cap USING (doc_id)
LEFT JOIN tot USING (doc_id)
LEFT JOIN dup USING (doc_id)
JOIN pii USING (doc_id)
JOIN res USING (doc_id)
JOIN pk USING (doc_id)
"""


def q_cointegration_1h(spark, sf_dir):
    """Johansen + Phillips-Ouliaris cointegration of each user's paired
    hourly series, merged on series_key into one registry slot (rows-only:
    eigen decompositions + MC critical tables have no DuckDB twin;
    exactness pinned in tests/test_cointegration.py).

    The row carries TWO in-plan certificates (the q_stl_decomp_suite
    raise_error pattern), so a green driver row is machine-checked
    evidence, not just a row count:

    - `cert_johansen_ok`: the trace statistic must equal the sum of the
      max-eigen statistics (trace(r=0) = -NΣlog(1-λi) = Σ max-eigen by
      construction), the eigen stats must be nonnegative and descending
      (λ sorted), and every interpolated p-value must lie in the clamped
      stats::approx range [0.01, 0.10].
    - `cert_po_twin_ok`: the PO kernel emits its SQL-expressible
      intermediates (no-intercept OLS slope + SSR, and the lag-0/lag-1
      moments of Δy — the latter ORDER-SENSITIVE, so they certify the
      kernel saw rows in bucket_ts order) and each is recomputed in pure
      SQL over the SAME pair frame inside this plan; |Δ| > 1e-6·max(1,
      |twin|) throws.

    A corrupted kernel or a scrambled sort makes the query THROW (pinned
    in tests/test_entry_contract.py)."""
    j = q_johansen_1h(spark, sf_dir)
    p = q_phillips_ouliaris_1h(spark, sf_dir)

    # pure-SQL twin of the PO kernel intermediates over the same pair frame
    pair = _hourly_pair(spark, sf_dir).select(
        "series_key", "bucket_ts",
        F.col("val_avg").alias("y"),
        F.col("n_points").cast("double").alias("x"),
    )
    w = W.partitionBy("series_key").orderBy("bucket_ts")
    d = pair.withColumn("dy", F.col("y") - F.lag("y").over(w))
    d = d.withColumn("dy1", F.lag("dy").over(w))
    twin = (
        d.groupBy("series_key")
        .agg(
            F.count(F.lit(1)).cast("double").alias("t_n"),
            F.sum(F.col("x") * F.col("y")).alias("t_sxy"),
            F.sum(F.col("x") * F.col("x")).alias("t_sxx"),
            F.sum(F.col("y") * F.col("y")).alias("t_syy"),
            F.sum(F.col("dy") * F.col("dy")).alias("t_sum_dy2"),
            F.sum(F.col("dy") * F.col("dy1")).alias("t_sum_dydy1"),
        )
        .select(
            "series_key",
            "t_n",
            F.floor(
                F.lit(4.0) * F.pow(F.col("t_n") / F.lit(100.0), F.lit(0.25))
            ).cast("double").alias("t_lmax"),
            (F.col("t_sxy") / F.col("t_sxx")).alias("t_beta"),
            (F.col("t_syy") - F.col("t_sxy") * F.col("t_sxy") / F.col("t_sxx"))
            .alias("t_ssr"),
            "t_syy",
            "t_sum_dy2",
            F.coalesce(F.col("t_sum_dydy1"), F.lit(0.0)).alias("t_sum_dydy1"),
        )
    )
    out = j.join(p, "series_key").join(twin, "series_key")

    po_pairs = {
        "po_n": "t_n",
        "po_lmax": "t_lmax",
        "po_beta": "t_beta",
        "po_ssr": "t_ssr",
        "po_sum_dy2": "t_sum_dy2",
        "po_sum_dydy1": "t_sum_dydy1",
    }
    po_ok = F.lit(True)
    for k, t in po_pairs.items():
        tol = F.lit(1e-6) * F.greatest(F.lit(1.0), F.abs(F.col(t)))
        if k == "po_ssr":
            # the twin's syy - sxy^2/sxx form cancels catastrophically when
            # the OLS fit is tight; bound that by eps-scaled syy
            tol = tol + F.lit(1e-10) * F.abs(F.col("t_syy"))
        po_ok = po_ok & (F.abs(F.col(k) - F.col(t)) <= tol)
    po_ok = po_ok & (
        (F.col("phillips_ouliaris_pvalue") >= F.lit(0.0099))
        & (F.col("phillips_ouliaris_pvalue") <= F.lit(0.1001))
    )
    po_guard = F.raise_error(
        F.format_string(
            "phillips-ouliaris twin certificate violated: series=%s "
            + " ".join(f"{k}=%s {t}=%s" for k, t in po_pairs.items()),
            F.col("series_key").cast("string"),
            *[
                c.cast("string")
                for k, t in po_pairs.items()
                for c in (F.col(k), F.col(t))
            ],
        )
    ).cast("boolean")

    p_in_range = lambda c: (  # noqa: E731  stats::approx rule=2 clamp
        (F.col(c) >= F.lit(0.0099)) & (F.col(c) <= F.lit(0.1001))
    )
    jo_ok = (
        (
            F.abs(
                F.col("johansen_trace_r0")
                - (F.col("johansen_stat_r0") + F.col("johansen_stat_r1"))
            )
            <= F.lit(5e-4)  # each term independently rounded to 4dp
        )
        & (F.col("johansen_stat_r1") >= F.lit(-1e-9))
        & (F.col("johansen_stat_r0") >= F.col("johansen_stat_r1") - F.lit(1e-9))
        & p_in_range("johansen_pvalue_r0")
        & p_in_range("johansen_pvalue_r1")
        & p_in_range("johansen_trace_pvalue_r0")
    )
    jo_guard = F.raise_error(
        F.format_string(
            "johansen certificate violated: series=%s stat_r0=%s stat_r1=%s "
            "trace_r0=%s",
            F.col("series_key").cast("string"),
            F.col("johansen_stat_r0").cast("string"),
            F.col("johansen_stat_r1").cast("string"),
            F.col("johansen_trace_r0").cast("string"),
        )
    ).cast("boolean")

    keep = [
        "johansen_stat_r0", "johansen_stat_r1", "johansen_pvalue_r0",
        "johansen_pvalue_r1", "johansen_trace_r0", "johansen_trace_pvalue_r0",
        "phillips_ouliaris_stat", "phillips_ouliaris_pvalue",
    ]
    # a kernel may legitimately declare a series undefined (singular
    # moment matrix, constant regressor -> res={}): ALL its outputs are
    # NULL together and the certificate is NULL (visibly unchecked in the
    # driver hash). A PARTIALLY-null row is a bug and still throws.
    jo_null = F.lit(True)
    for c in keep[:6]:
        jo_null = jo_null & F.col(c).isNull()
    po_null = F.col("phillips_ouliaris_stat").isNull()
    for k in po_pairs:
        po_null = po_null & F.col(k).isNull()
    return out.select(
        "series_key",
        *keep,
        F.when(jo_null, F.lit(None).cast("boolean"))
        .when(jo_ok, F.lit(True))
        .otherwise(jo_guard)
        .alias("cert_johansen_ok"),
        F.when(po_null, F.lit(None).cast("boolean"))
        .when(po_ok, F.lit(True))
        .otherwise(po_guard)
        .alias("cert_po_twin_ok"),
    )


def q_stl_decomp_suite(spark, sf_dir):
    """Every iterated-loess / supsmu decomposition surface in one long
    (series_key, kind, component, rep, bucket_ts, value) driver row:
    MSTL over the hourly tier (daily+weekly seasons), single-period STL
    over the daily tier (weekly season + season_adjust), the non-seasonal
    supsmu branch (stl.R:80), and seeded moving-block-bootstrap
    replicates (stl.R:171-197; formerly the q_stl_daily_1d row).

    Rows-only — loess is not SQL-expressible — but each decomposition
    row carries an IN-PLAN invariant certificate: every emitted value
    passes through a `raise_error` guard asserting the unrounded
    reconstruction identity value == trend + Σseason + remainder (and
    season_adjust == trend + remainder, stl.R:108-112 aliases) to 1e-9
    on its source row, so a green driver row proves the identities were
    machine-checked at run time, not just that rows came back. A
    corrupted component makes the query THROW (pinned in
    tests/test_stl_usaccdeaths.py). Exactness of the kernels is pinned
    by the golden stl tests."""
    from feasts_spark.operators.decompose import reconstruction_ok

    def _melt(df, kind, cols, ok):
        guard = F.raise_error(
            F.format_string(
                f"stl invariant violated in {kind}: series=%s ts=%s",
                F.col("series_key").cast("string"),
                F.col("bucket_ts").cast("string"),
            )
        ).cast("double")
        parts = [
            df.select(
                "series_key", F.lit(kind).alias("kind"),
                F.lit(c).alias("component"), F.lit(0).alias("rep"),
                "bucket_ts",
                F.when(ok, _r4(c)).otherwise(guard).alias("value"),
            )
            for c in cols
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    m = q_stl_multi_1h(spark, sf_dir)
    s = q_stl_components_1d(spark, sf_dir)
    sup = q_supsmu_trend_1d(spark, sf_dir)
    mstl = _melt(
        m, "mstl_1h", ["trend", "season_24", "season_168", "remainder"],
        reconstruction_ok(
            "val_avg_filled", ["trend", "season_24", "season_168", "remainder"]
        ),
    )
    stl1d = _melt(
        s, "stl_1d", ["trend", "season_7", "remainder", "season_adjust"],
        reconstruction_ok("val_avg", ["trend", "season_7", "remainder"])
        & reconstruction_ok("season_adjust", ["trend", "remainder"]),
    )
    supsmu = _melt(
        sup, "supsmu_1d", ["trend", "remainder"],
        reconstruction_ok("val_avg", ["trend", "remainder"]),
    )
    mbb = q_stl_generate_1d(spark, sf_dir).select(
        "series_key", F.lit("mbb_1d").alias("kind"),
        F.lit("sim").alias("component"), "rep", "bucket_ts",
        F.col("sim").alias("value"),
    )
    return mstl.unionByName(stl1d).unionByName(supsmu).unionByName(mbb)


def q_tapered_cf_1h(spark, sf_dir):
    """Tapered/banded ACF (acf.R:252-300) and tapered PACF (acf.R:118-138)
    as one tagged union (rows-only: eigenvalue shrinkage is not
    SQL-expressible; golden tests pin the kernels). Every emitted value
    passes an in-plan `raise_error` certificate for the correlation bound
    |r| <= 1 that the Durbin-Levinson recursion and the banding+shrinkage
    construction both guarantee — a kernel regression that pushes an
    estimate out of [-1, 1] turns this driver row into a hard failure."""

    def _guarded(df, kind, col):
        guard = F.raise_error(
            F.format_string(
                f"tapered-cf invariant |r|<=1 violated ({kind}): "
                "series=%s lag=%s",
                F.col("series_key").cast("string"),
                F.col("lag").cast("string"),
            )
        ).cast("double")
        return df.select(
            "series_key", F.lit(kind).alias("kind"), "lag",
            F.when(F.abs(F.col(col)) <= 1.0 + 1e-12, F.col(col))
            .otherwise(guard)
            .alias("value"),
        )

    a = _guarded(q_tacf_1h(spark, sf_dir), "tacf", "acf")
    b = _guarded(q_pacf_tapered_1h(spark, sf_dir), "pacf_tapered", "pacf")
    return a.unionByName(b)


def q_gapfill_1d(spark, sf_dir):
    """LOCF and linear gap-fill over the daily tier in one registry row,
    joined on the (series, bucket) grid both fills share."""
    locf = q_gapfill_locf_1d(spark, sf_dir)
    lin = q_gapfill_linear_1d(spark, sf_dir).select(
        "series_key", "bucket_ts", "val_interp"
    )
    return locf.join(lin, ["series_key", "bucket_ts"])


def _gapfill_1d_oracle() -> str:
    return (
        f"WITH a AS ({ORACLE_LOCF_1D}),\n"
        f"b AS ({ORACLE_LINEAR_1D})\n"
        "SELECT a.series_key, a.bucket_ts, a.is_gap, a.val_filled,\n"
        "       b.val_interp\n"
        "FROM a JOIN b USING (series_key, bucket_ts)"
    )


def q_unitroot_pack(spark, sf_dir):
    """The whole unit-root surface (features.R:137-203) in ONE tagged
    registry row: KPSS stat+pvalue, Phillips-Perron Z-tau stat+pvalue,
    and the ndiffs iteration, normalized to (series_key, tag, stat,
    pvalue). A tagged UNION rather than a three-way join — joining
    several CTE-heavy SQL texts sends Catalyst constraint propagation
    quadratic (see the documented guerrero packing hazard); unions of
    already-aggregated legs are safe on both engines."""
    from feasts_spark.functions.sql_features import ndiffs_sql

    k = q_kpss_sql_1d(spark, sf_dir)
    p = q_pp_sql_1d(spark, sf_dir)
    nd = spark.sql(ndiffs_sql())
    null_d = F.lit(None).cast("double")
    return (
        k.select(
            "series_key",
            F.lit("kpss").alias("tag"),
            F.col("kpss_stat").alias("stat"),
            F.col("kpss_pvalue").alias("pvalue"),
        )
        .unionByName(
            p.select(
                "series_key",
                F.lit("pp").alias("tag"),
                F.col("pp_stat").alias("stat"),
                F.col("pp_pvalue").alias("pvalue"),
            )
        )
        .unionByName(
            nd.select(
                "series_key",
                F.lit("ndiffs").alias("tag"),
                F.col("ndiffs").cast("double").alias("stat"),
                null_d.alias("pvalue"),
            )
        )
    )


def _unitroot_pack_oracle() -> str:
    from feasts_spark.functions.sql_features import ndiffs_sql, pp_sql

    return (
        f"WITH k AS ({_kpss_oracle()}),\n"
        f"p AS ({pp_sql()}),\n"
        f"nd AS ({ndiffs_sql()})\n"
        "SELECT series_key, 'kpss' AS tag, kpss_stat AS stat,\n"
        "       kpss_pvalue AS pvalue FROM k\n"
        "UNION ALL\n"
        "SELECT series_key, 'pp', pp_stat, pp_pvalue FROM p\n"
        "UNION ALL\n"
        "SELECT series_key, 'ndiffs', CAST(ndiffs AS DOUBLE),\n"
        "       CAST(NULL AS DOUBLE) FROM nd"
    )


def q_conv_flow(spark, sf_dir):
    """Conversation-flow analytics over the transcript shape
    (operators/flow.py): the role-transition Markov matrix with
    per-edge inter-turn latency distribution (mean/p50/p90/p99, Spark's
    exact linear-interpolation percentile == DuckDB quantile_cont), and
    per-tool call volume / reach / latency — one tagged pack. The
    transcript derives deterministically from `events` with identical
    SQL semantics on both engines (conv_id from user_id, turn order by
    (ts, event_id), role/tool from event_id % 5 — same trick as
    transcript_integrity), so every value is cross-engine exact."""
    from feasts_spark.operators.flow import conv_flow

    _utc(spark)
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    m5 = F.col("event_id") % 5
    tr = e.select(
        F.concat(F.lit("conv-"), F.col("user_id")).alias("conv_id"),
        (F.row_number().over(w) - 1).alias("turn_idx"),
        F.when(m5.isin(0, 2), F.lit("user"))
        .when(m5 == 4, F.lit("tool"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.when(m5 == 4, F.col("event_type"))
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        F.col("ts"),
    )
    out = conv_flow(tr)

    # In-plan certificate for the bounded-state sketch path
    # (conv_flow_sketch, operators/flow.py — the 10^12-turn plan): its
    # EXACT fields (n, n_convs, mean_s, share) must equal this oracled
    # exact pack's unrounded values at run time, and its percentile
    # estimates must respect the documented grid contract (inside
    # [lat_lo, lat_hi], monotone p50<=p90<=p99, null iff no latencies).
    # A drifting sketch makes this row THROW; the DuckDB oracle pins
    # cert_sketch_ok to literal TRUE, so the driver machine-checks the
    # scale path against the oracle path in one row. (One-bin accuracy
    # vs order statistics is pinned in tests/test_flow.py — Spark's
    # interpolated percentile has no bounded gap to an order statistic,
    # so it is not certified here.)
    from feasts_spark.operators.flow import conv_flow_sketch

    sk = conv_flow_sketch(tr).select(
        F.col("tag").alias("s_tag"), F.col("k1").alias("s_k1"),
        F.col("k2").alias("s_k2"), F.col("n").alias("s_n"),
        F.col("n_convs").alias("s_n_convs"),
        F.col("mean_s").alias("s_mean_s"), F.col("share").alias("s_share"),
        F.col("p50_s").alias("s_p50"), F.col("p90_s").alias("s_p90"),
        F.col("p99_s").alias("s_p99"),
    )
    j = out.join(
        sk,
        (out["tag"] == sk["s_tag"]) & (out["k1"] == sk["s_k1"])
        & out["k2"].eqNullSafe(sk["s_k2"]),
        "left",
    )

    def _near(a, b, tol):
        return (F.col(a).isNull() & F.col(b).isNull()) | (
            F.abs(F.col(a) - F.col(b))
            <= F.lit(tol) * F.greatest(F.lit(1.0), F.abs(F.col(a))))

    pctl = (
        (F.col("s_p50").isNull() & F.col("p50_s").isNull())
        | (F.col("s_p50").between(0.0, 3600.0)
           & (F.col("s_p50") <= F.col("s_p90"))
           & (F.col("s_p90") <= F.col("s_p99"))
           & F.col("s_p99").between(0.0, 3600.0))
    )
    ok = (
        F.col("s_n").isNotNull()
        & (F.col("n") == F.col("s_n"))
        & (F.col("n_convs") == F.col("s_n_convs"))
        & _near("mean_s", "s_mean_s", 1e-9)
        & _near("share", "s_share", 1e-12)
        & pctl
    )
    guard = F.raise_error(F.format_string(
        "conv_flow sketch certificate violated: edge=%s/%s exact "
        "n=%s mean=%s share=%s vs sketch n=%s mean=%s share=%s "
        "pctl=(%s,%s,%s)",
        F.col("k1"), F.col("k2").cast("string"),
        F.col("n").cast("string"), F.col("mean_s").cast("string"),
        F.col("share").cast("string"), F.col("s_n").cast("string"),
        F.col("s_mean_s").cast("string"), F.col("s_share").cast("string"),
        F.col("s_p50").cast("string"), F.col("s_p90").cast("string"),
        F.col("s_p99").cast("string"),
    )).cast("boolean")
    certified = j.select(
        *[out[c] for c in out.columns],
        F.when(ok, F.lit(True)).otherwise(guard).alias("cert_sketch_ok"),
    )
    return _round_cols(certified,
                       ["share", "mean_s", "p50_s", "p90_s", "p99_s"])


ORACLE_CONV_FLOW = f"""
WITH tr AS (
  SELECT 'conv-' || user_id AS conv_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - 1 AS turn_idx,
         CASE WHEN event_id % 5 IN (0, 2) THEN 'user'
              WHEN event_id % 5 = 4 THEN 'tool'
              ELSE 'assistant' END AS role,
         CASE WHEN event_id % 5 = 4 THEN event_type END AS tool,
         ts
  FROM events
), lagged AS (
  SELECT conv_id, role AS role_to, tool,
         lag(role) OVER w AS role_from,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1e6 AS delta_s
  FROM tr WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), pair AS (
  SELECT role_from, role_to, count(*) AS n,
         count(DISTINCT conv_id) AS n_convs,
         avg(delta_s) AS mean_s,
         quantile_cont(delta_s, 0.5) AS p50_s,
         quantile_cont(delta_s, 0.9) AS p90_s,
         quantile_cont(delta_s, 0.99) AS p99_s
  FROM lagged WHERE role_from IS NOT NULL
  GROUP BY 1, 2
), pair_out AS (
  SELECT 'pair' AS tag, role_from AS k1, role_to AS k2, n, n_convs,
         n::DOUBLE / sum(n) OVER (PARTITION BY role_from) AS share,
         mean_s, p50_s, p90_s, p99_s
  FROM pair
), tool_agg AS (
  SELECT tool, count(*) AS n, count(DISTINCT conv_id) AS n_convs,
         avg(delta_s) AS mean_s,
         quantile_cont(delta_s, 0.5) AS p50_s,
         quantile_cont(delta_s, 0.9) AS p90_s,
         quantile_cont(delta_s, 0.99) AS p99_s
  FROM lagged WHERE tool IS NOT NULL GROUP BY 1
), tool_out AS (
  SELECT 'tool' AS tag, tool AS k1, CAST(NULL AS VARCHAR) AS k2, n,
         n_convs, n::DOUBLE / sum(n) OVER () AS share,
         mean_s, p50_s, p90_s, p99_s
  FROM tool_agg
), u AS (
  SELECT * FROM pair_out UNION ALL SELECT * FROM tool_out
)
SELECT tag, k1, k2, n, n_convs,
       {_sql_r4('share')} AS share, {_sql_r4('mean_s')} AS mean_s,
       {_sql_r4('p50_s')} AS p50_s, {_sql_r4('p90_s')} AS p90_s,
       {_sql_r4('p99_s')} AS p99_s,
       TRUE AS cert_sketch_ok
FROM u
"""


def q_transcript_integrity(spark, sf_dir):
    """The north rule's per-row invariant as a first-class oracled query:
    exact per-turn text equality under stable (conv_id, turn_idx)
    ordering, certified at conversation grain by an order-sensitive
    digest (operators/integrity.py). The transcript table is derived
    deterministically from `events` with identical SQL semantics on both
    engines (conv_id from user_id, turn_idx by (ts, event_id) order,
    text from event_type:props), so the md5-chain digests must match
    bit-for-bit engine-to-engine. Extended with `ctx_digest_k3`: the
    md5-chain over every turn's rolling 3-turn SFT context window
    (operators/examples.py conversation_windows) — one green column
    certifies the whole training-example context assembly (window
    membership, role-prefix format, join order) against DuckDB's
    replay of the identical window arithmetic."""
    from feasts_spark.operators.examples import conversation_windows
    from feasts_spark.operators.integrity import turn_digest

    _utc(spark)
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = e.select(
        F.concat(F.lit("conv-"), F.col("user_id")).alias("conv_id"),
        (F.row_number().over(w) - 1).alias("turn_idx"),
        F.when(F.col("event_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant")).alias("role"),
        F.concat_ws(":", "event_type", "props").alias("text"),
    )
    cw = conversation_windows(tr, k=3)
    ctx = cw.groupBy("conv_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "ctx_digest"))
                    ),
                    lambda s: s["ctx_digest"],
                ),
                "",
            )
        ).alias("ctx_digest_k3")
    )
    return turn_digest(tr.drop("role")).join(ctx, "conv_id")


ORACLE_TRANSCRIPT_INTEGRITY = """
WITH tr AS (
  SELECT 'conv-' || user_id AS conv_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS turn_idx,
         CASE WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         concat_ws(':', event_type, props) AS text
  FROM events
),
cw AS (
  SELECT conv_id, turn_idx,
         md5(string_agg(role || ': ' || text, chr(30)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS ctx_digest
  FROM tr
),
ctx AS (
  SELECT conv_id,
         md5(string_agg(ctx_digest, '' ORDER BY turn_idx)) AS ctx_digest_k3
  FROM cw GROUP BY conv_id
)
SELECT t.conv_id, count(*) AS n_turns,
       (min(t.turn_idx) = 0 AND max(t.turn_idx) = count(*) - 1
        AND count(DISTINCT t.turn_idx) = count(*)) AS contiguous,
       md5(string_agg(md5(t.text), ''
           ORDER BY t.turn_idx, md5(t.text))) AS digest,
       any_value(ctx.ctx_digest_k3) AS ctx_digest_k3
FROM tr t JOIN ctx USING (conv_id) GROUP BY t.conv_id
"""
# digest ORDER BY (turn_idx, md5(text)): the Spark side sorts (i, h)
# structs, so duplicate turn_idx ties break on the text hash — the
# oracle replays the identical total order, keeping digests comparable
# even for malformed (non-contiguous / duplicate-idx) conversations.


def q_topk_event_types_1h(spark, sf_dir):
    """Exact top-2 event types per (series, 1h bucket) by count
    (operators/topk.py) — heavy hitters with a deterministic
    (count DESC, type ASC) tie order replayed by the oracle."""
    from feasts_spark.operators.topk import topk_by_group

    _utc(spark)
    e = _events(spark, sf_dir).select(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
        "event_type",
    )
    out = topk_by_group(e, 2, ["user_id", "bucket_ts"], "event_type")
    return out.select(
        F.col("user_id").alias("series_key"), "bucket_ts", "event_type",
        "cnt", "rnk",
    )


ORACLE_TOPK_1H = """
WITH c AS (
  SELECT user_id AS series_key, date_trunc('hour', ts) AS bucket_ts,
         event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2, 3
), r AS (
  SELECT *, row_number() OVER (PARTITION BY series_key, bucket_ts
            ORDER BY cnt DESC, event_type ASC) AS rnk
  FROM c
)
SELECT series_key, bucket_ts, event_type, cnt, CAST(rnk AS INT) AS rnk
FROM r WHERE rnk <= 2
"""


def q_active_users_1h(spark, sf_dir):
    """Site-wide exact distinct users per hour (operators/distinct.py)
    — the one aggregate that can't cascade exactly; the scan-once sketch
    path is hll_distinct_tiers (rows-only)."""
    from feasts_spark.operators.distinct import distinct_rollup

    _utc(spark)
    return distinct_rollup(_events(spark, sf_dir), "1h", "user_id")


ORACLE_ACTIVE_USERS = """
SELECT date_trunc('hour', ts) AS bucket_ts, count(*) AS n_points,
       count(DISTINCT user_id) AS n_distinct
FROM events GROUP BY 1
"""


_EPISODES_CTE = """
r AS (
  SELECT user_id AS series_key, date_trunc('hour', ts) AS bucket_ts,
         count(*) AS n_points
  FROM events GROUP BY 1, 2
), a AS (
  SELECT *, CAST(epoch(bucket_ts) AS BIGINT) // 3600
         - row_number() OVER (PARTITION BY series_key ORDER BY bucket_ts)
           AS grp
  FROM r WHERE n_points >= 2
), eps AS (
  SELECT series_key, min(bucket_ts) AS episode_start,
         max(bucket_ts) + INTERVAL 1 HOUR AS episode_end,
         count(*) AS n_buckets,
         CAST(sum(n_points) AS BIGINT) AS total_points
  FROM a GROUP BY series_key, grp
)
"""


def q_activity_episodes_1h(spark, sf_dir):
    """Maximal runs of >=2-point hours per series (gaps-and-islands over
    the 1h rollup, operators/intervals.py)."""
    from feasts_spark.operators.intervals import activity_episodes
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1h", "user_id", "ts", "value")
    return activity_episodes(r, "1h", min_points=2)


ORACLE_EPISODES_1H = f"""
WITH {_EPISODES_CTE}
SELECT * FROM eps
"""


def q_interval_join_1h(spark, sf_dir):
    """Error events joined into their containing activity episode via the
    bucketed-expansion equi-join (operators/intervals.py). The oracle
    runs the NAIVE range join over the identical episode CTE, so the
    rewrite is verified equivalent engine-to-engine."""
    from feasts_spark.operators.intervals import activity_episodes, interval_join
    from feasts_spark.operators.rollup import rollup_raw

    _utc(spark)
    e = _events(spark, sf_dir)
    r = rollup_raw(e, "1h", "user_id", "ts", "value")
    eps = activity_episodes(r, "1h", min_points=2)
    probes = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    out = interval_join(
        probes, eps, "user_id", "ts", tier="1h", interval_key_col="series_key"
    )
    return out.select(
        F.col("user_id").alias("series_key"), "ts", "event_id",
        "episode_start", "n_buckets",
    )


ORACLE_INTERVAL_JOIN_1H = f"""
WITH {_EPISODES_CTE}
SELECT p.user_id AS series_key, p.ts, p.event_id, e.episode_start,
       e.n_buckets
FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error') p
JOIN eps e ON e.series_key = p.user_id
          AND p.ts >= e.episode_start AND p.ts < e.episode_end
"""



# ---------------------------------------------------------------------------
# Merged packs + graphics data preps (round 3)
# ---------------------------------------------------------------------------

def q_cf_tables_1h(spark, sf_dir):
    """ACF + PACF tables joined on (series_key, lag) — one driver slot for
    the two correlation tables (acf.R:61-170). Each side keeps its own
    production operator (acf_table / pacf_table); the join is only the
    registry packing. Oracled by the same two DuckDB texts joined the
    same way."""
    a = q_acf_table_1h(spark, sf_dir)
    p = q_pacf_table_1h(spark, sf_dir)
    return a.join(p, ["series_key", "lag"])


def _cf_tables_oracle() -> str:
    return (
        "SELECT a.series_key, a.lag, a.acf, p.pacf\n"
        f"FROM ({ORACLE_ACF_1H}) a\n"
        f"JOIN ({_pacf_oracle()}) p\n"
        "  ON p.series_key = a.series_key AND p.lag = a.lag"
    )


def q_usage_1h(spark, sf_dir):
    """Hourly usage pack: exact top-2 event types per (series, bucket)
    joined with the site-wide per-hour exact distinct-user rollup on the
    bucket, PLUS machine-checked certificates for the HLL sketch cascade
    (operators/distinct.py hll_distinct_tiers): per output row,
    `hll_1h_ok` asserts the cascaded hourly estimate for that bucket sits
    within 2% of the exact distinct count, and the scalar
    `hll_1m_ok`/`hll_1d_ok` columns assert the same bound holds for EVERY
    minute/day bucket (bool_and, one-row crossJoin — no driver collect).
    The sketch estimates themselves are engine-specific so they can't be
    value-matched cross-engine; the oracle pins the certificates to TRUE,
    which means a drifting estimate turns this row hash-red. One driver
    slot for the usage aggregates + the full sketch-cascade evidence.

    NOTE deliberately NOT merged this way: guerrero + ndiffs. Joining
    those two SQL texts makes Catalyst's optimizer (constraint
    propagation over the 31-branch argmin CASE under a join) run for
    minutes; plain count/bool aggregates like these are safe to pack."""
    from feasts_spark.operators.distinct import (
        distinct_rollup,
        hll_distinct_tiers,
    )

    t = q_topk_event_types_1h(spark, sf_dir)
    a = q_active_users_1h(spark, sf_dir)
    _utc(spark)
    e = _events(spark, sf_dir)
    hll = hll_distinct_tiers(e, "user_id", "ts")
    REL = 0.02

    def _tier_ok(tier, alias):
        exact = distinct_rollup(e, tier, "user_id").select(
            "bucket_ts", "n_distinct"
        )
        per_bucket = (
            hll.filter(F.col("tier") == tier)
            .join(exact, "bucket_ts")
            .select(
                "bucket_ts",
                (
                    F.abs(F.col("n_est") - F.col("n_distinct"))
                    <= F.col("n_distinct") * REL
                ).alias(alias),
            )
        )
        return per_bucket

    ok_1h = _tier_ok("1h", "hll_1h_ok")
    certs = (
        _tier_ok("1m", "hll_1m_ok")
        .agg(F.bool_and("hll_1m_ok").alias("hll_1m_ok"))
        .crossJoin(
            _tier_ok("1d", "hll_1d_ok")
            .agg(F.bool_and("hll_1d_ok").alias("hll_1d_ok"))
        )
    )
    return t.join(a, "bucket_ts").join(ok_1h, "bucket_ts").crossJoin(certs)


def _usage_1h_oracle() -> str:
    return (
        "SELECT t.bucket_ts, t.series_key, t.event_type, t.cnt, t.rnk,\n"
        "       a.n_points, a.n_distinct,\n"
        "       TRUE AS hll_1h_ok, TRUE AS hll_1m_ok, TRUE AS hll_1d_ok\n"
        f"FROM ({ORACLE_TOPK_1H}) t\n"
        f"JOIN ({ORACLE_ACTIVE_USERS}) a ON a.bucket_ts = t.bucket_ts"
    )


def q_gg_season_1d(spark, sf_dir):
    """Season/subseries plot frame (feasts re-exports gg_season and
    gg_subseries from ggtime, NAMESPACE:58-60): hourly tier split into
    daily cycles — cycle = the day, pos = second offset into it — plus
    the per-(key,pos) season mean that gg_subseries draws as its
    reference line. The cycle/pos split is pure codegen projection; the
    mean is the one unavoidable exchange."""
    from feasts_spark.operators.rollup import rollup_raw
    from feasts_spark.operators.seasonal import gg_season_data

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1h", "user_id", "ts", "value")
    out = gg_season_data(r, period="1d")
    return out.select(
        "series_key",
        "cycle",
        "pos",
        _r4("val").alias("val"),
        _r4("season_mean").alias("season_mean"),
    )


ORACLE_GG_SEASON_1D = f"""
WITH r AS (
  SELECT user_id AS series_key, date_trunc('hour', ts) AS bucket_ts,
         avg(value) AS v
  FROM events GROUP BY user_id, date_trunc('hour', ts)
), g AS (
  SELECT series_key,
         date_trunc('day', bucket_ts) AS cycle,
         CAST(epoch(bucket_ts) - epoch(date_trunc('day', bucket_ts)) AS BIGINT)
           AS pos,
         v
  FROM r
)
SELECT series_key, cycle, pos,
       {_sql_r4('v')} AS val,
       {_sql_r4('avg(v) OVER (PARTITION BY series_key, pos)')} AS season_mean
FROM g
"""


def q_gg_lag_1h(spark, sf_dir):
    """Lag-plot frame (feasts re-exports gg_lag from ggtime,
    NAMESPACE:58): (y_t, y_t-k) pairs for k = 1..3 over the hourly tier.
    One ordered window pass (Catalyst fuses the per-lag columns into a
    single Window node) + explode."""
    from feasts_spark.operators.rollup import rollup_raw
    from feasts_spark.operators.seasonal import gg_lag_data

    _utc(spark)
    r = rollup_raw(_events(spark, sf_dir), "1h", "user_id", "ts", "value")
    out = gg_lag_data(r, lags=(1, 2, 3))
    return out.select(
        "series_key",
        F.col("lag").cast("long").alias("lag"),
        F.col("rn").cast("long").alias("rn"),
        _r4("val").alias("val"),
        _r4("val_lag").alias("val_lag"),
    )


ORACLE_GG_LAG_1H = f"""
WITH r AS (
  SELECT user_id AS series_key, date_trunc('hour', ts) AS bucket_ts,
         avg(value) AS v
  FROM events GROUP BY user_id, date_trunc('hour', ts)
), s AS (
  SELECT series_key, v,
         row_number() OVER (PARTITION BY series_key ORDER BY bucket_ts) AS rn
  FROM r
), l AS (SELECT unnest(generate_series(1, 3)) AS lag)
SELECT a.series_key, l.lag, a.rn,
       {_sql_r4('a.v')} AS val,
       {_sql_r4('b.v')} AS val_lag
FROM s a
CROSS JOIN l
JOIN s b ON b.series_key = a.series_key AND b.rn = a.rn - l.lag
"""


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline on sf0.001: rollup tiers -> gap-fill -> features."""
    _utc(spark)
    sf_dir = "/root/testdata/sf0.001"
    from feasts_spark.operators.features import features
    from feasts_spark.operators.gapfill import gapfill_locf
    from feasts_spark.operators.rollup import rollup_cascade, rollup_raw

    events = _events(spark, sf_dir)
    r1m = rollup_raw(events, "1m", "user_id", "ts", "value")
    r1h = rollup_cascade(r1m, "1h")
    filled = gapfill_locf(r1h, "1h", value_cols=("val_avg",))
    counts = filled.groupBy("series_key").count().filter(F.col("count") >= 20)
    series = filled.join(counts.select("series_key"), "series_key")
    return features(series, value_col="val_avg_filled", period=24)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry: exactly 50 rows, all inside the round driver's 50-slot
    check window — every query gets a driver CORRECTNESS row. The 43
    DuckDB-oracled queries come first, then the 7 rows-only queries
    (ordered by marginal evidence). Round-4 consolidation: the rollup
    family (plain 1m + salted 1m + 1h/1d cascade) packs into rollup_pack
    (each tier oracled directly from raw); hll_distinct_tiers folds into
    usage_1h as machine-checked error-bound certificates (so that row
    stays ORACLED); dedup_incremental joins minhash_pack;
    ann_approx_topk's per-neighbor rows join ann_recall; stl_daily_1d
    (supsmu + MBB) joins stl_decomp_suite, which now carries in-plan
    raise_error reconstruction-identity certificates."""
    return {
        # --- DuckDB-oracled (value-exact at sf0.01, strict) ---
        "rollup_pack": q_rollup_pack,
        "props_rollup": q_props_rollup,
        "retention_1m": q_retention_1m,
        "sessionize_1h": q_sessionize_1h,
        "lttb_1h": q_lttb_1h,
        "hist_quantile_1d": q_hist_quantile_1d,
        "anomaly_1d": q_anomaly_1d,
        "gapfill_1d": q_gapfill_1d,
        "cf_tables_1h": q_cf_tables_1h,
        "gg_season_1d": q_gg_season_1d,
        "gg_lag_1h": q_gg_lag_1h,
        "sql_features_basic": q_sql_features_basic,
        "shift_features": q_shift_features,
        "asof_enrich_1h": q_asof_enrich_1h,
        "m4_1h": q_m4_1h,
        "rate_ewma_1h": q_rate_ewma_1h,
        "calendar_profile": q_calendar_profile,
        "decomp_methods_1d": q_decomp_methods_1d,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "ngram_jaccard": q_ngram_jaccard,
        "dup_clusters": q_dup_clusters,
        "simhash_pairs": q_simhash_pairs,
        "cosine_pairs": q_cosine_pairs,
        "semantic_dup_clusters": q_semantic_dup_clusters,
        "ann_topk": q_ann_topk,
        "ccf_table_1h": q_ccf_table_1h,
        "portmanteau_1h": q_portmanteau_1h,
        "intermittent_daily": q_intermittent_daily,
        "gorilla_roundtrip_1h": q_gorilla_roundtrip_1h,
        "heavy_keys": q_heavy_keys,
        "text_pack": q_text_pack,
        "repetition_docs": q_repetition_docs,
        "contamination": q_contamination,
        "curation_pack": q_curation_pack,
        "guerrero_1d": q_guerrero_1d,
        "unitroot_pack": q_unitroot_pack,
        "conv_flow": q_conv_flow,
        "acf_features_1h": q_acf_features_1h,
        "transcript_integrity": q_transcript_integrity,
        "usage_1h": q_usage_1h,
        "activity_episodes_1h": q_activity_episodes_1h,
        "interval_join_1h": q_interval_join_1h,
        # --- rows-only (non-SQL-expressible; invariants certified
        # in-plan where feasible, exactness pinned by golden pytest) ---
        "cointegration_1h": q_cointegration_1h,
        "stl_decomp_suite": q_stl_decomp_suite,
        "tapered_cf_1h": q_tapered_cf_1h,
        "multimodal_features": q_multimodal_features,
        "ann_recall": q_ann_recall,
        "minhash_pack": q_minhash_pack,
        "feature_pack_all": q_feature_pack_all,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "rollup_pack": _rollup_pack_oracle(),
        "props_rollup": ORACLE_PROPS_ROLLUP,
        "retention_1m": ORACLE_RETENTION_1M,
        "sessionize_1h": ORACLE_SESSIONIZE_1H,
        "hist_quantile_1d": _hist_oracle(),
        "anomaly_1d": _anomaly_oracle(),
        "gapfill_1d": _gapfill_1d_oracle(),
        "lttb_1h": ORACLE_LTTB_1H,
        "cf_tables_1h": _cf_tables_oracle(),
        "gg_season_1d": ORACLE_GG_SEASON_1D,
        "gg_lag_1h": ORACLE_GG_LAG_1H,
        "sql_features_basic": _sql_features_basic_oracle(),
        "shift_features": _shift_features_oracle(),
        "asof_enrich_1h": ORACLE_ASOF_1H,
        "m4_1h": ORACLE_M4_1H,
        "rate_ewma_1h": _rate_ewma_oracle(),
        "calendar_profile": ORACLE_CALENDAR_PROFILE,
        "decomp_methods_1d": ORACLE_DECOMP_1D,
        "dedup_exact": ORACLE_DEDUP_EXACT,
        "text_stats": ORACLE_TEXT_STATS,
        "ngram_jaccard": ORACLE_NGRAM_JACCARD,
        "dup_clusters": ORACLE_DUP_CLUSTERS,
        "cosine_pairs": ORACLE_COSINE_PAIRS,
        "semantic_dup_clusters": ORACLE_SEMANTIC_DUP,
        "ann_topk": ORACLE_ANN_TOPK,
        "ccf_table_1h": ORACLE_CCF_1H,
        "portmanteau_1h": ORACLE_PORTMANTEAU_1H,
        "intermittent_daily": ORACLE_INTERMITTENT,
        "gorilla_roundtrip_1h": ORACLE_GORILLA_1H,
        "heavy_keys": ORACLE_HEAVY_KEYS,
        "text_pack": _text_pack_oracle(),
        "repetition_docs": _repetition_oracle(),
        "contamination": ORACLE_CONTAMINATION,
        "curation_pack": _curation_oracle(),
        "simhash_pairs": _oracle_simhash_pairs(),
        "unitroot_pack": _unitroot_pack_oracle(),
        "conv_flow": ORACLE_CONV_FLOW,
        "transcript_integrity": ORACLE_TRANSCRIPT_INTEGRITY,
        "usage_1h": _usage_1h_oracle(),
        "activity_episodes_1h": ORACLE_EPISODES_1H,
        "interval_join_1h": ORACLE_INTERVAL_JOIN_1H,
        "acf_features_1h": __import__(
            "feasts_spark.functions.sql_features", fromlist=["acf_features_sql"]
        ).acf_features_sql(),
        "guerrero_1d": __import__(
            "feasts_spark.functions.sql_features", fromlist=["guerrero_argmin_sql"]
        ).guerrero_argmin_sql(),
        # The 7 rows-only queries: stl_decomp_suite / feature_pack_all /
        # cointegration_1h / tapered_cf_1h are non-SQL-expressible
        # (iterated loess, optimizers, eigen decompositions, seeded
        # bootstrap) — exactness via golden pytest, and the stl/tapered
        # rows additionally carry in-plan raise_error invariant
        # certificates; minhash_pack / ann_recall / multimodal_features
        # are hash-banding + binary codecs — recall vs brute force and
        # full==incremental equivalence asserted in pytest, codec mix
        # reported by the multimodal row's codec/real_frac columns.
    }
