"""Tier stitching (stitch_range): an arbitrary-range aggregate served
from the coarsest covering tiers must equal aggregating the raw points
directly — for every edge-alignment shape, with and without a raw
remainder, and with partial tier sets."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F, types as T

from feasts_spark.operators.rollup import (
    cover_range,
    rollup_cascade,
    rollup_raw,
    stitch_range,
)

T0 = dt.datetime(2024, 3, 1)

_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])


@pytest.fixture(scope="module")
def data(spark):
    """5 conversations, one point every 7 minutes over 12 days, plus a
    sub-minute cluster (seconds offsets) to exercise raw remainders."""
    rows = [
        Row(conv_id=f"c{j}",
            ts=T0 + dt.timedelta(minutes=7 * i, seconds=13 * j % 60),
            value=float((i * 31 + j * 7) % 97) / 3.0)
        for j in range(5)
        for i in range(12 * 24 * 60 // 7)
    ]
    raw = spark.createDataFrame(rows, _SCHEMA).cache()
    tiers = {"1m": rollup_raw(raw, "1m")}
    tiers["1h"] = rollup_cascade(tiers["1m"], "1h")
    tiers["1d"] = rollup_cascade(tiers["1h"], "1d")
    tiers = {k: v.cache() for k, v in tiers.items()}
    yield raw, tiers
    raw.unpersist()
    [v.unpersist() for v in tiers.values()]


def _direct(raw, start, end):
    ts, v = F.col("ts"), F.col("value")
    return (
        raw.filter((ts >= F.lit(start)) & (ts < F.lit(end)))
        .groupBy(F.col("conv_id").alias("series_key"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(v).alias("val_sum"),
            F.min(v).alias("val_min"),
            F.max(v).alias("val_max"),
            F.min_by(v, ts).alias("val_first"),
            F.max_by(v, ts).alias("val_last"),
            F.min(ts).alias("first_ts"),
            F.max(ts).alias("last_ts"),
        )
        .withColumn("val_avg", F.col("val_sum") / F.col("n_points"))
    )


def _r(df):
    return df.withColumn("val_sum", F.round("val_sum", 8)) \
             .withColumn("val_avg", F.round("val_avg", 8))


def _assert_equal(got, expect):
    got, expect = _r(got), _r(expect)
    assert got.count() == expect.count()
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


class TestCoverRange:
    def test_cover_is_exact_disjoint_partition(self):
        start = T0 + dt.timedelta(hours=5, minutes=17)
        end = T0 + dt.timedelta(days=9, hours=21, minutes=43)
        spans = cover_range(start, end)
        # interior whole days present, finer tiers only at the edges
        assert spans["1d"] == [(T0 + dt.timedelta(days=1),
                                T0 + dt.timedelta(days=9))]
        assert len(spans["1h"]) <= 2 and len(spans["1m"]) <= 2
        assert "raw" not in spans
        # spans are aligned, disjoint, and union exactly to [start, end)
        all_spans = sorted(
            s for t in ("1d", "1h", "1m") for s in spans[t])
        assert all_spans[0][0] == start and all_spans[-1][1] == end
        for (_, a_hi), (b_lo, _) in zip(all_spans, all_spans[1:]):
            assert a_hi == b_lo

    def test_sub_minute_remainder_goes_to_raw(self):
        start = T0 + dt.timedelta(minutes=1, seconds=30)
        end = T0 + dt.timedelta(hours=2, seconds=45)
        spans = cover_range(start, end)
        assert spans["raw"] == [
            (start, T0 + dt.timedelta(minutes=2)),
            (T0 + dt.timedelta(hours=2), end),
        ]

    def test_aligned_bounds_have_no_edges(self):
        spans = cover_range(T0, T0 + dt.timedelta(days=3))
        assert spans["1d"] == [(T0, T0 + dt.timedelta(days=3))]
        assert spans["1h"] == [] and spans["1m"] == []

    def test_cover_partition_property(self):
        """For EVERY second-granular range: spans are bucket-aligned,
        disjoint, ordered, and union exactly to [start, end); no finer
        span could be absorbed by a coarser bucket."""
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=300, deadline=None)
        @given(
            s=st.integers(min_value=0, max_value=40 * 86400),
            w=st.integers(min_value=1, max_value=20 * 86400),
        )
        def check(s, w):
            start = T0 + dt.timedelta(seconds=s)
            end = start + dt.timedelta(seconds=w)
            spans = cover_range(start, end)
            flat = sorted(
                (lo, hi, t)
                for t in ("1d", "1h", "1m", "raw")
                for lo, hi in spans.get(t, [])
            )
            assert flat[0][0] == start and flat[-1][1] == end
            for (_, a_hi, _), (b_lo, _, _) in zip(flat, flat[1:]):
                assert a_hi == b_lo  # disjoint AND gap-free
            for lo, hi, t in flat:
                if t == "raw":
                    continue
                sec = {"1d": 86400, "1h": 3600, "1m": 60}[t]
                es = int((lo - dt.datetime(1970, 1, 1)).total_seconds())
                ee = int((hi - dt.datetime(1970, 1, 1)).total_seconds())
                assert es % sec == 0 and ee % sec == 0 and ee > es
            # maximality: a full coarser bucket inside a finer span would
            # mean the greedy cover failed
            for lo, hi, t in flat:
                coarser = {"1m": 3600, "1h": 86400}.get(t)
                if coarser is None:
                    continue
                es = int((lo - dt.datetime(1970, 1, 1)).total_seconds())
                ee = int((hi - dt.datetime(1970, 1, 1)).total_seconds())
                first = ((es + coarser - 1) // coarser) * coarser
                assert first + coarser > ee, (t, lo, hi)

        check()


RANGES = [
    # (start offset, end offset) — every alignment shape
    (dt.timedelta(hours=5, minutes=17), dt.timedelta(days=9, hours=21,
                                                     minutes=43)),
    (dt.timedelta(0), dt.timedelta(days=12)),                 # fully aligned
    (dt.timedelta(minutes=3), dt.timedelta(minutes=59)),      # inside 1 hour
    (dt.timedelta(hours=23), dt.timedelta(days=1, hours=1)),  # day boundary
    (dt.timedelta(days=11, hours=22), dt.timedelta(days=13)), # past data end
]


class TestStitchRange:
    @pytest.mark.parametrize("so,eo", RANGES)
    def test_equals_direct_aggregate(self, data, so, eo):
        raw, tiers = data
        got = stitch_range(tiers, T0 + so, T0 + eo)
        _assert_equal(got, _direct(raw, T0 + so, T0 + eo))

    def test_sub_minute_bounds_need_raw(self, data):
        raw, tiers = data
        start = T0 + dt.timedelta(hours=1, seconds=30)
        end = T0 + dt.timedelta(hours=26, seconds=45)
        with pytest.raises(ValueError, match="not aligned"):
            stitch_range(tiers, start, end)
        got = stitch_range(tiers, start, end, raw=raw)
        _assert_equal(got, _direct(raw, start, end))

    def test_partial_tier_set(self, data):
        raw, tiers = data
        start = T0 + dt.timedelta(hours=5, minutes=17)
        end = T0 + dt.timedelta(days=9, hours=21, minutes=43)
        got = stitch_range({k: tiers[k] for k in ("1m", "1h")}, start, end)
        _assert_equal(got, _direct(raw, start, end))

    def test_empty_range_raises(self, data):
        _, tiers = data
        with pytest.raises(ValueError, match="empty range"):
            stitch_range(tiers, T0, T0)

    def test_unknown_tier_raises(self, data):
        _, tiers = data
        with pytest.raises(ValueError, match="unknown tiers"):
            stitch_range({"5m": tiers["1m"]}, T0,
                         T0 + dt.timedelta(days=1))
