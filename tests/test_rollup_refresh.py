"""Late-data incremental refresh of continuous aggregates.

The invalidation-log contract: `rollup_refresh(rollup(on_time), late) ==
rollup(on_time ∪ late)` with the on-time data never re-aggregated — clean
tier rows pass through a broadcast anti join untouched; only the dirty
buckets' rows re-merge with the late batch's own rollup.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feasts_spark.operators.rollup import (
    invalidated_buckets,
    rollup_merge,
    rollup_raw,
    rollup_refresh,
)
from feasts_spark.plans import formatted_plan, plan_summary

SORT = ["series_key", "bucket_ts"]


def _tiers_equal(a, b):
    a = a.sort_values(SORT).reset_index(drop=True)
    b = b.sort_values(SORT).reset_index(drop=True)
    exact = ["series_key", "bucket_ts", "n_points", "val_min", "val_max",
             "val_first", "val_last", "first_ts", "last_ts"]
    pd.testing.assert_frame_equal(a[exact], b[exact], check_exact=True)
    # sums re-associate across the merge boundary
    np.testing.assert_allclose(a["val_sum"], b["val_sum"], rtol=1e-12)
    np.testing.assert_allclose(a["val_avg"], b["val_avg"], rtol=1e-12)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def split(events):
    """Deterministic ~10% 'late' slice of the corpus."""
    is_late = F.pmod(F.xxhash64("event_id"), F.lit(10)) == 0
    return events.filter(~is_late), events.filter(is_late)


COLS = ["series_key", "bucket_ts", "n_points", "val_sum", "val_min",
        "val_max", "val_first", "val_last", "first_ts", "last_ts",
        "val_avg"]


class TestRefresh:
    def test_refresh_equals_full_recompute(self, spark, events, split):
        on_time, late = split
        existing = rollup_raw(on_time, "1h", "user_id", "ts", "value")
        refreshed = rollup_refresh(
            existing, late, "1h", "user_id", "ts", "value"
        )
        full = rollup_raw(events, "1h", "user_id", "ts", "value")
        _tiers_equal(refreshed.toPandas()[COLS], full.toPandas()[COLS])

    def test_clean_buckets_pass_through_bitwise(self, spark, split):
        """Rows outside the invalidation set must come back byte-identical
        to the existing tier — including float sums, which a re-aggregation
        would re-associate."""
        on_time, late = split
        existing = rollup_raw(on_time, "1h", "user_id", "ts", "value")
        refreshed = rollup_refresh(
            existing, late, "1h", "user_id", "ts", "value"
        )
        dirty = invalidated_buckets(late, "1h", "user_id", "ts")
        clean_before = existing.join(dirty, SORT, "left_anti").toPandas()
        clean_after = (
            refreshed.join(dirty, SORT, "left_anti").toPandas()
        )
        pd.testing.assert_frame_equal(
            clean_before[COLS].sort_values(SORT).reset_index(drop=True),
            clean_after[COLS].sort_values(SORT).reset_index(drop=True),
            check_exact=True,
        )

    def test_late_only_buckets_appear(self, spark, events):
        """Late rows can create brand-new (key, bucket) rows, not just
        amend existing ones."""
        existing = rollup_raw(
            events.filter("user_id <> 1"), "1d", "user_id", "ts", "value"
        )
        late = events.filter("user_id = 1")
        assert late.count() > 0
        refreshed = rollup_refresh(
            existing, late, "1d", "user_id", "ts", "value"
        )
        full = rollup_raw(events, "1d", "user_id", "ts", "value")
        _tiers_equal(refreshed.toPandas()[COLS], full.toPandas()[COLS])

    def test_empty_late_batch_is_identity(self, spark, events):
        existing = rollup_raw(events, "1d", "user_id", "ts", "value")
        refreshed = rollup_refresh(
            existing, events.filter("event_id < 0"), "1d",
            "user_id", "ts", "value",
        )
        _tiers_equal(
            refreshed.toPandas()[COLS], existing.toPandas()[COLS]
        )

    def test_merge_commutes_with_union(self, spark, events, split):
        on_time, late = split
        a = rollup_raw(on_time, "1d", "user_id", "ts", "value")
        b = rollup_raw(late, "1d", "user_id", "ts", "value")
        merged = rollup_merge(a, b)
        full = rollup_raw(events, "1d", "user_id", "ts", "value")
        _tiers_equal(merged.toPandas()[COLS], full.toPandas()[COLS])


class TestRefreshPlan:
    def test_tier_scan_never_shuffles(self, spark, split, tmp_path):
        """The scale contract: with the existing tier persisted, the clean
        pass-through and the dirty selection are broadcast hash joins on
        the tier scan (no exchange touches tier rows before the joins);
        the only exchanges aggregate the LATE data (its rollup + the dirty
        merge)."""
        on_time, late = split
        path = str(tmp_path / "tier_1h")
        rollup_raw(on_time, "1h", "user_id", "ts", "value").write.parquet(
            path
        )
        existing = spark.read.parquet(path)
        old = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            refreshed = rollup_refresh(
                existing, late, "1h", "user_id", "ts", "value"
            )
            plan = formatted_plan(refreshed)
            s = plan_summary(refreshed)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old)
        import re

        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
        assert s["has_broadcast"]
        # every shuffle Exchange aggregates LATE-batch-sized data (the
        # late rollup, the dirty-set distinct, the merge agg) — none may
        # sit between the tier scan and its joins
        shuffles = re.findall(r"^\(\d+\) Exchange\b", plan, re.MULTILINE)
        assert len(shuffles) <= 3, plan
        tree = plan.split("\n\n")[0].splitlines()
        scan_depths = [len(ln) - len(ln.lstrip()) for ln in tree
                       if "Scan parquet" in ln]
        assert len(scan_depths) >= 3  # tier scan reused + late scans


class TestStreamingComposition:
    def test_beyond_watermark_stragglers_recovered_by_refresh(
        self, spark, tmp_path
    ):
        """The composed out-of-order architecture: Structured Streaming
        finalizes buckets at the watermark (append mode DROPS rows later
        than it — asserted here, not assumed), and the batch
        rollup_refresh then folds exactly those dropped stragglers into
        the streamed tier, landing bitwise on the full recompute. This is
        the production shape: stream owns in-watermark lateness, an async
        refresh owns the tail."""
        from feasts_spark.streaming.rollup_stream import stream_rollup

        base = pd.Timestamp("2024-05-01 00:00:00")
        b0 = pd.DataFrame({
            "series_key": ["k"] * 3,
            "ts": [base + pd.Timedelta(minutes=m) for m in (5, 65, 125)],
            "value": [1.0, 2.0, 3.0],
        })
        # batch 1: a far-future sentinel closes every real bucket; batch 2:
        # a straggler for hour 0, now far outside the 10m watermark. The
        # straggler must ride one batch BEHIND the sentinel — the global
        # watermark in effect during a micro-batch is the one computed
        # from the PREVIOUS batch's max event time (observed on the
        # progress feed: a straggler sharing the sentinel's batch is NOT
        # dropped), so the drop only provably happens in batch 2.
        straggler_ts = base + pd.Timedelta(minutes=30)
        b1 = pd.DataFrame({
            "series_key": ["k"],
            "ts": [base + pd.Timedelta(hours=50)],
            "value": [99.0],
        })
        b2 = pd.DataFrame({
            "series_key": ["k"], "ts": [straggler_ts], "value": [10.0],
        })
        d = tmp_path / "straggler_in"
        d.mkdir()
        import os
        import time

        now = time.time()
        for i, b in enumerate((b0, b1, b2)):
            p = d / f"b{i}.parquet"
            b.assign(ts=b["ts"].astype("datetime64[us]")).to_parquet(
                p, index=False
            )
            # FileStreamSource batches in mtime order — make it explicit
            os.utime(p, (now + i * 10, now + i * 10))
        stream = (
            spark.readStream
            .schema("series_key string, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        q = (
            stream_rollup(stream, "1h", key_col="series_key",
                          watermark="10 minutes")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("t_straggler")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        streamed = spark.sql(
            "SELECT * FROM t_straggler WHERE bucket_ts < '2024-05-02'"
        )
        got = streamed.orderBy("bucket_ts").toPandas()
        # the straggler was dropped: hour 0 closed with the on-time row only
        assert list(got["n_points"]) == [1, 1, 1]
        assert got.iloc[0]["val_sum"] == 1.0

        late = spark.createDataFrame(
            [("k", straggler_ts.to_pydatetime(), 10.0)],
            "series_key string, ts timestamp, value double",
        )
        refreshed = rollup_refresh(
            streamed, late, "1h", "series_key", "ts", "value"
        )
        all_rows = spark.createDataFrame(
            pd.concat([b0, b2]),  # on-time rows + the straggler, no sentinel
        )
        full = rollup_raw(all_rows, "1h", "series_key", "ts", "value")
        _tiers_equal(refreshed.toPandas()[COLS], full.toPandas()[COLS])
