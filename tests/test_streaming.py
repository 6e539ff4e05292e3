"""Streaming rollup == batch rollup on the same bounded input."""

import numpy as np
import pandas as pd

from feasts_spark.operators.rollup import rollup_raw
from feasts_spark.streaming.rollup_stream import run_stream_once

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_stream_rollup_matches_batch(spark, sf_dir):
    path = f"{sf_dir}/events.parquet"
    got = run_stream_once(
        spark, path, EVENTS_SCHEMA, "1h",
        key_col="user_id", ts_col="ts", value_col="value",
        query_name="t_stream_1h",
    ).orderBy("series_key", "bucket_ts").toPandas()
    batch = (
        rollup_raw(spark.read.parquet(path), "1h", "user_id", "ts", "value")
        .orderBy("series_key", "bucket_ts")
        .toPandas()[got.columns]
    )
    exact = ["series_key", "bucket_ts", "n_points", "val_min", "val_max",
             "val_first", "val_last", "first_ts", "last_ts"]
    pd.testing.assert_frame_equal(got[exact], batch[exact], check_exact=True)
    np.testing.assert_allclose(got["val_sum"], batch["val_sum"], rtol=1e-12)
