"""TableIO — storage abstraction: Iceberg when available, parquet-dir else.

The north rule targets Iceberg transcript/rollup tables. The sandbox's
pyspark install has no iceberg-spark-runtime jar, so TableIO feature-probes
the catalog and falls back to a parquet directory layout with the SAME
partitioning (days(ts) / bucket-ready key) and the same overwrite-by-
partition semantics the engine relies on for idempotent resume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark.conf.get("spark.sql.catalog.spark_catalog")
        jvm_class = "org.apache.iceberg.spark.SparkCatalog"
        spark._jvm.java.lang.Class.forName(jvm_class)  # noqa: SLF001
        return True
    except Exception:
        return False


class TableIO:
    """Read/write tables by name against a root (warehouse dir or catalog)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.use_iceberg = iceberg_available(spark)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(name)
        return self.spark.read.parquet(self._path(name))

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: tuple[str, ...] = (),
    ) -> None:
        if self.use_iceberg:
            w = df.writeTo(name).using("iceberg")
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._path(name))

    def overwrite_partitions(
        self, df: DataFrame, name: str, partition_by: tuple[str, ...],
        values: tuple | None = None,
    ) -> None:
        """Idempotent per-partition overwrite (dynamic partition overwrite) —
        the primitive checkpoint-resume builds on: re-running a completed
        partition replaces it with identical bytes instead of duplicating.
        `values` (the partition value being written) is advisory here —
        dynamic overwrite derives it from the data; SnapshotIO requires it.
        """
        if self.use_iceberg:
            df.writeTo(name).overwritePartitions()
            return
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(self._path(name))


def with_day_partition(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Add the days(ts) partition column used by the at-rest layout."""
    return df.withColumn("dt", F.to_date(F.col(ts_col)))


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Persist `df` as a bucketed (+ optionally sorted) managed table.

    Bucketing pre-partitions the data by hash(bucket_cols) AT WRITE TIME,
    so later joins/aggregations keyed on those columns read co-located
    buckets and skip the shuffle entirely — the standard layout for a fat
    table joined repeatedly on the same key (e.g. rollup tiers keyed by
    series). tests/test_plans.py asserts the bucketed self-join plan has
    ZERO Exchange nodes. Requires the session catalog (bucket metadata
    lives in the metastore); plain parquet paths cannot carry it.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)
