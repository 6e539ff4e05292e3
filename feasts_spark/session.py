"""SparkSession factory tuned for this engine.

Local-mode defaults match the sandbox (local[N] threads, single JVM); the
same settings scale to a real cluster because everything below is also the
right default there: AQE on (runtime coalescing + skew-join handling),
Arrow-batched pandas UDF exchange, UTC session timezone (required for
DuckDB-oracle comparison — Spark timestamps are session-TZ, DuckDB's are
UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | str | None = None,
    app_name: str = "feasts_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    cores: int for local[N], "*" for all, None -> $SPARK_GRAFT_CPUS or "*".
    shuffle_partitions defaults to the core count — at 100 TB scale this is
    instead sized to ~target partition bytes, but AQE coalescing makes the
    initial number forgiving in both regimes.
    master: explicit master URL override (e.g. "local-cluster[4,4,8192]"
    for the multi-executor-JVM bench shape); `cores` then only sizes
    shuffle_partitions defaults and must equal the total executor cores.
    """
    # One BLAS thread per python worker: each of the N Arrow-UDF workers is
    # already a full process; letting OpenBLAS spawn ncpu threads inside
    # every worker oversubscribes N*ncpu threads and HALVES feature-pack
    # throughput at local[32] (measured 510 -> 919 series/s with this fix).
    # Same setting is standard practice on real executors.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        n = os.cpu_count() if cores in ("*",) else int(cores)
        shuffle_partitions = max(int(n), 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Moderate heap on purpose: with 32 local task threads a 32-90g heap
        # makes G1 pause/allocation behavior dominate (measured 2-4x slower
        # shuffles than 16g). JVM data here is columnar+compressed; the big
        # memory consumers (numpy kernels) live in the python workers.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
        # Parquet's vectored-IO read future hard-fails (TimeoutException)
        # at 300s when the sandbox's shared virtio disk stalls under
        # cross-tenant load; plain positional reads just run slow. On
        # cluster NVMe/object stores re-enable via extra_conf.
        .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
        # int64 micros, not legacy INT96: INT96 pages carry NO min/max
        # statistics, which breaks footer-stats pruning (snapshot table
        # manifests) and row-group skipping on every timestamp filter
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
