"""Driver-contract tests: entry() smoke + query-vs-DuckDB-oracle parity.

Mirrors what the round driver does (CORRECTNESS_r{N}.json) at sf0.001 so
regressions surface in pytest before the driver runs.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "trend_strength" in df.columns


ORACLE_QUERIES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    got = entrymod.queries()[name](spark, sf_dir).toPandas()
    exp = ddb.execute(entrymod.oracle_sql()[name]).fetchdf()
    g, e = normalize(got), normalize(exp)
    assert list(g.columns) == list(e.columns)
    assert len(g) == len(e), f"{name}: {len(g)} vs {len(e)} rows"
    pd.testing.assert_frame_equal(g, e, check_dtype=False, atol=1e-9)


def test_rows_only_queries_nonempty(spark, sf_dir):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in set(qs) - set(oracles):
        df = qs[name](spark, sf_dir)
        assert df.count() >= 0, name


def test_feature_certificate_throws_on_corrupted_kernel(spark):
    """q_feature_pack_all's in-plan certificate: the UDF pack's
    SQL-expressible columns are cross-checked against the oracled SQL
    twins inside the plan; a kernel regression must make the query
    THROW, not return plausible rows (the q_stl_decomp_suite pattern,
    replicated here on a small synthetic series)."""
    from pyspark.sql import functions as F

    from feasts_spark.functions import acf1_expr
    from feasts_spark.operators.features import features

    rows = pd.DataFrame({
        "series_key": 1,
        "bucket_ts": pd.date_range("2024-01-01", periods=96, freq="h"),
        "val_avg": np.sin(np.arange(96) * 2 * np.pi / 24) * 3
        + np.arange(96) * 0.05 + 10.0,
    })
    r = spark.createDataFrame(rows)
    pack = features(r, period=24)
    twin = acf1_expr(r, "series_key", ["bucket_ts"], "val_avg") \
        .withColumnRenamed("acf1", "c_acf1")
    joined = pack.join(twin, "series_key")
    ok = (
        F.col("c_acf1").isNull()
        | (F.isnan(F.col("acf1")) & F.isnan(F.col("c_acf1")))
        | (~F.isnan(F.col("acf1"))
           & (F.abs(F.col("acf1") - F.col("c_acf1"))
              <= F.lit(1e-6) * F.greatest(F.lit(1.0),
                                          F.abs(F.col("c_acf1")))))
    )
    guard = F.raise_error(F.lit("feature certificate violated")) \
        .cast("double")

    good = joined.select(F.when(ok, F.col("acf1")).otherwise(guard).alias("v"))
    assert good.count() == 1

    # corrupt the "kernel" output -> the identical guarded plan throws
    bad = joined.withColumn("acf1", F.col("acf1") + 0.01).select(
        F.when(ok, F.col("acf1")).otherwise(guard).alias("v")
    )
    with pytest.raises(Exception, match="feature certificate violated"):
        bad.collect()

    # a kernel whose failure mode is NaN must ALSO throw when the twin
    # holds a real value (NaN was a certificate blind spot once)
    nan_bad = joined.withColumn(
        "acf1", F.lit(float("nan")).cast("double")
    ).select(F.when(ok, F.col("acf1")).otherwise(guard).alias("v"))
    with pytest.raises(Exception, match="feature certificate violated"):
        nan_bad.collect()

    # and a NULL kernel value against a real twin throws too
    null_bad = joined.withColumn(
        "acf1", F.lit(None).cast("double")
    ).select(F.when(ok, F.col("acf1")).otherwise(guard).alias("v"))
    with pytest.raises(Exception, match="feature certificate violated"):
        null_bad.collect()


def test_conv_flow_sketch_certificate_throws_on_drift(spark, sf_dir,
                                                      monkeypatch):
    """q_conv_flow's in-plan certificate: the bounded-state sketch path
    is cross-checked against the exact pack inside the same plan; a
    drifting sketch must make the driver row THROW, not return plausible
    rows. Patches the real operator to inject the drift, so the test
    exercises the ACTUAL entry query."""
    import feasts_spark.operators.flow as flowmod
    from pyspark.sql import functions as F

    # green on the real operator
    good = entrymod.queries()["conv_flow"](spark, sf_dir)
    rows = good.collect()
    assert rows and all(r["cert_sketch_ok"] for r in rows)

    real = flowmod.conv_flow_sketch

    def drifted(df, **kw):
        return real(df, **kw).withColumn("n", F.col("n") + F.lit(1))

    monkeypatch.setattr(flowmod, "conv_flow_sketch", drifted)
    with pytest.raises(Exception, match="sketch certificate violated"):
        entrymod.queries()["conv_flow"](spark, sf_dir).collect()


def test_cointegration_certificates_throw_on_corrupted_kernel(spark, sf_dir,
                                                              monkeypatch):
    """q_cointegration_1h's two in-plan certificates: the Johansen
    trace == Σ max-eigen identity and the Phillips-Ouliaris SQL-twin
    cross-check of the kernel's emitted intermediates. A corrupted
    kernel must make the driver row THROW, not return plausible rows.
    Patches the real kernels so the test exercises the ACTUAL entry
    query."""
    import feasts_spark.kernels.cointegration as cointmod

    # green on the real kernels: every non-degenerate series certifies
    good = entrymod.queries()["cointegration_1h"](spark, sf_dir).collect()
    checked = [r for r in good if r["cert_johansen_ok"] is not None]
    assert checked, "no certifiable series in the fixture corpus"
    assert all(r["cert_johansen_ok"] for r in checked)
    assert all(
        r["cert_po_twin_ok"]
        for r in good if r["cert_po_twin_ok"] is not None
    )

    # 1) break the trace identity -> johansen certificate throws
    real_jo = cointmod.cointegration_johansen

    def bad_jo(y, x, **kw):
        res = real_jo(y, x, **kw)
        res["johansen_trace_r0"] = res["johansen_trace_r0"] + 1.0
        return res

    monkeypatch.setattr(cointmod, "cointegration_johansen", bad_jo)
    with pytest.raises(Exception, match="johansen certificate violated"):
        entrymod.queries()["cointegration_1h"](spark, sf_dir).collect()
    monkeypatch.setattr(cointmod, "cointegration_johansen", real_jo)

    # 2) corrupt an order-SENSITIVE PO intermediate (the kernel claiming
    #    it saw a different row order) -> the SQL twin catches it
    real_po = cointmod.cointegration_phillips_ouliaris

    def bad_po(y, x, **kw):
        res = real_po(y, x, **kw)
        if res.get("po_sum_dydy1") is not None:
            res["po_sum_dydy1"] = res["po_sum_dydy1"] + 1.0
        return res

    monkeypatch.setattr(cointmod, "cointegration_phillips_ouliaris", bad_po)
    with pytest.raises(
        Exception, match="phillips-ouliaris twin certificate violated"
    ):
        entrymod.queries()["cointegration_1h"](spark, sf_dir).collect()


def test_ann_recall_certificates_throw_on_corrupted_method(spark, sf_dir,
                                                           monkeypatch):
    """q_ann_recall's in-plan certificate: reported cosines must match an
    independent recomputation from the raw vectors, and each method must
    clear its calibrated recall floor. A corrupted method must make the
    driver row THROW. Patches the real operator so the test exercises
    the ACTUAL entry query."""
    import feasts_spark.operators.similarity as simmod
    from pyspark.sql import functions as F

    good = entrymod.queries()["ann_recall"](spark, sf_dir).collect()
    assert good and all(r["cert_ok"] for r in good)

    real = simmod.ann_lsh_topk

    # 1) scores drift from the raw-vector truth -> cosine cert throws
    def drifted(df, **kw):
        return real(df, **kw).withColumn("cos", F.col("cos") + F.lit(0.01))

    monkeypatch.setattr(simmod, "ann_lsh_topk", drifted)
    with pytest.raises(Exception, match="ann cosine certificate violated"):
        entrymod.queries()["ann_recall"](spark, sf_dir).collect()

    # 2) a method silently losing candidates -> recall floor cert throws
    def lossy(df, **kw):
        return real(df, **kw).filter(F.col("rank") == 1)

    monkeypatch.setattr(simmod, "ann_lsh_topk", lossy)
    with pytest.raises(Exception, match="ann recall certificate violated"):
        entrymod.queries()["ann_recall"](spark, sf_dir).collect()
