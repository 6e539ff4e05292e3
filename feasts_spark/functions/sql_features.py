"""SQL-native per-series feature computations (SURVEY.md §2.1 "SQL alt").

Each returns a DataFrame keyed by the series key, computed entirely with
built-in window/aggregate expressions — no Python in the hot path. The
__spark_entry__ driver queries wrap these so DuckDB oracles verify them
end to end at every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def acf1_expr(df: DataFrame, key_col: str, order_cols: list, value_col: str) -> DataFrame:
    """Lag-1 autocorrelation, R divisor-n semantics (features.R:617)."""
    wk = W.partitionBy(key_col)
    wo = W.partitionBy(key_col).orderBy(*order_cols)
    v = F.col(value_col)
    s = (
        df.withColumn("_m", F.avg(v).over(wk))
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .withColumn("_xc", v - F.col("_m"))
        .withColumn("_xc_next", F.lead("_xc").over(wo))
    )
    return s.groupBy(F.col(key_col).alias("series_key")).agg(
        (
            (F.sum(F.col("_xc") * F.col("_xc_next")) / F.max("_n"))
            / (F.sum(F.col("_xc") * F.col("_xc")) / F.max("_n"))
        ).alias("acf1")
    )


def crossing_points_df(
    df: DataFrame, key_col: str, order_cols: list, value_col: str
) -> DataFrame:
    """n_crossing_points (features.R:4-13): exact order-statistics median.

    The midline is computed as (v[(n+1) div 2] + v[n div 2 + 1]) / 2 over the
    value-sorted series — the same formula R's median() uses — instead of
    `percentile(...)`: interpolating percentile implementations differ in the
    last ULP across engines for even n, flipping `value <= med` for points
    exactly at the median. Order statistics + one IEEE add/divide are
    bitwise-reproducible everywhere.
    """
    wk = W.partitionBy(key_col)
    wv = W.partitionBy(key_col).orderBy(value_col)
    med = (
        df.select(key_col, value_col)
        .withColumn("_vrn", F.row_number().over(wv))
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .filter(
            (F.col("_vrn") == F.expr("(_n + 1) div 2"))
            | (F.col("_vrn") == F.expr("_n div 2 + 1"))
        )
        .groupBy(key_col)
        .agg(F.avg(value_col).alias("_med"))
    )
    wo = W.partitionBy(key_col).orderBy(*order_cols)
    s = (
        df.join(med, key_col)
        .withColumn("_ab", F.col(value_col) <= F.col("_med"))
        .withColumn("_ab_next", F.lead("_ab").over(wo))
    )
    return (
        s.filter(F.col("_ab_next").isNotNull())
        .groupBy(F.col(key_col).alias("series_key"))
        .agg(
            F.sum((F.col("_ab") != F.col("_ab_next")).cast("long")).alias(
                "n_crossing_points"
            )
        )
    )


def shift_level_df(
    df: DataFrame, key_col: str, order_cols: list, value_col: str, size: int = 10
) -> DataFrame:
    """shift_level_max/index (features.R:395-417) via rolling windows."""
    wo = W.partitionBy(key_col).orderBy(*order_cols)
    wroll = wo.rowsBetween(-(size - 1), 0)
    s = (
        df.withColumn("_rn", F.row_number().over(wo))
        .withColumn("_a", F.avg(value_col).over(wroll))
        .withColumn("_diff", F.abs(F.col("_a") - F.lag("_a", size).over(wo)))
        .filter(F.col("_diff").isNotNull())
    )
    wrank = W.partitionBy(key_col).orderBy(
        F.desc(F.floor(F.col("_diff") * 1e6 + F.lit(0.500001))), F.asc("_rn")
    )
    return (
        s.withColumn("_rk", F.row_number().over(wrank))
        .filter(F.col("_rk") == 1)
        .select(
            F.col(key_col).alias("series_key"),
            F.col("_diff").alias("shift_level_max"),
            (F.col("_rn") - F.lit(size - 1)).alias("shift_level_index"),
        )
    )


def var_tiled_df(
    df: DataFrame, key_col: str, order_cols: list, value_col: str, size: int = 10
) -> DataFrame:
    """var_tiled_mean (stability) + var_tiled_var (lumpiness),
    features.R:562-595: z-score, tile, var of tile means/vars."""
    wo = W.partitionBy(key_col).orderBy(*order_cols)
    wk = W.partitionBy(key_col)
    v = F.col(value_col)
    s = (
        df.withColumn("_rn", F.row_number().over(wo))
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .withColumn("_z", (v - F.avg(v).over(wk)) / F.stddev_samp(v).over(wk))
        .withColumn("_tile", ((F.col("_rn") - 1) / size).cast("long"))
    )
    tiles = s.groupBy(key_col, "_tile").agg(
        F.avg("_z").alias("_tmean"),
        F.var_samp("_z").alias("_tvar"),
        F.count(F.lit(1)).alias("_tn"),
        F.max("_n").alias("_n"),
    )
    return tiles.groupBy(F.col(key_col).alias("series_key")).agg(
        F.when(F.max("_n") < 2 * size, F.lit(0.0))
        .otherwise(F.var_samp("_tmean"))
        .alias("var_tiled_mean"),
        F.when(F.max("_n") < 2 * size, F.lit(0.0))
        .otherwise(F.var_samp(F.when(F.col("_tn") == size, F.col("_tvar"))))
        .alias("var_tiled_var"),
    )


def kpss_df(
    df: DataFrame,
    key_col: str,
    order_cols: list,
    value_col: str,
    l_max: int = 12,
) -> DataFrame:
    """KPSS level-stationarity statistic + p-value in pure SQL.

    urca::ur.kpss type="mu", lags="short" semantics (features.R:139-144):
    demeaned residuals e_t, partial sums S_t, Bartlett long-run variance
    s2(l) with l = trunc(4*(n/100)^0.25), stat = sum(S_t^2)/(n^2*s2),
    p-value by clamped linear interpolation of the Kwiatkowski et al.
    critical-value table — every step windows/aggregates + scalar math,
    no Python. `l_max` bounds the materialized lag columns: the statistic
    is exact only while l = trunc(4*(n/100)^0.25) <= l_max, i.e. for
    n < 100*((l_max+1)/4)^4 points (l_max=12 -> 11,156 points, ~30 years
    of daily data); beyond that BOTH stat and p-value are emitted as NULL
    (never a silently truncated Bartlett sum) — raise l_max for longer
    series. Conditional weights zero out unused lag columns for short
    series.

    Mirrored verbatim by the DuckDB oracle in __spark_entry__ — golden
    parity with the numpy kernel is asserted in tests.
    """
    wk = W.partitionBy(key_col)
    wo = W.partitionBy(key_col).orderBy(*order_cols)
    wrun = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    v = F.col(value_col)
    s = (
        df.withColumn("_e", v - F.avg(v).over(wk))
        .withColumn("_S", F.sum("_e").over(wrun))
    )
    for k in range(1, l_max + 1):
        s = s.withColumn(f"_el{k}", F.lag("_e", k).over(wo))
    agg = s.groupBy(F.col(key_col).alias("series_key")).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(F.col("_e") * F.col("_e")).alias("_g0"),
        F.sum(F.col("_S") * F.col("_S")).alias("_ss"),
        *[
            F.sum(F.col("_e") * F.col(f"_el{k}")).alias(f"_g{k}")
            for k in range(1, l_max + 1)
        ],
    )
    n = F.col("_n")
    l = F.floor(F.lit(4.0) * F.pow(n / F.lit(100.0), F.lit(0.25)))
    s2 = F.col("_g0") / n
    for k in range(1, l_max + 1):
        s2 = s2 + F.when(
            F.lit(k) <= l,
            F.lit(2.0)
            * (F.lit(1.0) - F.lit(float(k)) / (l + F.lit(1.0)))
            * F.col(f"_g{k}")
            / n,
        ).otherwise(F.lit(0.0))
    out = agg.withColumn("_s2", s2).withColumn(
        "kpss_stat",
        # NULL (never a silently truncated Bartlett sum) once the
        # data-driven l exceeds the materialized lag columns
        F.when(l <= F.lit(l_max), F.col("_ss") / (n * n * F.col("_s2"))),
    )
    # clamped piecewise-linear interp of (0.347,0.463,0.574,0.739) ->
    # (0.10,0.05,0.025,0.01), identical expression tree in the oracle
    st = F.col("kpss_stat")
    pv = (
        F.when(st.isNull(), F.lit(None).cast("double"))
        .when(st <= 0.347, F.lit(0.10))
        .when(st <= 0.463, 0.10 + (st - 0.347) * (0.05 - 0.10) / (0.463 - 0.347))
        .when(st <= 0.574, 0.05 + (st - 0.463) * (0.025 - 0.05) / (0.574 - 0.463))
        .when(st <= 0.739, 0.025 + (st - 0.574) * (0.01 - 0.025) / (0.739 - 0.574))
        .otherwise(F.lit(0.01))
    )
    return out.withColumn("kpss_pvalue", pv).select(
        "series_key", "kpss_stat", "kpss_pvalue"
    )


def pacf12_df(
    df: DataFrame, key_col: str, order_cols: list, value_col: str
) -> DataFrame:
    """PACF at lags 1 and 2 via the Durbin-Levinson closed forms.

    phi_11 = rho_1 and phi_22 = (rho_2 - rho_1^2)/(1 - rho_1^2) — the
    first two D-L steps are rational in the ACF (acf.R:124-141), so they
    are SQL-expressible and DuckDB-oracle-able, unlike the general
    recursion that pacf_table runs in the numpy kernel. rho_k uses R's
    divisor-n ACF semantics.
    """
    wk = W.partitionBy(key_col)
    wo = W.partitionBy(key_col).orderBy(*order_cols)
    v = F.col(value_col)
    s = (
        df.withColumn("_m", F.avg(v).over(wk))
        .withColumn("_xc", v - F.col("_m"))
        .withColumn("_xc1", F.lead("_xc").over(wo))
        .withColumn("_xc2", F.lead("_xc", 2).over(wo))
    )
    agg = s.groupBy(F.col(key_col).alias("series_key")).agg(
        F.sum(F.col("_xc") * F.col("_xc")).alias("_c0"),
        F.sum(F.col("_xc") * F.col("_xc1")).alias("_c1"),
        F.sum(F.col("_xc") * F.col("_xc2")).alias("_c2"),
    )
    rho1 = F.col("_c1") / F.col("_c0")
    rho2 = F.col("_c2") / F.col("_c0")
    return agg.select(
        "series_key",
        rho1.alias("pacf1"),
        ((rho2 - rho1 * rho1) / (F.lit(1.0) - rho1 * rho1)).alias("pacf2"),
    )


_DF_TAU_MU_KNOTS = (25.0, 50.0, 100.0, 250.0, 500.0, 100000.0)
_DF_TAU_MU_VALS = {
    0.01: (-3.75, -3.58, -3.51, -3.46, -3.44, -3.43),
    0.05: (-3.00, -2.93, -2.89, -2.88, -2.87, -2.86),
    0.10: (-2.63, -2.60, -2.58, -2.57, -2.57, -2.57),
}


def _interp_case(var: str, xs: tuple, ys: tuple) -> str:
    """Clamped piecewise-linear interpolation as a CASE expression."""
    parts = [f"CASE WHEN {var} <= CAST({xs[0]} AS DOUBLE) THEN CAST({ys[0]} AS DOUBLE)"]
    for i in range(1, len(xs)):
        parts.append(
            f"WHEN {var} <= CAST({xs[i]} AS DOUBLE) THEN CAST({ys[i-1]} AS DOUBLE)"
            f" + ({var} - CAST({xs[i-1]} AS DOUBLE))"
            f" * (CAST({ys[i]} AS DOUBLE) - CAST({ys[i-1]} AS DOUBLE))"
            f" / (CAST({xs[i]} AS DOUBLE) - CAST({xs[i-1]} AS DOUBLE))"
        )
    parts.append(f"ELSE CAST({ys[-1]} AS DOUBLE) END")
    return "\n      ".join(parts)


def pp_sql(
    trunc: str = "day", min_points: int = 14, l_max: int = 12
) -> str:
    """Phillips-Perron Z-tau (constant model, short lags) as ONE SQL text.

    urca::ur.pp semantics (features.R:152-159): OLS y_t ~ 1 + y_{t-1} in
    closed form, Newey-West/Bartlett long-run variance of the residuals,
    Z-tau correction, Dickey-Fuller constant-model critical values
    interpolated first over n then over the statistic (both clamped).

    The SAME string runs on Spark SQL (over a temp view `events`) and on
    DuckDB as the oracle — dialect-neutral (CAST(), power(), floor(),
    inline OVER clauses), so cross-engine parity is textual, not
    hand-mirrored. Kernel parity vs kernels.extras.unitroot_pp is asserted
    in tests. As in kpss_df, the Newey-West sum is exact only while
    l = trunc(4*(n/100)^0.25) <= l_max (l_max=12 -> n < 11,156 points);
    longer series emit NULL stat + p-value rather than a silently
    truncated statistic.
    """
    lag_cols = ",\n         ".join(
        f"lag(e, {j}) OVER (PARTITION BY k ORDER BY rn) AS el{j}"
        for j in range(1, l_max + 1)
    )
    re_cols = ",\n         ".join(
        f"sum(e * el{j}) AS re{j}" for j in range(1, l_max + 1)
    )
    lam_terms = "\n      ".join(
        f"+ CASE WHEN {j} <= l THEN CAST(2 AS DOUBLE) * (CAST(1 AS DOUBLE)"
        f" - CAST({j} AS DOUBLE) / (l + CAST(1 AS DOUBLE))) * re{j} / n"
        f" ELSE CAST(0 AS DOUBLE) END"
        for j in range(1, l_max + 1)
    )
    cv_cases = {
        p: _interp_case("n", _DF_TAU_MU_KNOTS, _DF_TAU_MU_VALS[p])
        for p in (0.01, 0.05, 0.10)
    }
    return f"""
WITH r AS (
  SELECT user_id, date_trunc('{trunc}', ts) AS bucket_ts, avg(value) AS v
  FROM events GROUP BY user_id, date_trunc('{trunc}', ts)
), keyed AS (
  SELECT user_id FROM r GROUP BY user_id HAVING count(*) >= {min_points}
), o AS (
  SELECT r.user_id AS k, v,
         row_number() OVER (PARTITION BY r.user_id ORDER BY bucket_ts) AS rn
  FROM r JOIN keyed ON keyed.user_id = r.user_id
), p AS (
  SELECT k, rn, y, yl FROM (
    SELECT k, rn, v AS y, lag(v) OVER (PARTITION BY k ORDER BY rn) AS yl
    FROM o
  ) q WHERE yl IS NOT NULL
), sums AS (
  SELECT k, CAST(count(*) AS DOUBLE) AS n,
         sum(y) AS sy, sum(yl) AS syl, sum(y * yl) AS syyl,
         sum(yl * yl) AS syl2
  FROM p GROUP BY k
), ols AS (
  SELECT k, n, sy, syl, syl2,
         n * syl2 - syl * syl AS det,
         (n * syyl - sy * syl) / (n * syl2 - syl * syl) AS rho
  FROM sums
), ols2 AS (
  SELECT k, n, rho, det, (sy - rho * syl) / n AS mu FROM ols
), res AS (
  SELECT p.k AS k, p.rn AS rn, ols2.n AS n, ols2.rho AS rho, ols2.det AS det,
         p.y - ols2.mu - ols2.rho * p.yl AS e
  FROM p JOIN ols2 ON ols2.k = p.k
), resl AS (
  SELECT k, rn, n, rho, det, e,
         {lag_cols}
  FROM res
), agg AS (
  SELECT k AS series_key, max(n) AS n, max(rho) AS rho, max(det) AS det,
         sum(e * e) AS ree,
         {re_cols}
  FROM resl GROUP BY k
), base AS (
  SELECT *, ree / (n - CAST(2 AS DOUBLE)) AS s2,
    floor(CAST(4 AS DOUBLE) * power(n / CAST(100 AS DOUBLE), CAST(0.25 AS DOUBLE))) AS l
  FROM agg
), lam AS (
  SELECT series_key, n, rho, det, s2, l,
    sqrt(s2 * n / det) AS se_rho,
    ree / n AS g0,
    ree / n
      {lam_terms} AS lam2
  FROM base
), statc AS (
  SELECT series_key, n,
    CASE WHEN l <= {l_max} THEN
      sqrt(g0 / lam2) * ((rho - CAST(1 AS DOUBLE)) / se_rho)
        - (lam2 - g0) / (CAST(2 AS DOUBLE) * sqrt(lam2))
          * (n * se_rho / sqrt(s2))
    ELSE NULL END AS pp_stat
  FROM lam
), cv AS (
  SELECT series_key, pp_stat,
    {cv_cases[0.01]} AS cv01,
    {cv_cases[0.05]} AS cv05,
    {cv_cases[0.10]} AS cv10
  FROM statc
)
SELECT series_key,
  floor(pp_stat * 1e4 + CAST(0.500001 AS DOUBLE)) / 1e4 AS pp_stat,
  floor((CASE WHEN pp_stat IS NULL THEN NULL
    WHEN pp_stat <= cv01 THEN CAST(0.01 AS DOUBLE)
    WHEN pp_stat <= cv05 THEN CAST(0.01 AS DOUBLE) + (pp_stat - cv01)
      * (CAST(0.05 AS DOUBLE) - CAST(0.01 AS DOUBLE)) / (cv05 - cv01)
    WHEN pp_stat <= cv10 THEN CAST(0.05 AS DOUBLE) + (pp_stat - cv05)
      * (CAST(0.10 AS DOUBLE) - CAST(0.05 AS DOUBLE)) / (cv10 - cv05)
    ELSE CAST(0.10 AS DOUBLE) END) * 1e4
    + CAST(0.500001 AS DOUBLE)) / 1e4 AS pp_pvalue
FROM cv
"""


def acf_features_sql(
    trunc: str = "hour", min_points: int = 30, period: int = 24
) -> str:
    """feat_acf (features.R:616-653) as ONE dialect-neutral SQL text.

    acf1/acf10 on the series, diff1_acf1/diff1_acf10 and
    diff2_acf1/diff2_acf10 on its first and second differences, plus
    season_acf1 at the seasonal lag. R's divisor-n ACF reduces to ratios
    of centered lag-product sums (the divisor cancels), the differenced
    series are demeaned by their own means, and null rows at the series
    head drop the exact pairs numpy's diff-then-acf drops — so the whole
    pack is window functions + one aggregate. The SAME string runs on
    Spark SQL (temp view `events`) and DuckDB (the oracle).
    """
    lags = sorted(set(range(1, 11)) | {period})
    lead_x = ",\n         ".join(
        f"lead(xc, {k}) OVER (PARTITION BY k ORDER BY rn) AS xc{k}" for k in lags
    )
    lead_d = ",\n         ".join(
        f"lead(y1, {k}) OVER (PARTITION BY k ORDER BY rn) AS y1_{k},\n"
        f"         lead(y2, {k}) OVER (PARTITION BY k ORDER BY rn) AS y2_{k}"
        for k in range(1, 11)
    )
    sums_x = ",\n         ".join(
        f"sum(xc * xc{k}) AS s{k}" for k in lags
    )
    sums_d = ",\n         ".join(
        f"sum(y1 * y1_{k}) AS t{k},\n         sum(y2 * y2_{k}) AS u{k}"
        for k in range(1, 11)
    )
    sq = lambda terms: " + ".join(f"({t}) * ({t})" for t in terms)  # noqa: E731
    acf10 = sq([f"s{k} / s0" for k in range(1, 11)])
    d1_acf10 = sq([f"t{k} / t0" for k in range(1, 11)])
    d2_acf10 = sq([f"u{k} / u0" for k in range(1, 11)])
    r4 = lambda e, name: (  # noqa: E731
        f"floor(({e}) * 1e4 + CAST(0.500001 AS DOUBLE)) / 1e4 AS {name}"
    )
    return f"""
WITH r AS (
  SELECT user_id, date_trunc('{trunc}', ts) AS bucket_ts, avg(value) AS v
  FROM events GROUP BY user_id, date_trunc('{trunc}', ts)
), keyed AS (
  SELECT user_id FROM r GROUP BY user_id HAVING count(*) >= {min_points}
), o AS (
  SELECT r.user_id AS k, v,
         row_number() OVER (PARTITION BY r.user_id ORDER BY bucket_ts) AS rn,
         v - lag(v) OVER (PARTITION BY r.user_id ORDER BY bucket_ts) AS d1,
         v - CAST(2 AS DOUBLE) * lag(v) OVER (PARTITION BY r.user_id ORDER BY bucket_ts)
           + lag(v, 2) OVER (PARTITION BY r.user_id ORDER BY bucket_ts) AS d2
  FROM r JOIN keyed ON keyed.user_id = r.user_id
), c AS (
  SELECT k, rn,
         v - avg(v) OVER (PARTITION BY k) AS xc,
         d1 - avg(d1) OVER (PARTITION BY k) AS y1,
         d2 - avg(d2) OVER (PARTITION BY k) AS y2
  FROM o
), l AS (
  SELECT k, rn, xc, y1, y2,
         {lead_x},
         {lead_d}
  FROM c
), agg AS (
  SELECT k AS series_key,
         sum(xc * xc) AS s0, sum(y1 * y1) AS t0, sum(y2 * y2) AS u0,
         {sums_x},
         {sums_d}
  FROM l GROUP BY k
)
SELECT series_key,
  {r4("s1 / s0", "acf1")},
  {r4(acf10, "acf10")},
  {r4("t1 / t0", "diff1_acf1")},
  {r4(d1_acf10, "diff1_acf10")},
  {r4("u1 / u0", "diff2_acf1")},
  {r4(d2_acf10, "diff2_acf10")},
  {r4(f"s{period} / s0", "season_acf1")}
FROM agg
"""


def _guerrero_core(trunc: str, period: int) -> str:
    """Shared CTE chain (raw rollup -> tail subseries -> per-sub mu/sig ->
    admissible keys) used verbatim by guerrero_profile_sql and
    guerrero_argmin_sql so both texts stay byte-identical on the core."""
    return f"""
WITH r AS (
  SELECT user_id, date_trunc('{trunc}', ts) AS bucket_ts, avg(value) AS v
  FROM events GROUP BY user_id, date_trunc('{trunc}', ts)
), o AS (
  SELECT user_id AS k, v,
         row_number() OVER (PARTITION BY user_id ORDER BY bucket_ts) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM r
), tail AS (
  -- nsub = floor(n/period); start = n - nsub*period; sub = floor((rn-start-1)/period)
  SELECT k, v,
         CAST(floor((rn - (n - CAST(floor(n / CAST({period} AS DOUBLE)) AS BIGINT) * {period}) - 1)
                    / CAST({period} AS DOUBLE)) AS BIGINT) AS sub
  FROM o
  WHERE rn > n - CAST(floor(n / CAST({period} AS DOUBLE)) AS BIGINT) * {period}
    AND n >= {2 * period}
), subs AS (
  SELECT k, sub, avg(v) AS mu, stddev_samp(v) AS sig
  FROM tail GROUP BY k, sub
), keys_ok AS (
  SELECT k FROM subs GROUP BY k HAVING min(mu) > 0 AND count(*) >= 2
)"""


def guerrero_profile_sql(
    trunc: str = "day",
    period: int = 7,
    lambdas: tuple = (-0.9, -0.5, 0.0, 0.5, 1.0, 2.0),
) -> str:
    """Guerrero coefficient-of-variation profile at a fixed lambda grid —
    ONE dialect-neutral SQL text for Spark and DuckDB.

    The guerrero feature Brent-minimizes cv(lambda) = sd_h(rat)/mean_h(rat)
    with rat_h = sd_h / mean_h^(1-lambda) over length-`period` subseries of
    the series tail (guerrero.R:30-60). The optimizer is not
    SQL-expressible, but the OBJECTIVE is pure windows/aggregates — this
    profile oracles the inner math the kernel minimizes, at several
    lambdas. Keys are restricted to positive subseries means (fractional
    powers of negative bases are NaN in every engine) and >= 2 subseries.
    """
    rat_cols = ",\n    ".join(
        f"stddev_samp(sig / power(mu, CAST(1 AS DOUBLE) - CAST({lam} AS DOUBLE)))"
        f" / avg(sig / power(mu, CAST(1 AS DOUBLE) - CAST({lam} AS DOUBLE)))"
        f" AS cv_raw_{i}"
        for i, lam in enumerate(lambdas)
    )
    out_cols = ",\n  ".join(
        f"floor(cv_raw_{i} * 1e4 + CAST(0.500001 AS DOUBLE)) / 1e4"
        f" AS cv_lambda_{str(lam).replace('-', 'm').replace('.', '_')}"
        for i, lam in enumerate(lambdas)
    )
    return f"""{_guerrero_core(trunc, period)}, prof AS (
  SELECT subs.k AS series_key,
    {rat_cols}
  FROM subs JOIN keys_ok ON keys_ok.k = subs.k
  GROUP BY subs.k
)
SELECT series_key,
  {out_cols}
FROM prof
"""


def guerrero_argmin_sql(
    trunc: str = "day",
    period: int = 7,
    lambdas: tuple = tuple(round(-1.0 + 0.1 * i, 1) for i in range(31)),
) -> str:
    """Grid-argmin Box-Cox lambda over the Guerrero CV objective — ONE
    dialect-neutral SQL text for Spark and DuckDB.

    Evaluates cv(lambda) on a 0.1-step grid over [-1, 2] (the same
    objective guerrero.R:42-45 Brent-minimizes; the continuous optimizer
    stays in the golden-tested numpy kernel) and picks the grid lambda
    with the smallest CV. One pass: the grid lives in columns of a single
    aggregate row and the argmin is least() + a first-match CASE chain —
    no unpivot/UNION (which would re-plan the whole aggregation per
    branch in Spark). Tie-stable: CV is floored at 1e-6 resolution and
    the CASE scans lambdas ascending, so ties break toward the smaller
    lambda; NaN CVs (all-constant subseries) are NULLed out, which both
    engines' least() skips.
    """
    cv_cols = ",\n    ".join(
        f"stddev_samp(sig / power(mu, CAST(1 AS DOUBLE) - CAST({lam} AS DOUBLE)))"
        f" / avg(sig / power(mu, CAST(1 AS DOUBLE) - CAST({lam} AS DOUBLE)))"
        f" AS cv_{i}"
        for i, lam in enumerate(lambdas)
    )
    f_cols = ",\n    ".join(
        f"CASE WHEN cv_{i} IS NULL OR isnan(cv_{i}) THEN NULL"
        f" ELSE floor(cv_{i} * 1e6 + CAST(0.500001 AS DOUBLE)) END AS f_{i}"
        for i in range(len(lambdas))
    )
    least_args = ", ".join(f"f_{i}" for i in range(len(lambdas)))
    pick = "\n    ".join(
        f"WHEN f_{i} = fmin THEN CAST({lam} AS DOUBLE)"
        for i, lam in enumerate(lambdas)
    )
    return f"""{_guerrero_core(trunc, period)}, cvg AS (
  SELECT subs.k AS series_key,
    {cv_cols}
  FROM subs JOIN keys_ok ON keys_ok.k = subs.k
  GROUP BY subs.k
), fl AS (
  SELECT series_key,
    {f_cols}
  FROM cvg
), mm AS (
  SELECT series_key, least({least_args}) AS fmin, {least_args} FROM fl
)
SELECT series_key,
  CASE {pick}
    END AS lambda_guerrero
FROM mm WHERE fmin IS NOT NULL
"""


def ndiffs_sql(
    trunc: str = "day",
    min_points: int = 14,
    l_max: int = 12,
    alpha: float = 0.05,
) -> str:
    """unitroot_ndiffs (features.R:181-203) as ONE dialect-neutral SQL text.

    Runs the KPSS level-stationarity test on the raw series (d=0) and the
    once-differenced series (d=1), then ndiffs = max difference level kept:
    2 if p(diff x) < alpha, else 1 if p(x) < alpha, else 0 — exactly the
    kernel's max-of-kept-levels rule (stat_tests.unitroot_ndiffs). The
    KPSS machinery mirrors kpss_df: demeaned residuals, Bartlett long-run
    variance with l = trunc(4*(n/100)^0.25), clamped critical-value
    interpolation. Series long enough that l would exceed `l_max` yield a
    NULL p-value for that level (never a silently truncated statistic);
    the CASE then falls through to the shallower level.
    """
    lag_cols = ",\n         ".join(
        f"lag(e, {k}) OVER (PARTITION BY k, d ORDER BY rn) AS el{k}"
        for k in range(1, l_max + 1)
    )
    g_cols = ",\n         ".join(
        f"sum(e * el{k}) AS g{k}" for k in range(1, l_max + 1)
    )
    g_pass = ", ".join(f"g{k}" for k in range(1, l_max + 1))
    s2_terms = "\n      ".join(
        f"+ CASE WHEN {k} <= l THEN CAST(2 AS DOUBLE) * (CAST(1 AS DOUBLE) - "
        f"CAST({k} AS DOUBLE) / (l + CAST(1 AS DOUBLE))) * g{k} / n"
        f" ELSE CAST(0 AS DOUBLE) END"
        for k in range(1, l_max + 1)
    )
    return f"""
WITH r AS (
  SELECT user_id, date_trunc('{trunc}', ts) AS bucket_ts, avg(value) AS v
  FROM events GROUP BY user_id, date_trunc('{trunc}', ts)
), keyed AS (
  SELECT user_id FROM r GROUP BY user_id HAVING count(*) >= {min_points}
), base0 AS (
  SELECT r.user_id AS k, v,
         row_number() OVER (PARTITION BY r.user_id ORDER BY bucket_ts) AS rn
  FROM r JOIN keyed ON keyed.user_id = r.user_id
), ser AS (
  SELECT k, 0 AS d, v, rn FROM base0
  UNION ALL
  SELECT k, 1 AS d, dv AS v, rn FROM (
    SELECT k, v - lag(v) OVER (PARTITION BY k ORDER BY rn) AS dv, rn
    FROM base0
  ) q WHERE dv IS NOT NULL
), s AS (
  SELECT k, d, v,
         row_number() OVER (PARTITION BY k, d ORDER BY rn) AS rn,
         v - avg(v) OVER (PARTITION BY k, d) AS e
  FROM ser
), s2 AS (
  SELECT k, d, rn, e,
         sum(e) OVER (PARTITION BY k, d ORDER BY rn
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS S,
         {lag_cols}
  FROM s
), agg AS (
  SELECT k, d, CAST(count(*) AS DOUBLE) AS n,
         sum(e * e) AS g0, sum(S * S) AS ss,
         {g_cols}
  FROM s2 GROUP BY k, d
), st AS (
  SELECT k, d, n, ss,
    floor(CAST(4 AS DOUBLE) * power(n / CAST(100 AS DOUBLE), CAST(0.25 AS DOUBLE))) AS l,
    g0, {g_pass}
  FROM agg
), lr AS (
  SELECT k, d, n, ss, l,
    g0 / n
      {s2_terms} AS s2v
  FROM st
), stat AS (
  SELECT k, d,
    CASE WHEN l <= {l_max} THEN ss / (n * n * s2v) ELSE NULL END AS kpss_stat
  FROM lr
), pv AS (
  SELECT k, d,
    CASE
      WHEN kpss_stat IS NULL THEN NULL
      WHEN kpss_stat <= CAST(0.347 AS DOUBLE) THEN CAST(0.10 AS DOUBLE)
      WHEN kpss_stat <= CAST(0.463 AS DOUBLE) THEN CAST(0.10 AS DOUBLE)
        + (kpss_stat - CAST(0.347 AS DOUBLE))
        * (CAST(0.05 AS DOUBLE) - CAST(0.10 AS DOUBLE))
        / (CAST(0.463 AS DOUBLE) - CAST(0.347 AS DOUBLE))
      WHEN kpss_stat <= CAST(0.574 AS DOUBLE) THEN CAST(0.05 AS DOUBLE)
        + (kpss_stat - CAST(0.463 AS DOUBLE))
        * (CAST(0.025 AS DOUBLE) - CAST(0.05 AS DOUBLE))
        / (CAST(0.574 AS DOUBLE) - CAST(0.463 AS DOUBLE))
      WHEN kpss_stat <= CAST(0.739 AS DOUBLE) THEN CAST(0.025 AS DOUBLE)
        + (kpss_stat - CAST(0.574 AS DOUBLE))
        * (CAST(0.01 AS DOUBLE) - CAST(0.025 AS DOUBLE))
        / (CAST(0.739 AS DOUBLE) - CAST(0.574 AS DOUBLE))
      ELSE CAST(0.01 AS DOUBLE) END AS p
  FROM stat
), piv AS (
  SELECT k AS series_key,
         max(CASE WHEN d = 0 THEN p END) AS p0,
         max(CASE WHEN d = 1 THEN p END) AS p1
  FROM pv GROUP BY k
)
SELECT series_key,
  CAST(CASE WHEN p1 < CAST({alpha} AS DOUBLE) THEN 2
            WHEN p0 < CAST({alpha} AS DOUBLE) THEN 1
            ELSE 0 END AS BIGINT) AS ndiffs
FROM piv
"""


def shift_var_df(
    df: DataFrame, key_col: str, order_cols: list, value_col: str, size: int = 10
) -> DataFrame:
    """shift_var_max/index (features.R:421-444): rolling var_samp windows.

    Same gaps-free window algebra as shift_level_df with var_samp — stays
    entirely in whole-stage codegen."""
    wo = W.partitionBy(key_col).orderBy(*order_cols)
    wroll = wo.rowsBetween(-(size - 1), 0)
    s = (
        df.withColumn("_rn", F.row_number().over(wo))
        .withColumn("_v", F.var_samp(value_col).over(wroll))
        .withColumn("_diff", F.abs(F.col("_v") - F.lag("_v", size).over(wo)))
        .filter(F.col("_diff").isNotNull())
    )
    wrank = W.partitionBy(key_col).orderBy(
        F.desc(F.floor(F.col("_diff") * 1e6 + F.lit(0.500001))), F.asc("_rn")
    )
    return (
        s.withColumn("_rk", F.row_number().over(wrank))
        .filter(F.col("_rk") == 1)
        .select(
            F.col(key_col).alias("series_key"),
            F.col("_diff").alias("shift_var_max"),
            (F.col("_rn") - F.lit(size - 1)).alias("shift_var_index"),
        )
    )
