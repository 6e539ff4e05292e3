"""Conversation-flow analytics over the transcript shape.

The graft's payload is multi-turn conversation / agent transcripts
(conv_id, turn_idx, role, text, tool, ts). Beyond per-turn integrity and
per-conversation features, the questions an operator of a transcript
corpus actually asks are *flow*-shaped:

  - the role-transition matrix: how often does `user -> assistant`,
    `assistant -> tool`, `tool -> assistant` ... happen, and with what
    row-stochastic probability (a first-order Markov view of the corpus);
  - inter-turn latency: the distribution (mean / p50 / p90 / p99) of the
    wall-clock gap between a turn and the one before it, keyed by the
    same (role_from, role_to) pair — "how long does the assistant take
    to answer a user", "how long do tool calls run";
  - tool usage: per-tool call volume, conversation reach, and the same
    latency distribution restricted to that tool's turns.

All three share one lineage: a single lag window partitioned by
conversation (role_from = lag(role), delta_s = ts - lag(ts)) followed by
tiny hash aggregates. Spark shape at 10^12 turns:

  - ONE shuffle on conv_id for the lag window (the same partitioning
    every per-conversation operator in this engine uses — co-partitioned
    with rollups/features, so AQE can reuse the exchange);
  - the (role_from, role_to) and tool aggregates are map-side partial:
    output cardinality is |roles|^2 + |tools| — a few dozen rows
    regardless of corpus size, so the final exchange is negligible;
  - `share` normalizations run as a window over those few dozen rows.

Everything is built-in JVM expressions (lag / percentile / avg /
count distinct) — no Python in the plan. `percentile` is Spark's exact
linear-interpolation aggregate, the same interpolation DuckDB's
quantile_cont uses, which is what makes the pack value-oracle-able.

Reference parity note: feasts has no transcript-flow surface (it is a
tsibble feature package); this module is part of the engine's native
transcript tier alongside operators/integrity.py and sessionize.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

PCTS = (0.5, 0.9, 0.99)


def _lagged(
    df: DataFrame,
    conv_col: str,
    order_col: str,
    role_col: str,
    ts_col: str,
    tool_col: str | None,
) -> DataFrame:
    """One window pass: previous role + inter-turn gap in seconds.

    delta_s is computed on microsecond integers (unix_micros) so the
    division by 1e6 is exact for parquet's us-resolution timestamps;
    unix_micros rejects TIMESTAMP_NTZ, hence the cast (session tz must be
    UTC, as everywhere in this engine).
    """
    w = W.partitionBy(conv_col).orderBy(order_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cols = [
        F.col(conv_col).alias("conv_id"),
        F.col(role_col).alias("role_to"),
        F.lag(F.col(role_col)).over(w).alias("role_from"),
        ((us - F.lag(us).over(w)) / F.lit(1e6)).alias("delta_s"),
    ]
    if tool_col is not None:
        cols.append(F.col(tool_col).alias("tool"))
    return df.select(*cols)


def _latency_aggs() -> list:
    p = F.expr(f"percentile(delta_s, array({', '.join(map(str, PCTS))}))")
    return [
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.avg("delta_s").alias("mean_s"),
        p[0].alias("p50_s"),
        p[1].alias("p90_s"),
        p[2].alias("p99_s"),
    ]


def role_transitions(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
) -> DataFrame:
    """Role-transition matrix with latency distribution per edge.

    Output, one row per observed (role_from, role_to) pair:
      role_from, role_to, n (transition count), n_convs (conversations
      containing the edge), share (row-stochastic P(to | from)),
      mean_s / p50_s / p90_s / p99_s (inter-turn gap distribution).

    First turns (no predecessor) are excluded — they are not transitions.
    """
    lag = _lagged(df, conv_col, order_col, role_col, ts_col, None)
    agg = (
        lag.filter(F.col("role_from").isNotNull())
        .groupBy("role_from", "role_to")
        .agg(*_latency_aggs())
    )
    tot = W.partitionBy("role_from")
    return agg.withColumn("share", F.col("n") / F.sum("n").over(tot))


def tool_usage(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-tool call volume, reach, and invocation-latency distribution.

    Output, one row per tool: tool, n (calls), n_convs, share (of all
    tool calls), mean_s / p50_s / p90_s / p99_s (gap between the tool
    turn and the turn before it; a tool turn opening a conversation has
    no gap and contributes only to the counts — avg/percentile skip
    NULLs in both engines).
    """
    lag = _lagged(df, conv_col, order_col, role_col, ts_col, tool_col)
    agg = (
        lag.filter(F.col("tool").isNotNull())
        .groupBy("tool")
        .agg(*_latency_aggs())
    )
    return agg.withColumn("share", F.col("n") / F.sum("n").over(W.partitionBy()))


def conv_flow(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
    tool_col: str = "tool",
) -> DataFrame:
    """The full flow surface as a tagged pack on one schema:

      tag ('pair' | 'tool'), k1 (role_from | tool), k2 (role_to | NULL),
      n, n_convs, share, mean_s, p50_s, p90_s, p99_s.

    A naive union of role_transitions + tool_usage re-runs the scan and
    the conversation window once per leg (2 source scans). This packs
    both groupings into ONE GROUPING SETS aggregate over a single
    lag-window pass instead: one scan, one conv_id shuffle, one Expand(2)
    feeding a map-side partial agg — the duplicated rows exist only
    inside the agg operator, never on the wire at raw-row width. The
    `share` normalizations run as one window over the few-dozen-row
    aggregate (partition key: role_from for pair rows, constant for tool
    rows — one partitioning serves both).

    Result values are identical to the standalone operators (asserted in
    tests); grouping-set membership is read from grouping_id, so a
    genuine NULL role_from inside the pair set is distinguishable from
    the aggregated-away columns of the other set.
    """
    lag = _lagged(df, conv_col, order_col, role_col, ts_col, tool_col)
    # grouping_id bits follow (role_from, role_to, tool): the pair set
    # aggregates tool away -> 0b001; the tool set aggregates both role
    # columns -> 0b110.
    agg = lag.groupingSets(
        [["role_from", "role_to"], ["tool"]],
        "role_from", "role_to", "tool",
    ).agg(F.grouping_id().alias("_gid"), *_latency_aggs())
    is_pair = F.col("_gid") == 1
    kept = agg.filter(
        (is_pair & F.col("role_from").isNotNull())
        | (~is_pair & F.col("tool").isNotNull())
    ).select(
        F.when(is_pair, F.lit("pair")).otherwise(F.lit("tool")).alias("tag"),
        F.when(is_pair, F.col("role_from")).otherwise(F.col("tool")).alias("k1"),
        F.when(is_pair, F.col("role_to")).alias("k2"),
        "n",
        "n_convs",
        "mean_s",
        "p50_s",
        "p90_s",
        "p99_s",
    )
    share_w = W.partitionBy(
        "tag",
        F.when(F.col("tag") == "pair", F.col("k1")).otherwise(F.lit("")),
    )
    return kept.withColumn("share", F.col("n") / F.sum("n").over(share_w))
