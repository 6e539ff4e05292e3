"""Deterministic transcript synthesizer (FIXTURES.md §1).

Generates the BASELINE.json input_hint table:
  (conv_id string, turn_idx int32, role string, text string,
   tool string, ts timestamp)

fully distributed: spark.range(n_convs) -> mapInPandas expansion, each
conversation seeded from hash(conv_id) so any subset of partitions is
reproducible independently (no driver-side data, no global RNG). Skew
knobs: Zipf(alpha=1.3) turn counts clipped to [4, max_turns], top-3 convs
forced long; dropout windows (p=0.05) leave ts gaps for gap-fill tests;
ts strictly increasing with turn_idx.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TOOLS = ["search", "calculator", "browser", "python", "sql", "files", "email", "maps"]
_WORDS = (
    "the a of to and in is for on with query spark table rollup tier turn "
    "agent tool answer plan result data time series trend season noise"
).split()

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _gen_conversation(i: int, base_seed: int, max_turns: int, start_epoch: int,
                      span_days: int, force_long: bool) -> pd.DataFrame:
    rng = np.random.RandomState((base_seed * 1_000_003 + i) % (2**31 - 1))
    if force_long:
        n = max_turns
    else:
        # Zipf(alpha=1.3) clipped
        n = int(np.clip(rng.zipf(1.3), 4, max_turns))
    conv_id = f"conv-{i:08d}"
    turn_idx = np.arange(n, dtype=np.int32)
    # roles: user/assistant alternating, occasional tool turns (p=0.15)
    roles = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    tool_mask = rng.random(n) < 0.15
    roles[tool_mask] = "tool"
    tools = np.full(n, None, dtype=object)
    tools[tool_mask] = [TOOLS[k] for k in rng.randint(0, len(TOOLS), tool_mask.sum())]
    # text: token soup whose LENGTH carries trend + seasonal + noise so the
    # derived len(text) series exercises STL/ACF meaningfully
    trend = 40 + 0.05 * turn_idx
    seasonal = 15 * np.sin(2 * np.pi * turn_idx / 24.0)
    noise = rng.standard_normal(n) * 8
    target_len = np.clip(trend + seasonal + noise, 8, 4000).astype(int)
    words = rng.choice(_WORDS, size=int(target_len.sum() // 4 + n))
    texts = []
    pos = 0
    for L in target_len:
        buf = []
        ln = 0
        while ln < L:
            w = words[pos % words.size]
            pos += 1
            buf.append(w)
            ln += len(w) + 1
        texts.append(" ".join(buf))
    # timestamps: conv start within span, lognormal inter-turn gaps,
    # dropout windows (p=0.05) inject large gaps; strictly increasing
    start = start_epoch + int(rng.random() * span_days * 86400)
    gaps = np.exp(rng.standard_normal(n) * 1.0 + 2.5)  # ~12s median
    if rng.random() < 0.05 and n > 20:
        cut = rng.randint(5, n - 5)
        gaps[cut] += 6 * 3600  # 6h dropout
    ts = start + np.cumsum(gaps)
    # microsecond-exact stamps (Arrow timestamp[us]); float-second input
    # would carry ns noise that the safe Arrow conversion rejects
    ts_us = np.round(ts * 1e6).astype(np.int64)
    ts_us = np.maximum.accumulate(ts_us + np.arange(n))  # strictly increasing
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": pd.to_datetime(ts_us, unit="us"),
        }
    )


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int = 2000,
    seed: int = 42,
    max_turns: int = 200_000,
    start: str = "2024-01-01",
    span_days: int = 30,
    n_forced_long: int = 3,
    forced_long_turns: int = 100_000,
    n_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcript table.

    n_partitions controls the generator's (and hence any direct write's)
    file layout. The default follows the session's parallelism, which is
    right for throwaway frames — but a corpus CACHE shared across runs at
    different core counts must pass an explicit count: a parquet row group
    is the atomic scan unit, so a cache written by a narrow session (e.g.
    8 files of ~100 MB row groups) hard-caps scan parallelism for every
    wider reader regardless of spark.sql.files.maxPartitionBytes.
    Conversations stay clustered either way (the repartition happens on
    the conv id frame BEFORE generation, never row-wise after)."""
    start_epoch = int(pd.Timestamp(start).timestamp())

    def gen(batches):
        for pdf in batches:
            for i in pdf["id"].tolist():
                force_long = i < n_forced_long
                mt = forced_long_turns if force_long else max_turns
                yield _gen_conversation(
                    int(i), seed, mt, start_epoch, span_days, force_long
                )

    if n_partitions is None:
        n_partitions = max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(n_convs).repartition(n_partitions)
    return base.mapInPandas(gen, schema=SCHEMA)


def turn_series(df: DataFrame) -> DataFrame:
    """Project the numeric series the features consume: len(text) per turn."""
    from pyspark.sql import functions as F

    return df.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.length("text").cast("double").alias("value"),
    )
