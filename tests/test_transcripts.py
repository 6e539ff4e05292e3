"""Transcript synthesizer invariants (FIXTURES.md §1, BASELINE.json input_hint):
schema shape, strict ts ordering, determinism (exact per-turn text equality
under stable (conv_id, turn_idx) order across independent materializations).
"""

import pandas as pd
from pyspark.sql import functions as F

from feasts_spark.sources.transcripts import synthesize_transcripts, turn_series


def test_schema_and_ordering(spark):
    t = synthesize_transcripts(spark, n_convs=20, n_forced_long=1,
                               forced_long_turns=500, max_turns=300)
    assert [f.name for f in t.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ]
    pdf = t.toPandas().sort_values(["conv_id", "turn_idx"])
    for _, grp in pdf.groupby("conv_id"):
        assert grp["turn_idx"].tolist() == list(range(len(grp)))
        assert grp["ts"].is_monotonic_increasing
        assert grp["ts"].nunique() == len(grp)  # strictly increasing
    # tool populated exactly on tool turns
    assert (pdf["tool"].notna() == (pdf["role"] == "tool")).all()


def test_deterministic_text_equality(spark):
    """Per-turn text equality under stable (conv_id, turn_idx) order —
    the BASELINE.json per-row invariant, via two independent syntheses."""
    a = synthesize_transcripts(spark, n_convs=10, n_forced_long=0, max_turns=200)
    b = synthesize_transcripts(spark, n_convs=10, n_forced_long=0, max_turns=200)
    pa = a.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pb = b.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(pa, pb)


def test_skew_knobs(spark):
    t = synthesize_transcripts(spark, n_convs=30, n_forced_long=2,
                               forced_long_turns=1000, max_turns=300)
    counts = (
        t.groupBy("conv_id").count().orderBy(F.desc("count")).limit(3).collect()
    )
    assert counts[0]["count"] == 1000 and counts[1]["count"] == 1000
    s = turn_series(t)
    assert s.columns == ["conv_id", "turn_idx", "ts", "value"]
    assert s.filter(F.col("value") <= 0).count() == 0
