"""feasts_spark — a PySpark-native time-series rollup + feature engine.

A from-scratch Spark implementation of the query/data-processing
capabilities of tidyverts/feasts (reference: /root/reference, R, v0.4.2.9000)
extended with a tiered rollup / gap-fill / compression / retention engine
for conversation-transcript tables at cluster scale.

Architecture (SURVEY.md):
  - ``kernels/``   pure numpy/pandas math, R-exact (no Spark dependency)
  - ``operators/`` Spark DataFrame operators (rollup, gapfill, cf, features,
                   decompose, compression, skew)
  - ``sources/``   table IO + deterministic transcript synthesizer
  - ``functions/`` column-level helpers (SQL-native feature expressions)
  - ``streaming/`` checkpointed incremental runs (lineage + resume)
"""

__version__ = "0.1.0"
