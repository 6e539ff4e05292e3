"""Checkpointed incremental batch execution (lineage + resume)."""
