"""Table IO and deterministic data synthesis."""
