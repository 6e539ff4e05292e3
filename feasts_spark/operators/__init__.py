"""Spark DataFrame operators (SURVEY.md §2.4/§2.5)."""
