"""Dataset-level operators: relational headline queries, dedup,
similarity search, text analysis, multimodal plumbing. Each operator is
a function (spark, sf_dir|DataFrames) -> DataFrame that builds a
declarative plan — Catalyst chooses the physical strategy; docstrings
record the intended 100 TB posture (broadcast vs shuffle, partial agg,
skew handling)."""
