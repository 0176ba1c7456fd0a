"""PySpark-native analytics engine with the capabilities of
NexVeridian/ark-invest-api-rust-data, rebuilt Spark-first.

Layout:
  session    — SparkSession factory + runtime tuning for foreign sessions
  catalog    — testdata/lake table loaders (schema shims, e.g. nanos ts)
  functions/ — scalar expression layers (casts, string rules, security rules)
  operators/ — normalize, merge/dedupe, LLM-data ops (dedup, similarity, text)
  sources/   — HTTP readers, parquet lake store, CSV backfill
  plans/     — the declared query surface (Spark query + DuckDB oracle pairs)
  streaming/ — Structured Streaming surface over the events table
"""

__version__ = "0.1.0"
