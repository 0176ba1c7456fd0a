"""Ingestion sources and sinks: HTTP readers (driver-side), the
per-ticker parquet store (reference layout) and the hive-partitioned
lake (scale layout), CSV backfill."""
