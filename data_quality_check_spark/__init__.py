"""data_quality_check_spark — a PySpark-native quality-filter engine.

Reimagines the per-record validate→label→report contract of the reference
(`digitaldanieldev/data-quality-check`, a Rust HTTP/CLI JSON-vs-protobuf
validator — see /root/reference/data-quality-server/src/handlers.rs:80-146)
as a partition-parallel Spark batch job over Parquet/Iceberg tables of
multi-turn transcripts:

  scan → schema/constraint validation → heuristic quality rules →
  langid + perplexity scoring (vectorized pandas UDFs, broadcast models) →
  PII/toxicity scrub → keep/drop labels → lineage/metrics table.

All model math is numpy (fastText-style hashed char-ngram classifier,
KenLM-style char n-gram LM with stupid backoff); no external model files,
no network, deterministic everywhere (fixed seeds, float64 per-row math).
"""

__version__ = "0.1.0"
