"""Deterministic transcript table derived from the `documents` test table.

The engine's native input is a transcript table (conv_id, turn_idx, role,
text, tool, ts) — see schema.TRANSCRIPT_SCHEMA. For the driver's correctness
gate the transcripts must be reproducible inside BOTH Spark and DuckDB from
the shared parquet test tables, so this module derives them from `documents`
with pure arithmetic on doc_id — including deterministically injected
anomalies covering every validation rule and scrub pattern (the same
role anomaly fixtures the reference keeps in
/root/reference/data/input/test/example.json for its validator).

Anomaly schedule (doc_id divisibility → injected defect):
  %31 → PII email+phone appended       %37 → IP+SSN+URL appended
  %41 → toxic term appended            %43 → tool set on non-tool turn
  %53 → role outside vocabulary        %61 → duplicate (conv_id, turn_idx)
  %71 → NULL text                      %73 → too-short text
  %79 → symbol soup text               %89 → negative turn_idx
  %101 → NULL timestamp
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

N_CONVS = 97  # documents are dealt round-robin into this many conversations

_PII1 = " contact me at john.doe@example.com or 555-123-4567"
_PII2 = " my ip is 10.0.0.42 and ssn 123-45-6789 see https://ex.com/a?b=1"
_TOX = " you frakk"
_SHORT = "hi"
_SOUP = "@@@ ### $$$ %%% ^^^ &&&"


def _sql(div: str, with_doc_id: bool = False) -> str:
    """Shared derivation body; `div` is the integer-division operator.
    `with_doc_id` keeps the source doc_id — the 1:1 surrogate key the
    model-score oracle parquet joins on ((conv_id, turn_idx) is NOT
    unique: the %61 anomaly injects duplicates)."""
    did = "doc_id," if with_doc_id else ""
    return f"""
    SELECT {did}
      'c' || CAST(doc_id % {N_CONVS} AS STRING) AS conv_id,
      CAST(CASE
        WHEN doc_id % 89 = 0 THEN -1
        WHEN doc_id % 61 = 0 THEN (doc_id {div} {N_CONVS}) + 1
        ELSE doc_id {div} {N_CONVS}
      END AS INT) AS turn_idx,
      CASE
        WHEN doc_id % 53 = 0 THEN 'robot'
        WHEN doc_id % 4 = 0 THEN 'user'
        WHEN doc_id % 4 = 1 THEN 'assistant'
        WHEN doc_id % 4 = 2 THEN 'system'
        ELSE 'tool'
      END AS role,
      CASE
        WHEN doc_id % 71 = 0 THEN NULL
        WHEN doc_id % 79 = 0 THEN '{_SOUP}'
        WHEN doc_id % 73 = 0 THEN '{_SHORT}'
        ELSE text
          || CASE WHEN doc_id % 31 = 0 THEN '{_PII1}' ELSE '' END
          || CASE WHEN doc_id % 37 = 0 THEN '{_PII2}' ELSE '' END
          || CASE WHEN doc_id % 41 = 0 THEN '{_TOX}' ELSE '' END
      END AS text,
      CASE
        WHEN doc_id % 43 = 0 THEN 'hammer'
        WHEN doc_id % 4 = 3 THEN 'search'
        ELSE NULL
      END AS tool,
      CASE WHEN doc_id % 101 = 0 THEN NULL
           ELSE 1700000000 + doc_id END AS ts_epoch
    FROM documents
    """


def spark_sql() -> str:
    """Spark SQL derivation (expects a temp view `documents`)."""
    return _sql("div")


def duckdb_sql(with_doc_id: bool = False) -> str:
    """DuckDB derivation of the SAME rows (documents view pre-registered)."""
    return _sql("//", with_doc_id)


def load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read documents parquet → derived transcript DataFrame (with real ts).

    Column pruning note: the derivation touches only (doc_id, text), so the
    Parquet scan reads exactly those two columns (verified via .explain
    ReadSchema in tests/test_plans.py).
    """
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    t = spark.sql(spark_sql())
    return t.withColumn(
        "ts", F.timestamp_seconds(F.col("ts_epoch"))
    ).drop("ts_epoch")
