"""Resumable batch IO: snapshot-manifest checkpointing over Parquet/Iceberg.

The reference's config-producer keeps an mtime map of processed .proto files
and only re-processes changed ones
(/root/reference/config-producer-proto/src/main.rs:200-246 — the mtime
HashMap at 258-289 is exactly checkpoint state). The batch engine
generalizes that into snapshot-style checkpointing:

  * input is a set of Parquet files (locally) or an Iceberg table's snapshot
    file list (on a cluster);
  * work is committed in CHUNKS of input files: each chunk runs as one Spark
    job writing its labeled output + its per-partition lineage/metrics rows,
    then a manifest entry for the chunk is published ATOMICALLY (temp file +
    os.replace — the local stand-in for an Iceberg snapshot commit);
  * on restart, committed chunks are skipped by reading the manifest — so a
    killed job resumes with no duplicated and no missing (conv_id, turn_idx)
    rows (tests/test_resume.py).

At 100 TB scale the chunk is the unit of fault recovery ABOVE Spark's own
task retry: a lost executor re-runs tasks (spark.task.maxFailures), a lost
driver re-runs only un-committed chunks.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import DEFAULT_RULESET, RuleSet
from .plans import pipeline

MANIFEST_DIR = "_manifest"


def normalize_file_uri(p: str) -> str:
    """Canonical plain path: Spark emits file:/ (input_file_name) and
    file:/// (_metadata.file_path) for the same local file."""
    for prefix in ("file:///", "file:/"):
        if p.startswith(prefix):
            return "/" + p[len(prefix):].lstrip("/")
    return p


def list_input_files(spark: SparkSession, input_path: str) -> list[str]:
    """Deterministic sorted list of the input's parquet part files."""
    df = spark.read.parquet(input_path)
    return sorted(normalize_file_uri(r[0]) for r in df.select(
        F.input_file_name()).distinct().collect())


def _manifest_path(output_dir: str) -> str:
    return os.path.join(output_dir, MANIFEST_DIR)


def read_manifest(output_dir: str) -> list[dict]:
    """Committed chunk entries, ordered by commit sequence."""
    mdir = _manifest_path(output_dir)
    if not os.path.isdir(mdir):
        return []
    entries = []
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as fh:
                entries.append(json.load(fh))
    return entries


def processed_files(output_dir: str) -> set[str]:
    return {f for e in read_manifest(output_dir) for f in e["input_files"]}


def _commit_manifest(output_dir: str, entry: dict) -> None:
    """Atomic snapshot publish: write-temp + rename (Iceberg-commit analog)."""
    mdir = _manifest_path(output_dir)
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"{entry['chunk_id']}.json")
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(entry, fh)
    os.replace(tmp, final)


@dataclass
class JobReport:
    chunks_run: int
    chunks_skipped: int
    files_processed: list[str]


def run_job(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    cfg: RuleSet = DEFAULT_RULESET,
    *,
    with_models: bool = True,
    bc_models=None,
    files_per_chunk: int = 16,
    output_partitions: int | None = None,
    fail_after_chunks: int | None = None,
) -> JobReport:
    """Run (or resume) the labeling job over `input_path`.

    Output layout:
      output_dir/turns/chunk=<id>/   labeled + scrubbed turns (parquet)
      output_dir/metrics/chunk=<id>/ per-partition lineage + metrics rows
      output_dir/_manifest/<id>.json committed-chunk manifest (atomic)

    `fail_after_chunks` is test-only fault injection: raise after N chunk
    commits to exercise resume.
    """
    files = list_input_files(spark, input_path)
    done = processed_files(output_dir)
    todo = [f for f in files if f not in done]
    seq0 = len(read_manifest(output_dir))
    if with_models and bc_models is None and todo:
        from .functions.udfs import broadcast_models
        bc_models = broadcast_models(spark)

    chunks = [todo[i:i + files_per_chunk]
              for i in range(0, len(todo), files_per_chunk)]
    ran = 0
    processed: list[str] = []
    for k, chunk in enumerate(chunks):
        chunk_id = f"{seq0 + k:06d}-{uuid.uuid4().hex[:8]}"
        df = spark.read.parquet(*chunk)
        labeled = pipeline.label_turns(
            df, cfg, with_models=with_models, bc_models=bc_models)
        out = pipeline.stable_order(labeled, output_partitions)
        out.write.mode("overwrite").parquet(
            os.path.join(output_dir, "turns", f"chunk={chunk_id}"))
        metrics = pipeline.metrics_table(
            labeled, cfg, with_models=with_models)
        metrics.write.mode("overwrite").parquet(
            os.path.join(output_dir, "metrics", f"chunk={chunk_id}"))
        _commit_manifest(output_dir, {
            "chunk_id": chunk_id,
            "input_files": chunk,
            "ruleset_version": cfg.version,
        })
        ran += 1
        processed.extend(chunk)
        if fail_after_chunks is not None and ran >= fail_after_chunks:
            raise RuntimeError(f"injected failure after {ran} chunks")
    return JobReport(chunks_run=ran,
                     chunks_skipped=len(files) - len(todo),
                     files_processed=processed)


def read_output(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, "turns"))


def read_metrics(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, "metrics"))
