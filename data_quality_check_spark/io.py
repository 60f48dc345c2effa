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

import hashlib
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
    fail_before_commit: int | None = None,
    measure_latency: bool = False,
    max_records_per_file: int | None = None,
    models_on_survivors: bool = False,
) -> JobReport:
    """Run (or resume) the labeling job over `input_path`.

    Output layout:
      output_dir/turns/chunk=<id>/   labeled + scrubbed turns (parquet)
      output_dir/metrics/chunk=<id>/ per-partition lineage + metrics rows
      output_dir/_manifest/<id>.json committed-chunk manifest (atomic)

    Exactly-once across EVERY crash window: the chunk_id is derived from
    the chunk's sorted input-file list, so a crash BETWEEN the parquet
    writes and the manifest commit leaves an orphan directory that the
    re-run overwrites (same id, mode=overwrite) — and read_output()/
    read_metrics() read only manifest-committed chunk dirs anyway, so an
    orphan is never visible to readers even before the re-run.

    `fail_after_chunks` / `fail_before_commit` are test-only fault
    injection: raise after N chunk commits, or after the Nth chunk's data
    writes but BEFORE its manifest commit, to exercise both resume windows.
    """
    files = list_input_files(spark, input_path)
    done = processed_files(output_dir)
    todo = [f for f in files if f not in done]
    if with_models and bc_models is None and todo:
        from .functions.udfs import broadcast_models
        bc_models = broadcast_models(spark)

    chunks = [todo[i:i + files_per_chunk]
              for i in range(0, len(todo), files_per_chunk)]
    ran = 0
    processed: list[str] = []
    for chunk in chunks:
        chunk_id = hashlib.sha256("\n".join(chunk).encode()).hexdigest()[:16]
        df = spark.read.parquet(*chunk)
        timed = measure_latency and with_models
        labeled = pipeline.label_turns(
            df, cfg, with_models=with_models, bc_models=bc_models,
            measure_latency=timed,
            models_on_survivors=models_on_survivors)
        persisted = None
        if timed:
            # Persist across the three consumers (latency, turns, metrics):
            # without it the latency write triggers a SEPARATE scoring pass
            # whose batch_us values would not correspond to the run that
            # produced the committed output.
            persisted = labeled.persist()
            labeled = persisted
            # D10 duration histogram: per-chunk scoring-latency percentiles
            # (metrics.rs:22-25 analog) written next to the metrics table
            from .operators import latency as lat

            lat_rows = lat.percentiles(
                labeled.select(F.spark_partition_id().alias("partition_id"),
                               "batch_us"),
                "batch_us", ("partition_id",))
            lat_rows.write.mode("overwrite").parquet(
                os.path.join(output_dir, "latency", f"chunk={chunk_id}"))
            labeled = labeled.drop("batch_us")
        out = pipeline.stable_order(labeled, output_partitions)
        w = out.write.mode("overwrite")
        if max_records_per_file:
            # compaction control: output_partitions bounds file count from
            # below (parallelism), maxRecordsPerFile from above (no
            # gigantic files for downstream range readers)
            w = w.option("maxRecordsPerFile", str(max_records_per_file))
        w.parquet(
            os.path.join(output_dir, "turns", f"chunk={chunk_id}"))
        metrics = pipeline.metrics_table(
            labeled, cfg, with_models=with_models)
        metrics.write.mode("overwrite").parquet(
            os.path.join(output_dir, "metrics", f"chunk={chunk_id}"))
        if persisted is not None:
            persisted.unpersist()
        if fail_before_commit is not None and ran + 1 >= fail_before_commit:
            raise RuntimeError(
                f"injected failure before manifest commit of chunk {ran + 1}")
        _commit_manifest(output_dir, {
            "chunk_id": chunk_id,
            "input_files": chunk,
            "ruleset_version": cfg.version,
            # latency/chunk=<id>/ exists only for timed chunks; readers
            # filter on this so a mixed-flags output dir stays readable
            "has_latency": timed,
        })
        ran += 1
        processed.extend(chunk)
        if fail_after_chunks is not None and ran >= fail_after_chunks:
            raise RuntimeError(f"injected failure after {ran} chunks")
    return JobReport(chunks_run=ran,
                     chunks_skipped=len(files) - len(todo),
                     files_processed=processed)


def run_job_iceberg(
    spark: SparkSession,
    input_table: str,
    output_table: str,
    metrics_table: str,
    cfg: RuleSet = DEFAULT_RULESET,
    *,
    with_models: bool = True,
    bc_models=None,
    output_partitions: int | None = None,
    checkpoint_table: str | None = None,
) -> None:
    """Cluster path: Iceberg catalog tables end-to-end.

    Requires iceberg-spark-runtime on the cluster classpath (not available
    in this sandbox — the parquet+manifest twin run_job() above executes the
    IDENTICAL labeling plan and carries the tests; this function only swaps
    the IO endpoints, per SURVEY §7 "Iceberg absence locally").

    Resume model: the processed high-water mark is the input table's
    snapshot id, recorded in `checkpoint_table` (conv-free control table
    `(input_table string, snapshot_id long, ruleset_version string)`).
    On restart, only rows appended after that snapshot are read via
    Iceberg's incremental scan (`start-snapshot-id`) — the catalog-native
    equivalent of the local file manifest.
    """
    last_snapshot = None
    if checkpoint_table is not None:
        try:
            row = (spark.read.table(checkpoint_table)
                   .filter(F.col("input_table") == input_table)
                   .agg(F.max("snapshot_id")).first())
            last_snapshot = row[0] if row else None
        except Exception:
            last_snapshot = None  # first run: control table absent

    current = (spark.sql(
        f"SELECT snapshot_id FROM {input_table}.snapshots "
        f"ORDER BY committed_at DESC LIMIT 1").first() or [None])[0]
    if last_snapshot is not None:
        if current == last_snapshot:
            return
        df = (spark.read.format("iceberg")
              .option("start-snapshot-id", str(last_snapshot))
              .option("end-snapshot-id", str(current))
              .table(input_table))
    else:
        df = spark.read.table(input_table)

    labeled = pipeline.label_turns(
        df, cfg, with_models=with_models, bc_models=bc_models)
    out = pipeline.stable_order(labeled, output_partitions)
    out.writeTo(output_table).append()
    pipeline.metrics_table(labeled, cfg, with_models=with_models) \
        .writeTo(metrics_table).append()
    if checkpoint_table is not None and current is not None:
        spark.createDataFrame(
            [(input_table, current, cfg.version)],
            "input_table string, snapshot_id long, ruleset_version string",
        ).writeTo(checkpoint_table).append()


def _read_committed(spark: SparkSession, output_dir: str,
                    sub: str) -> DataFrame:
    """Read ONLY manifest-committed chunk directories — orphan dirs from a
    crash between data write and manifest commit are invisible (the
    snapshot-isolation read path; Iceberg gives this for free)."""
    ids = [e["chunk_id"] for e in read_manifest(output_dir)]
    base = os.path.join(output_dir, sub)
    if not ids:
        raise FileNotFoundError(f"no committed chunks under {output_dir}")
    paths = [os.path.join(base, f"chunk={i}") for i in ids]
    return spark.read.option("basePath", base).parquet(*paths)


def read_output(spark: SparkSession, output_dir: str) -> DataFrame:
    return _read_committed(spark, output_dir, "turns")


def read_metrics(spark: SparkSession, output_dir: str) -> DataFrame:
    return _read_committed(spark, output_dir, "metrics")


def read_latency(spark: SparkSession, output_dir: str) -> DataFrame:
    """Latency percentiles for the chunks that HAVE them: latency/ is
    written only when measure_latency AND with_models were set for a
    chunk, so a mixed run (resume with different flags, CLI without
    --measure-latency) must not make the reader fail on missing paths.
    Manifest entries record `has_latency`; pre-flag manifests fall back
    to a directory-existence probe."""
    entries = read_manifest(output_dir)
    base = os.path.join(output_dir, "latency")
    ids = [
        e["chunk_id"] for e in entries
        if e.get("has_latency",
                 os.path.isdir(os.path.join(base, f"chunk={e['chunk_id']}")))
    ]
    if not ids:
        raise FileNotFoundError(
            f"no committed chunks with latency data under {output_dir} "
            "(run with measure_latency=True)")
    paths = [os.path.join(base, f"chunk={i}") for i in ids]
    return spark.read.option("basePath", base).parquet(*paths)


# ---------------------------------------------------------------------------
# shared index-persistence plumbing (minhash_save/ivf_save use these)
# ---------------------------------------------------------------------------

def index_table_name(prefix: str, path: str) -> str:
    """Catalog table name for a bucketed index saved at `path`: a short
    sanitized path tail for readability + an md5 tail for UNIQUENESS —
    a suffix-only derivation lets two different paths share a name, and
    saveAsTable(mode='overwrite') would then silently repoint the first
    index at the second's files."""
    import hashlib
    import re

    tail = re.sub(r"\W+", "_", path).strip("_")[-24:]
    return f"{prefix}_{tail}_{hashlib.md5(path.encode()).hexdigest()[:12]}"


def write_index_meta(spark: SparkSession, path: str, row: tuple,
                     schema: str) -> None:
    """Index metadata as a one-row Spark JSON dataset — written through
    the same storage layer as the index tables, so save/load works
    wherever the data does (s3://, hdfs://, ...)."""
    (spark.createDataFrame([row], schema).coalesce(1)
     .write.mode("overwrite").json(os.path.join(path, "meta")))


def write_index_nonce(spark: SparkSession, path: str) -> str:
    """Crash-atomicity marker for multi-dataset index saves (r4 ADVICE):
    the save protocol is nonce FIRST, data files second, meta (carrying
    the nonce) LAST. A crash anywhere in between leaves the two nonces
    disagreeing, so a load can never silently pair stale metadata (e.g.
    an old bucket spec) with freshly rewritten data files — the failure
    mode of the meta-last-only protocol."""
    import uuid

    nonce = uuid.uuid4().hex
    (spark.createDataFrame([(nonce,)], "nonce string").coalesce(1)
     .write.mode("overwrite").json(os.path.join(path, "nonce")))
    return nonce


def check_index_nonce(spark: SparkSession, path: str,
                      meta_nonce: str | None) -> None:
    """Verify the data-dir nonce matches the one recorded in meta.
    Pre-r5 saves carry neither → skip (nothing to verify). Any mismatch
    means an interrupted save: fail loudly instead of reading data files
    under the wrong metadata."""
    try:
        row = spark.read.schema("nonce string").json(
            os.path.join(path, "nonce")).first()
        dir_nonce = row["nonce"] if row else None
    except Exception:
        dir_nonce = None
    if meta_nonce is None and dir_nonce is None:
        return
    if meta_nonce != dir_nonce:
        raise ValueError(
            f"index at {path} is from an interrupted save "
            f"(meta nonce {meta_nonce!r} != data nonce {dir_nonce!r}) — "
            "re-run the save")


def read_index_meta(spark: SparkSession, path: str, schema: str):
    """Read index metadata; falls back to the legacy driver-local
    meta.json format (pre-r4 saves) with absent fields left NULL."""
    try:
        return spark.read.schema(schema).json(
            os.path.join(path, "meta")).first()
    except Exception:
        with open(os.path.join(path, "meta.json")) as fh:
            legacy = json.load(fh)
        fields = [f.split()[0] for f in schema.split(",")]
        from pyspark.sql import Row
        return Row(**{f: legacy.get(f) for f in fields})


def write_bucketed(df: DataFrame, table: str, buckets: int,
                   key: tuple[str, ...] = ("conv_id",),
                   sort: tuple[str, ...] = ("conv_id", "turn_idx")) -> None:
    """Bucketed managed table: pre-shuffled + pre-sorted on `key`, so
    repeated joins/aggregations on that key run with ZERO exchanges
    (SortMergeJoin directly over bucket files — plan-asserted in
    tests/test_plans.py). The 100 TB pattern for dimension co-location:
    pay the shuffle once at write time, never again per query. Bucket
    count should match the downstream parallelism target (one task per
    bucket per join)."""
    (df.write.bucketBy(buckets, *key).sortBy(*sort)
     .mode("overwrite").format("parquet").saveAsTable(table))
