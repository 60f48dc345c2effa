"""Benchmark harness (driver contract): one JSON line with per-query seconds.

Headline metric: end-to-end turns/sec of the FULL quality-filter pipeline
(langid + perplexity + heuristics + scrub, stable ordering, parquet write)
over a replicated ~1M-turn transcript table derived from the sf documents —
the local stand-in for the north rule's 10^12-turn Iceberg job. The
replicated input is materialized ONCE under /tmp and reused, so runs at
different parallelism levels (BENCH/scaling.py: local[8] vs local[32])
measure the same bytes.

Env:
  SPARK_GRAFT_SF_DIR   input dir      (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N]       (default 32)
  BENCH_TURNS          target turn count for the replicated table (default 1e6)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TARGET_TURNS = int(float(os.environ.get("BENCH_TURNS", "1000000")))
REPS = int(os.environ.get("BENCH_REPS", "3"))


def build_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"dqcs-bench-{CPUS}")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def replicated_input(spark) -> tuple[str, int]:
    """Materialize (once) a ~TARGET_TURNS-turn transcript parquet table by
    replicating the sf-derived transcripts with distinct conv_ids."""
    from pyspark.sql import functions as F

    from data_quality_check_spark.sources import transcripts

    sf_tag = os.path.basename(SF_DIR.rstrip("/"))
    path = f"/tmp/dqcs_bench/{sf_tag}_turns{TARGET_TURNS}"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        t = transcripts.load(spark, SF_DIR)
        base_n = t.count()
        reps = max(1, TARGET_TURNS // base_n)
        big = (
            t.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
            .withColumn("conv_id", F.concat_ws("_", "conv_id", "rep"))
            .drop("rep")
            .repartition(max(CPUS, 32))
        )
        big.write.mode("overwrite").parquet(path)
    return path, spark.read.parquet(path).count()


def bench_pipeline_e2e(spark, in_path: str, reps: int = REPS) -> float:
    """read parquet → full label (models+rules+scrub) → stable order → write.

    One untimed warmup (codegen compile, Python-worker spawn, page cache)
    then best-of-`reps` — this box shows heavy host-side steal (identical
    runs measured 12-29s across one afternoon, BENCH/runs_log.md), so a
    single cold measurement can be 5x off steady state; best-of-3 is the
    variance floor we can afford per round."""
    from data_quality_check_spark.functions.udfs import broadcast_models
    from data_quality_check_spark.plans import pipeline

    bc = broadcast_models(spark)
    out_path = f"/tmp/dqcs_bench/out_{CPUS}"

    def run():
        df = spark.read.parquet(in_path)
        lab = pipeline.label_turns(df, with_models=True, bc_models=bc)
        out = pipeline.stable_order(lab, max(CPUS, 32))
        out.write.mode("overwrite").parquet(out_path)

    run()  # warmup, untimed
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return best


def gate_queries(spark) -> dict[str, float]:
    """Per-query wall seconds for the driver-contract queries at SF_DIR."""
    import __spark_entry__ as entry

    times: dict[str, float] = {}
    # driver gates + consolidated extras: keeps per-query timing cells
    # comparable across rounds even as gates move out of the 50-window
    qs = {**entry.queries(), **entry.extra_queries()}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # fault isolation: one bad query must not
            # cost the whole per-round bench record
            print(f"bench: query {name} FAILED: {e}", file=sys.stderr)
            times[name] = -1.0
    return times


def main() -> None:
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    in_path, n_turns = replicated_input(spark)
    e2e = bench_pipeline_e2e(spark, in_path)
    queries = ({} if os.environ.get("BENCH_SKIP_QUERIES")
               else gate_queries(spark))
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": ("e2e sec, full qf pipeline (langid+ppl+rules+scrub+"
                   "stable-order+write) over replicated transcripts"),
        "value": round(e2e, 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / e2e, 1),
        "cpus": CPUS,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
