"""Capture .explain("formatted") for gate queries into plans/r06/.

Usage: python BENCH/capture_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name tail)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = "/root/repo/plans/r06"


def main() -> None:
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    suffix = sys.argv[1]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dqcs-capture-plans")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    qs = {**entry.queries(), **entry.extra_queries()}
    for name in sys.argv[2:]:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"{OUT_DIR}/{name}_{suffix}.txt", "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
