"""spark-submit entry shim: ship the package via --py-files, run the CLI.

Cluster deployment (the north rule's form — spark-submit cannot take -m,
it needs a script file, which is this shim):

    zip -r dqcs.zip data_quality_check_spark
    spark-submit --py-files dqcs.zip submit.py \
        --input  s3://bucket/transcripts \
        --output s3://bucket/labeled \
        --files-per-chunk 64 --output-partitions 4096

Run twice at N and 4N executors over the same input to measure scaling
efficiency (BENCH/BASELINE.md records the local[N] twin of that
experiment).
"""

import sys

from data_quality_check_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
