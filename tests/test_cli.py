"""CLI smoke test: the spark-submit batch entry end-to-end in-process."""

from __future__ import annotations

import json


def test_cli_runs_and_resumes(spark, tmp_path, capsys):
    from data_quality_check_spark import cli

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    rows = [("c1", i, "user", f"turn {i} with plain ordinary words", None,
             None) for i in range(30)]
    (spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
     .repartition(3).write.parquet(src))

    # build_session getOrCreate() reuses the test session — fine for smoke
    rc = cli.main(["--input", src, "--output", out, "--no-models",
                   "--files-per-chunk", "2"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["output_turns"] == 30
    assert rep["chunks_run"] == 2

    rc = cli.main(["--input", src, "--output", out, "--no-models"])
    assert rc == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["chunks_run"] == 0
    assert rep2["chunks_skipped"] == 3
    assert rep2["output_turns"] == 30
