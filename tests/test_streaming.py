"""Structured Streaming tests: incremental file source with exactly-once
resume (the C5 config-watcher analog), streaming labels == batch labels,
watermarked dedup, and the stateful conversation aggregator."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from data_quality_check_spark.streaming import stream as dqs


def _rows(i0, n, conv="c1"):
    return [
        (conv, i, ["user", "assistant"][i % 2],
         f"turn number {i} with some ordinary words here", None,
         datetime(2024, 1, 1, tzinfo=timezone.utc))
        for i in range(i0, i0 + n)
    ]


SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp")


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append").parquet(path)


def _run_available(spark, src, out, ckpt):
    df = dqs.read_transcript_stream(spark, src)
    lab = dqs.label_stream(df, with_models=False)
    q = dqs.start_parquet_sink(lab, out, ckpt, available_now=True)
    q.awaitTermination(120)
    q.stop()


def test_stream_matches_batch_and_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, src, _rows(0, 40))
    _run_available(spark, src, out, ckpt)
    got1 = spark.read.parquet(out)
    assert got1.count() == 40

    # resume: only the NEW file is processed (checkpoint = mtime-map analog)
    _write_batch(spark, src, _rows(40, 25))
    _run_available(spark, src, out, ckpt)
    got2 = spark.read.parquet(out).collect()
    assert len(got2) == 65
    keys = [(r["conv_id"], r["turn_idx"]) for r in got2]
    assert len(set(keys)) == 65  # exactly-once: no dup, no missing

    # streaming labels equal the batch pipeline's (dup rule aside)
    from data_quality_check_spark.plans import pipeline
    batch = pipeline.label_turns(
        spark.read.parquet(src), with_models=False, dup_strategy="none"
    ).collect()
    b = {(r["conv_id"], r["turn_idx"]):
         (r["keep"], tuple(r["drop_reasons"]), r["text_scrubbed"])
         for r in batch}
    for r in got2:
        assert b[(r["conv_id"], r["turn_idx"])] == (
            r["keep"], tuple(r["drop_reasons"]), r["text_scrubbed"])


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = _rows(0, 10) + _rows(5, 3)  # turn_idx 5,6,7 duplicated
    _write_batch(spark, src, rows)
    df = dqs.read_transcript_stream(spark, src)
    lab = dqs.label_stream(df, with_models=False, dedup="drop")
    q = dqs.start_parquet_sink(lab, out, ckpt, available_now=True)
    q.awaitTermination(120)
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 10
    assert got.select("conv_id", "turn_idx").distinct().count() == 10


def test_conversation_stats_stateful(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(spark, src, _rows(0, 12, "cA") + _rows(0, 5, "cB"))
    df = dqs.read_transcript_stream(spark, src)
    lab = dqs.label_stream(df, with_models=False)
    stats = dqs.conversation_stats_stream(lab)
    q = (stats.writeStream.format("memory").queryName("conv_stats")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    q.stop()
    rows = {r["conv_id"]: r for r in
            spark.sql("SELECT * FROM conv_stats").collect()}
    assert rows["cA"]["n_turns"] == 12
    assert rows["cA"]["max_turn_idx"] == 11
    assert rows["cB"]["n_turns"] == 5
    assert rows["cA"]["n_kept"] <= 12
