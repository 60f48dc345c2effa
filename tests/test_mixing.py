"""Corpus-mixing tests: realized budgets, determinism, degenerate edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_check_spark.operators import mixing


def _src(spark, n, tok):
    return spark.createDataFrame([(i, tok) for i in range(n)],
                                 "doc_id long, n_tokens long")


def test_sample_to_budget_hits_budget_approximately(spark):
    df = _src(spark, 2000, 10)           # 20k tokens total
    kept = mixing.sample_to_budget(df, budget=5000)
    got = kept.agg(F.sum("n_tokens")).collect()[0][0]
    # md5 draws are uniform: expect 5000 ± a generous band
    assert 3500 <= got <= 6500


def test_sample_to_budget_deterministic_and_partition_stable(spark):
    df = _src(spark, 500, 7)
    a = {r["doc_id"] for r in mixing.sample_to_budget(df, 1000).collect()}
    b = {r["doc_id"] for r in
         mixing.sample_to_budget(df.repartition(13), 1000).collect()}
    assert a == b and a


def test_budget_edges(spark):
    df = _src(spark, 100, 5)             # 500 tokens
    # budget >= total keeps everything
    assert mixing.sample_to_budget(df, 500).count() == 100
    assert mixing.sample_to_budget(df, 10**9).count() == 100
    # zero budget keeps nothing
    assert mixing.sample_to_budget(df, 0).count() == 0
    # zero-token source keeps everything (costs nothing)
    z = _src(spark, 10, 0)
    assert mixing.sample_to_budget(z, 100).count() == 10


def test_mix_corpora_tags_sources(spark):
    mixed = mixing.mix_corpora({
        "a": (_src(spark, 300, 10), 1000),
        "b": (_src(spark, 50, 10), 10**9),
    })
    counts = {r["source"]: r["count"] for r in
              mixed.groupBy("source").count().collect()}
    assert counts["b"] == 50
    assert 0 < counts["a"] < 300


def test_mixing_duckdb_parity_fuzz(spark):
    """Random token tables and budgets through both engines — totals,
    floor thresholds and hex compares must agree."""
    import random

    import duckdb

    rng = random.Random(47)
    for trial in range(5):
        rows = [(i, rng.randint(0, 50)) for i in range(rng.randint(1, 200))]
        budget = rng.choice([0, 10, sum(t for _, t in rows) // 3,
                             sum(t for _, t in rows) * 2])
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        got = sorted(r["doc_id"] for r in
                     mixing.sample_to_budget(df, budget).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE t (doc_id BIGINT, n_tokens BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(r[0] for r in con.execute(
            mixing.sample_to_budget_sql("SELECT * FROM t", budget)
        ).fetchall())
        con.close()
        assert got == want, (trial, budget)
