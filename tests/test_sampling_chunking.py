"""Deterministic sampling/splitting and context-window chunking."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_quality_check_spark.operators import sampling, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_sample_fraction_matches_python_md5(spark, docs):
    """Every kept/dropped decision is recomputable in pure Python — the
    engine-independence property that makes the sample reproducible."""
    kept = {r["doc_id"] for r in
            sampling.sample_fraction(docs, "doc_id", 0.25)
            .select("doc_id").collect()}
    all_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    thresh = format(round(0.25 * 65536), "04x")
    expect = {i for i in all_ids
              if hashlib.md5(str(i).encode()).hexdigest()[:4] < thresh}
    assert kept == expect
    assert 0.15 < len(kept) / len(all_ids) < 0.35  # ≈ frac at n=500


def test_sample_is_stable_under_partitioning(spark, docs):
    a = {r["doc_id"] for r in
         sampling.sample_fraction(docs, "doc_id", 0.5).collect()}
    b = {r["doc_id"] for r in
         sampling.sample_fraction(docs.repartition(13), "doc_id", 0.5)
         .collect()}
    assert a == b


def test_split_column_partitions_exactly(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    rows = docs.select(
        "doc_id", sampling.split_column("doc_id", w).alias("split")
    ).collect()
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) <= set(w)
    assert sum(counts.values()) == len(rows)  # total partition, no nulls
    assert counts["train"] > counts.get("val", 0)
    # splits are disjoint by construction (single CASE) — and a second run
    # assigns identically
    again = docs.select(
        "doc_id", sampling.split_column("doc_id", w).alias("split")
    ).collect()
    assert {(r["doc_id"], r["split"]) for r in rows} == \
           {(r["doc_id"], r["split"]) for r in again}


def test_split_weights_must_sum_to_one():
    with pytest.raises(ValueError):
        sampling.split_column("k", {"a": 0.5, "b": 0.3})


def test_sample_fraction_boundary_keeps_everything(spark, docs):
    """frac at/near 1.0 must keep ALL rows. The threshold bucket 65536
    renders as the 5-char hex '10000', which sorts BELOW most 4-char
    draws — before the short-circuit this silently kept ~6% of rows."""
    n = docs.count()
    assert sampling.sample_fraction(docs, "doc_id", 1.0).count() == n
    assert sampling.sample_fraction(docs, "doc_id", 0.9999999).count() == n
    assert sampling.sample_fraction(docs, "doc_id", 0.0).count() == 0


def test_split_column_boundary_first_weight_one(spark, docs):
    """A first split weight of 1.0 (cumulative bucket == full space) must
    absorb every row — the split twin of the frac≈1.0 hazard."""
    w = {"train": 1.0, "unused": 0.0}
    got = docs.select(
        sampling.split_column("doc_id", w).alias("split")).collect()
    assert {r["split"] for r in got} == {"train"}


def test_split_column_sql_twin_boundary(spark, docs):
    """The DuckDB twin takes the SAME short-circuit arms at the boundary
    (all engine twins previously shared the '10000' bug, so parity tests
    could not catch it — this pins the fixed behavior cross-engine)."""
    import duckdb

    for w in ({"a": 1.0, "b": 0.0}, {"a": 0.9999999, "b": 0.0000001},
              {"a": 0.0, "b": 1.0}, {"a": 0.3, "b": 0.7}):
        spark_rows = sorted(
            (r["doc_id"], r["split"]) for r in docs.select(
                "doc_id",
                sampling.split_column("doc_id", w).alias("split")).collect())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{SF}/documents.parquet'")
        duck_rows = sorted(con.execute(
            f"SELECT doc_id, {sampling.split_column_sql('doc_id', w)} "
            f"AS split FROM documents").fetchall())
        con.close()
        assert spark_rows == duck_rows, f"weights {w} diverged"


def test_chunks_reconstruct_document(spark):
    """overlap=0 chunks concatenate back to the whitespace-normalized
    document; every chunk except the last is exactly max_tokens."""
    rows = [(1, " ".join(f"w{i}" for i in range(25))),
            (2, "short doc"),
            (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.chunk_documents(df, max_tokens=10, overlap=0).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [c["n_tokens"] for c in by_doc[1]] == [10, 10, 5]
    joined = " ".join(c["chunk"] for c in by_doc[1])
    assert joined == rows[0][1]
    assert [c["n_tokens"] for c in by_doc[2]] == [2]
    assert 3 not in by_doc  # empty doc → no chunks


def test_chunks_overlap_lookback(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20)))],
        "doc_id long, text string")
    out = sorted(textstats.chunk_documents(df, max_tokens=8, overlap=4)
                 .collect(), key=lambda r: r["chunk_idx"])
    # starts every 4 tokens; consecutive chunks share 4 tokens
    c0, c1 = out[0]["chunk"].split(), out[1]["chunk"].split()
    assert c0[4:] == c1[:4]
    # full coverage: the union of chunks is the token range
    seen = {w for r in out for w in r["chunk"].split()}
    assert seen == {f"w{i}" for i in range(20)}


def test_chunk_param_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textstats.chunk_documents(df, max_tokens=8, overlap=8)


def test_vocab_topk_deterministic_boundary(spark):
    rows = [(1, "a a a b b c c d e f")]  # ties: b/c at 2; d/e/f at 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["token"], r["n"]) for r in
           textstats.vocab_topk(df, k=4).collect()]
    # boundary tie at n=1 broken lexicographically: d wins over e/f
    assert sorted(got) == [("a", 3), ("b", 2), ("c", 2), ("d", 1)]


def test_lang_stats_rollup(spark, docs):
    got = {r["lang"]: r for r in textstats.lang_stats(docs).collect()}
    assert sum(r["n_docs"] for r in got.values()) == docs.count()
    for r in got.values():
        assert r["total_chars"] >= r["n_docs"]  # non-degenerate


def test_sessionize_gap_semantics(spark):
    from datetime import datetime, timedelta

    from data_quality_check_spark.operators import sessions

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 7, t0, 1.0),
        (2, 7, t0 + timedelta(minutes=10), 2.0),   # same session (<=30m)
        (3, 7, t0 + timedelta(minutes=50), 3.0),   # 40m gap → new session
        (4, 8, t0, 5.0),                            # other user independent
        (5, 7, None, 9.0),                          # null ts excluded
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    got = {(r["user_id"], r["session_idx"]):
           (r["n_events"], r["sum_value_k"])
           for r in sessions.sessionize(df, gap_s=1800).collect()}
    assert got == {(7, 0): (2, 3000), (7, 1): (1, 3000), (8, 0): (1, 5000)}


def test_sessionize_boundary_gap_is_same_session(spark):
    from datetime import datetime, timedelta

    from data_quality_check_spark.operators import sessions

    t0 = datetime(2024, 1, 1)
    rows = [(1, 1, t0, 0.0), (2, 1, t0 + timedelta(seconds=1800), 0.0)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    out = sessions.sessionize(df, gap_s=1800).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2  # gap == 1800 merges


def test_sessionize_midnight_spanning_session_merges(spark):
    """The (user, day) pre-bounding must stitch sessions across midnight:
    events at 23:50 and 00:10 next day are ONE session; a multi-day chain
    of within-gap day boundaries collapses into one session too."""
    from datetime import datetime, timedelta

    from data_quality_check_spark.operators import sessions

    t0 = datetime(2024, 1, 1, 23, 50, 0)
    rows = [(1, 1, t0, 1.0),
            (2, 1, t0 + timedelta(minutes=20), 1.0),     # 00:10 day 2
            (3, 1, t0 + timedelta(minutes=40), 1.0)]     # 00:30 day 2
    # user 2: a 3-day chain, each hop 23:59 → 00:01 (2-minute gaps)
    for d in range(3):
        base = datetime(2024, 2, 1 + d, 23, 59, 0)
        rows.append((10 + 2 * d, 2, base, 1.0))
        rows.append((11 + 2 * d, 2, base + timedelta(minutes=2), 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    got = {(r["user_id"], r["session_idx"]): r["n_events"]
           for r in sessions.sessionize(df, gap_s=1800).collect()}
    assert got[(1, 0)] == 3
    # user 2's three midnight hops chain into... days are 24h apart, so
    # hops between days 1→2 exceed the gap: 3 sessions of 2 events
    assert {k: v for k, v in got.items() if k[0] == 2} \
        == {(2, 0): 2, (2, 1): 2, (2, 2): 2}


def test_sessionize_bounded_equals_unbounded(spark):
    """The skew-bounded default must be decision-identical to the simple
    single-window form on a dense multi-day fixture (including a single
    bot user emitting continuously across day boundaries)."""
    from data_quality_check_spark.operators import sessions
    from pyspark.sql import functions as F

    ev = spark.range(5000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000) + (F.col("id") * 613) % 400000
        ).alias("ts"),
        (F.col("id") % 13).cast("double").alias("value"))
    # bot user 99: one event every 600s for 4 days straight — one session
    bot = spark.range(576).select(
        (F.col("id") + 100000).alias("event_id"),
        F.lit(99).alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 600)
        .alias("ts"),
        F.lit(1.0).alias("value"))
    ev = ev.unionByName(bot)
    key = ["user_id", "session_idx"]
    a = {tuple(r[k] for k in key): (r["n_events"], r["start_epoch"],
                                    r["end_epoch"], r["sum_value_k"])
         for r in sessions.sessionize(ev, gap_s=1800).collect()}
    b = {tuple(r[k] for k in key): (r["n_events"], r["start_epoch"],
                                    r["end_epoch"], r["sum_value_k"])
         for r in sessions.sessionize(ev, gap_s=1800,
                                      bounded=False).collect()}
    assert a == b
    assert a[(99, 0)][0] == 576  # the bot's 4-day run is ONE session


def test_sessionize_event_window_partitions_by_user_day(spark):
    """Skew guard (VERDICT r02 #8): the per-EVENT window must shuffle on
    (user, day) — a single bot user never serializes into one sort."""
    import contextlib
    import io as _io

    from data_quality_check_spark.operators import sessions
    from pyspark.sql import functions as F

    ev = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 2).alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 3600)
        .alias("ts"), F.lit(1.0).alias("value"))
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        sessions.sessionize(ev, gap_s=1800).explain("formatted")
    plan = buf.getvalue()
    # the event-grain exchange carries both keys
    import re
    assert re.search(r"hashpartitioning\(user_id#\d+L?, _day#\d+", plan)


def test_profile_table_one_pass_and_exact(spark):
    from data_quality_check_spark.operators import profile

    rows = [(1, "a", None), (2, "a", 5.0), (3, None, 5.0), (4, "b", 7.0)]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    got = {r["column"]: r for r in profile.profile_table(df).collect()}
    assert got["id"]["n"] == 4 and got["id"]["n_null"] == 0
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["v"]["n_distinct"] == 2
    assert got["v"]["min_s"] == "5.0" and got["v"]["max_s"] == "7.0"
    # single aggregation pass: exactly one Aggregate subtree feeds the melt
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        profile.profile_table(df).explain()
    assert buf.getvalue().count("Scan ExistingRDD") <= 1


def test_corpus_drift_detects_mix_shift(spark):
    from data_quality_check_spark.operators import profile

    old = spark.createDataFrame(
        [(i, "en" if i < 80 else "de") for i in range(100)],
        "doc_id long, lang string")
    new = spark.createDataFrame(
        [(i, "en" if i < 50 else "fr") for i in range(100)],
        "doc_id long, lang string")
    got = {r["lang"]: r for r in
           profile.corpus_drift(old, new, "lang").collect()}
    assert got["en"]["share_delta_pm"] == -300      # 80% → 50%
    assert got["de"]["n_new"] == 0                  # vanished value
    assert got["fr"]["n_old"] == 0 and got["fr"]["share_delta_pm"] == 500


def test_stratified_sample_rates_and_subset(spark):
    from data_quality_check_spark.operators import sampling
    from pyspark.sql import functions as F

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en").otherwise("xx").alias("lang"))
    kept = sampling.stratified_sample(
        df, "doc_id", "lang", {"en": 0.5}, default_frac=0.1)
    counts = {r["lang"]: r["n"] for r in
              kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["en"] / 1000 - 0.5) < 0.08
    assert abs(counts["xx"] / 3000 - 0.1) < 0.05
    # monotone subset: raising a stratum's fraction only ADDS rows
    more = sampling.stratified_sample(
        df, "doc_id", "lang", {"en": 0.8}, default_frac=0.1)
    a = {r["doc_id"] for r in kept.collect()}
    b = {r["doc_id"] for r in more.collect()}
    assert a <= b


def test_pack_shards_matches_serial_cumsum(spark):
    from data_quality_check_spark.operators import sampling
    from pyspark.sql import functions as F

    n = 500
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 37 + 1).alias("n_tokens"))
    got = {r["doc_id"]: r["shard_id"] for r in
           sampling.pack_shards(df, budget=100).collect()}
    toks = [(i % 37) + 1 for i in range(n)]
    acc, want = 0, {}
    for i in range(n):
        want[i] = acc // 100
        acc += toks[i]
    assert got == want
    # partitioning invariance: the distributed prefix sum must not depend
    # on the input layout
    got13 = {r["doc_id"]: r["shard_id"] for r in
             sampling.pack_shards(df.repartition(13), budget=100).collect()}
    assert got13 == want
    # shard ids are windows of the token axis: monotone in doc order and
    # bounded by ceil(total/budget) (a straddling doc may leave its next
    # window sparse — inherent to start-window packing, not a bug)
    assert list(got[i] for i in range(n)) == sorted(got[i] for i in range(n))
    assert max(want.values()) <= (sum(toks) - 1) // 100


def test_stratified_sample_sql_twin_boundary_fuzz(spark, docs):
    """Random per-stratum fractions INCLUDING the 0.0/1.0 boundaries
    through both engines — the frac≈1.0 hex-rendering hazard (ADVICE r02)
    must stay short-circuited in every generated arm."""
    import random

    import duckdb

    rng = random.Random(31)
    langs = ["en", "de", "fr", "es", "zh"]
    for trial in range(6):
        fracs = {l: rng.choice([0.0, 1.0, 0.9999999, rng.random()])
                 for l in rng.sample(langs, rng.randint(1, 4))}
        dflt = rng.choice([0.0, 1.0, rng.random()])
        got = sorted(r["doc_id"] for r in sampling.stratified_sample(
            docs, "doc_id", "lang", fracs, dflt).select("doc_id").collect())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{SF}/documents.parquet'")
        want = sorted(r[0] for r in con.execute(
            "SELECT doc_id FROM documents WHERE "
            + sampling.stratified_sample_sql("doc_id", "lang", fracs, dflt)
        ).fetchall())
        con.close()
        assert got == want, (trial, fracs, dflt)


def test_stratified_and_split_sql_quote_escaping(spark):
    """r3 verdict #7: stratum/split names containing a single quote must
    round-trip through the generated DuckDB twins (previously raw
    interpolation would break the SQL — or worse, silently mangle it)."""
    import duckdb

    from pyspark.sql import functions as F

    names = ["o'brien", "plain", "it''s"]
    rows = [(i, names[i % 3]) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    fracs = {"o'brien": 0.7, "it''s": 0.4}
    got = sorted(r["doc_id"] for r in sampling.stratified_sample(
        df, "doc_id", "lang", fracs, 0.2).select("doc_id").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, lang VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(r[0] for r in con.execute(
        "SELECT doc_id FROM t WHERE "
        + sampling.stratified_sample_sql("doc_id", "lang", fracs, 0.2)
    ).fetchall())
    assert got == want

    weights = {"tr'ain": 0.6, "v'al": 0.4}
    got_s = sorted(
        (r["doc_id"], r["s"]) for r in df.select(
            "doc_id",
            sampling.split_column("doc_id", weights).alias("s")).collect())
    want_s = sorted(tuple(r) for r in con.execute(
        f"SELECT doc_id, {sampling.split_column_sql('doc_id', weights)}"
        " AS s FROM t").fetchall())
    con.close()
    assert got_s == want_s


def test_bpe_estimate_calibration(spark, docs):
    """The subword estimate must dominate the whitespace count (every
    word is >= 1 subword; symbols add more) while staying in the
    plausible BPE range, and split long/numeric pieces as specified."""
    t = textstats.token_counts(docs).agg(
        F.sum("n_tokens").alias("w"),
        F.sum("n_tokens_bpe").alias("b")).collect()[0]
    assert t["b"] >= t["w"]
    assert t["b"] <= 3 * t["w"]

    df = spark.createDataFrame(
        [(1, "internationalization 12345678 hello!"), (2, ""), (3, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens_bpe"] for r in
           textstats.token_counts(df).collect()}
    # ceil(20/6)=4 + ceil(8/3)=3 + ceil(5/6)=1 + '!'=1
    assert got[1] == 9
    assert got[2] == 0 and got[3] == 0


def test_pack_shards_join_offsets_path_identical(spark, monkeypatch):
    """The >MAP_OFFSETS_MAX broadcast-join offset path must produce the
    same packing as the literal-map path (forced via the threshold)."""
    toks = [(i, 100 + (i * 37) % 400) for i in range(300)]
    df = spark.createDataFrame(toks, "doc_id long, n_tokens long")
    base = sorted(tuple(r) for r in
                  sampling.pack_shards(df, budget=1000).collect())
    monkeypatch.setattr(sampling, "MAP_OFFSETS_MAX", 0)
    joined = sorted(tuple(r) for r in
                    sampling.pack_shards(df, budget=1000).collect())
    assert base == joined and base
