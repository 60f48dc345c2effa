"""Distributed n-gram LM estimation tests: counts vs hand computation,
conditional probabilities, short-doc and min_count edges."""

from __future__ import annotations

from data_quality_check_spark.operators import ngrams


def test_ngram_counts_hand_computed(spark):
    rows = [(1, "a b a b c"), (2, "A b x"), (3, "solo"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["ngram"]: r["n_occurrences"] for r in
           ngrams.ngram_counts(df, n=2).collect()}
    # doc1: 'a b','b a','a b','b c'; doc2 (lowercased): 'a b','b x'
    assert got == {"a b": 3, "b a": 1, "b c": 1, "b x": 1}
    # min_count prunes the tail
    got2 = {r["ngram"] for r in
            ngrams.ngram_counts(df, n=2, min_count=2).collect()}
    assert got2 == {"a b"}


def test_bigram_model_probabilities(spark):
    rows = [(1, "the cat sat"), (2, "the cat ran"), (3, "the dog sat")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["w1"], r["w2"]): (r["n_pair"], r["p_u"]) for r in
           ngrams.bigram_model(df).collect()}
    # context 'the' appears 3x: cat 2/3, dog 1/3
    assert got[("the", "cat")] == (2, 666666)
    assert got[("the", "dog")] == (1, 333333)
    assert got[("cat", "sat")] == (1, 500000)
    # per-context probabilities sum to ~1e6
    from collections import defaultdict
    sums = defaultdict(int)
    for (w1, _), (_, p) in got.items():
        sums[w1] += p
    assert all(999990 <= s <= 1000000 for s in sums.values())


def test_ngram_counts_short_and_null_docs(spark):
    rows = [(1, "one"), (2, ""), (3, None), (4, "  ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert ngrams.ngram_counts(df, n=2).count() == 0
    assert ngrams.bigram_model(df).count() == 0


def test_ngrams_duckdb_parity_fuzz(spark):
    """Random texts through both engines for ngram_counts and
    bigram_model — split/slice/probability parity."""
    import random

    import duckdb

    rng = random.Random(41)
    vocab = "the a cat dog sat ran fast slow very much so and or".split()
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 12))))
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)

    got = sorted(tuple(r) for r in ngrams.ngram_counts(df, n=3).collect())
    want = sorted(tuple(r) for r in
                  con.execute(ngrams.ngram_counts_sql(n=3)).fetchall())
    assert got == want and got

    got_b = sorted(tuple(r) for r in ngrams.bigram_model(df).collect())
    want_b = sorted(tuple(r) for r in
                    con.execute(ngrams.bigram_model_sql()).fetchall())
    assert got_b == want_b and got_b
