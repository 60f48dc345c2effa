"""Property-based tri-engine parity: random adversarial texts must scrub and
featurize identically in Python (oracle), DuckDB, and Spark.

The reference has no property tests (SURVEY §5.1); we add them because byte
equality across three regex/string engines is exactly the kind of contract
random inputs break. Alphabet is constrained to the classes the engines
treat identically (no astral plane, no \\x00): ASCII + Latin-1 letters,
digits, whitespace, punctuation, PII-ish fragments.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from data_quality_check_spark import oracle
from data_quality_check_spark.functions import rules, scrub

ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n\r.-_@:/#()[]{}<>!?,;'+*•…éüßàçñöø"
)

FRAGMENTS = st.sampled_from([
    "bob@example.com", "https://x.io/p?q=1", "10.0.0.1", "123-45-6789",
    "555-123-4567", "4111-1111-1111-1111", "frakk", "...", "- item",
    '"quoted"', "a@b", "http://", "999.1.2.3", "@@", "\n\n", "  ",
])

TEXTS = st.lists(
    st.one_of(st.text(alphabet=ALPHABET, max_size=40), FRAGMENTS),
    max_size=8,
).map(" ".join)

FEATS = ("n_chars", "n_words", "n_lines", "mean_word_len", "max_word_len",
         "symbol_ratio", "stopword_frac", "alpha_frac", "dup_line_frac",
         "bullet_frac", "ellipsis_frac")


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@given(TEXTS)
@settings(max_examples=300, deadline=None)
def test_scrub_python_vs_duckdb(duck, text):
    got = duck.execute(
        f"SELECT {scrub.scrub_sql('t')} FROM (SELECT ? AS t)", [text]
    ).fetchone()[0]
    assert got == scrub.scrub_py(text)


@given(TEXTS)
@settings(max_examples=300, deadline=None)
def test_features_python_vs_duckdb(duck, text):
    fsql = rules.feature_sql()
    row = duck.execute(
        "SELECT " + ", ".join(f"{fsql[k]}" for k in FEATS)
        + " FROM (SELECT ? AS text)", [text]
    ).fetchone()
    exp = oracle.features(text)
    for k, got in zip(FEATS, row):
        assert got == pytest.approx(exp[k], abs=1e-12), (k, text)


def _random_texts(n: int, seed: int = 7) -> list[str]:
    import random

    rnd = random.Random(seed)
    frags = FRAGMENTS.elements if hasattr(FRAGMENTS, "elements") else None
    pool = ["bob@example.com", "https://x.io/p?q=1", "10.0.0.1",
            "123-45-6789", "555-123-4567", "4111-1111-1111-1111", "frakk",
            "...", "- item", '"quoted"', "a@b", "http://", "999.1.2.3",
            "@@", "\n\n", "  "]
    out = []
    for _ in range(n):
        parts = []
        for _ in range(rnd.randint(0, 8)):
            if rnd.random() < 0.4:
                parts.append(rnd.choice(pool))
            else:
                parts.append("".join(rnd.choice(ALPHABET)
                                     for _ in range(rnd.randint(0, 40))))
        out.append(" ".join(parts))
    return out


def test_scrub_and_features_spark_batch(spark):
    """One Spark round-trip over a batch of seeded random texts (a Spark
    session per hypothesis example would be too slow)."""
    texts = _random_texts(120)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string")
    f = rules.feature_columns(F.col("text"))
    rows = df.select(
        "i", scrub.scrub_column(F.col("text")).alias("s"),
        *[f[k].alias(k) for k in FEATS]).collect()
    for r in rows:
        t = texts[r["i"]]
        assert r["s"] == scrub.scrub_py(t), repr(t)
        exp = oracle.features(t)
        for k in FEATS:
            assert r[k] == pytest.approx(exp[k], abs=1e-12), (k, repr(t))
