"""Tri-engine scrub parity: Spark regexp_replace chain, DuckDB chain, and
Python re chain must agree BYTE-FOR-BYTE on adversarial inputs.

This is the hard invariant from the north rule ("scrubbed text byte-for-byte")
— the analog of the reference's round-trip serialization check
(/root/reference/dynamic-message/src/lib.rs:261-282: a record is valid iff
it survives the full encode→decode cycle unchanged).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from data_quality_check_spark.functions import scrub

CASES = [
    "plain text with nothing sensitive at all",
    "reach me at alice.smith+work@sub.example.co.uk today",
    "two mails a@b.io and c.d@e-f.org in one line",
    "site https://example.com/path?q=1&r=2#frag plus http://x.y/z",
    "server at 192.168.0.1 and 10.0.0.255 responded",
    "card 4111 1111 1111 1111 or 4111-1111-1111-1111 charged",
    "ssn 123-45-6789 on file",
    "call 555-123-4567 or (555) 123-4567 or +1 555.123.4567",
    "mixed: bob@x.com at 10.1.2.3 via https://t.co/abc 123-45-6789",
    "unicode héllo wörld émail: müller@straße.de stays partial",
    "astral mixed@x.com 😀 10.0.0.1 𝔘𝔫𝔦",
    "",
    "edge@case.c",  # TLD too short for the email pattern → untouched
    "999.999.999.999 matches the (deliberately loose) ipv4 pattern",
    "nested https://a.b/c?d=e@f.g — url wins over the email inside it",
    "line one\nbob@x.com\nline three",
    "you frakk and FRAKK and Frakk",  # toxic term, case-insensitive
]


@pytest.fixture(scope="module")
def spark_scrubbed(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)],
                               "i int, text string")
    rows = (df.select("i", scrub.scrub_column(F.col("text")).alias("s"))
            .collect())
    return {r["i"]: r["s"] for r in rows}


def test_python_vs_spark(spark_scrubbed):
    for i, t in enumerate(CASES):
        assert spark_scrubbed[i] == scrub.scrub_py(t), f"case {i}: {t!r}"


def test_python_vs_duckdb():
    con = duckdb.connect()
    expr = scrub.scrub_sql("t")
    for i, t in enumerate(CASES):
        got = con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [t]).fetchone()[0]
        assert got == scrub.scrub_py(t), f"case {i}: {t!r}"


def test_scrub_none_passthrough():
    assert scrub.scrub_py(None) is None


def test_replacement_tokens_present():
    s = scrub.scrub_py("bob@x.com 10.1.2.3 https://t.co 123-45-6789 "
                       "call 555-123-4567 card 4111-1111-1111-1111 frakk")
    for tok in ("<EMAIL>", "<IP>", "<URL>", "<SSN>", "<PHONE>", "<CC>",
                "<TOXIC>"):
        assert tok in s, s


def test_order_url_before_ip():
    # the host of a URL must not be half-scrubbed into <IP>
    s = scrub.scrub_py("see https://10.0.0.1/admin now 10.0.0.2")
    assert s == "see <URL> now <IP>"
