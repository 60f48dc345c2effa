"""Raw-JSON validation tests, mirroring the reference's validator cases
(/root/reference/dynamic-message/tests/dynamic_message_tests.rs): valid
record, type mismatch, unknown field, defaults/missing tolerated — plus the
double-encoding path and the base64 descriptor decode."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_quality_check_spark.sources import jsonl

VALID = json.dumps({"conv_id": "c1", "turn_idx": 3, "role": "user",
                    "text": "hello there", "tool": None,
                    "ts_epoch": 1700000000})


def _validate(spark, payloads, **kw):
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)],
                               "i int, raw string")
    out = jsonl.validate_json_records(df, "raw", **kw).collect()
    return {r["i"]: r for r in out}


def test_valid_record(spark):
    r = _validate(spark, [VALID])[0]
    assert r["valid"] and r["violations"] == []
    assert (r["conv_id"], r["turn_idx"], r["role"]) == ("c1", 3, "user")
    assert json.loads(r["roundtrip"])["turn_idx"] == 3  # D4 round trip


def test_malformed_and_non_object(spark):
    rows = _validate(spark, ["{broken", "[1,2,3]", '"just a string"', "42"])
    for i in range(4):
        assert rows[i]["violations"] == ["malformed"], (i, rows[i])


def test_unknown_field_rejected(spark):
    # the reference's strictest rule (lib.rs:249-251)
    bad = json.dumps({"conv_id": "c", "turn_idx": 1, "extra_key": True})
    r = _validate(spark, [bad])[0]
    assert r["violations"] == ["unknown_field"]


def test_missing_fields_tolerated(spark):
    # iteration is over present keys only (lib.rs:18-19)
    r = _validate(spark, [json.dumps({"conv_id": "c"})])[0]
    assert r["valid"]
    assert r["turn_idx"] is None


def test_type_mismatch(spark):
    bad = json.dumps({"conv_id": "c", "turn_idx": "not an int"})
    r = _validate(spark, [bad])[0]
    assert "type_mismatch" in r["violations"]
    # JSON null is tolerated (like a missing field)
    ok = json.dumps({"conv_id": "c", "turn_idx": None})
    assert _validate(spark, [ok])[0]["valid"]


def test_double_encoded(spark):
    escaped = json.dumps(VALID)  # encode the JSON text as a JSON string
    r = _validate(spark, [escaped])[0]
    assert r["valid"]
    assert r["conv_id"] == "c1"
    # with json_escaped=False the same payload is a non-object → malformed
    r2 = _validate(spark, [escaped], json_escaped=False)[0]
    assert r2["violations"] == ["malformed"]


def test_field_check(spark):
    missing = json.dumps({"conv_id": "c"})
    wrong = json.dumps({"conv_id": "c", "role": "assistant"})
    right = json.dumps({"conv_id": "c", "role": "user"})
    rows = _validate(spark, [missing, wrong, right],
                     required_field="role", required_value="user")
    assert rows[0]["violations"] == ["missing_field"]
    assert rows[1]["violations"] == ["field_mismatch"]
    assert rows[2]["valid"]


def test_to_transcript(spark):
    df = spark.createDataFrame([(VALID,)], "raw string")
    v = jsonl.validate_json_records(df, "raw")
    t = jsonl.to_transcript(v).collect()
    assert len(t) == 1
    assert t[0]["ts"] is not None


def test_base64_decode(spark):
    import base64

    good = base64.b64encode(b"descriptor bytes").decode()
    df = spark.createDataFrame([(good,), ("!!!not-base64$$",)], "p string")
    rows = df.select(
        jsonl.decode_descriptor_payload(F.col("p")).alias("d")).collect()
    assert bytes(rows[0]["d"]) == b"descriptor bytes"
    assert rows[1]["d"] is None


def test_fixture_covers_all_reasons(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("documents")
    raw = spark.sql(jsonl.fixture_sql("spark"))
    v = jsonl.validate_json_records(raw, "raw", required_field="role",
                                    required_value="user")
    seen = {x for r in v.select("violations").collect()
            for x in r["violations"]}
    assert seen == {"malformed", "unknown_field", "type_mismatch",
                    "missing_field", "field_mismatch"}
