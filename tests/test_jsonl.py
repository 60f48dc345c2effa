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
    v = jsonl.validate_json_records(raw, "raw", spec=jsonl.EXTENDED_SPEC,
                                    required_field="role",
                                    required_value="user")
    seen = {x for r in v.select("violations").collect()
            for x in r["violations"]}
    assert seen == {"malformed", "unknown_field", "type_mismatch",
                    "enum_mismatch", "missing_field", "field_mismatch"}


# --- full type-dispatch matrix (reference dynamic-message/src/lib.rs:22-247,
#     mismatch tests dynamic_message_tests.rs:50-73,130-152) ---

SPEC = jsonl.EXTENDED_SPEC


def _viol(spark, payload, **kw):
    kw.setdefault("spec", SPEC)
    return _validate(spark, [json.dumps(payload)], **kw)[0]["violations"]


def test_double_arm(spark):
    assert _viol(spark, {"score": "high"}) == ["type_mismatch"]
    assert _viol(spark, {"score": 1.5}) == []
    assert _viol(spark, {"score": 3}) == []        # int populates double
    assert _viol(spark, {"score": True}) == ["type_mismatch"]


def test_bool_arm(spark):
    assert _viol(spark, {"flag": "yes"}) == ["type_mismatch"]
    assert _viol(spark, {"flag": 1}) == ["type_mismatch"]
    assert _viol(spark, {"flag": False}) == []


def test_int_range_arm(spark):
    # u32-style range check (lib.rs:74-86): value outside i32 fails
    assert _viol(spark, {"turn_idx": 3000000000}) == ["type_mismatch"]
    assert _viol(spark, {"turn_idx": 2147483647}) == []
    assert _viol(spark, {"ts_epoch": 3000000000}) == []  # long is fine


def test_string_arm_rejects_non_string_json(spark):
    assert _viol(spark, {"conv_id": 7}) == ["type_mismatch"]
    assert _viol(spark, {"conv_id": {"a": 1}}) == ["type_mismatch"]
    assert _viol(spark, {"conv_id": "c7"}) == []


def test_bytes_arm(spark):
    assert _viol(spark, {"blob": "TURJ"}) == []          # valid base64
    assert _viol(spark, {"blob": "!!!"}) == ["type_mismatch"]
    assert _viol(spark, {"blob": 5}) == ["type_mismatch"]


def test_enum_arm(spark):
    assert _viol(spark, {"kind": "chat"}) == []
    assert _viol(spark, {"kind": "alien"}) == ["enum_mismatch"]
    assert _viol(spark, {"kind": 2}) == ["enum_mismatch"]


def test_bytes_raw_arm_matches_reference(spark):
    """lib.rs:167-190: Kind::Bytes accepts ANY JSON string (raw UTF-8
    bytes), no base64 requirement — unlike the proto3-canonical `bytes`."""
    assert _viol(spark, {"braw": "!!! not base64 at all"}) == []
    assert _viol(spark, {"braw": "TURJ"}) == []
    assert _viol(spark, {"braw": 7}) == ["type_mismatch"]
    assert _viol(spark, {"braw": True}) == ["type_mismatch"]


def test_u64_arm(spark):
    """lib.rs:107-128: Uint64/Fixed64 — integer-written values in
    [0, 2^64); [2^63, 2^64) must validate (the long type cannot hold it)."""
    assert _viol(spark, {"big": 5}) == []
    assert _viol(spark, {"big": 9223372036854775807}) == []      # i64 max
    assert _viol(spark, {"big": 9223372036854775808}) == []      # > i64
    assert _viol(spark, {"big": 18446744073709551615}) == []     # u64 max
    assert _viol(spark, {"big": 18446744073709551616}) \
        == ["type_mismatch"]                                     # overflow
    assert _viol(spark, {"big": -3}) == ["type_mismatch"]
    assert _viol(spark, {"big": 1.5}) == ["type_mismatch"]
    assert _viol(spark, {"big": "5"}) == ["type_mismatch"]       # string
    assert _viol(spark, {"big": True}) == ["type_mismatch"]


def test_roundtrip_materializes_enum_number_and_bytes(spark):
    """D4 serialization (lib.rs:261-282): the enum NAME resolves to its
    NUMBER (lib.rs:191-221; vocab index here) and raw bytes serialize as
    base64 — the protobuf-JSON canonical forms."""
    import base64

    row = _validate(spark, [json.dumps(
        {"kind": "task", "braw": "héllo", "big": 9223372036854775808})],
        spec=SPEC)[0]
    assert row["valid"]
    rt = json.loads(row["roundtrip"])
    assert rt["kind"] == 1                      # vocab ("chat","task","note")
    assert rt["braw"] == base64.b64encode("héllo".encode()).decode()
    assert int(rt["big"]) == 9223372036854775808


def test_nested_struct_arms(spark):
    assert _viol(spark, {"meta": {"lang": "en", "v": 4}}) == []
    assert _viol(spark, {"meta": 7}) == ["type_mismatch"]
    assert _viol(spark, {"meta": {"lang": 5}}) == ["type_mismatch"]
    assert _viol(spark, {"meta": {"v": "x"}}) == ["type_mismatch"]
    assert _viol(spark, {"meta": {"lang": "en", "bogus": 1}}) \
        == ["unknown_field"]


def test_typed_required_value(spark):
    # D5: the reference's field_check value is any JSON scalar
    v_int = _validate(spark, [json.dumps({"turn_idx": 5}),
                              json.dumps({"turn_idx": 6}),
                              json.dumps({"turn_idx": "5"})],
                      spec=SPEC, required_field="turn_idx",
                      required_value=5)
    assert v_int[0]["valid"]
    assert v_int[1]["violations"] == ["field_mismatch"]
    # string "5" is not the NUMBER 5 — typed equality, not text equality
    assert "field_mismatch" in v_int[2]["violations"]

    v_bool = _validate(spark, [json.dumps({"flag": True}),
                               json.dumps({"flag": False})],
                       spec=SPEC, required_field="flag",
                       required_value=True)
    assert v_bool[0]["valid"]
    assert v_bool[1]["violations"] == ["field_mismatch"]


def test_jsonl_file_source_roundtrip(spark, tmp_path):
    """File source (one line ≙ one /validate request body): write valid
    records with write_jsonl, read back through the full D1-D6 chain,
    recover the typed transcript."""
    rows = [("c1", 0, "user", "hello", None, 1700000000),
            ("c1", 1, "assistant", "hi there", None, 1700000001),
            ("c2", 0, "tool", "result", "search", 1700000002)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts_epoch long")
    p = str(tmp_path / "jsonl")
    jsonl.write_jsonl(df, p)
    v = jsonl.read_jsonl(spark, p)
    assert v.filter("valid").count() == 3
    t = jsonl.to_transcript(v)
    got = {(r["conv_id"], r["turn_idx"], r["role"]) for r in t.collect()}
    assert got == {("c1", 0, "user"), ("c1", 1, "assistant"),
                   ("c2", 0, "tool")}


def test_jsonl_file_source_flags_bad_lines(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.jsonl").write_text(
        '{"conv_id":"c1","turn_idx":0}\n'
        '{"conv_id":"c2","turn_idx":"x"}\n'
        '{broken\n')
    v = jsonl.read_jsonl(spark, str(p)).collect()
    by = {r["raw"][:12]: r["violations"] for r in v}
    assert by['{"conv_id":"'] in ([], ["type_mismatch"])
    flat = sorted(x for r in v for x in r["violations"])
    assert flat == ["malformed", "type_mismatch"]
