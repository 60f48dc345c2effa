"""Dual-engine property fuzzing of the JSON type-dispatch matrix.

The Spark arms (from_json PERMISSIVE nulls + VARIANT type inspector) and
the DuckDB arms (json_type allow-lists + TRY_CAST range guards) were
mirrored by hand from probed behavior; this fuzzer guards them against
drift by throwing random JSON values of every type at every declared
field in both engines and requiring IDENTICAL violation strings per
record — the jsonl analog of the scrub/heuristics tri-engine fuzz.
"""

from __future__ import annotations

import json
import random

import duckdb
import pytest

from data_quality_check_spark.sources import jsonl

SPEC = jsonl.EXTENDED_SPEC

# value pool: every JSON type incl. boundary integers; base64-valid and
# -invalid strings; enum members and strangers; nested objects
_VALUES = [
    "plain text", "TURJ", "!!!", "chat", "alien", "", "123",
    0, 1, -1, 5, 2147483647, 2147483648, -2147483649, 3000000000,
    9223372036854775807, 9223372036854775808,        # i64 max / +1
    18446744073709551615, 18446744073709551616,      # u64 max / +1
    1.5, -0.25, 1e3,
    True, False, None,
    {"lang": "en", "v": 3}, {"lang": 5}, {"v": "x"}, {"bogus": 1}, {},
    [1, 2], [],
]
_FIELDS = [f.name for f in SPEC] + ["surprise_key"]


def _random_payload(rng: random.Random) -> str:
    n = rng.randint(0, 5)
    obj = {rng.choice(_FIELDS): rng.choice(_VALUES) for _ in range(n)}
    return json.dumps(obj)


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_type_matrix_parity_fuzz(spark, seed):
    rng = random.Random(seed)
    payloads = [_random_payload(rng) for _ in range(200)]
    # a few structurally broken ones per run
    payloads += ["{broken", "[1]", '"str"', "42", ""]

    rows = [(i, p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "doc_id long, raw string")
    got_spark = {
        r["doc_id"]: ",".join(r["violations"])
        for r in jsonl.validate_json_records(
            df, "raw", spec=SPEC, json_escaped=False,
            required_field="role", required_value="user").collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE payloads (doc_id BIGINT, raw VARCHAR)")
    con.executemany("INSERT INTO payloads VALUES (?, ?)", rows)
    # json_escaped=False on the Spark side ≙ skipping the unescape CTE:
    # feed raw straight through by making the escape branch unreachable
    sql = jsonl.validation_oracle_sql_over(
        "SELECT doc_id, raw FROM payloads", "role", "user", SPEC)
    sql = sql.replace("WHEN raw LIKE '\"%\"' AND json_valid(raw)",
                      "WHEN FALSE AND json_valid(raw)")
    got_duck = {r[0]: r[1] for r in
                con.execute(sql).fetchall()}

    assert set(got_spark) == set(got_duck)
    diffs = {i: (got_spark[i], got_duck[i], payloads[i])
             for i in got_spark if got_spark[i] != got_duck[i]}
    assert not diffs, f"{len(diffs)} parity breaks, first: " \
                      f"{sorted(diffs.items())[:3]}"
