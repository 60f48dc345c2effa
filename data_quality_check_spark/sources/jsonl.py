"""Raw-JSON ingest + schema validation: the reference's core operator family
re-expressed over columns of JSON strings.

Maps, operator by operator (SURVEY §2.1):
  D1 JSON parse / well-formedness  (json_validation.rs:36-40)
     → try-parse via from_json null-check → reason 'malformed'
  D2 JSON unescape (double-encoded) (json_validation.rs:151-163)
     → when(starts/ends with '"', from_json(col, 'string'))
  D3 schema conformance + UNKNOWN-FIELD REJECTION (dynamic-message/src/
     lib.rs:11-258, unknown key check at 249-251)
     → from_json(col, schema) type dispatch + json_object_keys ⊆ schema set
  D4 round-trip serialization (lib.rs:261-282)
     → to_json(struct) — defaults materialized by the struct itself
  D5 field presence + equality   (json_validation.rs:165-194)
     → require_field() predicate with distinct missing/mismatch reasons
  D6 orchestration               (json_validation.rs:17-149)
     → validate_json_records(): ONE narrow select chain

All native expressions — the whole validation is a single Spark stage.
Type-mismatch semantics follow the reference: a field whose JSON type cannot
populate the declared type fails the record (Spark: from_json in PERMISSIVE
mode nulls the field while the raw key remains — detected by comparing
parsed-null vs raw-key-present).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from ..schema import TRANSCRIPT_SCHEMA

# JSON-carried transcript fields (ts arrives as epoch seconds, like the
# parquet fixture derivation)
JSON_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts_epoch", T.LongType()),
])

_FIELDS = tuple(f.name for f in JSON_SCHEMA.fields)
# fields whose declared type a JSON string value cannot populate
_NON_STRING_FIELDS = ("turn_idx", "ts_epoch")


def unescape(col: Column) -> Column:
    """D2: if the payload is a double-encoded JSON string ("{\"a\":1}"),
    decode one level; otherwise pass through (json_validation.rs:151-163).

    from_json only takes struct/array/map schemas, so the scalar string is
    decoded by wrapping it into a one-field object first."""
    looks_escaped = col.startswith('"') & col.endswith('"')
    wrapped = F.concat(F.lit('{"v":'), col, F.lit("}"))
    inner = F.from_json(wrapped, "v string").getField("v")
    return F.when(looks_escaped & inner.isNotNull(), inner).otherwise(col)


def validate_json_records(
    df: DataFrame,
    json_col: str = "raw",
    *,
    json_escaped: bool = True,
    required_field: str | None = None,
    required_value: str | None = None,
) -> DataFrame:
    """D6: parse → conformance-check → round-trip each JSON record.

    Adds columns: `valid` (bool), `violations` (array<string> in canonical
    order: malformed, not_object, unknown_field, type_mismatch,
    missing_field, field_mismatch), `roundtrip` (canonical JSON, D4),
    plus the parsed transcript columns.
    """
    raw = F.col(json_col)
    src = unescape(raw) if json_escaped else raw

    parsed = F.from_json(src, JSON_SCHEMA)  # PERMISSIVE: bad fields → null
    # D1: well-formedness + top-level-must-be-object (lib.rs:253-255).
    # from_json returns non-null struct only for valid JSON objects; a JSON
    # array/scalar or garbage yields null.
    obj_keys = F.json_object_keys(src)
    is_object = obj_keys.isNotNull()
    malformed = src.isNull() | ~is_object

    # D3a: unknown-field rejection (lib.rs:249-251) — any key outside the
    # schema fails the record
    unknown = F.exists(obj_keys, lambda k: ~k.isin(*_FIELDS))

    # D3b: type dispatch — a present key whose parsed value is null means the
    # JSON type could not populate the declared type (lib.rs:22-221 arms).
    # JSON null literals are tolerated like the reference tolerates missing
    # fields (get_json_object returns null for JSON null).
    def _mismatch(name: str) -> Column:
        key_present = F.arrays_overlap(obj_keys, F.array(F.lit(name)))
        raw_val = F.get_json_object(src, f"$.{name}")
        return key_present & raw_val.isNotNull() & parsed[name].isNull()

    type_mismatch = F.lit(False)
    for name in _NON_STRING_FIELDS:
        type_mismatch = type_mismatch | _mismatch(name)

    flags = [
        ("malformed", malformed),
        ("unknown_field", ~malformed & unknown),
        ("type_mismatch", ~malformed & type_mismatch),
    ]
    # D5: optional field presence + equality with distinct reasons
    # (json_validation.rs:173-183 mismatch, 184-188 missing)
    if required_field is not None:
        present = ~malformed & F.arrays_overlap(
            obj_keys, F.array(F.lit(required_field)))
        value = F.get_json_object(src, f"$.{required_field}")
        flags.append(("missing_field", ~malformed & ~present))
        if required_value is not None:
            flags.append((
                "field_mismatch",
                present & ~value.eqNullSafe(F.lit(required_value)),
            ))

    violations = F.filter(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in flags]),
        lambda x: x.isNotNull(),
    )
    valid = F.size(violations) == 0
    # D4: round-trip — canonical serialization of the populated record
    roundtrip = F.when(valid, F.to_json(parsed))

    out = df.withColumn("violations", violations)
    out = out.withColumn("valid", valid)
    out = out.withColumn("roundtrip", roundtrip)
    for name in _FIELDS:
        out = out.withColumn(name, F.when(~malformed, parsed[name]))
    return out


def to_transcript(validated: DataFrame) -> DataFrame:
    """Valid records → typed transcript table (ts from epoch seconds)."""
    return (
        validated.filter("valid")
        .select(
            "conv_id", "turn_idx", "role", "text", "tool",
            F.timestamp_seconds(F.col("ts_epoch")).alias("ts"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic raw-JSON fixture (gate twin of sources/transcripts.py)
# ---------------------------------------------------------------------------

def fixture_sql(dialect: str) -> str:
    """SELECT doc_id, raw — JSON records derived from `documents` by doc_id
    arithmetic, with injected anomalies covering every validation reason
    (the JSON analog of the reference fixture
    /root/reference/data/input/test/example.json):

      %11 → malformed (closing brace dropped)   %13 → unknown key "bogus"
      %17 → turn_idx as string (type mismatch)  %19 → double-encoded payload
      %23 → role key missing

    Built with plain string concatenation so Spark SQL and DuckDB produce
    byte-identical records. `dialect` ∈ {'spark', 'duckdb'}.
    """
    if dialect == "spark":
        cast, esc = "STRING", r"'\\\"'"
    else:
        cast, esc = "VARCHAR", "'\\\"'"
    did = f"CAST(doc_id AS {cast})"
    role = ("CASE WHEN doc_id % 4 = 0 THEN 'user' "
            "WHEN doc_id % 4 = 1 THEN 'assistant' "
            "WHEN doc_id % 4 = 2 THEN 'system' ELSE 'tool' END")
    j0 = (
        f"'{{\"conv_id\":\"c' || CAST(doc_id % 7 AS {cast}) || '\",' || "
        f"'\"turn_idx\":' || CASE WHEN doc_id % 17 = 0 THEN '\"x9\"' "
        f"ELSE {did} END || ',' || "
        f"CASE WHEN doc_id % 23 = 0 THEN '' "
        f"ELSE '\"role\":\"' || {role} || '\",' END || "
        f"'\"text\":\"t' || {did} || '\",' || "
        f"CASE WHEN doc_id % 13 = 0 THEN '\"bogus\":1,' ELSE '' END || "
        f"'\"ts_epoch\":' || CAST(1700000000 + doc_id AS {cast}) || '}}'"
    )
    return f"""
    SELECT doc_id,
      CASE
        WHEN doc_id % 11 = 0 THEN substr(j0, 1, length(j0) - 1)
        WHEN doc_id % 19 = 0 THEN '"' || replace(j0, '"', {esc}) || '"'
        ELSE j0
      END AS raw
    FROM (SELECT doc_id, {j0} AS j0 FROM documents)
    """


def validation_oracle_sql(required_field: str = "role",
                          required_value: str = "user") -> str:
    """DuckDB twin of validate_json_records() over fixture_sql('duckdb')."""
    fields = ", ".join(f"'{f}'" for f in _FIELDS)
    # `safe` shields json_type/json_extract from malformed payloads (DuckDB
    # evaluates CASE branches vectorized, so guards alone don't protect)
    unescape = """
      CASE WHEN raw LIKE '"%"' AND json_valid(raw)
                AND json_type(safe::JSON) = 'VARCHAR'
           THEN json_extract_string(safe, '$')
      ELSE raw END"""
    mismatch = " OR ".join(
        f"(list_contains(json_keys(s), '{f}')"
        f" AND json_type(s, '$.{f}') IS NOT NULL"
        f" AND json_type(s, '$.{f}') NOT IN ('UBIGINT', 'BIGINT', 'NULL'))"
        for f in _NON_STRING_FIELDS
    )
    # DuckDB's vectorized CASE evaluates both branches, so malformed rows
    # must be replaced by '{}' BEFORE any json_keys/json_type call
    return f"""
WITH fixture AS ({fixture_sql('duckdb')}),
fx AS (SELECT doc_id, raw,
       CASE WHEN json_valid(raw) THEN raw ELSE '""' END AS safe
       FROM fixture),
un AS (SELECT doc_id, {unescape} AS s FROM fx),
flagged AS (
  SELECT doc_id,
    pre_malformed OR json_type(s::JSON) <> 'OBJECT' AS malformed,
    CASE WHEN NOT pre_malformed AND json_type(s::JSON) = 'OBJECT'
         THEN s ELSE '{{}}' END AS s
  FROM (SELECT doc_id, CASE WHEN json_valid(s) THEN s ELSE '{{}}' END AS s,
               NOT json_valid(s) AS pre_malformed FROM un)
),
reasons AS (
  SELECT doc_id,
    list_filter([
      CASE WHEN malformed THEN 'malformed' END,
      CASE WHEN NOT malformed AND len(list_filter(json_keys(s),
        k -> k NOT IN ({fields}))) > 0 THEN 'unknown_field' END,
      CASE WHEN NOT malformed AND ({mismatch}) THEN 'type_mismatch' END,
      CASE WHEN NOT malformed AND NOT list_contains(json_keys(s),
        '{required_field}') THEN 'missing_field' END,
      CASE WHEN NOT malformed AND list_contains(json_keys(s),
        '{required_field}') AND (json_extract_string(s,
        '$.{required_field}') IS DISTINCT FROM '{required_value}')
        THEN 'field_mismatch' END
    ], x -> x IS NOT NULL) AS violations
  FROM flagged
)
SELECT doc_id,
  coalesce(list_aggregate(violations, 'string_agg', ','), '') AS violations,
  len(violations) = 0 AS valid
FROM reasons
"""


def decode_descriptor_payload(col: Column) -> Column:
    """D8: base64 payload decode (handlers.rs:55-65) — config payloads
    arrive base64-encoded; invalid base64 → null (caller rejects)."""
    return F.try_to_binary(col, F.lit("base64"))
