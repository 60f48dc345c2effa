"""Local replica of the driver's DuckDB correctness gate at sf0.001.

Every oracle-backed entry in __spark_entry__.queries() must hash-match its
oracle_sql() twin; rows-only entries must at least produce stable rows."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
import gate_harness as gh

SF = "/root/testdata/sf0.001"

# driver-window gates + the consolidated extras: the local sweep grades
# ALL of them, the driver grades the first 50 of queries()
_QUERIES = {**entry.queries(), **entry.extra_queries()}
_ORACLES = {**entry.oracle_sql(), **entry.extra_oracle_sql()}


def test_driver_window_holds():
    """The driver grades exactly the first 50 registry entries (r4
    verdict #1): queries() must never exceed 50 or a gate silently
    escapes the oracle."""
    q = entry.queries()
    assert len(q) <= 50, f"{len(q)} driver gates > 50-entry window"
    # and every driver gate must carry an oracle twin
    assert set(q) == set(entry.oracle_sql())


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_backed(spark, name):
    r = gh.compare(name, spark, SF, _QUERIES, _ORACLES, verbose=False)
    assert r["match"], r
    # non-vacuity invariant (VERDICT r01): a green cell must prove
    # something — fixtures are scheduled so every oracle returns rows
    assert r["rows"] > 0, f"{name} oracled but 0 rows — vacuous gate"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only(spark, name):
    df = _QUERIES[name](spark, SF)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"conv_id", "turn_idx", "keep", "text_scrubbed"} <= set(df.columns)
