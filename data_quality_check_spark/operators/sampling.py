"""Deterministic hash sampling / dataset splitting for training pipelines.

Sampling at 100 TB must be (a) reproducible across runs and engines —
never rand()-seeded per task, whose draw order depends on partitioning —
and (b) stable under appends: a row's fate depends only on its own key. Both come from hashing the key with md5 (identical bytes in Spark,
DuckDB, and Python) and comparing a fixed-width HEX PREFIX against
thresholds computed from the requested fractions. No shuffle at all:
every decision is a per-row narrow expression, so the sample/split
composes with scans and pushes through the whole plan.

Resolution: 4 hex digits = 65,536 buckets (fraction granularity 1/65536,
plenty for split weights; widen HEX_DIGITS for finer ratios).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HEX_DIGITS = 4
_SPACE = 16 ** HEX_DIGITS


def _key_hex(key: Column) -> Column:
    """First HEX_DIGITS chars of md5(key as string) — the row's uniform
    draw in [0, 1) as a lexicographically ordered hex string."""
    return F.substring(F.md5(key.cast("string")), 1, HEX_DIGITS)


def _bucket(frac: float) -> int:
    """Integer bucket threshold in [0, _SPACE]. _SPACE means "keep all":
    it CANNOT be rendered as a HEX_DIGITS-wide hex string (format() yields
    the 5-char '10000', which sorts BELOW most 4-char draws — 'ffff' >
    '10000' lexicographically — so a frac≈1.0 threshold would silently
    keep only the '0...' prefix bucket, ~6%). Callers must short-circuit
    bucket >= _SPACE to an always-true arm and bucket <= 0 to always-false
    instead of comparing hex strings."""
    return min(_SPACE, max(0, round(frac * _SPACE)))


def _thresh_hex(bucket: int) -> str:
    assert 0 < bucket < _SPACE, "render only comparable thresholds"
    return format(bucket, f"0{HEX_DIGITS}x")


def key_hex_sql(key_expr: str) -> str:
    """DuckDB twin of _key_hex."""
    return f"substr(md5(CAST({key_expr} AS VARCHAR)), 1, {HEX_DIGITS})"


def sample_fraction(df: DataFrame, key_col: str, frac: float) -> DataFrame:
    """Keep ≈frac of rows, deterministically by key. A row is kept iff its
    hex draw < thresh — the same rows every run, every engine, every
    partitioning. frac >= 1 - 1/(2·_SPACE) keeps everything (see _bucket:
    the full-space threshold has no comparable hex rendering)."""
    b = _bucket(frac)
    if b >= _SPACE:
        return df
    if b <= 0:
        return df.filter(F.lit(False))
    return df.filter(_key_hex(F.col(key_col)) < F.lit(_thresh_hex(b)))


def split_column(key_col: str, weights: dict[str, float]) -> Column:
    """Label each row with its split name by cumulative hex thresholds —
    e.g. {'train': .8, 'val': .1, 'test': .1} → train/val/test assignment
    that is stable under appends and identical across engines. Weights
    must sum to 1 (the last split absorbs rounding)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    names = list(weights)
    h = _key_hex(F.col(key_col))
    expr = F.lit(names[-1])
    cum = 0.0
    arms = []
    for name in names[:-1]:
        cum += weights[name]
        arms.append((name, _bucket(cum)))
    for name, b in reversed(arms):
        # cumulative bucket at/above the full space absorbs every row
        # (hex rendering of _SPACE is uncomparable — see _bucket); at/below
        # zero it matches nothing
        if b >= _SPACE:
            cond = F.lit(True)
        elif b <= 0:
            cond = F.lit(False)
        else:
            cond = h < F.lit(_thresh_hex(b))
        expr = F.when(cond, F.lit(name)).otherwise(expr)
    return expr


def split_column_sql(key_expr: str, weights: dict[str, float]) -> str:
    """DuckDB twin of split_column, generated from the same weights (same
    bucket short-circuits, same arm order — the engines cannot drift)."""
    names = list(weights)
    h = key_hex_sql(key_expr)
    cum = 0.0
    arms = []
    for name in names[:-1]:
        cum += weights[name]
        b = _bucket(cum)
        if b >= _SPACE:
            cond = "TRUE"
        elif b <= 0:
            cond = "FALSE"
        else:
            cond = f"{h} < '{_thresh_hex(b)}'"
        arms.append(f"WHEN {cond} THEN '{name}'")
    return "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END"
