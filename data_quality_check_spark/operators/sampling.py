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


def _thresh_hex(frac: float) -> str:
    return format(min(_SPACE, max(0, round(frac * _SPACE))),
                  f"0{HEX_DIGITS}x")


def key_hex_sql(key_expr: str) -> str:
    """DuckDB twin of _key_hex."""
    return f"substr(md5(CAST({key_expr} AS VARCHAR)), 1, {HEX_DIGITS})"


def sample_fraction(df: DataFrame, key_col: str, frac: float) -> DataFrame:
    """Keep ≈frac of rows, deterministically by key. A row is kept iff its
    hex draw < thresh — the same rows every run, every engine, every
    partitioning."""
    return df.filter(_key_hex(F.col(key_col)) < F.lit(_thresh_hex(frac)))


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
        arms.append((name, _thresh_hex(cum)))
    for name, thresh in reversed(arms):
        expr = F.when(h < F.lit(thresh), F.lit(name)).otherwise(expr)
    return expr


def split_column_sql(key_expr: str, weights: dict[str, float]) -> str:
    """DuckDB twin of split_column, generated from the same weights."""
    names = list(weights)
    h = key_hex_sql(key_expr)
    cum = 0.0
    arms = []
    for name in names[:-1]:
        cum += weights[name]
        arms.append(f"WHEN {h} < '{_thresh_hex(cum)}' THEN '{name}'")
    return "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END"
