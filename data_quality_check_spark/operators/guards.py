"""Shared skew-guard plumbing for rank-cap operators.

The repo's hot-key discipline (CLAUDE.md) rests on Catalyst's PARTIAL
WindowGroupLimit: a `row_number() <= cap` filter gets a map-side
pre-trim ONLY while cap <= spark.sql.optimizer.windowGroupLimitThreshold
(default 1000). Above it, the optimization silently disappears and every
hot key ships (and sorts) its whole population in one partition — the
exact failure mode the caps exist to avoid. Operators that accept a
user-supplied cap call warn_window_cap() so an override past the
threshold is loud (r4 ADVICE)."""

from __future__ import annotations

import warnings

WINDOW_GROUP_LIMIT_THRESHOLD = 1000


def warn_window_cap(param: str, value: int,
                    threshold: int = WINDOW_GROUP_LIMIT_THRESHOLD) -> None:
    if value > threshold:
        warnings.warn(
            f"{param}={value} exceeds Spark's "
            f"windowGroupLimitThreshold ({threshold}): the map-side "
            "partial WindowGroupLimit will NOT fire, so each hot key "
            "ships its full population to one partition's sort — raise "
            "spark.sql.optimizer.windowGroupLimitThreshold to match, or "
            f"keep {param} <= {threshold}",
            stacklevel=3)
