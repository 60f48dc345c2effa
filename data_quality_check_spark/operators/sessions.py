"""Gap-based sessionization over an event stream (batch form).

The standard conversation/activity segmentation operator: events of one
user separated by more than `gap_s` seconds start a new session. Built
from two window functions (lag → new-session flag, running sum → session
index) and one aggregate — all JVM-side, one shuffle keyed on user_id.

Scale notes (100 TB): the shuffle key is the user — high cardinality, but
a single pathological user (a bot with 10^8 events) serializes into one
partition's sort. The standard mitigations are (a) pre-bounding sessions
by a coarse time unit ((user, day) composite key, then merging sessions
that span midnight) or (b) letting AQE's skew-join handling split the
sort — both change nothing in this operator's semantics, so the simple
form is kept and the caveat documented. Event-time ties break on
event_id so the session index is deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, gap_s: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """One row per (user, session): 0-based session_idx, event count,
    start/end epoch seconds, µ-scaled value sum."""
    te = F.unix_timestamp(F.col(ts_col)).cast("long")
    w = Window.partitionBy(user_col).orderBy(te, F.col(id_col))
    new_s = F.when(
        F.lag(te).over(w).isNull() | ((te - F.lag(te).over(w)) > gap_s),
        F.lit(1)).otherwise(F.lit(0))
    run = (Window.partitionBy(user_col).orderBy(te, F.col(id_col))
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sess = (
        events.filter(F.col(ts_col).isNotNull())
        .withColumn("_te", te)
        .withColumn("_new", new_s)
        .withColumn("session_idx",
                    (F.sum("_new").over(run) - 1).cast("int"))
    )
    return (
        sess.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_te").alias("start_epoch"),
            F.max("_te").alias("end_epoch"),
            F.sum(F.floor(F.col("value") * 1000).cast("long"))
            .cast("long").alias("sum_value_k"),
        )
    )


def sessionize_sql(gap_s: int = 1800) -> str:
    """DuckDB twin over the `events` view, generated from the same gap."""
    return f"""
WITH o AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS te, value
  FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT *, CASE WHEN lag(te) OVER w IS NULL
                   OR te - lag(te) OVER w > {gap_s}
            THEN 1 ELSE 0 END AS new_s
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY te, event_id)
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY te, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM flagged
)
SELECT user_id, CAST(sess - 1 AS INT) AS session_idx,
  count(*) AS n_events,
  CAST(min(te) AS BIGINT) AS start_epoch,
  CAST(max(te) AS BIGINT) AS end_epoch,
  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_k
FROM s GROUP BY 1, 2
"""
