"""URL/domain curation operators — the standard web-corpus companions to
the quality filter: host extraction, blocklist filtering, per-domain doc
caps, per-domain rollups.

Everything here is narrow JVM expressions plus at most one host-keyed
shuffle, so the operators compose with scans and push through the plan.
Host extraction uses regexp_extract with an explicit ASCII class (the
repo's engine-portable regex subset — identical semantics in Spark, RE2,
DuckDB and Python re; Spark's parse_url(url, 'HOST') would work too but
has no DuckDB twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# scheme://[userinfo@]host[:port]/... → host. Evasion-hardened (review
# r4): userinfo is skipped via a non-capturing group (a URL like
# https://x@spam.example.net would otherwise extract 'x@spam.example.net'
# and slip every blocklist/cap), and matching runs over the LOWERCASED
# url so HTTPS:// schemes and mixed-case hosts fold into one bucket
# (host names are case-insensitive). No match → ''.
HOST_RE = "^[a-z]+://(?:[^/@]*@)?([^/:@]+)"


def host_expr(url_col) -> object:
    """Host of a URL column as a narrow expression ('' when unparseable —
    never NULL, so blocklists and caps treat junk URLs as one bucket)."""
    return F.coalesce(
        F.regexp_extract(F.lower(url_col), HOST_RE, 1), F.lit(""))


def host_sql(url_expr: str) -> str:
    """DuckDB twin of host_expr."""
    return f"coalesce(regexp_extract(lower({url_expr}), '{HOST_RE}', 1), '')"


def with_host(df: DataFrame, url_col: str = "url",
              host_col: str = "host") -> DataFrame:
    return df.withColumn(host_col, host_expr(F.col(url_col)))


def blocklist_filter(df: DataFrame, blocked_hosts: list[str],
                     host_col: str = "host") -> DataFrame:
    """Drop documents whose host is on the blocklist. A literal list
    becomes a broadcast anti-join (blocklists are small — 10^4..10^6
    hosts — and the corpus must never shuffle for one); pass a DataFrame
    of (host) instead for a blocklist too large to broadcast."""
    if isinstance(blocked_hosts, DataFrame):
        bl = blocked_hosts.select(F.col(blocked_hosts.columns[0])
                                  .alias(host_col))
        return df.join(bl, host_col, "left_anti")
    spark = df.sparkSession
    bl = spark.createDataFrame([(h,) for h in blocked_hosts],
                               f"{host_col} string")
    return df.join(F.broadcast(bl), host_col, "left_anti")


def domain_caps(df: DataFrame, max_per_host: int,
                host_col: str = "host",
                id_col: str = "doc_id") -> DataFrame:
    """Per-domain document cap (anti-spam / diversity): keep at most
    `max_per_host` docs per host — deterministically the smallest ids, so
    the kept set is reproducible across runs and engines.

    One host-keyed shuffle — and Catalyst inserts a PARTIAL
    WindowGroupLimit before it (verified via .explain: each map task
    keeps only its local top-max_per_host rows per host pre-shuffle), so
    a hot domain never even ships its full row set, let alone sorts it
    in one partition; the residual reduce-side sort is over ≤
    max_per_host · n_map_tasks rows per host."""
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(id_col)
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= max_per_host).drop("_rk"))


def domain_stats(df: DataFrame, host_col: str = "host",
                 text_col: str = "text") -> DataFrame:
    """Per-domain rollup (the audit view the caps/blocklists are tuned
    from): docs and total chars per host. Map-side combinable."""
    return (df.groupBy(host_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.coalesce(F.length(text_col), F.lit(0)))
                 .cast("long").alias("n_chars")))


def domain_caps_sql(source_sql: str, max_per_host: int,
                    blocked_hosts: list[str] | None = None,
                    url_expr: str = "url") -> str:
    """DuckDB twin of with_host → blocklist_filter → domain_caps over any
    (doc_id, ..., url) source."""
    where = ""
    if blocked_hosts:
        quoted = ", ".join("'" + h.replace("'", "''") + "'"
                           for h in blocked_hosts)
        where = f"WHERE host NOT IN ({quoted})"
    return f"""
WITH src AS ({source_sql}),
h AS (SELECT doc_id, {host_sql(url_expr)} AS host FROM src),
b AS (SELECT * FROM h {where}),
r AS (SELECT doc_id, host,
        row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rk
      FROM b)
SELECT doc_id, host FROM r WHERE rk <= {max_per_host}
"""


def domain_stats_sql(source_sql: str, url_expr: str = "url") -> str:
    """DuckDB twin of with_host → domain_stats."""
    return f"""
WITH src AS ({source_sql})
SELECT {host_sql(url_expr)} AS host,
  count(*) AS n_docs,
  CAST(sum(coalesce(length(text), 0)) AS BIGINT) AS n_chars
FROM src GROUP BY 1
"""
