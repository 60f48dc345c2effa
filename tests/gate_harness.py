"""Local replica of the driver's correctness gate.

Runs each __spark_entry__.queries()[name] on Spark and, when an oracle
exists, the matching oracle_sql()[name] on DuckDB over the same parquet
dir; compares row count + order-insensitive value hash with columns sorted
by name (values stringified, rows sorted) — strictly stricter than needed.
"""

from __future__ import annotations

import hashlib

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def spark_result(df):
    rows = [tuple(r) for r in df.collect()]
    return df.columns, rows


def duck_result(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def compare(name, spark, sf_dir, queries, oracles, verbose=True):
    df = queries[name](spark, sf_dir)
    s_cols, s_rows = spark_result(df)
    if name not in oracles:
        n = len(s_rows)
        if verbose:
            print(f"{name:24s} rows-only: {n} rows")
        return {"name": name, "rows": n, "oracle": False, "match": n >= 0}
    con = duck_con(sf_dir)
    d_cols, d_rows = duck_result(con, oracles[name])
    sn, sh = frame_hash(s_cols, s_rows)
    dn, dh = frame_hash(d_cols, d_rows)
    ok = (sorted(s_cols) == sorted(d_cols)) and sn == dn and sh == dh
    if verbose:
        status = "MATCH" if ok else "MISMATCH"
        print(f"{name:24s} {status} spark={sn}/{sh} duck={dn}/{dh}")
        if not ok and sorted(s_cols) != sorted(d_cols):
            print(f"  cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
    return {"name": name, "rows": sn, "oracle": True, "match": ok,
            "spark": (sn, sh), "duck": (dn, dh)}


def diff_rows(name, spark, sf_dir, queries, oracles, limit=5):
    """Print first differing canonical rows for debugging."""
    df = queries[name](spark, sf_dir)
    s_cols, s_rows = spark_result(df)
    con = duck_con(sf_dir)
    d_cols, d_rows = duck_result(con, oracles[name])
    so = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    do = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    s = sorted("\x1f".join(_canon(r[i]) for i in so) for r in s_rows)
    d = sorted("\x1f".join(_canon(r[i]) for i in do) for r in d_rows)
    s_only = sorted(set(s) - set(d))[:limit]
    d_only = sorted(set(d) - set(s))[:limit]
    for x in s_only:
        print("  spark-only:", x.replace("\x1f", " | ")[:300])
    for x in d_only:
        print("  duck-only :", x.replace("\x1f", " | ")[:300])
