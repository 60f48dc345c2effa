"""URL/domain curation tests: host extraction, blocklist, caps, rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_check_spark.operators import domains


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, url string")


def test_host_extraction_edges(spark):
    rows = [
        (1, "a", "https://example.com/x"),
        (2, "b", "http://sub.example.org:8080/path?q=1"),
        (3, "c", "not a url"),
        (4, "d", "ftp://files.example.net"),
        (5, "e", None),
    ]
    got = {r["doc_id"]: r["host"] for r in
           domains.with_host(_df(spark, rows)).collect()}
    assert got[1] == "example.com"
    assert got[2] == "sub.example.org"          # port stripped
    assert got[3] == ""                          # junk → '' bucket
    assert got[4] == "files.example.net"
    assert got[5] == ""                          # NULL url → '' (never NULL)


def test_blocklist_filter_list_and_dataframe(spark):
    rows = [(i, "t", f"https://h{i % 3}.com/p") for i in range(9)]
    d = domains.with_host(_df(spark, rows))
    kept = {r["doc_id"] for r in
            domains.blocklist_filter(d, ["h0.com"]).collect()}
    assert kept == {i for i in range(9) if i % 3 != 0}
    bl = spark.createDataFrame([("h1.com",), ("h2.com",)], "host string")
    kept2 = {r["doc_id"] for r in
             domains.blocklist_filter(d, bl).collect()}
    assert kept2 == {0, 3, 6}


def test_domain_caps_keep_smallest_ids(spark):
    rows = [(i, "t", "https://hot.com/p") for i in range(50)]
    rows += [(100 + i, "t", f"https://cold{i}.com/p") for i in range(5)]
    d = domains.with_host(_df(spark, rows))
    kept = {r["doc_id"] for r in domains.domain_caps(d, 10).collect()}
    assert kept == set(range(10)) | {100 + i for i in range(5)}
    # deterministic under different partitioning
    kept2 = {r["doc_id"] for r in
             domains.domain_caps(d.repartition(7), 10).collect()}
    assert kept2 == kept


def test_domain_stats_rollup(spark):
    rows = [(1, "aaaa", "https://x.com/1"), (2, "bb", "https://x.com/2"),
            (3, None, "https://y.com/1")]
    d = domains.with_host(_df(spark, rows))
    got = {r["host"]: (r["n_docs"], r["n_chars"]) for r in
           domains.domain_stats(d).collect()}
    assert got == {"x.com": (2, 6), "y.com": (1, 0)}


def test_domains_duckdb_parity_fuzz(spark):
    """Random URLs (schemes, ports, junk, quotes, unicode hosts) through
    the Spark expression AND the generated SQL twin — host extraction,
    blocklist and cap must agree row for row."""
    import random

    import duckdb

    rng = random.Random(29)
    pool = ["https://a{0}.com/x", "http://b{0}.org:88/y?q=1",
            "ftp://c{0}.net", "not a url {0}", "", "https://",
            "https://sp'am.com/{0}", "HTTPS://upper.com/{0}",
            "https://héte.example/{0}"]
    rows = [(i, "t", rng.choice(pool).format(i % 5)) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    kept = domains.domain_caps(
        domains.blocklist_filter(domains.with_host(df), ["a0.com"]), 7)
    got = sorted((r["doc_id"], r["host"]) for r in
                 kept.select("doc_id", "host").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql = domains.domain_caps_sql("SELECT * FROM t", 7,
                                  blocked_hosts=["a0.com"])
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want and got


def test_host_extraction_evasion_hardened(spark):
    """Review r4: userinfo and case must not evade blocklists/caps."""
    rows = [
        (1, "a", "https://x@spam.example.net/p"),
        (2, "b", "HTTPS://Spam.EXAMPLE.net/p"),
        (3, "c", "https://user:pw@deep.example.org:8080/q"),
    ]
    got = {r["doc_id"]: r["host"] for r in
           domains.with_host(_df(spark, rows)).collect()}
    assert got[1] == "spam.example.net"
    assert got[2] == "spam.example.net"
    assert got[3] == "deep.example.org"
    kept = domains.blocklist_filter(
        domains.with_host(_df(spark, rows)), ["spam.example.net"])
    assert {r["doc_id"] for r in kept.collect()} == {3}
