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


def test_blocklist_suffix_match_closes_subdomain_evasion(spark):
    """r4 ADVICE: blocking spam.example.net must also drop
    a.spam.example.net (suffix match) while sparing the sibling
    other.example.net; exact match keeps its legacy semantics."""
    rows = [(1, "t", "https://spam.example.net/p"),
            (2, "t", "https://a.spam.example.net/p"),
            (3, "t", "https://deep.a.spam.example.net/p"),
            (4, "t", "https://other.example.net/p"),
            (5, "t", "https://example.net/p")]
    d = domains.with_host(_df(spark, rows))
    exact = {r["doc_id"] for r in
             domains.blocklist_filter(d, ["spam.example.net"]).collect()}
    assert exact == {2, 3, 4, 5}  # subdomains slip through exact match
    sfx = {r["doc_id"] for r in
           domains.blocklist_filter(d, ["spam.example.net"],
                                    match="suffix").collect()}
    assert sfx == {4, 5}


def test_registered_domain_and_caps_key(spark):
    from pyspark.sql import functions as F

    rows = [(i, "t", f"https://sub{i}.hot.example.net/p")
            for i in range(20)]
    rows += [(100, "t", "https://shop.example.co.uk/p"),
             (101, "t", "https://example.co.uk/p"),
             (102, "t", "https://plain.org/p")]
    d = domains.with_host(_df(spark, rows))
    reg = {r["doc_id"]: r["rd"] for r in d.select(
        "doc_id", domains.registered_domain_expr(F.col("host"))
        .alias("rd")).collect()}
    assert reg[0] == "example.net"
    assert reg[100] == "example.co.uk"  # multi-label public suffix
    assert reg[101] == "example.co.uk"
    assert reg[102] == "plain.org"
    # key='host' lets each minted subdomain dodge the cap...
    by_host = {r["doc_id"] for r in domains.domain_caps(d, 5).collect()}
    assert set(range(20)) <= by_host
    # ...key='registered' caps the whole eTLD+1 family
    by_reg = {r["doc_id"] for r in
              domains.domain_caps(d, 5, key="registered").collect()}
    assert by_reg & set(range(20)) == set(range(5))
    assert {100, 101, 102} <= by_reg


def test_registered_domain_duckdb_twin(spark):
    import duckdb

    from pyspark.sql import functions as F

    hosts = ["a.spam.example.net", "shop.example.co.uk", "example.co.uk",
             "x.com", "com", "", "deep.a.b.co.jp"]
    d = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r["host"]: r["rd"] for r in d.select(
        "host", domains.registered_domain_expr(F.col("host"))
        .alias("rd")).collect()}
    con = duckdb.connect()
    for h in hosts:
        want = con.execute(
            "SELECT " + domains.registered_domain_sql(f"'{h}'")
        ).fetchone()[0]
        assert got[h] == want, (h, got[h], want)


def test_domain_caps_warns_past_window_threshold(spark):
    import warnings

    rows = [(i, "t", "https://x.com/p") for i in range(5)]
    d = domains.with_host(_df(spark, rows))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        domains.domain_caps(d, 1001)
        assert any("windowGroupLimitThreshold" in str(x.message)
                   for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        domains.domain_caps(d, 1000)
        assert not any("windowGroupLimitThreshold" in str(x.message)
                       for x in w)


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
