"""pii_scan / redact_pii and canonical_url / url_dedup_stats."""

from pyspark.sql import functions as F

from tric_spark.operators.pii import pii_scan, redact_pii
from tric_spark.operators.urlnorm import canonical_url, url_dedup_stats


def _canon_one(spark, url):
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(canonical_url(F.col("url")).alias("c"))
        .collect()[0]["c"]
    )


def test_canonical_url_full_mangle(spark):
    assert (
        _canon_one(
            spark,
            "HTTPS://WWW.Site3.Example.COM:443/a/b/?utm_source=x&id=3#frag",
        )
        == "https://site3.example.com/a/b?id=3"
    )


def test_canonical_url_cases(spark):
    cases = {
        "http://example.com:80//a//b///": "http://example.com/a/b",
        "example.com/path": "http://example.com/path",
        "https://example.com": "https://example.com/",
        "http://example.com/?utm_source=a&utm_campaign=b": "http://example.com/",
        "http://h/x?b=2&a=1": "http://h/x?a=1&b=2",
        # non-default port and non-tracking params survive
        "http://Host:8080/x?gclid=1&q=z": "http://host:8080/x?q=z",
        # :443 is only default for https; http keeps it
        "http://h:443/": "http://h:443/",
    }
    for raw, want in cases.items():
        assert _canon_one(spark, raw) == want, raw


def test_url_dedup_stats(spark):
    urls = [
        "HTTP://WWW.A.com/x/",
        "http://a.com/x",
        "http://a.com:80/x#f",
        "http://b.com/y",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["canon_url"]: (r["n_urls"], r["n_raw_variants"])
        for r in url_dedup_stats(df).collect()
    }
    assert got == {"http://a.com/x": (3, 3), "http://b.com/y": (1, 1)}


def test_pii_scan_counts_and_mask(spark):
    rows = [
        (0, "mail bob.smith+x@sub.example.co.uk from 10.2.30.4 call 415-555-0142"),
        (1, "version 1.2.3.4x stays, 1.2.3.4 goes, 99-1234 is no phone"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert set(out) == {0, 1}  # NULL text filtered
    assert (out[0]["n_emails"], out[0]["n_ipv4"], out[0]["n_phones"]) == (1, 1, 1)
    # doc 1: the 'x' suffix kills \b for 1.2.3.4x; bare '1.2.3.4' matches;
    # '99-1234' lacks the 3-digit exchange so it is not a phone
    assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) == (0, 1, 0)
    red = (
        df.filter("doc_id = 0")
        .select(redact_pii(F.col("text")).alias("t"))
        .collect()[0]["t"]
    )
    assert red == "mail [EMAIL] from [IP] call [PHONE]"


def test_pii_no_false_positives(spark):
    df = spark.createDataFrame(
        [(0, "plain words only, v2.1 release, a-b 12-34")],
        "doc_id long, text string",
    )
    r = pii_scan(df).collect()[0]
    assert (r["n_emails"], r["n_ipv4"], r["n_phones"]) == (0, 0, 0)


def test_robots_filter(spark):
    from pyspark.sql import functions as F

    from tric_spark.operators.urlnorm import robots_filter

    rules = [
        ("/admin", False),
        ("/static", False),
        ("/p/", True),
        ("/", True),
        ("/p/9", False),
    ]
    paths = [
        (0, "/p/3"),          # /p/ allow (len 3) beats / allow
        (1, "/p/9"),          # /p/9 deny (len 4) beats /p/ allow
        (2, "/admin/x"),      # deny
        (3, "/other"),        # / allow
        (4, "x-no-slash"),    # no match -> default allow
        (5, "/p/93"),         # /p/9 prefix still matches -> deny
    ]
    df = spark.createDataFrame(paths, "doc_id long, path string")
    got = {r["doc_id"]: r["allowed"] for r in robots_filter(df, rules).collect()}
    assert got == {0: True, 1: False, 2: False, 3: True, 4: True, 5: False}

    # allow wins a length tie regardless of rule order
    tie = [("/a", False), ("/a", True)]
    one = spark.createDataFrame([(0, "/a/x")], "doc_id long, path string")
    assert robots_filter(one, tie).collect()[0]["allowed"]
    assert robots_filter(one, tie[::-1]).collect()[0]["allowed"]
