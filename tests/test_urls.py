"""URL canonicalization / latest-capture dedup / domain rollups (ops/urls.py)
— edge cases the oracle's five variant families don't reach."""

from __future__ import annotations

from pyspark.sql import functions as F

from re_shacl_spark.ops import urls as U


def _canon(spark, raw: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    return [r.c for r in df.select(U.canonicalize_url(F.col("url")).alias("c")).collect()]


def test_canonicalize_cases(spark):
    cases = {
        # scheme/host lowered, path case preserved
        "HTTP://WWW.Ex.COM/Path/File": "http://www.ex.com/Path/File",
        # default ports dropped; non-default kept
        "http://ex.com:80/a": "http://ex.com/a",
        "https://ex.com:443/a": "https://ex.com/a",
        "http://ex.com:8080/a": "http://ex.com:8080/a",
        # fragment dropped
        "http://ex.com/a#sec-2": "http://ex.com/a",
        # tracking param in the middle: separators tidied
        "http://ex.com/p?a=1&utm_source=x&b=2": "http://ex.com/p?a=1&b=2",
        # all-tracking query: '?' dropped entirely
        "http://ex.com/p?utm_source=x&utm_medium=y": "http://ex.com/p",
        # leading tracking param: next param takes over after '?'
        "http://ex.com/p?fbclid=z&id=7": "http://ex.com/p?id=7",
        # bare root slash collapses; deeper trailing slash preserved
        "http://ex.com/": "http://ex.com",
        "http://ex.com/a/": "http://ex.com/a/",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_registered_domain(spark):
    cases = {
        "http://a.b.news.example.co.uk/x": "example.co.uk",
        "https://blog.example.com/x": "example.com",
        "http://example.com/x": "example.com",
        "http://localhost:8080/x": "localhost",
        "http://deep.sub.site.org/x": "site.org",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = [r.d for r in df.select(U.registered_domain(F.col("url")).alias("d")).collect()]
    assert got == list(cases.values())


def test_dedup_url_latest_tiebreak(spark):
    rows = [
        # three captures of one canonical page; ts tie between B and C
        ("http://EX.com/p?utm_source=a", 10),
        ("http://ex.com/p?utm_source=b", 20),
        ("http://ex.com/p?utm_source=c", 20),
        ("http://other.com/q", 5),
    ]
    pages = spark.createDataFrame(rows, "url string, crawl_ts long")
    kept = U.dedup_url_latest(pages, ts_col="crawl_ts").orderBy("canonical_url").collect()
    assert [(r.canonical_url, r.url) for r in kept] == [
        # ts desc, then raw url desc: ...source=c beats ...source=b
        ("http://ex.com/p", "http://ex.com/p?utm_source=c"),
        ("http://other.com/q", "http://other.com/q"),
    ]


def test_domain_stats(spark):
    rows = [
        ("http://a.ex.com/1", "xx"),
        ("http://A.EX.com/1#f", "yyy"),   # same canonical page, 2nd capture
        ("http://b.ex.com/2", "z"),
        ("http://other.org/9", None),     # null text counts 0 chars
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    got = {r.domain: (r.n_captures, r.n_pages, r.total_chars)
           for r in U.domain_stats(pages).collect()}
    assert got == {"ex.com": (3, 2, 6), "other.org": (1, 1, 0)}
