"""URL canonicalization, latest-capture dedup, and per-domain rollups for
Common-Crawl-style page corpora (BASELINE.json input_hint: pages keyed by
``url`` + ``warc_ts``).

A web-scale crawl holds many captures of the same logical page under trivially
different URLs (scheme/host case, default ports, fragments, tracking params)
and many timestamped recrawls of the same canonical URL.  The standard
pipeline is: canonicalize → keep the newest capture per canonical URL →
aggregate per registered domain for crawl-quality triage.

Everything here is pure JVM column algebra (regexp chains + one window /
one hash aggregation) — no Python in the data path; at 10^12 pages the
canonicalizer is map-only, the dedup is one shuffle on the canonical URL, and
the rollup is one partial-aggregated shuffle on the domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# multi-label public suffixes the 2-label heuristic would split wrong; a real
# deployment ships the full Mozilla public-suffix list as a broadcast table —
# the heuristic keeps this module dependency-free and deterministic
_SECOND_LEVEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.sg", "com.tr",
)

# query params that never change page identity (tracking/attribution)
_TRACKING_PARAMS = r"(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|ref_src)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an http(s) URL, as one JVM expression chain:

    1. lowercase the scheme and host (path/query stay case-sensitive),
    2. drop the default port (``:80`` for http, ``:443`` for https),
    3. drop the fragment,
    4. drop tracking query params (``utm_*``, ``fbclid``, …), tidying any
       separators they leave behind; a fully-emptied query string loses its
       ``?``,
    5. collapse a bare trailing ``/`` on the path root.
    """
    u = url
    # 1. scheme+host+port prefix lowercased in place
    u = F.regexp_replace(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", r"$1")
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""),
    )
    # 2. default ports
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443(?=[/?#]|$)", r"$1")
    # 3. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 4. tracking params (leading, middle, trailing) + separator tidy-up
    u = F.regexp_replace(u, r"([?&])" + _TRACKING_PARAMS + r"=[^&#]*", r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]$", "")
    # 5. root trailing slash: http://h/ -> http://h
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", r"$1")
    return u


def host_of(url: Column) -> Column:
    """Lowercased host (port stripped) of an http(s) URL."""
    return F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))


def registered_domain(url: Column) -> Column:
    """eTLD+1 by the 2-label heuristic with a short second-level-suffix table
    (see module docstring for the production public-suffix-list note)."""
    host = host_of(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.when(n >= 3, F.concat_ws(".", F.element_at(parts, -3), last2)).otherwise(host)
    is_2nd_level = last2.isin(*_SECOND_LEVEL_SUFFIXES)
    return F.when(n <= 2, host).when(is_2nd_level, last3).otherwise(last2)


def dedup_url_latest(pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts") -> DataFrame:
    """Keep the newest capture per CANONICAL url (ties broken by the raw url
    descending, then deterministic across reruns).  One shuffle on the
    canonical url; at crawl scale this is the classic WARC-dedup shape —
    hash-partition by canonical url, no driver involvement."""
    canon = canonicalize_url(F.col(url_col)).alias("canonical_url")
    w = Window.partitionBy("canonical_url").orderBy(
        F.col(ts_col).desc(), F.col(url_col).desc()
    )
    return (
        pages.select("*", canon)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def domain_stats(pages: DataFrame, url_col: str = "url", text_col: str = "text") -> DataFrame:
    """Per-registered-domain crawl rollup: captures, distinct canonical pages,
    total/mean text volume.  Partial aggregation (map-side combine) keeps the
    shuffle proportional to |domains|, not |pages|."""
    canon = canonicalize_url(F.col(url_col))
    return (
        pages.select(
            registered_domain(F.col(url_col)).alias("domain"),
            canon.alias("canonical_url"),
            F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("_len"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_captures"),
            F.count_distinct("canonical_url").alias("n_pages"),
            F.sum("_len").alias("total_chars"),
        )
    )
