"""Extraction golden bytes + the byte-identity invariant (BASELINE.json
input_hint: "byte-identical extracted text per url")."""

from __future__ import annotations

import hashlib

from re_shacl_spark import corpus
from re_shacl_spark.extract.html import extract_text, extract_text_bytes

GOLDEN = [
    (None, None),
    (b"", ""),
    (b"<html><body><p>hello world</p></body></html>", "hello world"),
    (b"<p>a</p><script>var x = '<p>no</p>';</script><p>b</p>", "a b"),
    (b"<style>p {color: red}</style>text", "text"),
    (b"<!-- hidden -->shown", "shown"),
    (b"a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39; &nbsp;f", "a & b <c> \"d\" 'e' f"),
    (b"<div>unclosed <b>tag <broken", "unclosed tag"),
    ("café <b>résumé</b>".encode(), "café résumé"),
    (b"\xff\xfe<p>bad utf8</p>", "�� bad utf8"),
]


def test_golden_bytes():
    for html, want in GOLDEN:
        assert extract_text_bytes(html) == want, html


def test_extraction_byte_identity_across_parallelism(spark):
    """Same (url → text) map at 1 and 4 partitions — run-to-run and
    parallelism-level determinism, the north-rule invariant."""
    pages = corpus.generate_pages(spark, 300, seed=7)
    outs = []
    for n in (1, 4):
        df = extract_text(pages.repartition(n))
        rows = {r.url: r.text for r in df.select("url", "text").collect()}
        digest = hashlib.sha256(
            "\x00".join(f"{u}\x01{t}" for u, t in sorted(rows.items(), key=lambda kv: kv[0])).encode()
        ).hexdigest()
        outs.append((rows, digest))
    assert outs[0][1] == outs[1][1]
    # null html rows stay null; empty html rows become ""
    texts = outs[0][0]
    nulls = [u for u, t in texts.items() if t is None]
    empties = [u for u, t in texts.items() if t == ""]
    assert nulls and empties


def test_extract_fills_only_missing_text(spark):
    pages = corpus.generate_pages(spark, 50, seed=7)
    pre = pages.limit(10).withColumn("text", pages.url)  # pretend text exists
    got = extract_text(pre).select("url", "text").collect()
    assert all(r.text == r.url for r in got)
