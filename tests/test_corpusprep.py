"""Corpus-prep operators (ops/corpusprep.py): chunking, vocab, n-grams,
training shards, boilerplate removal — hand-computable fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from re_shacl_spark.ops import corpusprep as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_chunk_exact_windows(spark):
    # 10 tokens, chunk 4, overlap 1 -> stride 3 -> ceil((10-1)/3) = 3 chunks
    text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    out = C.chunk_documents(
        _docs(spark, [(1, "s", text)]), chunk_tokens=4, overlap=1
    ).orderBy("chunk_id").collect()
    got = [(r.chunk_id, r.n_tokens, r.chunk_text) for r in out]
    assert got == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t3 t4 t5 t6"),
        (2, 4, "t6 t7 t8 t9"),
    ]


def test_chunk_short_and_empty_docs(spark):
    out = C.chunk_documents(
        _docs(spark, [(1, "s", "only two"), (2, "s", "   "), (3, "s", "x")]),
        chunk_tokens=8, overlap=2,
    ).collect()
    got = {(r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text) for r in out}
    assert got == {(1, 0): (2, "only two"), (3, 0): (1, "x")}  # empty doc dropped


def test_chunk_last_window_short(spark):
    # 5 tokens, chunk 4, overlap 0 -> chunks [0:4), [4:5)
    out = C.chunk_documents(
        _docs(spark, [(1, "s", "a b c d e")]), chunk_tokens=4, overlap=0
    ).orderBy("chunk_id").collect()
    assert [(r.n_tokens, r.chunk_text) for r in out] == [(4, "a b c d"), (1, "e")]


def test_chunk_rejects_bad_overlap(spark):
    with pytest.raises(ValueError, match="overlap"):
        C.chunk_documents(_docs(spark, [(1, "s", "a")]), chunk_tokens=4, overlap=4)


def test_vocab_topk_counts_and_tiebreak(spark):
    docs = _docs(spark, [
        (1, "s", "Apple banana apple"),
        (2, "s", "BANANA cherry"),
        (3, "s", "banana"),
    ])
    out = C.vocab_topk(docs, k=2).collect()
    assert [(r.word, r.tf, r.df) for r in out] == [("banana", 3, 3), ("apple", 2, 1)]
    # tie between apple(2)/... none; check deterministic tie: add k=3
    out3 = C.vocab_topk(docs, k=3).collect()
    assert [(r.word, r.tf) for r in out3] == [("banana", 3), ("apple", 2), ("cherry", 1)]


def test_ngram_counts_bigrams(spark):
    docs = _docs(spark, [
        (1, "s", "a b a b"),
        (2, "s", "a b"),
        (3, "s", "solo"),
    ])
    out = {r.ngram: r.n_occurrences for r in C.ngram_counts(docs, n=2, min_count=1).collect()}
    assert out == {"a b": 3, "b a": 1}
    filt = {r.ngram for r in C.ngram_counts(docs, n=2, min_count=2).collect()}
    assert filt == {"a b"}


def test_training_shards_deterministic_and_dense(spark):
    docs = _docs(spark, [(i, "s", "x") for i in range(40)]).select("doc_id", "source")
    a = C.training_shards(docs, n_shards=4, seed="z").collect()
    b = C.training_shards(docs, n_shards=4, seed="z").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    assert set(by_shard) <= set(range(4))
    for positions in by_shard.values():  # dense 1..n per shard
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # a different seed yields a different assignment
    c = C.training_shards(docs, n_shards=4, seed="other").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_strip_boilerplate_removes_templates_per_group(spark):
    rows = [
        (1, "g1", "NAV\nunique one\nCOPYRIGHT"),
        (2, "g1", "NAV\nunique two\nCOPYRIGHT"),
        (3, "g1", "NAV\nunique three\nCOPYRIGHT"),
        (4, "g2", "NAV\nother site\nfooter"),  # NAV appears once in g2: kept
    ]
    out = {r.doc_id: r for r in C.strip_boilerplate(
        _docs(spark, rows), min_docs=3).collect()}
    assert out[1].text == "unique one" and out[1].n_kept == 1 and out[1].n_dropped == 2
    assert out[2].text == "unique two"
    assert out[4].text == "NAV\nother site\nfooter" and out[4].n_dropped == 0


def test_strip_boilerplate_all_boiler_and_blank_lines(spark):
    rows = [
        (1, "g", "SAME\n\nSAME"),
        (2, "g", "SAME"),
        (3, "g", "SAME"),
    ]
    out = {r.doc_id: r for r in C.strip_boilerplate(
        _docs(spark, rows), min_docs=3).collect()}
    assert out[2].text == "" and out[2].n_kept == 0 and out[2].n_dropped == 1
    # doc 1: two SAME lines dropped + one blank dropped
    assert out[1].text == "" and out[1].n_dropped == 3


def test_strip_boilerplate_preserves_line_order(spark):
    rows = [(i, "g", f"HDR\nline {i}a\nline {i}b\nHDR") for i in range(1, 5)]
    out = {r.doc_id: r.text for r in C.strip_boilerplate(
        _docs(spark, rows), min_docs=3).collect()}
    assert out[1] == "line 1a\nline 1b"


# ---------------------------------------------------------------------------
# duplicate_span_stats
# ---------------------------------------------------------------------------

def test_dup_spans_exact_counts(spark):
    # docs 1/2 share the 3-token span "x y z" (doc 2 embeds it mid-text);
    # doc 3 is all-unique; doc 4 is shorter than the window
    docs = _docs(spark, [
        (1, "s", "x y z tail1"),
        (2, "s", "head xa x y z"),
        (3, "s", "p q r s"),
        (4, "s", "a b"),
    ])
    out = {r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_ppm)
           for r in C.duplicate_span_stats(docs, window=3).collect()}
    # doc 1: windows {x y z, y z tail1} -> 1 dup of 2 -> 500000 ppm
    # doc 2: windows {head xa x, xa x y, x y z} -> 1 of 3 -> 333333 ppm
    assert out == {1: (2, 1, 500_000), 2: (3, 1, 333_333), 3: (2, 0, 0)}


def test_dup_spans_within_doc_repeat_is_not_dup(spark):
    # the span "a b c" occurs twice in ONE doc only: df(span)=1, not a dup
    docs = _docs(spark, [(1, "s", "a b c q a b c"), (2, "s", "z z z z")])
    out = {r.doc_id: r.n_dup_windows
           for r in C.duplicate_span_stats(docs, window=3).collect()}
    assert out == {1: 0, 2: 0}


def test_dup_spans_case_folds_and_rejects_bad_window(spark):
    docs = _docs(spark, [(1, "s", "A b C d"), (2, "s", "a B c e")])
    out = {r.doc_id: r.n_dup_windows
           for r in C.duplicate_span_stats(docs, window=3).collect()}
    assert out == {1: 1, 2: 1}  # "a b c" shared after lowercasing
    with pytest.raises(ValueError, match="window"):
        C.duplicate_span_stats(docs, window=0)


def test_strip_boilerplate_regex_significant_separator(spark):
    """sep goes through F.split (a Java regex) but array_join rejoins it
    literally — a '|' separator must split literally, not as alternation
    (which splits between every character)."""
    rows = [
        (1, "g", "NAV|unique one|NAV"),
        (2, "g", "NAV|unique two|NAV"),
        (3, "g", "NAV|unique three|NAV"),
    ]
    out = {r.doc_id: r for r in C.strip_boilerplate(
        _docs(spark, rows), min_docs=3, sep="|").collect()}
    assert out[1].text == "unique one" and out[1].n_dropped == 2
    assert out[3].text == "unique three" and out[3].n_kept == 1
