"""Property-based cross-checks for the round-4 integer operators: PageRank,
duplicate-span stats and the bigram LM score, each verified against a naive
pure-Python reference over randomized small inputs (the same role the DuckDB
oracles play at sf scale, but with hypothesis-chosen shapes).  Example counts
are kept low — every example runs Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

SCALE = 1_000_000

edges_strat = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1, max_size=40,
)

texts_strat = st.lists(
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=12).map(" ".join),
    min_size=1, max_size=12,
)


def _naive_pagerank(pairs, iterations):
    edges = sorted({(f"n{a}", f"n{b}") for a, b in pairs})
    nodes = sorted({x for e in edges for x in e})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: SCALE for n in nodes}
    for _ in range(iterations):
        inbox = {n: 0 for n in nodes}
        for s, o in edges:
            inbox[o] += rank[s] // deg[s]
        rank = {n: 150_000 + (850_000 * inbox[n]) // SCALE for n in nodes}
    return rank


@SETTINGS
@given(pairs=edges_strat, iterations=st.integers(1, 3))
def test_pagerank_matches_naive_reference(spark, pairs, iterations):
    from re_shacl_spark.ops.graph import pagerank

    t = spark.createDataFrame(
        [(f"n{a}", "p", f"n{b}", None, False, None) for a, b in pairs],
        "s string, p string, o string, "
        "o_lit struct<lex:string,dtype:string,lang:string>, "
        "is_lit boolean, src_url string",
    )
    got = {r.node: r.rank_ppm for r in pagerank(t, iterations=iterations).collect()}
    assert got == _naive_pagerank(pairs, iterations)


def _naive_dup_spans(texts, window):
    spans = {}
    for i, text in enumerate(texts):
        words = text.lower().split()
        for j in range(len(words) - window + 1):
            spans.setdefault(" ".join(words[j:j + window]), set()).add(i)
    out = {}
    for i, text in enumerate(texts):
        words = text.lower().split()
        n = len(words) - window + 1
        if n < 1:
            continue
        dup = sum(
            1 for j in range(n)
            if len(spans[" ".join(words[j:j + window])]) >= 2
        )
        out[i] = (n, dup, dup * SCALE // n)
    return out


@SETTINGS
@given(texts=texts_strat, window=st.integers(1, 4))
def test_dup_spans_match_naive_reference(spark, texts, window):
    from re_shacl_spark.ops import corpusprep as C

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_ppm)
           for r in C.duplicate_span_stats(docs, window=window).collect()}
    assert got == _naive_dup_spans(texts, window)


def _naive_lm_score(texts):
    c2, c1 = {}, {}
    occ = []
    for i, text in enumerate(texts):
        words = text.lower().split()
        for a, b in zip(words, words[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
            occ.append((i, a, b))
    out = {}
    for i, _ in enumerate(texts):
        ppms = [c2[(a, b)] * SCALE // c1[a] for d, a, b in occ if d == i]
        if ppms:
            out[i] = (len(ppms), sum(ppms) // len(ppms))
    return out


@SETTINGS
@given(texts=texts_strat)
def test_lm_score_matches_naive_reference(spark, texts):
    from re_shacl_spark.ops.textstats import lm_transition_score

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.lm_score_ppm)
           for r in lm_transition_score(docs).collect()}
    assert got == _naive_lm_score(texts)
