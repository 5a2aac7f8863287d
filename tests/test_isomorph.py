"""SO4: bnode-aware graph equivalence (reference src/graph_isomorph.py)."""

from __future__ import annotations

from re_shacl_spark.model.isomorph import graph_diff, graphs_equivalent
from re_shacl_spark.model.triples import iri_triple, lit_triple, triples_df


def _g(spark, rows):
    return triples_df(spark, rows)


def test_identical_ground_graphs(spark):
    rows = [iri_triple("a", "p", "b"), lit_triple("a", "q", "5")]
    assert graphs_equivalent(_g(spark, rows), _g(spark, rows))


def test_differing_graphs(spark):
    a = _g(spark, [iri_triple("a", "p", "b")])
    b = _g(spark, [iri_triple("a", "p", "c")])
    assert not graphs_equivalent(a, b)
    d1, d2 = graph_diff(a, b)
    assert d1.count() == 1 and d2.count() == 1


def test_bnode_renaming_is_equivalent(spark):
    a = _g(spark, [
        iri_triple("shape", "property", "_:x"),
        iri_triple("_:x", "path", "knows"),
        lit_triple("_:x", "minCount", "1"),
    ])
    b = _g(spark, [
        iri_triple("shape", "property", "_:y7"),
        iri_triple("_:y7", "path", "knows"),
        lit_triple("_:y7", "minCount", "1"),
    ])
    assert graphs_equivalent(a, b)


def test_bnode_content_difference_detected(spark):
    a = _g(spark, [iri_triple("s", "property", "_:x"), iri_triple("_:x", "path", "knows")])
    b = _g(spark, [iri_triple("s", "property", "_:x"), iri_triple("_:x", "path", "likes")])
    assert not graphs_equivalent(a, b)


def test_two_distinct_bnodes_not_conflated(spark):
    a = _g(spark, [
        iri_triple("s", "property", "_:x"), iri_triple("_:x", "path", "knows"),
        iri_triple("s", "property", "_:y"), iri_triple("_:y", "path", "likes"),
    ])
    b = _g(spark, [
        iri_triple("s", "property", "_:m"), iri_triple("_:m", "path", "knows"),
        iri_triple("s", "property", "_:n"), iri_triple("_:n", "path", "likes"),
    ])
    assert graphs_equivalent(a, b)
    c = _g(spark, [
        iri_triple("s", "property", "_:m"), iri_triple("_:m", "path", "knows"),
        iri_triple("s", "property", "_:n"), iri_triple("_:n", "path", "knows"),
    ])
    assert not graphs_equivalent(a, c)


def test_chained_bnodes(spark):
    a = _g(spark, [iri_triple("_:a", "next", "_:b"), iri_triple("_:b", "val", "end")])
    b = _g(spark, [iri_triple("_:q", "next", "_:r"), iri_triple("_:r", "val", "end")])
    assert graphs_equivalent(a, b)
