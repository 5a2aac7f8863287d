"""BGP pattern matching (query.py) over hand-built graphs."""

from __future__ import annotations

import pytest

from re_shacl_spark.model.triples import iri_triple, lit_triple, triples_df, vocab
from re_shacl_spark.query import bgp

EX = "http://x.org/"


def _g(spark):
    rows = [
        iri_triple(EX + "a", vocab.TYPE, EX + "Person"),
        iri_triple(EX + "b", vocab.TYPE, EX + "Person"),
        iri_triple(EX + "a", EX + "knows", EX + "b"),
        iri_triple(EX + "b", EX + "knows", EX + "a"),
        iri_triple(EX + "a", EX + "likes", EX + "a"),   # self-loop
        lit_triple(EX + "a", EX + "name", "Alice"),
        iri_triple(EX + "c", EX + "knows", EX + "a"),   # c is untyped
    ]
    return triples_df(spark, rows)


def test_bgp_join_on_shared_vars(spark):
    got = {tuple(r) for r in bgp(
        _g(spark),
        [("?x", vocab.TYPE, EX + "Person"), ("?x", EX + "knows", "?y")],
    ).collect()}
    assert got == {(EX + "a", EX + "b"), (EX + "b", EX + "a")}


def test_bgp_repeated_variable_in_pattern(spark):
    # ?x likes ?x: only the self-loop
    got = [tuple(r) for r in bgp(_g(spark), [("?x", EX + "likes", "?x")]).collect()]
    assert got == [(EX + "a",)]


def test_bgp_optional_and_select(spark):
    got = {tuple(r) for r in bgp(
        _g(spark),
        [("?x", vocab.TYPE, EX + "Person")],
        optional=[("?x", EX + "name", "?n")],
        select=["x", "n"],
    ).collect()}
    assert got == {(EX + "a", "Alice"), (EX + "b", None)}


def test_bgp_three_hop_chain(spark):
    got = {tuple(r) for r in bgp(
        _g(spark),
        [("?x", EX + "knows", "?y"), ("?y", EX + "knows", "?z")],
        select=["x", "z"],
    ).collect()}
    assert got == {(EX + "a", EX + "a"), (EX + "b", EX + "b"), (EX + "c", EX + "b")}


def test_bgp_disconnected_raises(spark):
    with pytest.raises(ValueError, match="disconnected"):
        bgp(_g(spark), [("?x", EX + "knows", "?y"), ("?p", EX + "likes", "?q")])
    # explicit opt-in allows the cross product
    n = bgp(_g(spark),
            [("?x", EX + "likes", "?x"), ("?p", vocab.TYPE, "?t")],
            allow_cross=True).count()
    assert n == 2
