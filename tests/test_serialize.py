"""S4 graph sink round-trip: parse → fuse → write N-Triples (distributed) →
re-read (distributed regex source) → graph equivalence incl. bnodes, literal
escapes, datatype and language tags."""

from __future__ import annotations

import os

from re_shacl_spark.model.isomorph import graphs_equivalent
from re_shacl_spark.model.serialize import ntriples_lines, read_ntriples, write_ntriples
from re_shacl_spark.model.ttl import parse_ttl, parse_ttl_file
from re_shacl_spark.model.triples import triples_df
from re_shacl_spark.pipeline import fuse

TEST_TTL = "/root/reference/source/Datasets/test.ttl"


def _roundtrip(spark, df, tmp_path, name):
    path = os.path.join(str(tmp_path), name)
    write_ntriples(df, path)
    return read_ntriples(spark, path)


def test_fixture_fuse_roundtrip(spark, tmp_path):
    fused = fuse(spark, triples_df(spark, parse_ttl_file(TEST_TTL))).triples
    back = _roundtrip(spark, fused, tmp_path, "fused.nt")
    assert back.count() == fused.count()
    assert graphs_equivalent(fused, back)


def test_nasty_literals_and_bnodes_roundtrip(spark, tmp_path):
    ttl = r'''
    @prefix : <http://x.org/> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    :a :label "line\nbreak and \"quote\" and \\backslash\t tab" .
    :a :num "42"^^xsd:integer .
    :a :name "hello"@en .
    :a :plain "plain" .
    [ :inside :a ] :links :a .
    '''
    df = triples_df(spark, parse_ttl(ttl))
    back = _roundtrip(spark, df, tmp_path, "nasty.nt")
    assert graphs_equivalent(df, back)
    # exact o_lit fidelity for the non-bnode rows (dtype/lang survive verbatim)
    want = {(r.s, r.o, r.o_lit) for r in df.collect() if not r.s.startswith("_:")}
    got = {(r.s, r.o, r.o_lit) for r in back.collect() if not r.s.startswith("_:")}
    assert want == got


def test_lines_are_valid_turtle(spark):
    ttl = '@prefix : <http://x.org/> .\n:a :b "x\\ny"@en .\n:a :c :d .'
    df = triples_df(spark, parse_ttl(ttl))
    text = "\n".join(r.line for r in ntriples_lines(df).collect())
    re_parsed = triples_df(spark, parse_ttl(text))
    assert graphs_equivalent(df, re_parsed)
