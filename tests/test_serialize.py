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


def test_write_rejects_grammar_breaking_iri(spark):
    """An IRI containing '>' (or a newline) would corrupt the line grammar —
    the export must FAIL, not write a silently broken file (ADVICE r2)."""
    import pytest

    bad = spark.createDataFrame(
        [("http://x.org/a>b", "http://x.org/p", "http://x.org/o")], ["s", "p", "o"]
    ).selectExpr(
        "s", "p", "o",
        "cast(null as struct<lex:string,dtype:string,lang:string>) as o_lit",
        "false as is_lit", "cast(null as string) as src_url",
    )
    with pytest.raises(Exception, match="un-serializable subject"):
        ntriples_lines(bad).collect()
    # validate=False keeps the trusted-re-export fast path available
    assert ntriples_lines(bad, validate=False).count() == 1


def test_read_malformed_lines_error_and_drop(spark, tmp_path):
    """A line the grammar can't parse must raise by default (previously it
    yielded empty s/p/o — silent corruption), and 'drop' must skip exactly
    the bad lines."""
    import os

    import pytest

    path = os.path.join(str(tmp_path), "mixed.nt")
    good = '<http://x/a> <http://x/p> <http://x/b> .'
    bad1 = 'not a triple at all'
    bad2 = '<http://x/a> <http://x/p> "unterminated .'
    with open(path, "w") as f:
        f.write("\n".join([good, bad1, bad2]) + "\n")
    with pytest.raises(Exception, match="malformed N-Triples line"):
        read_ntriples(spark, path).collect()
    kept = read_ntriples(spark, path, on_malformed="drop").collect()
    assert [(r.s, r.p, r.o) for r in kept] == [("http://x/a", "http://x/p", "http://x/b")]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            # full printable ASCII + the escape-relevant controls + some unicode
            alphabet=st.characters(
                whitelist_categories=("L", "N", "P", "S", "Z"),
                whitelist_characters='\n\r\t"\\',
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_literal_roundtrip_fuzz(spark, tmp_path, texts):
    """Any literal string survives write → read byte-for-byte (escape and
    unescape are inverses, including pathological backslash runs)."""
    import shutil

    from re_shacl_spark.model.triples import lit_triple, triples_df

    rows = [lit_triple(f"http://x.org/s{i}", "http://x.org/p", t)
            for i, t in enumerate(texts)]
    df = triples_df(spark, rows)
    path = str(tmp_path / "fuzz.nt")
    shutil.rmtree(path, ignore_errors=True)
    back = _roundtrip(spark, df, tmp_path, "fuzz.nt")
    got = {(r.s, r.o) for r in back.collect()}
    want = {(f"http://x.org/s{i}", t) for i, t in enumerate(texts)}
    assert got == want


def test_nquads_roundtrip_preserves_graphs(spark, tmp_path):
    """N-Quads round-trips LINEAGE: named-graph triples keep src_url, default
    graph rows come back null; literals containing '<...>' text never confuse
    the graph-term split."""
    from re_shacl_spark.model.serialize import read_nquads, write_nquads
    from re_shacl_spark.model.triples import iri_triple, lit_triple, triples_df

    rows = [
        iri_triple("http://s/a", "http://p/p", "http://o/b", src_url="http://g/1"),
        iri_triple("http://s/a", "http://p/p", "http://o/c"),  # default graph
        lit_triple("http://s/b", "http://p/q", "see <http://x> here",
                   src_url="http://g/2"),
        lit_triple("http://s/c", "http://p/q", "ends with <angle>"),
        lit_triple("http://s/d", "http://p/q", "30",
                   dtype="http://www.w3.org/2001/XMLSchema#integer",
                   src_url="http://g/1"),
        lit_triple("http://s/e", "http://p/q", "chat", lang="fr",
                   src_url="http://g/2"),
    ]
    df = triples_df(spark, rows)
    path = str(tmp_path / "g.nq")
    write_nquads(df, path)
    back = read_nquads(spark, path)
    key = lambda r: (r.s, r.p, r.o, r.is_lit,  # noqa: E731
                     r.o_lit and (r.o_lit.lex, r.o_lit.dtype, r.o_lit.lang),
                     r.src_url)
    assert sorted(map(key, back.collect())) == sorted(map(key, df.collect()))


def test_nquads_malformed_and_default_graph_lines(spark, tmp_path):
    """Hand-written mixed files parse per the grammar: 3-term lines →
    default graph, 4-term → named; junk errors or drops per contract."""
    import pytest

    from re_shacl_spark.model.serialize import read_nquads

    p = tmp_path / "mix.nq"
    p.write_text(
        '<http://s> <http://p> <http://o> <http://g> .\n'
        '<http://s> <http://p> "lit with <iri> text" .\n'
        'garbage line\n'
    )
    got = read_nquads(spark, str(p), on_malformed="drop").collect()
    assert {(r.s, r.src_url) for r in got} == {
        ("http://s", "http://g"),
        ("http://s", None),
    }
    lit = next(r for r in got if r.is_lit)
    assert lit.o == "lit with <iri> text"
    with pytest.raises(Exception, match="malformed"):
        read_nquads(spark, str(p)).collect()
