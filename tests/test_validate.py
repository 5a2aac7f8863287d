"""SHACL validation engine against hand-computed oracles (constraint kinds from
the reference's committed shape graphs, SURVEY §2.9)."""

from __future__ import annotations

from re_shacl_spark.model.triples import iri_triple, lit_triple, triples_df, vocab
from re_shacl_spark.validate.engine import validate
from re_shacl_spark.validate.shapes import NodeShape, PropertyConstraint

EX = "http://x.org/"
XSD_INT = vocab.XSD + "integer"
XSD_STR = vocab.XSD + "string"


def _graph(spark):
    rows = [
        iri_triple(EX + "p1", vocab.TYPE, EX + "Person"),
        iri_triple(EX + "p2", vocab.TYPE, EX + "Person"),
        iri_triple(EX + "p3", vocab.TYPE, EX + "Person"),
        iri_triple(EX + "p1", EX + "knows", EX + "p2"),
        iri_triple(EX + "p1", EX + "knows", EX + "p3"),
        lit_triple(EX + "p1", EX + "age", "42", XSD_INT),
        lit_triple(EX + "p2", EX + "age", "young", XSD_STR),
        iri_triple(EX + "p3", EX + "age", EX + "unknown"),  # IRI where literal expected
        lit_triple(EX + "p1", EX + "status", "active", XSD_STR),
        lit_triple(EX + "p2", EX + "status", "retired", XSD_STR),
    ]
    return triples_df(spark, rows)


def _viol(spark, g, shapes):
    rep = validate(spark, g, shapes)
    return {(r.focus, r.constraint, r.value) for r in rep.violations.collect()}, rep


def test_mincount_maxcount(spark):
    g = _graph(spark)
    shapes = [NodeShape("S", target_classes=[EX + "Person"],
                        properties=[PropertyConstraint(path=EX + "knows", min_count=1, max_count=1)])]
    got, rep = _viol(spark, g, shapes)
    assert got == {(EX + "p1", "maxCount", "2"), (EX + "p2", "minCount", "0"), (EX + "p3", "minCount", "0")}
    assert not rep.conforms


def test_datatype_and_nodekind(spark):
    g = _graph(spark)
    shapes = [NodeShape("S", target_classes=[EX + "Person"],
                        properties=[PropertyConstraint(path=EX + "age", datatype=XSD_INT)])]
    got, _ = _viol(spark, g, shapes)
    assert got == {(EX + "p2", "value", "young"), (EX + "p3", "value", EX + "unknown")}

    shapes = [NodeShape("S", target_classes=[EX + "Person"],
                        properties=[PropertyConstraint(path=EX + "age", node_kind=vocab.SH + "Literal")])]
    got, _ = _viol(spark, g, shapes)
    assert got == {(EX + "p3", "value", EX + "unknown")}


def test_in_values_and_negation(spark):
    g = _graph(spark)
    shapes = [NodeShape("S", target_classes=[EX + "Person"],
                        properties=[PropertyConstraint(path=EX + "status", in_values=["active"])])]
    got, _ = _viol(spark, g, shapes)
    assert got == {(EX + "p2", "value", "retired")}

    shapes = [NodeShape("S", target_classes=[EX + "Person"],
                        properties=[PropertyConstraint(path=EX + "status", in_values=["active"], negated=True)])]
    got, _ = _viol(spark, g, shapes)
    assert got == {(EX + "p1", "value", "active")}


def test_sh_or_branches(spark):
    g = _graph(spark)
    # age must be integer-typed OR an IRI — only p2's plain string fails
    pc = PropertyConstraint(
        path=EX + "age",
        or_branches=[
            PropertyConstraint(datatype=XSD_INT),
            PropertyConstraint(node_kind=vocab.SH + "IRI"),
        ],
    )
    shapes = [NodeShape("S", target_classes=[EX + "Person"], properties=[pc])]
    got, _ = _viol(spark, g, shapes)
    assert got == {(EX + "p2", "value", "young")}


def test_sh_class_and_node_ref(spark):
    g = _graph(spark)
    # knows-values must conform to a shape requiring integer age
    ref = NodeShape("AgeShape", properties=[PropertyConstraint(path=EX + "age", datatype=XSD_INT, min_count=1)])
    outer = NodeShape(
        "S",
        target_classes=[EX + "Person"],
        properties=[PropertyConstraint(path=EX + "knows", node_ref="AgeShape")],
    )
    got, _ = _viol(spark, g, [outer, ref])
    # p1 knows p2 (string age → ref fails) and p3 (IRI age → ref fails)
    focus_vals = {(f, v) for f, c, v in got if c == "value" and f == EX + "p1"}
    assert focus_vals == {(EX + "p1", EX + "p2"), (EX + "p1", EX + "p3")}


def test_target_node_and_has_value(spark):
    g = _graph(spark)
    shapes = [NodeShape("S", target_nodes=[EX + "p2"],
                        properties=[PropertyConstraint(path=EX + "status", has_value="active")])]
    got, _ = _viol(spark, g, shapes)
    assert got == {(EX + "p2", "hasValue", "active")}


def test_conforming_graph(spark):
    g = _graph(spark)
    shapes = [NodeShape("S", target_classes=[EX + "Person"],
                        properties=[PropertyConstraint(path=EX + "status", max_count=5)])]
    got, rep = _viol(spark, g, shapes)
    assert got == set() and rep.conforms


def test_fail_fast_stops_at_first_violating_shape(spark):
    from re_shacl_spark.validate.engine import validate_fail_fast

    g = _graph(spark)
    bad = NodeShape("Bad", target_classes=[EX + "Person"],
                    properties=[PropertyConstraint(path=EX + "knows", min_count=5)])
    never = NodeShape("Never", target_classes=[EX + "Person"],
                      properties=[PropertyConstraint(path=EX + "status", min_count=99)])
    rep = validate_fail_fast(spark, g, [bad, never])
    assert not rep.conforms
    assert rep.shapes_evaluated == 1  # 'Never' was never evaluated
    assert {r.shape for r in rep.violations.collect()} == {"Bad"}

    ok = NodeShape("Ok", target_classes=[EX + "Person"],
                   properties=[PropertyConstraint(path=EX + "status", max_count=9)])
    rep2 = validate_fail_fast(spark, g, [ok, ok])
    assert rep2.conforms and rep2.shapes_evaluated == 2

    # two failing shapes landing in the SAME doubling chunk: the report must
    # still name the first one in list order, with its violations only
    bad2 = NodeShape("Bad2", target_classes=[EX + "Person"],
                     properties=[PropertyConstraint(path=EX + "knows", min_count=7)])
    rep3 = validate_fail_fast(spark, g, [ok, bad, bad2])
    assert not rep3.conforms and rep3.shapes_evaluated == 2
    assert {r.shape for r in rep3.violations.collect()} == {"Bad"}


def test_node_ref_value_not_target_typed_conforms(spark):
    """SHACL semantics (ADVICE r2): sh:node asks whether the VALUE conforms to
    the referenced shape's constraints — membership in the shape's target
    class is not required.  a1 satisfies AgeShape without being Person-typed."""
    rows = [
        iri_triple(EX + "p1", vocab.TYPE, EX + "Person"),
        iri_triple(EX + "p1", EX + "advisor", EX + "a1"),  # conforms, untyped
        iri_triple(EX + "p1", EX + "advisor", EX + "a2"),  # no age → ref fails
        lit_triple(EX + "a1", EX + "age", "50", XSD_INT),
    ]
    g = triples_df(spark, rows)
    ref = NodeShape(
        "AgeShape",
        target_classes=[EX + "Person"],
        properties=[PropertyConstraint(path=EX + "age", datatype=XSD_INT, min_count=1)],
    )
    outer = NodeShape(
        "S",
        target_classes=[EX + "Person"],
        properties=[PropertyConstraint(path=EX + "advisor", node_ref="AgeShape")],
    )
    got, _ = _viol(spark, g, [outer, ref])
    # AgeShape still REPORTS only on its targets (p1, ageless); a1's
    # conformance is evaluated but never reported; a2 fails the reference
    assert got == {
        (EX + "p1", "minCount", "0"),
        (EX + "p1", "value", EX + "a2"),
    }
