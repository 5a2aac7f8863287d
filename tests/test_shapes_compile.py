"""Shape compiler against the reference's committed shape graphs
(/root/reference/source/ShapesGraphs/), plus validation of the reference
reasoning fixture through the compiled PersonShape."""

from __future__ import annotations

from re_shacl_spark.model.triples import triples_df, vocab
from re_shacl_spark.model.ttl import parse_ttl_file
from re_shacl_spark.pipeline import fuse
from re_shacl_spark.validate.engine import validate
from re_shacl_spark.validate.shapes import compile_shapes

SHAPES_DIR = "/root/reference/source/ShapesGraphs"
EX = "http://example.org/"
UB = "http://swat.cse.lehigh.edu/onto/univ-bench.owl#"


def test_compile_reference_test_shapes():
    shapes = compile_shapes(parse_ttl_file(f"{SHAPES_DIR}/test.ttl"))
    assert len(shapes) == 1
    s = shapes[0]
    assert s.shape_id == EX + "PersonShape"
    assert s.target_classes == [EX + "Person"]
    got = {(pc.path, pc.clazz) for pc in s.properties}
    assert got == {(EX + "knows", EX + "Person"), (EX + "relatedTo", EX + "Person")}


def test_compile_lubm_schema1():
    shapes = compile_shapes(parse_ttl_file(f"{SHAPES_DIR}/lubm/schema1.ttl"))
    by_id = {s.shape_id: s for s in shapes}
    assert UB + "FullProfessorShape" in by_id
    fp = by_id[UB + "FullProfessorShape"]
    assert fp.target_classes == [UB + "FullProfessor"]
    paths = {pc.path: pc for pc in fp.properties}
    assert paths[UB + "doctoralDegreeFrom"].min_count == 1
    assert paths[UB + "doctoralDegreeFrom"].node_ref == UB + "UniversityShape"
    assert paths[UB + "headOf"].max_count == 1
    assert paths[UB + "emailAddress"].min_count == 1


def test_reference_shapes_validate_fused_fixture(spark):
    """Fuse the reference reasoning fixture, validate with its own shapes:
    after fusion every Person's knows/relatedTo values are Persons (domain/
    range typing materialized) → conforms."""
    data = parse_ttl_file("/root/reference/source/Datasets/test.ttl")
    shapes = compile_shapes(parse_ttl_file(f"{SHAPES_DIR}/test.ttl"))
    res = fuse(spark, triples_df(spark, data))
    # rewrite targets through the TBox class reps (Person collapsed into its
    # equivalence component's min-IRI representative)
    crep = res.tbox.class_rep
    for s in shapes:
        s.target_classes = [crep.get(c, c) for c in s.target_classes]
        for pc in s.properties:
            pc.clazz = crep.get(pc.clazz, pc.clazz)
    rep = validate(spark, res.triples, shapes, tbox=res.tbox)
    assert rep.conforms, rep.violations.collect()


def test_reference_shapes_catch_untyped_value(spark):
    data = parse_ttl_file("/root/reference/source/Datasets/test.ttl")
    # add an edge whose object never becomes a Person-equivalent
    data.append((f"{EX}john", f"{EX}knows_nothing", f"{EX}rock", None, False, None))
    shapes = compile_shapes(parse_ttl_file(f"{SHAPES_DIR}/test.ttl"))
    res = fuse(spark, triples_df(spark, data))
    crep = res.tbox.class_rep
    for s in shapes:
        s.target_classes = [crep.get(c, c) for c in s.target_classes]
        for pc in s.properties:
            pc.clazz = crep.get(pc.clazz, pc.clazz)
            pc.path = f"{EX}knows_nothing"  # repoint both constraints at the new edge
    rep = validate(spark, res.triples, shapes, tbox=res.tbox)
    focus = {r.focus for r in rep.violations.collect()}
    assert f"{EX}john" in focus
