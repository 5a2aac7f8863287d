"""End-to-end validation of the reference's committed LUBM shapes graphs
(source/ShapesGraphs/lubm/schema{1,2,3}.ttl) against the deterministic ABox —
full-report set equality vs the closed-form DuckDB mirror at a DIFFERENT scale
(NU=7) than the driver queries use (NU=40), plus hand-computed spot checks."""

from __future__ import annotations

import duckdb
import pytest

from re_shacl_spark.workloads import lubm

UB = lubm.UB
NU = 7


def _spark_rows(spark, which):
    df = lubm.lubm_violations(spark, which, n_univ=NU)
    return sorted((r.focus, r.shape, r.path, r.constraint, r.value) for r in df.collect())


def _oracle_rows(which):
    rows = duckdb.connect().execute(lubm.oracle_sql(which, n_univ=NU)).fetchall()
    return sorted(tuple(map(str, r)) for r in rows)


def test_shapes_compile_counts(spark):
    assert len(lubm.lubm_shapes(1)) == 3
    assert len(lubm.lubm_shapes(2)) == 7
    assert len(lubm.lubm_shapes(3)) == 14
    # the node-level sh:not on PublicationShape must compile as a negated
    # property shape, not be silently dropped
    pub = [s for s in lubm.lubm_shapes(2) if s.shape_id == UB + "PublicationShape"][0]
    assert len(pub.not_properties) == 1
    assert pub.not_properties[0].path == UB + "publicationAuthor"
    assert pub.not_properties[0].node_ref == UB + "UndergraduateStudentShape"


@pytest.mark.parametrize("which", [1, 2, 3])
def test_lubm_schema_report_parity(spark, which):
    got = _spark_rows(spark, which)
    want = _oracle_rows(which)
    missing = [r for r in want if r not in got]
    extra = [r for r in got if r not in want]
    assert not missing and not extra, (
        f"schema{which}: missing={missing[:5]} extra={extra[:5]} "
        f"(got {len(got)} want {len(want)})"
    )
    assert len(got) > 0


def test_lubm_spot_checks(spark):
    got = set(_spark_rows(spark, 2))
    # university 3 (3%7==3) has no name
    assert ("u:3", UB + "UniversityShape", UB + "name", "minCount", "0") in got
    # university 5 (5%11==5) has two names
    assert ("u:5", UB + "UniversityShape", UB + "name", "maxCount", "2") in got
    # department 2 (2%13==2) nameless; professor pointing at a dept whose
    # university u=1 is fine but dept 4 (4%9==4) lacks subOrganizationOf →
    # dept 4 non-conforming → prof 8 (works for dept 4) gets a value violation
    assert ("d:2", UB + "DepartmentShape", UB + "name", "minCount", "0") in got
    assert ("p:8", UB + "FullProfessorShape", UB + "worksFor", "value", "d:4") in got
    assert ("p:8", UB + "FullProfessorShape", UB + "headOf", "value", "d:4") in got
    # publication 0 (0%4==0): authors st:0, st:1 — st:0 and st:1 conform at
    # NU=7 iff their modular predicates all pass; verify the sh:not row is
    # present exactly when the oracle says so (consistency already covered by
    # parity; this pins the constraint label)
    not_rows = {r for r in got if r[3] == "not"}
    for focus, shape, path, _c, value in not_rows:
        assert shape == UB + "PublicationShape" and path == UB + "publicationAuthor"
        assert value == "2"
