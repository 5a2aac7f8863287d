"""End-to-end validation of the reference's committed Shape_30 graph against
the deterministic DBpedia-like ABox — full-report parity vs the closed-form
DuckDB mirror at a different scale than the driver query, plus census pins."""

from __future__ import annotations

import duckdb

from re_shacl_spark.workloads import shape30

N_ENT = 17


def test_census():
    shapes = shape30.shape30_shapes()
    assert len(shapes) == 30
    assert sum(len(s.properties) for s in shapes) == 611
    spec, extra_types = shape30._spec(shapes)
    # the 30 sh:in-on-rdf:type property shapes are excluded from seeding
    assert len(spec) == 611 - 30
    # every extra-typed class instance is NOT a target class (no accidental foci)
    targets = {tc for s in shapes for tc in s.target_classes}
    assert not (set(extra_types) & targets)


def test_shape30_report_parity(spark):
    df = shape30.shape30_violations(spark, N_ENT)
    got = sorted((r.focus, r.shape, r.path, r.constraint, r.value) for r in df.collect())
    want = sorted(
        tuple(map(str, r))
        for r in duckdb.connect().execute(shape30.oracle_sql(N_ENT)).fetchall()
    )
    assert got == want
    assert len(got) > 100
    # both violation kinds present
    kinds = {r[3] for r in got}
    assert kinds == {"minCount", "value"}
