"""End-to-end KG-construction DAG: correctness, resume, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from re_shacl_spark import corpus
from re_shacl_spark.checkpoint import CheckpointStore
from re_shacl_spark.extract.emit import SURFACE_P
from re_shacl_spark.job import CLS, construct_kg
from re_shacl_spark.model.triples import vocab

N_PAGES = 800


def _run(spark, store=None):
    pages = corpus.generate_pages(spark, N_PAGES, seed=11)
    return construct_kg(spark, pages, corpus.alias_rows(), store=store)


def test_full_dag_semantics(spark):
    res = _run(spark)
    triples = {(r.s, r.p, r.o) for r in res.triples.collect()}

    # mention nodes merged INTO entity ids (entity IRIs sort below mention IRIs):
    # surface literals now hang off the canonical entity
    hub = "http://kg.example.org/entity/E000_hub"
    assert (hub, SURFACE_P, "acme corp") in triples
    reps = {r.member: r.rep for r in res.rep_map.collect()}
    assert reps.get("http://kg.example.org/mention/acme_corp") == hub
    # subclass typing materialized: hub is an Organization and an Entity
    assert (hub, vocab.TYPE, CLS + "Organization") in triples
    assert (hub, vocab.TYPE, CLS + "Entity") in triples
    # domain rule typed every mentioning page
    pages_typed = {s for s, p, o in triples if p == vocab.TYPE and o == CLS + "Page"}
    assert len(pages_typed) > 0

    # violations: only PageShape maxCount (3 mentions) fires on this corpus
    v = res.violations.collect()
    assert all(r.constraint == "maxCount" for r in v)
    assert res.metrics["violations"] > 0
    # conformant excludes exactly the violating subjects
    bad = {r.focus for r in v}
    conf_subjects = {r.s for r in res.conformant.collect()}
    assert conf_subjects.isdisjoint(bad)
    assert res.metrics["conformant_triples"] < res.metrics["fused_triples"]


def test_resume_identical_and_no_recompute(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ck"))
    r1 = _run(spark, store)
    # fresh run against a complete store: every stage resumes
    r2 = _run(spark, store)
    for k in ("fused_triples", "conformant_triples", "violations"):
        assert r1.metrics[k] == r2.metrics[k]
    assert store.lineage().filter(F.col("stage") == "s4_fused").count() > 0
    assert int(store.stage_meta("s4_fused")["rounds"]) == r1.rounds


def test_resume_invalidates_on_same_schema_different_data(spark, tmp_path):
    """Non-file-backed inputs fingerprint their CONTENT (ADVICE r2): resuming
    with a same-schema corpus of different rows must recompute, not serve the
    previous run's checkpoints."""
    store = CheckpointStore(spark, str(tmp_path / "ck"))
    pages_a = corpus.generate_pages(spark, N_PAGES, seed=11)
    r1 = construct_kg(spark, pages_a, corpus.alias_rows(), store=store)
    pages_b = corpus.generate_pages(spark, N_PAGES // 2, seed=12)
    r2 = construct_kg(spark, pages_b, corpus.alias_rows(), store=store)
    assert r1.metrics["fused_triples"] != r2.metrics["fused_triples"]
    # and the smaller corpus really flowed through: direct run parity
    r3 = construct_kg(spark, corpus.generate_pages(spark, N_PAGES // 2, seed=12),
                      corpus.alias_rows())
    assert r2.metrics["fused_triples"] == r3.metrics["fused_triples"]


def test_determinism_across_runs(spark):
    a = _run(spark)
    b = _run(spark)
    ta = sorted((r.s, r.p, r.o) for r in a.conformant.collect())
    tb = sorted((r.s, r.p, r.o) for r in b.conformant.collect())
    assert ta == tb


def test_input_token_resume_and_invalidation(spark, tmp_path):
    """Callers that know their input's identity (deterministic generator args,
    an Iceberg snapshot id in production) pass input_token and skip the
    content-scan fingerprint.  Same token -> every stage resumes; different
    token -> full recompute, never a stale checkpoint."""
    store = CheckpointStore(spark, str(tmp_path / "ck"))
    pages_a = corpus.generate_pages(spark, N_PAGES, seed=11)
    tok_a = corpus.pages_token(N_PAGES, seed=11)
    r1 = construct_kg(spark, pages_a, corpus.alias_rows(), store=store,
                      input_token=tok_a)
    # same token: resumed (metrics identical, lineage intact)
    r2 = construct_kg(spark, pages_a, corpus.alias_rows(), store=store,
                      input_token=tok_a)
    for k in ("fused_triples", "conformant_triples", "violations"):
        assert r1.metrics[k] == r2.metrics[k]
    # changed token (different corpus identity): must recompute, and the new
    # corpus really flows through — parity with a store-less direct run
    pages_b = corpus.generate_pages(spark, N_PAGES // 2, seed=12)
    tok_b = corpus.pages_token(N_PAGES // 2, seed=12)
    assert tok_a != tok_b
    r3 = construct_kg(spark, pages_b, corpus.alias_rows(), store=store,
                      input_token=tok_b)
    r4 = construct_kg(spark, pages_b, corpus.alias_rows())
    assert r3.metrics["fused_triples"] == r4.metrics["fused_triples"]
    assert r1.metrics["fused_triples"] != r3.metrics["fused_triples"]
