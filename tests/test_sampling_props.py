"""Property-based invariants for ops/sampling.py (hypothesis).

Each property is the operator's scale contract, checked over randomized
small inputs: determinism under repartitioning, exact quotas, gapless
packing.  Example counts are kept low — every example runs Spark jobs.
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

ids = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60, unique=True
)


@SETTINGS
@given(doc_ids=ids, rate=st.floats(min_value=0.0, max_value=1.0))
def test_hash_sample_is_a_deterministic_subset(spark, doc_ids, rate):
    from re_shacl_spark.ops import sampling as SMP

    d = spark.createDataFrame([(i,) for i in doc_ids], ["doc_id"])
    a = {r.doc_id for r in SMP.hash_sample(d, rate).collect()}
    b = {r.doc_id for r in SMP.hash_sample(d.repartition(5), rate).collect()}
    assert a == b and a <= set(doc_ids)


@SETTINGS
@given(
    doc_ids=ids,
    n_strata=st.integers(min_value=1, max_value=4),
    quota=st.integers(min_value=1, max_value=7),
)
def test_stratified_quota_exact(spark, doc_ids, n_strata, quota):
    from re_shacl_spark.ops import sampling as SMP

    rows = [(i, f"s{i % n_strata}") for i in doc_ids]
    d = spark.createDataFrame(rows, ["doc_id", "source"])
    per = {
        r.source: r["count"]
        for r in SMP.stratified_sample(d, quota)
        .groupBy("source")
        .count()
        .collect()
    }
    from collections import Counter

    sizes = Counter(s for _, s in rows)
    assert per == {s: min(n, quota) for s, n in sizes.items()}


@SETTINGS
@given(
    toks=st.lists(st.integers(min_value=1, max_value=900), min_size=1, max_size=50),
    budget=st.integers(min_value=16, max_value=600),
)
def test_pack_sequences_gapless_and_invariant(spark, toks, budget):
    from re_shacl_spark.ops import sampling as SMP

    d = spark.createDataFrame(list(enumerate(toks)), ["doc_id", "bpe_tokens"])
    rows = sorted(tuple(r) for r in SMP.pack_sequences(d, budget).collect())
    alt = sorted(
        tuple(r) for r in SMP.pack_sequences(d.repartition(7), budget).collect()
    )
    assert rows == alt                                  # parallelism-invariant
    # reconstruct global starts: gapless cover of [0, sum(toks))
    starts = sorted(sid * budget + off for _, _, sid, off in rows)
    tok_of = {}
    for _, t, sid, off in rows:
        tok_of[sid * budget + off] = t
    cursor = 0
    for s in starts:
        assert s == cursor
        cursor += tok_of[s]
    assert cursor == sum(toks)
    assert all(0 <= off < budget for _, _, _, off in rows)
