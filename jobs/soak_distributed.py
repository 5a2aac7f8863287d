"""Forced-scale soak of the two scale branches toy data never reaches
(VERDICT r2 #9):

  A. the rep-map rewrite ABOVE the 2M-row broadcast gate — canonicalize_triples
     must auto-select the sort-merge branch (no broadcast of a map that would
     OOM executors at 100 TB) and still produce the exact closed-form counts;
  B. near_dup_clusters with its LSH candidate-pair frame ABOVE the CC driver
     threshold (100k edges) — the salted large-star/small-star DISTRIBUTED
     path runs through the op's own default gates (no forced threshold=0),
     min-id survivor election verified in closed form.

Everything is JVM-generated (spark.range + column algebra, no Python in the
data path).  Prints ONE JSON line; scripts/scaling.py-style recording lands in
BENCH.md §soak.

  python jobs/soak_distributed.py [--members 2500000] [--groups 40000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=2_500_000,
                    help="rep-map rows (> BROADCAST_REP_MAP_MAX_ROWS forces sort-merge)")
    ap.add_argument("--groups", type=int, default=40_000,
                    help="near-dup groups of 3 identical docs (3 LSH pairs each)")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    if "PYSPARK_GATEWAY_PORT" in os.environ:
        spark = SparkSession.builder.getOrCreate()
    else:
        from re_shacl_spark.session import get_spark

        cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        spark = get_spark("soak_distributed", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from re_shacl_spark.canonicalize.rewrite import (
        BROADCAST_REP_MAP_MAX_ROWS,
        canonicalize_triples,
    )

    out: dict = {"broadcast_gate_rows": BROADCAST_REP_MAP_MAX_ROWS}

    # -- A: sort-merge rewrite above the broadcast gate ----------------------
    n = args.members
    assert n > BROADCAST_REP_MAP_MAX_ROWS, "soak must exceed the broadcast gate"
    m = lambda c: F.concat(F.lit("m"), c.cast("string"))  # noqa: E731
    # members m0..m(n-1), components of 5 consecutive ids, rep = group min
    rep_map = spark.range(n).select(
        m(F.col("id")).alias("member"),
        m(F.col("id") - F.col("id") % 5).alias("rep"),
    ).localCheckpoint(eager=True)
    # chain triples (m_i, kg:next, m_{i+1}) — every s and o hits the map
    triples = spark.range(n - 1).select(
        m(F.col("id")).alias("s"),
        F.lit("kg:next").alias("p"),
        m(F.col("id") + 1).alias("o"),
        F.lit(None).cast("struct<lex:string,dtype:string,lang:string>").alias("o_lit"),
        F.lit(False).alias("is_lit"),
        F.lit(None).cast("string").alias("src_url"),
    )

    t0 = time.time()
    rewritten = canonicalize_triples(triples, rep_map, broadcast=None)
    # drive THIS QueryExecution to completion JVM-side (df.count() would build
    # a separate aggregate QE and leave this one's AQE plan unfinalized), then
    # read the FINAL adaptive plan — the branch that actually executed
    qe = rewritten._jdf.queryExecution()
    got = qe.executedPlan().execute().count()
    out["rewrite_sec"] = round(time.time() - t0, 2)
    plan = qe.executedPlan().toString()
    out["rewrite_rows"] = got
    out["rewrite_sort_merge_joins"] = plan.count("SortMergeJoin")
    out["rewrite_broadcast_joins"] = plan.count("BroadcastHashJoin")
    # closed form: (rep(i), rep(i+1)) for i<n-1, distinct.  Within a 5-group
    # the 4 internal edges collapse to ONE self-loop-free? no — rep(i)=rep(i+1)
    # for the 4 internal edges → (g,g); crossing edges → (g, g+5).  Distinct:
    # one (g,g) per full group + one (g,g+5) per boundary.
    expected = (
        spark.range(n - 1)
        .select(
            (F.col("id") - F.col("id") % 5).alias("a"),
            ((F.col("id") + 1) - (F.col("id") + 1) % 5).alias("b"),
        )
        .distinct()
        .count()
    )
    out["rewrite_expected"] = expected
    assert got == expected, f"sort-merge rewrite wrong: {got} != {expected}"
    assert out["rewrite_sort_merge_joins"] >= 3 and out["rewrite_broadcast_joins"] == 0, (
        "rep-map above the gate must take the sort-merge branch: " + plan[:2000]
    )

    # -- B: near_dup_clusters through the distributed CC path ----------------
    from re_shacl_spark.ops.dedup import near_dup_clusters

    g = args.groups
    # identical text within each group of 3 → same minhash signature → 3 LSH
    # candidate pairs per group; 3g docs → 3g pairs > the 100k driver cap.
    # Every WORD is group-derived (md5), so no shingle is shared across groups
    # — shared filler words would put the whole corpus in a handful of buckets
    # and turn candidate generation quadratic (the hot-shingle failure mode
    # max_df exists for; here we want clean per-group buckets).
    word = lambda tag: F.md5(F.concat((F.col("id") % g).cast("string"), F.lit(tag)))  # noqa: E731
    docs = spark.range(3 * g).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[word(t) for t in "abcdef"]).alias("text"),
    ).localCheckpoint(eager=True)

    t0 = time.time()
    clusters = near_dup_clusters(docs).localCheckpoint(eager=True)
    out["neardup_sec"] = round(time.time() - t0, 2)
    out["neardup_pairs"] = 3 * g  # one triangle per group > the 100k driver cap
    # group j = ids {j, j+g, j+2g}; CC omits identity rows, so each cluster
    # contributes its 2 non-representative members, rep = numeric min = j
    out["neardup_member_rows"] = clusters.count()
    out["neardup_clusters"] = clusters.select("keep_id").distinct().count()
    bad = clusters.filter(
        (F.col("doc_id") % g != F.col("keep_id")) | (F.col("keep_id") >= g)
    ).count()
    out["neardup_wrong_rows"] = bad
    assert out["neardup_member_rows"] == 2 * g and out["neardup_clusters"] == g and bad == 0, out
    out["cc_driver_threshold"] = 100_000
    out["parallelism"] = spark.sparkContext.defaultParallelism
    print(json.dumps(out))


if __name__ == "__main__":
    main()
