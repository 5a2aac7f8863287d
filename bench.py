"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys: triples_per_sec (BASELINE.json's throughput metric — fused triples
emitted by the flagship fusion per second of its wall time) and rows per query.

Each query is forced end-to-end with a noop write (full computation, no driver
collect bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from re_shacl_spark import kgbench  # noqa: E402
from re_shacl_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "kg_fuse",
    "j10_inverse_functional_sameas",
    "j13_connected_components",
    "v_mincount",
    "kg_emit_triples",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "sim_topk_bruteforce",
    "text_quality",
    "text_fingerprint",
    "rel_q1",
    # the reference's headline workload: all 30 committed DBpedia shapes /
    # 611 property shapes validated end-to-end in one pass
    "v_shape30_report",
]


def _force(df) -> int:
    """Materialize the full result; returns row count (cheap after cache)."""
    df = df.cache()
    n = df.count()
    df.unpersist()
    return n


def _fuse_stress() -> float | None:
    """Scale-path evidence: the reasoning fixpoint over a synthetic
    multi-million-triple graph (JVM-generated; no Python in the data path) —
    the number that tracks 100 TB readiness, vs the barrier-bound toy-scale
    kg_fuse headline.  MUST run before the parent bench session exists: two
    local[32] JVMs contend for the same cores and understate throughput ~3×
    (BENCH_r02's 47k vs 116-120k standalone — VERDICT r2 #1)."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "jobs", "fuse_bench.py"),
             "--triples", "2000000"],
            capture_output=True, text=True, timeout=300,
        )
        line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
        if line:
            return json.loads(line[-1])["triples_per_sec"]
    except Exception:
        pass
    return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    fuse_stress = _fuse_stress()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen paths once (reference protocol: preheat before timing,
    # run_experiment.py:156-159) — including the fixpoint machinery, whose first
    # run pays JIT + codegen compilation across ~30 job barriers
    kgbench.q_rel_q1(spark, sf_dir).count()
    kgbench.q_kg_fuse(spark, "/root/testdata/sf0.001").count()
    # preheat the benchmark SF's parquet into page cache so the first timed
    # query measures compute, not cold disk (reference preheat protocol)
    for t in ("customer", "supplier", "nation", "orders", "documents", "embeddings"):
        kgbench._read(spark, sf_dir, t).count()

    per_q: dict[str, float] = {}
    rows: dict[str, int] = {}
    triples_per_sec = None
    for name in HEADLINE:
        t0 = time.time()
        n = _force(kgbench.QUERIES[name](spark, sf_dir))
        dt = time.time() - t0
        per_q[name] = round(dt, 3)
        rows[name] = n
        if name == "kg_fuse":
            triples_per_sec = round(n / dt, 1)

    # A1-style ablation metric, now the reference's full THREE-method
    # comparison (run_experiment.py methods + inter_graph): merged (Re-SHACL) /
    # expansion-only (withoutM) / full unscoped closure (owlrl-style), all on
    # the same sameAs-rich slice — size AND wall per arm, blowups vs merged
    expand_blowup = None
    try:
        from re_shacl_spark.pipeline import fuse, fuse_expand, fuse_full

        g = kgbench.ablation_graph(spark, sf_dir)
        t0 = time.time()
        merged_n = _force(fuse(spark, g, emit_sameas_provenance=False).triples)
        t_merged = time.time() - t0
        t0 = time.time()
        expanded_n = _force(fuse_expand(spark, g).triples)
        t_expanded = time.time() - t0
        t0 = time.time()
        full_n = _force(fuse_full(spark, g).triples)
        t_full = time.time() - t0
        expand_blowup = {
            "merged_triples": merged_n,
            "expanded_triples": expanded_n,
            "full_triples": full_n,
            "expand_blowup": round(expanded_n / max(merged_n, 1), 3),
            "full_blowup": round(full_n / max(merged_n, 1), 3),
            "merged_sec": round(t_merged, 2),
            "expanded_sec": round(t_expanded, 2),
            "full_sec": round(t_full, 2),
        }
    except Exception:
        pass

    # incremental-maintenance metric: folding a ~15% ABox increment into a
    # closed base via fuse_delta vs re-closing everything (the kg_fuse wall).
    # Identical output row count is asserted — speedup without parity is noise.
    delta_increment = None
    try:
        from pyspark.sql import functions as F

        from re_shacl_spark.pipeline import fuse, fuse_delta

        t = kgbench.rel_triples(spark, sf_dir)
        plain = (F.col("p") == "kg:placedBy") & (
            F.expr("cast(substring(s, 3) as long)") % 7 == 0
        )
        bridge = plain | ((F.col("p") == "kg:next") & (F.col("s") == "n:12"))
        delta_increment = {"full_refuse_sec": per_q.get("kg_fuse")}
        for label, cond in (("plain_abox", plain), ("trans_bridge", bridge)):
            base = fuse(spark, t.filter(~cond), assume_distinct=True)
            _force(base.triples)  # settle the base outside the timed window
            t0 = time.time()
            inc = fuse_delta(spark, base, t.filter(cond))
            inc_rows = _force(inc.triples)
            t_inc = time.time() - t0
            delta_increment[label] = {
                "increment_sec": round(t_inc, 2),
                "rows_match_full": inc_rows == rows.get("kg_fuse"),
                "speedup_vs_refuse": round(per_q["kg_fuse"] / t_inc, 2)
                if per_q.get("kg_fuse")
                else None,
            }
    except Exception:
        pass

    total = round(sum(per_q.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": per_q,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "triples_per_sec": triples_per_sec,
                "fuse_stress_triples_per_sec": fuse_stress,
                "expand_ablation": expand_blowup,
                "delta_increment": delta_increment,
                "rows": rows,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            }
        )
    )


if __name__ == "__main__":
    main()
