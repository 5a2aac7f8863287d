"""Graph-analytics operators over the triple store: fixed-point-integer
PageRank for entity-importance ranking.

KG construction at web scale needs an importance signal over the canonical
entity graph — it feeds entity-linking priors (rank candidate entities by
centrality, the role `prior` plays in extract/linking.py), crawl/reprocess
prioritization, and "which hub entities deserve skew handling" diagnostics
(kgbench.q_kg_degree_topk finds the hubs; this ranks everything else too).
The reference engine has no counterpart (it is an rdflib reasoner,
/root/reference/ReSHACL/re_shacl.py); the design obligations are Spark-native:

* **Deterministic integer arithmetic.**  Ranks are parts-per-million longs,
  not doubles: every step is integer division / multiplication / an integer
  SUM, all of which are exact and commutative, so the result is bit-identical
  at ANY partitioning / parallelism / aggregation order — and a DuckDB oracle
  reproduces it exactly.  Float PageRank cannot make that promise (double
  addition is not associative; tree-aggregation order varies run to run).
* **One shuffle per iteration.**  Each round is contribution = rank DIV
  out-degree shipped along edges (a join on the edge's source), then a SUM
  grouped by destination — partial-aggregated map-side, one exchange on the
  destination key.  The edge list and degree table are computed once and
  reused; only the rank frame changes across iterations.
* **Hub skew.**  The groupBy(dst) aggregation is the skew point (a hub entity
  receives edges from everywhere); SUM is algebraic, so map-side combine
  already collapses per-task duplicates, and AQE skew-join handles the
  residual — same posture as the sameAs CC (canonicalize/cc.py), which salts
  only beyond the executor-memory threshold.
* **Fixed iteration count, O(1) plan.**  Each iteration ends in an eager
  localCheckpoint: lineage stays one-round deep (the same truncation contract
  as pipeline.fuse), so 10–50 iterations at 10^12 edges never re-plan or
  re-execute earlier rounds.

Dangling mass (nodes with no out-edges — literals never enter; leaf IRIs do)
is dropped, not redistributed: rank_i(v) = BASE + d·Σ_{u→v} rank_{i-1}(u) DIV
deg(u), the common "simplified PageRank" variant (the original Brin/Page
formulation).  BASE = (1−d)·SCALE keeps ranks on an absolute ppm scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # ranks are parts-per-million longs


def entity_edges(triples: DataFrame) -> DataFrame:
    """Distinct directed entity pairs of the graph: one (src, dst) row per
    connected IRI pair, predicates collapsed, literal objects dropped (they
    are not entities).  One dropDuplicates shuffle; at 10^12 triples this is
    the standard edge-list projection every graph algorithm starts from."""
    out = triples
    if "is_lit" in out.columns:
        out = out.filter(~F.col("is_lit"))
    return (
        out.select(F.col("s").alias("src"), F.col("o").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )


def pagerank(
    triples: DataFrame,
    iterations: int = 2,
    damping_ppm: int = 850_000,
    checkpoint: bool = True,
) -> DataFrame:
    """Deterministic integer PageRank over the triple store's entity graph.

    Returns (node, rank_ppm): every IRI that occurs as subject or object of
    an entity edge, with its rank after ``iterations`` rounds in
    parts-per-million (initial rank = 1_000_000 for every node).

    ``damping_ppm`` is the damping factor in ppm (850_000 = the classic
    0.85).  All arithmetic is long-integer (DIV truncates toward zero on the
    non-negative operands here), so the result is independent of
    partitioning, aggregation order and engine — the DuckDB mirror in
    kgbench.SQL_KG_PAGERANK reproduces it bit-for-bit with the iterations
    unrolled as CTEs.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")

    def ckpt(df: DataFrame) -> DataFrame:
        # checkpoint=False keeps the full lineage visible for plan audits
        # (scripts/plan_audit.py); production runs truncate per round
        return df.localCheckpoint(eager=True) if checkpoint else df

    edges = ckpt(entity_edges(triples))
    nodes = ckpt(
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # out-degree is edge-list-sized and reused every round
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base = SCALE - damping_ppm  # (1-d) on the ppm scale
    rank = nodes.select("node", F.lit(SCALE).cast("long").alias("rank_ppm"))
    for _ in range(iterations):
        contrib = (
            edges.join(deg, "src")
            .join(rank.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_ppm div deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
        )
        rank = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    # decimal(38,0) intermediate: d*m in bigint overflows once
                    # a hub's summed in-contributions pass ~1.08e13 ppm
                    # (~10^7 nodes' mass) — reachable below the 10^12-edge
                    # target; IntegralDivide on decimal returns bigint
                    + F.expr(
                        f"(cast(coalesce(m, 0L) as decimal(38,0))"
                        f" * {damping_ppm}) div {SCALE}"
                    )
                ).alias("rank_ppm"),
            )
        )
        rank = ckpt(rank)  # O(1) lineage across rounds
    return rank
