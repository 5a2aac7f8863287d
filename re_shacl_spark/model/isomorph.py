"""Bnode-aware graph equivalence (SO4) — the reference's golden-output oracle
(/root/reference/src/graph_isomorph.py:1-51) re-expressed as set algebra.

rdflib's `isomorphic` does full bnode bijection search; the reference's checker
counts directional diffs and bnode-involving diffs.  Here bnodes are skolemized
by *signature*: 1-WL refinement — each bnode's label is the hash of its sorted
in/out edge descriptions, where neighbors contribute their current label
(ground terms contribute themselves), iterated a fixed number of rounds.
Graphs whose bnode structure is distinguishable by neighborhood signatures
compare exactly; pathological automorphic bnode twins still compare equal —
the same contract the reference relies on (its shape-graph bnodes are
property-shape containers with ground content)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bnodes(t: DataFrame) -> DataFrame:
    s_side = t.filter(F.col("s").startswith("_:")).select(F.col("s").alias("node"))
    o_side = t.filter(F.col("o").startswith("_:") & ~F.col("is_lit")).select(
        F.col("o").alias("node")
    )
    return s_side.unionByName(o_side).distinct()


def skolemize(triples: DataFrame, rounds: int = 3) -> DataFrame:
    """Rename every bnode to sk:<signature>; deterministic across runs and
    parallelism levels."""
    t = triples.select("s", "p", "o", "is_lit").localCheckpoint(eager=True)
    sig = _bnodes(t).withColumn("sig", F.lit("_:"))
    if sig.isEmpty():
        return triples

    for _ in range(rounds):
        lab = (
            t.join(sig.select(F.col("node").alias("s"), F.col("sig").alias("_ls")), "s", "left")
            .join(sig.select(F.col("node").alias("o"), F.col("sig").alias("_lo")), "o", "left")
            .select(
                "s", "p", "o", "is_lit",
                F.coalesce("_ls", F.col("s")).alias("ls"),
                F.when(F.col("is_lit"), F.col("o")).otherwise(F.coalesce("_lo", F.col("o"))).alias("lo"),
            )
        )
        desc = (
            lab.filter(F.col("s").startswith("_:"))
            .select(F.col("s").alias("node"), F.concat(F.lit("out|"), F.col("p"), F.lit("|"), F.col("lo")).alias("d"))
            .unionByName(
                lab.filter(F.col("o").startswith("_:") & ~F.col("is_lit")).select(
                    F.col("o").alias("node"),
                    F.concat(F.lit("in|"), F.col("p"), F.lit("|"), F.col("ls")).alias("d"),
                )
            )
        )
        sig = (
            desc.groupBy("node")
            .agg(F.md5(F.concat_ws("\x01", F.array_sort(F.collect_list("d")))).alias("sig"))
            .localCheckpoint(eager=True)
        )

    sk = sig.select("node", F.concat(F.lit("sk:"), F.col("sig")).alias("skid"))
    return (
        triples.join(sk.select(F.col("node").alias("s"), F.col("skid").alias("_ss")), "s", "left")
        .withColumn("s", F.coalesce("_ss", "s"))
        .drop("_ss")
        .join(sk.select(F.col("node").alias("o"), F.col("skid").alias("_so")), "o", "left")
        .withColumn("o", F.when(F.col("is_lit"), F.col("o")).otherwise(F.coalesce("_so", "o")))
        .drop("_so")
    )


def graph_diff(a: DataFrame, b: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(a∖b, b∖a) on skolemized (s,p,o) sets — the reference's directional
    diff counts (graph_isomorph.py:19-27)."""
    sa = skolemize(a).select("s", "p", "o").distinct()
    sb = skolemize(b).select("s", "p", "o").distinct()
    return sa.exceptAll(sb), sb.exceptAll(sa)


def graphs_equivalent(a: DataFrame, b: DataFrame) -> bool:
    """Set equality modulo bnode naming (graph_isomorph.py:12-15 contract)."""
    d1, d2 = graph_diff(a, b)
    return d1.isEmpty() and d2.isEmpty()
