"""Entity-link disambiguation by page-level embedding coherence.

``extract/mentions.py`` detects alias hits against a broadcast alias→candidate
dictionary with prior scores (the reference feeds rdflib from exactly such
link decisions; /root/reference/ReSHACL builds its graph from pre-linked
triples).  An ambiguous alias carries several candidate entities — this module
picks one per (page, alias) by COHERENCE: entities mentioned together on a
page tend to be related, so each candidate is scored against the page's
embedding centroid:

    score(url, e) = prior(url, alias, e) * (1 + cos(emb(e), centroid(url))) / 2
    centroid(url) = element-wise mean of all candidate-entity embeddings on url

Everything is JVM column algebra — posexplode to (url, entity, idx, value)
rows, one aggregation per (url, idx) for the centroid, one per (url, entity)
for dot/norms, one window for the per-(url, alias) argmax.  No Python UDF.

Scale shape: shuffles key on (url, idx) and (url, entity) — both bounded by
pages × dims and pages × page-entities; the winner window shuffles on
(url, alias).  Entity embeddings join by entity id (sort-merge/shuffled-hash;
broadcast when the dictionary is small).  At 10^12 pages nothing here is
quadratic: every stage is linear in mentions × dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coherence_disambiguate(
    candidates: DataFrame, entity_emb: DataFrame
) -> DataFrame:
    """Pick one entity per (url, alias) from ambiguous candidates.

    ``candidates``: (url, alias, entity, prior) — duplicates allowed (per
    occurrence); scoring is page-level so they collapse first.
    ``entity_emb``: (entity, emb array<double>).
    Returns (url, alias, entity, score) — the argmax candidate, score rounded
    to 6 decimals, ties broken by entity id for determinism.
    """
    cand = candidates.select("url", "alias", "entity", "prior").distinct()
    page_ent = cand.select("url", "entity").distinct()
    un = page_ent.join(entity_emb, "entity").select(
        "url", "entity", F.posexplode("emb").alias("idx", "v")
    )
    cent = un.groupBy("url", "idx").agg(F.avg("v").alias("c"))
    d = (
        un.join(cent, ["url", "idx"])
        .groupBy("url", "entity")
        .agg(
            F.sum(F.col("v") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nv"),
            F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nc"),
        )
    )
    cos = F.when(
        (F.col("nv") > 0) & (F.col("nc") > 0), F.col("dot") / (F.col("nv") * F.col("nc"))
    ).otherwise(F.lit(0.0))
    scored = cand.join(d, ["url", "entity"]).withColumn(
        "score", F.round(F.col("prior") * (F.lit(1.0) + cos) / F.lit(2.0), 6)
    )
    w = Window.partitionBy("url", "alias").orderBy(
        F.col("score").desc(), F.col("entity")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("url", "alias", "entity", "score")
    )
