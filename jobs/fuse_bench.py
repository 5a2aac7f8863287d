"""Fuse-stage scaling stress: run the reasoning+canonicalization fixpoint over
a synthetic N-triple graph (JVM-generated, so generation is not the bottleneck)
and report triples/sec.  Used by scripts/scaling.py-style evidence at two
parallelism levels where the graph stage — not the Python front end — is the
scaling subject.

  spark-submit --master local[4] jobs/fuse_bench.py --triples 4000000
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
    ap.add_argument("--triples", type=int, default=4_000_000)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    if "PYSPARK_GATEWAY_PORT" in os.environ:
        spark = SparkSession.builder.getOrCreate()
    else:
        from re_shacl_spark.session import get_spark

        cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        spark = get_spark("fuse_bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from re_shacl_spark.model.triples import iri_triple, triples_df, vocab
    from re_shacl_spark.pipeline import fuse

    n = args.triples // 2  # two ABox edges per i below
    base = spark.range(n)
    e = F.concat(F.lit("e:"), F.col("id").cast("string"))
    e2 = F.concat(F.lit("e:"), ((F.col("id") * 7 + 1) % n).cast("string"))

    def rows(s, p, o):
        return base.select(
            s.alias("s"), F.lit(p).alias("p"), o.alias("o"),
            F.lit(None).cast("struct<lex:string,dtype:string,lang:string>").alias("o_lit"),
            F.lit(False).alias("is_lit"), F.lit(None).cast("string").alias("src_url"),
        )

    knows = rows(e, "kg:knows", e2)
    types = base.filter(F.col("id") % 3 == 0).select(
        F.concat(F.lit("e:"), F.col("id").cast("string")).alias("s"),
        F.lit(vocab.TYPE).alias("p"), F.lit("kg:P").alias("o"),
        F.lit(None).cast("struct<lex:string,dtype:string,lang:string>").alias("o_lit"),
        F.lit(False).alias("is_lit"), F.lit(None).cast("string").alias("src_url"),
    )
    sameas = base.filter(F.col("id") % 1000 == 0).select(
        F.concat(F.lit("e:"), F.col("id").cast("string")).alias("s"),
        F.lit(vocab.SAMEAS).alias("p"),
        F.concat(F.lit("d:"), F.col("id").cast("string")).alias("o"),
        F.lit(None).cast("struct<lex:string,dtype:string,lang:string>").alias("o_lit"),
        F.lit(False).alias("is_lit"), F.lit(None).cast("string").alias("src_url"),
    )
    tbox = triples_df(spark, [
        iri_triple("kg:knows", vocab.DOMAIN, "kg:P"),
        iri_triple("kg:knows", vocab.RANGE, "kg:P"),
        iri_triple("kg:knows", vocab.INVERSEOF, "kg:knownBy"),
        iri_triple("kg:P", vocab.SUBCLASS, "kg:Q"),
        iri_triple("kg:Q", vocab.SUBCLASS, "kg:R"),
    ])
    g = knows.unionByName(types).unionByName(sameas).unionByName(tbox)
    g = g.repartition(spark.sparkContext.defaultParallelism, "s").localCheckpoint(eager=True)
    n_in = g.count()

    t0 = time.time()
    res = fuse(spark, g, assume_distinct=True)
    n_out = res.triples.count()
    wall = time.time() - t0
    print(json.dumps({
        "triples_in": n_in,
        "triples_out": n_out,
        "parallelism": spark.sparkContext.defaultParallelism,
        "wall_sec": round(wall, 2),
        "rounds": res.rounds,
        "triples_per_sec": round(n_out / wall, 1),
    }))


if __name__ == "__main__":
    main()
