"""Incremental-maintenance crossover: fold a small ABox increment into a
closed base via fuse_delta and compare against re-fusing everything, at a
base size where per-job fixed overhead no longer dominates (VERDICT r4 next
#6: the sf0.1 measurement shows 1.3-2.0x because the toy graph's wall is
mostly job barriers; the |delta|-proportionality claim needs a point where
the base is big enough for the full re-fuse to pay real shuffle cost).

  python jobs/delta_bench.py --triples 4000000 --delta-permille 5

Prints ONE JSON line: n_triples, n_delta, refuse_sec, increment_sec,
speedup, rows_match.
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
    ap.add_argument("--delta-permille", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    if "PYSPARK_GATEWAY_PORT" in os.environ:
        spark = SparkSession.builder.getOrCreate()
    else:
        from re_shacl_spark.session import get_spark

        cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        spark = get_spark("delta_bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from re_shacl_spark.model.triples import iri_triple, triples_df, vocab
    from re_shacl_spark.pipeline import fuse, fuse_delta

    # same synthetic shape as jobs/fuse_bench.py: knows-ring + typed third +
    # sparse sameAs, TBox with domain/range/inverse + subclass chain
    n = args.triples // 2
    ids = spark.range(n)
    e = F.concat(F.lit("e:"), F.col("id").cast("string"))
    e2 = F.concat(F.lit("e:"), ((F.col("id") * 7 + 1) % n).cast("string"))

    def rows(s, p, o):
        return ids.select(
            s.alias("s"), F.lit(p).alias("p"), o.alias("o"),
            F.lit(None).cast("struct<lex:string,dtype:string,lang:string>").alias("o_lit"),
            F.lit(False).alias("is_lit"), F.lit(None).cast("string").alias("src_url"),
        )

    knows = rows(e, "kg:knows", e2)
    types = rows(e, vocab.TYPE, F.lit("kg:P")).filter(
        F.expr("cast(substring(s, 3) as long)") % 3 == 0
    )
    sameas = rows(e, vocab.SAMEAS, F.concat(F.lit("d:"), F.col("id").cast("string"))).filter(
        F.expr("cast(substring(s, 3) as long)") % 1000 == 0
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

    # a crawl-like increment: delta_permille of the knows edges by subject id
    is_delta = (F.col("p") == "kg:knows") & (
        F.expr("cast(substring(s, 3) as long)") % 1000 < args.delta_permille
    )
    delta = g.filter(is_delta).localCheckpoint(eager=True)
    n_delta = delta.count()

    # settle the closed base OUTSIDE every timed window
    base = fuse(spark, g.filter(~is_delta), assume_distinct=True)
    base.triples.count()

    t0 = time.time()
    inc = fuse_delta(spark, base, delta)
    inc_rows = inc.triples.count()
    increment_sec = time.time() - t0

    t0 = time.time()
    full = fuse(spark, g, assume_distinct=True)
    full_rows = full.triples.count()
    refuse_sec = time.time() - t0

    print(json.dumps({
        "n_triples": n_in,
        "n_delta": n_delta,
        "delta_fraction": round(n_delta / n_in, 5),
        "refuse_sec": round(refuse_sec, 2),
        "increment_sec": round(increment_sec, 2),
        "speedup": round(refuse_sec / increment_sec, 2) if increment_sec > 0 else None,
        "rows_match": inc_rows == full_rows,
        "rows": full_rows,
    }))


if __name__ == "__main__":
    main()
