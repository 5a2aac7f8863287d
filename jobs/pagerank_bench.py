"""PageRank scaling stress: run ops/graph.pagerank over a synthetic
multi-million-edge entity graph (JVM-generated — generation is never the
bottleneck) with a deliberate hub-skew component, and report edge-iterations
per second.  Evidences the operator's one-shuffle-per-iteration claim at a
size where the shuffle, not the job barrier, dominates.

  spark-submit --master local[4] jobs/pagerank_bench.py --edges 4000000
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
    ap.add_argument("--edges", type=int, default=4_000_000)
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--hub-share", type=float, default=0.2,
                    help="fraction of edges pointing at one hub node")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    if "PYSPARK_GATEWAY_PORT" in os.environ:
        spark = SparkSession.builder.getOrCreate()
    else:
        from re_shacl_spark.session import get_spark

        cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        spark = get_spark(
            "pagerank_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
        )
    spark.sparkContext.setLogLevel("ERROR")

    from re_shacl_spark.ops.graph import pagerank

    n_nodes = max(args.edges // 4, 1)
    base = spark.range(args.edges)
    src = F.concat(F.lit("e:"), (F.col("id") % n_nodes).cast("string"))
    # hub-share of edges land on node e:0 (the boilerplate-entity skew case);
    # the rest follow a scrambled affine map
    dst = F.when(
        F.col("id") % 100 < int(args.hub_share * 100), F.lit("e:0")
    ).otherwise(
        F.concat(F.lit("e:"), ((F.col("id") * 7 + 3) % n_nodes).cast("string"))
    )
    triples = base.select(
        src.alias("s"), F.lit("p:link").alias("p"), dst.alias("o"),
        F.lit(None).cast("struct<lex:string,dtype:string,lang:string>").alias("o_lit"),
        F.lit(False).alias("is_lit"),
        F.lit(None).cast("string").alias("src_url"),
    ).localCheckpoint(eager=True)  # materialize input OUTSIDE the timed window

    t0 = time.time()
    ranks = pagerank(triples, iterations=args.iterations)
    n_ranked = ranks.count()
    hub = ranks.filter(F.col("node") == "e:0").first()
    wall = time.time() - t0
    print(json.dumps({
        "edges": args.edges,
        "iterations": args.iterations,
        "nodes_ranked": n_ranked,
        "hub_rank_ppm": hub["rank_ppm"] if hub else None,
        "wall_sec": round(wall, 2),
        "edge_iterations_per_sec": round(args.edges * args.iterations / wall, 1),
    }))


if __name__ == "__main__":
    main()
