"""Distributed connected-components stress: the salted large-star/small-star
path on a skewed synthetic graph (one hub in ~30% of edges — the north-star
skew case — plus 8-groups and long chains), driver fast path disabled.

  python jobs/cc_bench.py --edges 2000000 [--salts 8]
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
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--salts", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    if "PYSPARK_GATEWAY_PORT" in os.environ:
        spark = SparkSession.builder.getOrCreate()
    else:
        from re_shacl_spark.session import get_spark

        cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        spark = get_spark("cc_bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from re_shacl_spark.canonicalize.cc import connected_components

    n = args.edges
    base = spark.range(n)
    v = lambda c: F.concat(F.lit("v"), c.cast("string"))  # noqa: E731
    # 70%: group edges (i -> i - i%8); 30%: hub edges (i -> hub) — heavy skew
    edges = base.select(
        v(F.col("id")).alias("u"),
        F.when(F.col("id") % 10 < 3, F.lit("vhub")).otherwise(
            v(F.col("id") - F.col("id") % 8)
        ).alias("v"),
    ).localCheckpoint(eager=True)
    n_edges = edges.count()

    t0 = time.time()
    reps = connected_components(edges, n_salts=args.salts, driver_threshold=0)
    n_members = reps.count()
    wall = time.time() - t0
    print(json.dumps({
        "edges": n_edges,
        "salts": args.salts,
        "members": n_members,
        "parallelism": spark.sparkContext.defaultParallelism,
        "wall_sec": round(wall, 2),
        "edges_per_sec": round(n_edges / wall, 1),
    }))


if __name__ == "__main__":
    main()
