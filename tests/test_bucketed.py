"""Bucketed triple-store evidence: a store written with bucketBy(s) serves
subject-subject joins WITHOUT a shuffle on either side — the co-located join
layout SURVEY §1.4 names for the 100 TB triple store (rewrite joins and
validation groupBys are keyed by s).

Spark bucketing requires a catalog table (saveAsTable); the test parks the
table under the session's warehouse dir and drops it afterwards.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_self_join_has_no_exchange(spark, tmp_path):
    from re_shacl_spark.model.triples import iri_triple, triples_df

    rows = [
        iri_triple(f"http://x/s{i % 50}", f"http://x/p{i % 7}", f"http://x/o{i}")
        for i in range(400)
    ]
    df = triples_df(spark, rows)
    name = "bucketed_triples_test"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.bucketBy(8, "s").sortBy("s")
        .option("path", str(tmp_path / "tbl"))
        .saveAsTable(name)
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try:
        # at test size the planner would broadcast (hiding the layout); force
        # the shuffle-vs-bucket decision the layout exists to win at scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t = spark.table(name)
        a = t.filter(F.col("p") == "http://x/p1").select("s", F.col("o").alias("o1"))
        b = t.filter(F.col("p") == "http://x/p2").select("s", F.col("o").alias("o2"))
        joined = a.join(b, "s")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join must consume the bucketed layout directly: no shuffle
        # exchange on either side (broadcast would also hide a shuffle-free
        # plan, so forbid that too and require a sort-merge over buckets)
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        n = joined.count()
        # oracle: plain join on the un-bucketed frame
        a0 = df.filter(F.col("p") == "http://x/p1").select("s", F.col("o").alias("o1"))
        b0 = df.filter(F.col("p") == "http://x/p2").select("s", F.col("o").alias("o2"))
        assert n == a0.join(b0, "s").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
