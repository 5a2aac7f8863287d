"""Per-method RunTimeResults table — the reference's side-by-side harness
(run_experiment.py:40-84,88-135: PrettyTable['Method', 'Average validation
time (s)', 'Standard deviation', 'Conform', '#Violation'] appended to
Outputs/<dataset>/RunTimeResults.txt), re-expressed over this engine's method
arms (VERDICT r3 "What's missing" #3).

The dataset is the deterministic LUBM ABox (workloads/lubm.py) seeded with
owl:sameAs professor aliases (p % 10 == 0 → p ~ pa:p), so the merge-vs-expand
arms genuinely differ: under merged semantics the alias collapses onto its
canonical node (one violation row per real defect, the Re-SHACL claim); under
expansion semantics properties copy through to the alias and its violations
duplicate — the same report-size blowup the reference measures pyshacl
against.  Each method row times fuse+validate end-to-end, 3 reps, mean ± std,
like the reference's loop at run_experiment.py:47-55.

Usage: python scripts/runtime_results.py [--n-univ 10] [--schema 1]
Writes Outputs/lubm<schema>/RunTimeResults.txt and prints the table.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _table(rows: list[list[str]], header: list[str]) -> str:
    cols = [header] + rows
    widths = [max(len(str(r[i])) for r in cols) for i in range(len(header))]

    def line(ch: str = "-") -> str:
        return "+" + "+".join(ch * (w + 2) for w in widths) + "+"

    def fmt(r: list[str]) -> str:
        return "| " + " | ".join(str(v).ljust(w) for v, w in zip(r, widths)) + " |"

    out = [line(), fmt(header), line()]
    out += [fmt(r) for r in rows]
    out.append(line())
    return "\n".join(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-univ", type=int, default=10)
    ap.add_argument("--schema", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from re_shacl_spark.model.triples import O_LIT_TYPE, vocab
    from re_shacl_spark.pipeline import fuse, fuse_expand, fuse_full
    from re_shacl_spark.validate.engine import validate
    from re_shacl_spark.workloads import lubm

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("runtime-results")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    abox = lubm.lubm_abox(spark, args.n_univ)
    # professor aliases: the sameAs seeding that differentiates the arms
    n_prof = 8 * args.n_univ
    aliases = (
        spark.range(0, n_prof)
        .filter(F.col("id") % 10 == 0)
        .select(
            F.concat(F.lit("p:"), F.col("id").cast("string")).alias("s"),
            F.lit(vocab.SAMEAS).alias("p"),
            F.concat(F.lit("pa:"), F.col("id").cast("string")).alias("o"),
            F.lit(None).cast(O_LIT_TYPE).alias("o_lit"),
            F.lit(False).alias("is_lit"),
            F.lit(None).cast("string").alias("src_url"),
        )
    )
    g = abox.unionByName(aliases).localCheckpoint(eager=True)
    shapes = lubm.lubm_shapes(args.schema)

    methods = {
        "reshacl (merged, owl)": lambda: fuse(spark, g, profile="owl"),
        "reshacl-rdfs (merged, rdfs)": lambda: fuse(spark, g, profile="rdfs"),
        "withoutM (expanded, owl)": lambda: fuse_expand(spark, g, profile="owl"),
        "withoutM-rdfs (expanded, rdfs)": lambda: fuse_expand(spark, g, profile="rdfs"),
        "full-closure (inter_graph analog)": lambda: fuse_full(spark, g),
    }

    header = ["Method", "Average validation time (s)", "Standard deviation", "Conform", "#Violation"]
    rows = []
    detail = {}
    for name, arm in methods.items():
        times, conform, n_viol = [], None, None
        for _ in range(args.reps):
            t0 = time.time()
            fused = arm()
            rep = validate(spark, fused.triples, shapes)
            n_viol = rep.violations.count()  # forces the full plan
            conform = rep.conforms
            times.append(time.time() - t0)
        mean = statistics.mean(times)
        std = statistics.pstdev(times)
        rows.append([name, f"{mean:.3f}", f"{std:.3f}", str(conform), str(n_viol)])
        detail[name] = {"mean_sec": round(mean, 3), "std_sec": round(std, 3),
                        "conform": conform, "violations": n_viol}
        print(f"[{name}] {mean:.2f}s ±{std:.2f}  conform={conform}  #viol={n_viol}")

    table = _table(rows, header)
    out_dir = os.path.join(REPO, "Outputs", f"lubm{args.schema}")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "RunTimeResults.txt"), "a+") as f:
        f.write(table + "\n")
    print(table)
    print(json.dumps({"dataset": f"lubm{args.schema}", "n_univ": args.n_univ, "methods": detail}))


if __name__ == "__main__":
    main()
