"""Scaling-efficiency evidence (north_rule: ≥0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the same job runs at two local
parallelism levels — local[8] (N) and local[32] (4N) — on the SAME input via
``spark-submit --py-files`` (separate JVMs, fresh sessions), and we report
throughput at both plus efficiency = (tput_4N / tput_N) / 4.

Usage: python scripts/scaling.py [--pages 100000] [--out BENCH_SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_pyfiles_zip() -> str:
    dst = "/tmp/re_shacl_spark.zip"
    with zipfile.ZipFile(dst, "w") as z:
        pkg = os.path.join(REPO, "re_shacl_spark")
        for root, _, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    z.write(p, os.path.relpath(p, REPO))
    return dst


def run_at(cores: int, pages: int, pyfiles: str, body_repeat: int) -> dict:
    ckpt = f"/tmp/kg_scaling_{cores}"
    shutil.rmtree(ckpt, ignore_errors=True)
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(shutil.which("pyspark") or sys.executable), "spark-submit"
    )
    cmd = [
        spark_submit,
        "--master", f"local[{cores}]",
        "--conf", f"spark.sql.shuffle.partitions={cores}",
        "--conf", "spark.sql.constraintPropagation.enabled=false",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.driver.memory=16g",
        # wide text rows: bound Arrow batch memory (see jobs/run_pipeline.py)
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=2048",
        # at this toy scale the stage checkpoints are a few hundred MB, so the
        # default 128MB split packs a whole pandas-UDF stage into <=2 waves and
        # one straggler owns the stage wall (profiled: s2 ran 8 tasks, per-task
        # python time IDENTICAL at 1 and 4 cores — pure imbalance, not
        # bandwidth).  32MB restores 4+ waves/core; on a real cluster the
        # file:core ratio is huge and the default is fine
        "--conf", "spark.sql.files.maxPartitionBytes=33554432",
        "--py-files", pyfiles,
        os.path.join(REPO, "jobs", "run_pipeline.py"),
        "--pages", str(pages),
        "--body-repeat", str(body_repeat),
        "--checkpoint", ckpt,
    ]
    # a crashed python worker (socket reset mid-Arrow-stream) kills one
    # attempt, not the whole multi-hour evidence run: keep the full stderr
    # for diagnosis and retry once from the stage checkpoint
    for attempt in range(2):
        shutil.rmtree(ckpt, ignore_errors=True)  # full-run timing, no resume credit
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
        if line:
            return json.loads(line[-1])
        log = f"/tmp/scaling_fail_{cores}c_a{attempt}.log"
        with open(log, "w") as f:
            f.write(out.stdout + "\n==== STDERR ====\n" + out.stderr)
        sys.stderr.write(f"attempt {attempt} at {cores} cores failed; stderr -> {log}\n")
    raise RuntimeError(f"no JSON from spark-submit ({cores} cores) after retry; see {log}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=100_000)
    ap.add_argument("--body-repeat", type=int, default=40)
    ap.add_argument("--n-cores", type=int, default=2)
    ap.add_argument("--xn-cores", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SCALING.json"))
    args = ap.parse_args()

    pyfiles = make_pyfiles_zip()

    def best_of(cores: int) -> dict:
        # the sandbox has noisy neighbors: take the best of --reps runs
        # (min wall = least interference) per parallelism level
        runs = [run_at(cores, args.pages, pyfiles, args.body_repeat) for _ in range(args.reps)]
        return min(runs, key=lambda r: r["wall_sec"])

    r8 = best_of(args.n_cores)
    r32 = best_of(args.xn_cores)
    core_ratio = args.xn_cores / args.n_cores
    eff = (r32["triples_per_sec"] / r8["triples_per_sec"]) / core_ratio
    result = {
        "pages": args.pages,
        "N_cores": args.n_cores,
        "4N_cores": args.xn_cores,
        "body_repeat": args.body_repeat,
        "throughput_N": r8["triples_per_sec"],
        "throughput_4N": r32["triples_per_sec"],
        "wall_N_sec": r8["wall_sec"],
        "wall_4N_sec": r32["wall_sec"],
        "scaling_efficiency": round(eff, 3),
        "detail": {"N": r8, "4N": r32},
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
