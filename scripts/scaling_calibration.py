"""Calibration microbenchmarks for the scaling artifact (VERDICT r3 #7).

Measures this box's parallel-speedup CEILINGS at the same two parallelism
levels the pipeline scaling run uses, so the raw pipeline ratio can be read
against what the hardware allows rather than against an idealized 4.0×:

  arith   pure-arithmetic Python (multiprocessing) — the no-memory-traffic
          upper bound (≈ linear on a healthy box)
  strpy   string-heavy Python (mention-detection-shaped work) — the ceiling
          for the pandas-UDF front end
  jvmscan JVM memory-streaming scan via spark-submit
          (range(4e8) → xxhash64 → bit_xor) — the ceiling for shuffle/scan
          stages; on a shared-DRAM box this is the binding constraint

Usage: python scripts/scaling_calibration.py [--n-cores 1] [--xn-cores 4]
Prints one JSON object; scripts/run_scaling_r04.py folds it into
BENCH_SCALING_r04.json.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _arith_task(n: int) -> float:
    s = 0.0
    for i in range(n):
        s += (i * i) % 97
    return s


def _str_task(n: int) -> int:
    # mention-detection-shaped: lower/split/find over a web-ish sentence
    text = "The Quick Brown Fox visited Berlin and Paris with Apple Inc today " * 8
    hits = 0
    for i in range(n):
        t = (text + str(i)).lower()
        for w in t.split():
            if w.startswith(("ber", "par", "app")):
                hits += 1
    return hits


def _py_speedup(task, per_task: int, cores_lo: int, cores_hi: int) -> dict:
    def run(cores: int) -> float:
        t0 = time.time()
        with mp.Pool(cores) as p:
            p.map(task, [per_task] * cores)
        return time.time() - t0

    # equal TOTAL work per level: cores tasks of per_task each → wall at
    # perfect scaling is constant; speedup = (lo_wall*hi)/(hi_wall*lo) … use
    # throughput form instead: items/sec
    w_lo, w_hi = run(cores_lo), run(cores_hi)
    tput_lo = cores_lo * per_task / w_lo
    tput_hi = cores_hi * per_task / w_hi
    ratio = cores_hi / cores_lo
    return {
        "wall_lo": round(w_lo, 2),
        "wall_hi": round(w_hi, 2),
        "speedup": round(tput_hi / tput_lo, 2),
        "efficiency": round(tput_hi / tput_lo / ratio, 3),
    }


_JVM_SCAN = """
import json, sys, time
from pyspark.sql import SparkSession, functions as F
spark = SparkSession.builder.getOrCreate()
# warm-up pass: JIT compilation and first-job scheduling stay out of the
# measured window, and the scan is sized (4e9 rows) so compute dominates —
# the r4/r5 variant (4e8, cold) was startup-bound and reported a fake 0.275
# "bandwidth ceiling" that a warmed 10x scan measures at ~0.87
spark.range(int(1e7)).select(F.xxhash64("id").alias("h")).agg(
    F.expr("bit_xor(h)")).collect()
t0 = time.time()
spark.range(int(4e9)).select(F.xxhash64("id").alias("h")).agg(
    F.expr("bit_xor(h)")).collect()
print(json.dumps({"wall": time.time() - t0}))
"""


def _jvm_scan(cores: int) -> float:
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(shutil.which("pyspark") or sys.executable), "spark-submit"
    )
    script = "/tmp/jvm_scan_cal.py"
    with open(script, "w") as f:
        f.write(_JVM_SCAN)
    out = subprocess.run(
        [spark_submit, "--master", f"local[{cores}]",
         "--conf", f"spark.sql.shuffle.partitions={cores}",
         "--conf", "spark.driver.memory=8g", script],
        capture_output=True, text=True, timeout=1200,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not line:
        raise RuntimeError(f"jvm scan failed at {cores} cores:\n{out.stderr[-2000:]}")
    return json.loads(line[-1])["wall"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-cores", type=int, default=1)
    ap.add_argument("--xn-cores", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    lo, hi = args.n_cores, args.xn_cores
    ratio = hi / lo

    res = {
        "n_cores": lo,
        "xn_cores": hi,
        "arith_python": _py_speedup(_arith_task, 6_000_000, lo, hi),
        "string_python": _py_speedup(_str_task, 40_000, lo, hi),
    }
    w_lo, w_hi = _jvm_scan(lo), _jvm_scan(hi)
    res["jvm_stream_scan"] = {
        "wall_lo": round(w_lo, 2),
        "wall_hi": round(w_hi, 2),
        "speedup": round(w_lo / w_hi, 2),
        "efficiency": round(w_lo / w_hi / ratio, 3),
    }
    s = json.dumps(res)
    if args.out:
        with open(args.out, "w") as f:
            f.write(s)
    print(s)


if __name__ == "__main__":
    main()
