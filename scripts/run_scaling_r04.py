"""Round-4 scaling re-evidence (VERDICT r3 #7): one artifact that carries
BOTH the raw pipeline N→4N ratio on the CURRENT code and the box's measured
parallel-speedup ceilings, so the ≥0.8 north-rule criterion can be read
against what this shared-DRAM sandbox physically allows.

Runs scripts/scaling.py (800k pages, 1→4 cores, best-of-2 — the r2/r3
protocol) and scripts/scaling_calibration.py at the same core pair, then
folds both plus the ceiling-normalized ratio into BENCH_SCALING_r04.json.

Usage: python scripts/run_scaling_r04.py [--pages 800000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=800_000)
    ap.add_argument("--n-cores", type=int, default=1)
    ap.add_argument("--xn-cores", type=int, default=4)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SCALING_r04.json"))
    args = ap.parse_args()

    raw_path = "/tmp/scaling_r04_raw.json"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "scaling.py"),
         "--pages", str(args.pages), "--n-cores", str(args.n_cores),
         "--xn-cores", str(args.xn_cores), "--reps", str(args.reps),
         "--out", raw_path],
        check=True,
    )
    with open(raw_path) as f:
        raw = json.load(f)

    cal = json.loads(
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "scaling_calibration.py"),
             "--n-cores", str(args.n_cores), "--xn-cores", str(args.xn_cores)],
            check=True, capture_output=True, text=True,
        ).stdout.strip().splitlines()[-1]
    )

    # ceiling-normalized reading: the pipeline's dominant stages are the
    # pandas-UDF front end (string-python-shaped) and JVM scan/shuffle; the
    # binding hardware ceiling is the HIGHER of what those two allow — if the
    # pipeline's raw efficiency reaches the blended ceiling, the DAG itself
    # is not the bottleneck.
    ceiling = max(
        cal["string_python"]["efficiency"], cal["jvm_stream_scan"]["efficiency"]
    )
    result = dict(raw)
    result["calibration"] = cal
    result["hardware_ceiling_efficiency"] = ceiling
    result["ceiling_normalized_efficiency"] = round(
        raw["scaling_efficiency"] / ceiling, 3
    ) if ceiling else None
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
