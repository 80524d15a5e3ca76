"""Informational two-parallelism probe for the training-prep CLEANUP
pass (jobs/cleanup_job.py) — the map-only complement to the index-build
scaling headline. Same protocol as run_scaling.py: identical spark-submit
job, identical input, local-cluster with 1 vs 4 SEPARATE executor JVMs of
fixed shape; efficiency = (tp_4 / tp_1) / 4.

Prints one JSON line; results are recorded by hand in BENCH.md (this
script never writes it).

Usage: python scripts/run_cleanup_scaling.py [--docs 4000000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from run_scaling import gen_input, wait_for_idle  # noqa: E402


def run_level(cores: int, input_path: str, zip_path: str) -> dict:
    master = f"local-cluster[{cores},2,6144]"
    cmd = [
        "spark-submit",
        "--master", master,
        "--conf", "spark.sql.shuffle.partitions=128",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.executor.memory=5632m",
        "--conf", "spark.scheduler.minRegisteredResourcesRatio=1.0",
        "--conf", "spark.scheduler.maxRegisteredResourcesWaitingTime=90s",
        "--conf", "spark.driver.memory=6g",
        "--py-files", zip_path,
        os.path.join(ROOT, "jobs", "cleanup_job.py"),
        "--input", input_path,
    ]
    print("+", " ".join(cmd), flush=True)
    out = subprocess.run(
        cmd, check=True, cwd=ROOT, capture_output=True, text=True
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    m = json.loads(line)
    m["cores"] = cores
    return m


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=4_000_000)
    ap.add_argument("--input", default=None,
                    help="existing webtext parquet dir (skips generation)")
    ap.add_argument("--levels", type=int, nargs=2, default=[1, 4])
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()

    data = args.input or os.path.join(
        tempfile.gettempdir(), f"u2i_wt_{args.docs // 1000}k"
    )
    if not os.path.exists(os.path.join(data, "_SUCCESS")):
        print(f"generating {args.docs} docs -> {data}", flush=True)
        gen_input(data, args.docs)

    zip_path = os.path.join(ROOT, "dist", "unichem2index_spark.zip")
    if not os.path.exists(zip_path):
        subprocess.run(
            [sys.executable, "scripts/package_pyfiles.py"],
            check=True, cwd=ROOT,
        )

    results = {}
    for cores in args.levels:
        best = None
        for _ in range(args.repeats):
            load = wait_for_idle()
            print(f"level {cores}: load1={load:.2f}", flush=True)
            m = run_level(cores, data, zip_path)
            m["load_at_start"] = load
            m["load_at_end"] = os.getloadavg()[0]
            if best is None or m["docs_per_sec"] > best["docs_per_sec"]:
                best = m
        results[cores] = best

    lo, hi = args.levels
    eff = (
        results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]
    ) / (hi / lo)
    print(json.dumps({
        "op": "cleanup_pass",
        "docs": args.docs,
        "levels": {str(c): results[c] for c in args.levels},
        "scaling_efficiency": round(eff, 3),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }))


if __name__ == "__main__":
    main()
