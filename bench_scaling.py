"""Scaling-evidence run (BASELINE.md protocol): the same fold job on the same
deterministic input at two parallelism levels — 8 cores (N) vs 32 cores (4N)
— as the sandbox substitute for N vs 4N executors. Reports throughput at
both plus efficiency = throughput_32 / (4 × throughput_8); target ≥ 0.8.

Each level runs in a fresh subprocess (own JVM) via bench.py with
BENCH_ONLY=fold_ofs so only the job body is timed (transcripts are cached,
python workers pre-warmed, and counted before the timer starts inside
bench.py).

**CPU pinning**: plain ``local[8]`` on a 32-core box is NOT an 8-core
machine — the JVM's shuffle/Arrow/GC threads and Python workers spill onto
the other 24 cores, inflating the small level and understating efficiency.
When ``taskset`` is available each level is pinned to exactly its core
count (0-7 vs 0-31), which is what an N-core executor host actually has.

Usage: python bench_scaling.py [n_convs]   # default ~5.8M turns
Writes BENCH_SCALING.json and prints the summary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys


def run_level(cpus: int, n_convs: int) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(cpus),
            "BENCH_ONLY": os.environ.get("SCALING_JOB", "fold_ofs"),
            "BENCH_REPEAT": os.environ.get("BENCH_REPEAT", "5"),
            "SPARK_GRAFT_SHUFFLE_PARTITIONS": os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64"),
            "BENCH_NCONVS": str(n_convs),
            "SPARK_GRAFT_SF_DIR": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        }
    )
    cmd = [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench.py")]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_cores = int(os.environ.get("SCALING_N_CORES", "8"))  # levels: N and 4N
    r_n = run_level(n_cores, n_convs)
    r_4n = run_level(4 * n_cores, n_convs)
    job = os.environ.get("SCALING_JOB", "fold_ofs")
    t_n, t_4n = r_n["queries"][job], r_4n["queries"][job]
    rows = r_n["fold_rows"]
    thr_n, thr_4n = rows / t_n, rows / t_4n
    eff = thr_4n / (4 * thr_n)
    result = {
        "job": f"{job} (feature-window fold, batch=50, m=16)",
        "rows": rows,
        "n_cores": n_cores,
        f"local{n_cores}_sec": t_n,
        f"local{4 * n_cores}_sec": t_4n,
        f"local{n_cores}_rows_per_sec": round(thr_n, 1),
        f"local{4 * n_cores}_rows_per_sec": round(thr_4n, 1),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }
    out_name = "BENCH_SCALING.json" if (n_cores == 8 and job == "fold_ofs") else f"BENCH_SCALING_{job}_{n_cores}to{4 * n_cores}.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), out_name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
