"""Scaling-evidence run (BASELINE.md protocol): the same fold job on the same
deterministic input at two parallelism levels — N cores vs 4N cores — as the
sandbox substitute for N vs 4N executors. Target: throughput efficiency
``thr_4N / (4 × thr_N) ≥ 0.8``.

This box is a VM whose effective CPU speed swings ~2× on minute timescales
(measured: an embarrassingly-parallel pure-NumPy probe with zero IPC and zero
shared state ranges 387k–763k rows/s at the SAME 8-core level across 10
back-to-back runs). A single pair of level measurements is therefore
meaningless. The protocol:

1. **Interleaved pairs**: run (spark_N, spark_4N) K times alternating, so both
   levels sample the same box-noise phases; report the median efficiency.
2. **Ceiling probe per pair**: immediately after each Spark pair, measure the
   SAME two levels with a pure-NumPy multiprocessing probe (no Spark, no
   Arrow, no JVM — just taskset-pinned worker processes running the kernel).
   Its efficiency is the box's hardware ceiling for CPU-bound scaling; the
   engine cannot beat the substrate it runs on.
3. **Normalized efficiency** = median(spark_eff) / median(ceiling_eff): the
   engine-attributable scaling quality. ≥ 1.0 means the Spark layer adds no
   scaling penalty over bare processes.

**CPU pinning**: plain ``local[8]`` on a 32-core box is NOT an 8-core
machine — JVM shuffle/Arrow/GC threads and Python workers spill onto the
other 24 cores. Each level (and each ceiling probe) is pinned to exactly its
core count.

Usage: python bench_scaling.py [n_convs]     # default 200k convs (~11.6M turns)
Env:   SCALING_N_CORES (default 8 → pair 8 vs 32), SCALING_PAIRS (default 5),
       SCALING_JOB (default fold_ofs), BENCH_REPEAT (default 3 per level-run),
       SCALING_PARTITIONS_PER_CORE (default 1 — r04: each level runs
       partitions = cores × this, the layout minimizing its own wall-clock;
       explicit SPARK_GRAFT_SHUFFLE_PARTITIONS overrides both levels).
Writes BENCH_SCALING.json (or BENCH_SCALING_<job>_<N>to<4N>.json) and prints
the summary. QUIET BOX ONLY — any concurrent load poisons both levels.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


# ---------------------------------------------------------------------------
# pure-CPU ceiling probe (runs in taskset-pinned subprocesses of this file)
# ---------------------------------------------------------------------------

def _ceiling_worker(q, seconds: float) -> None:
    sys.path.insert(0, HERE)
    import numpy as np

    from pystreamfs_spark.kernels import init_state, select_top_m, update

    rng = np.random.default_rng(os.getpid())
    X = rng.standard_normal((50, 16))
    y = (rng.random(50) > 0.5).astype(np.float64)
    state = init_state("ofs", 16, num_features=5)
    t0 = time.perf_counter()
    rows = 0
    while time.perf_counter() - t0 < seconds:
        for _ in range(20):
            state, w = update("ofs", state, X, y)
            select_top_m(w, 5)
            rows += 50
    q.put(rows / (time.perf_counter() - t0))


def _ceiling_main(nproc: int, seconds: float) -> None:
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ[var] = "1"
    from multiprocessing import Process, Queue

    q: "Queue[float]" = Queue()
    ps = [Process(target=_ceiling_worker, args=(q, seconds)) for _ in range(nproc)]
    for p in ps:
        p.start()
    thr = [q.get() for _ in ps]
    for p in ps:
        p.join()
    print(sum(thr))


def ceiling_level(cpus: int, seconds: float = 6.0) -> float:
    """Aggregate rows/s of `cpus` independent kernel processes pinned to
    `cpus` cores — the box's CPU capability at that width, engine-free."""
    cmd = [sys.executable, os.path.abspath(__file__), "--ceiling", str(cpus), str(seconds)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    return float(out.stdout.strip().splitlines()[-1])


# ---------------------------------------------------------------------------
# spark level runs (each in a fresh pinned JVM via bench.py)
# ---------------------------------------------------------------------------

def run_level(cpus: int, n_convs: int) -> dict:
    # Task granularity is tuned PER LEVEL (r04, VERDICT r03 #5): the
    # ~10 ms/task driver-serial scheduling overhead (BASELINE.md) is
    # invariant across levels, so a fixed 64-task layout taxes the wide
    # level relatively 4× harder. partitions = cores × SCALING_PARTITIONS_
    # PER_CORE (default 1 → one wave of maximal tasks per level) is the
    # per-level tuning a real cluster operator applies — each level runs
    # the layout that minimizes ITS OWN wall-clock. Explicit
    # SPARK_GRAFT_SHUFFLE_PARTITIONS still overrides both levels.
    ppc = int(os.environ.get("SCALING_PARTITIONS_PER_CORE", "1"))
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(cpus),
            "BENCH_ONLY": os.environ.get("SCALING_JOB", "fold_ofs"),
            "BENCH_REPEAT": os.environ.get("BENCH_REPEAT", "3"),
            "SPARK_GRAFT_SHUFFLE_PARTITIONS": os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus * ppc)),
            "BENCH_NCONVS": str(n_convs),
            "SPARK_GRAFT_SF_DIR": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            "SPARK_GRAFT_ARROW_BATCH": os.environ.get("SPARK_GRAFT_ARROW_BATCH", "65536"),
            "BENCH_FEAT32": os.environ.get("BENCH_FEAT32", "1"),
        }
    )
    cmd = [sys.executable, os.path.join(HERE, "bench.py")]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_cores = int(os.environ.get("SCALING_N_CORES", "8"))  # levels: N and 4N
    n_pairs = int(os.environ.get("SCALING_PAIRS", "5"))
    job = os.environ.get("SCALING_JOB", "fold_ofs")

    pairs = []
    rows = None
    for i in range(n_pairs):
        r_n = run_level(n_cores, n_convs)
        r_4n = run_level(4 * n_cores, n_convs)
        rows = r_n["fold_rows"]
        t_n, t_4n = r_n["queries"][job], r_4n["queries"][job]
        thr_n, thr_4n = rows / t_n, rows / t_4n
        eff = thr_4n / (4 * thr_n)
        c_n = ceiling_level(n_cores)
        c_4n = ceiling_level(4 * n_cores)
        ceff = c_4n / (4 * c_n)
        pairs.append(
            {
                "spark_sec": [round(t_n, 3), round(t_4n, 3)],
                "spark_rows_per_sec": [round(thr_n, 1), round(thr_4n, 1)],
                "spark_eff": round(eff, 3),
                "ceiling_rows_per_sec": [round(c_n, 1), round(c_4n, 1)],
                "ceiling_eff": round(ceff, 3),
            }
        )
        print(
            f"pair {i}: spark {t_n:.2f}s/{t_4n:.2f}s eff={eff:.3f}  "
            f"ceiling eff={ceff:.3f}",
            file=sys.stderr,
            flush=True,
        )

    sp_effs = [p["spark_eff"] for p in pairs]
    ce_effs = [p["ceiling_eff"] for p in pairs]
    med_sp = statistics.median(sp_effs)
    med_ce = statistics.median(ce_effs)
    result = {
        "job": f"{job} (feature-window fold, batch=50, m=16)",
        "rows": rows,
        "n_cores": n_cores,
        "n_pairs": n_pairs,
        "scaling_efficiency": round(med_sp, 3),
        "scaling_efficiency_pairs": sp_effs,
        "ceiling_efficiency": round(med_ce, 3),
        "ceiling_efficiency_pairs": ce_effs,
        "normalized_efficiency": round(med_sp / med_ce, 3),
        "target": 0.8,
        "pairs": pairs,
        "note": (
            "ceiling = zero-IPC pure-NumPy multiprocessing at the same pinned "
            "levels; normalized = spark_median / ceiling_median (engine-"
            "attributable scaling quality, 1.0 = no penalty over bare processes)"
        ),
    }
    out_name = (
        "BENCH_SCALING.json"
        if (n_cores == 8 and job == "fold_ofs")
        else f"BENCH_SCALING_{job}_{n_cores}to{4 * n_cores}.json"
    )
    with open(os.path.join(HERE, out_name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--ceiling":
        _ceiling_main(int(sys.argv[2]), float(sys.argv[3]) if len(sys.argv) > 3 else 6.0)
    else:
        main()
