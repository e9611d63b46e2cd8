"""Optimization-round measurement harness (guide §1) — SEPARATE from the
frozen bench.py.

Modes:
  python bench_extra.py explain q1,q2,...   # write plans/r06/<q>_<tag>.txt
  python bench_extra.py time q1,q2 [N]      # interleaved timing, N reps
  python bench_extra.py noop q1,q2 [N]      # same but noop-sink instead of
                                            # bench.py's count()/collect()

Timing is interleaved across the requested queries (q1,q2,q1,q2,...) so a
CPU-phase swing cannot fake a per-query comparison (the bench_scaling.py
lesson), and reports per-query min/median over N reps. Uses the same
session config as bench.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def _mk_spark():
    os.environ.setdefault("SPARK_GRAFT_ARROW_BATCH", "65536")
    from pystreamfs_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    gc_threads = os.environ.get("SPARK_GC_THREADS", str(max(4, cpus // 2)))
    jopts = f"-XX:ParallelGCThreads={gc_threads} -XX:ConcGCThreads={max(1, int(gc_threads) // 4)}"
    spark = get_spark(
        app_name="pystreamfs_spark-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(32, cpus)))),
        extra_conf={"spark.driver.extraJavaOptions": jopts},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("PLAN_TAG", "before")

    spark = _mk_spark()
    import __spark_entry__ as em

    qs = em.queries()

    def frame(name):
        return qs[name](spark, sf_dir)

    if mode == "explain":
        os.makedirs("plans/r06", exist_ok=True)
        for n in names:
            df = frame(n)
            txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            with open(f"plans/r06/{n}_{tag}.txt", "w") as f:
                f.write(txt)
            print(f"wrote plans/r06/{n}_{tag}.txt ({len(txt)} bytes)")
        spark.stop()
        return

    def run(name):
        df = frame(name)
        if mode == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            # mirror bench.py's action per query
            if name in ("bloom_decon",):
                df.agg(F.sum("n_overlap")).collect()
            elif name in ("zorder",):
                df.agg(F.sum("zkey")).collect()
            elif name in ("ks_drift",):
                df.collect()
            else:
                df.count()

    # warm up executor workers once, untimed
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for n in names:
        run(n)

    res: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{n}")
            t0 = time.perf_counter()
            run(n)
            res[n].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        n: {"min": min(v), "med": round(statistics.median(v), 3), "samples": v}
        for n, v in res.items()
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
