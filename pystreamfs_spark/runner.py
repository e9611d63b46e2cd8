"""spark-submit entry point.

    spark-submit --py-files pystreamfs_spark.zip \
        pystreamfs_spark/runner.py \
        --input synth:20000 --output /tmp/run1 \
        --kernel ofs --batch-size 50 --num-features 5 --epochs 8

``--input`` is either a transcripts Parquet/Iceberg path (columns per
BASELINE.json input_hint) or ``synth:N`` for the deterministic N-conversation
synthetic table. The run is checkpointed: re-submitting with the same
``--output`` resumes from the last committed epoch (see checkpoint.py).
Outputs: ``weights/``, ``lineage/``, ``metrics/`` epoch-partitioned Parquet
plus a run-summary JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="pystreamfs_spark checkpointed fold runner")
    p.add_argument("--input", required=True, help="transcripts path or synth:N")
    p.add_argument("--output", required=True, help="output directory (resume ledger lives here)")
    p.add_argument("--kernel", default="ofs", choices=["ofs", "fsds", "efs"])
    p.add_argument("--batch-size", type=int, default=50)
    p.add_argument("--num-features", type=int, default=5)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--fsds-k", type=int, default=2)
    p.add_argument("--fsds-ell", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max-epochs-this-run", type=int, default=None)
    args = p.parse_args(argv)

    from pystreamfs_spark.checkpoint import CheckpointedFold
    from pystreamfs_spark.functions import featurize_turns
    from pystreamfs_spark.session import get_spark
    from pystreamfs_spark.sources.tableio import read_table
    from pystreamfs_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(app_name="pystreamfs_spark-runner")
    t0 = time.perf_counter()
    if args.input.startswith("synth:"):
        transcripts = synthesize_transcripts(spark, n_convs=int(args.input.split(":", 1)[1]), seed=args.seed)
    else:
        transcripts = read_table(spark, args.input)

    featurized = featurize_turns(transcripts)
    kernel_kwargs = {"k": args.fsds_k, "ell": args.fsds_ell} if args.kernel == "fsds" else {}

    run = CheckpointedFold(spark, args.output, n_epochs=args.epochs, seed=args.seed)
    already = sorted(run.committed_epochs())
    committed = run.run(
        featurized,
        kernel=args.kernel,
        batch_size=args.batch_size,
        num_features=args.num_features,
        kernel_kwargs=kernel_kwargs,
        max_epochs_this_run=args.max_epochs_this_run,
    )
    n_windows = run.weights().count() if (already or committed) else 0
    summary = {
        "kernel": args.kernel,
        "epochs_resumed_from": already,
        "epochs_committed_this_run": committed,
        "total_windows": n_windows,
        "elapsed_sec": round(time.perf_counter() - t0, 3),
        "output": args.output,
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
