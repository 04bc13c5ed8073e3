"""Production-shaped batched-BPE datapoint (VERDICT r10 ask #4).

The registry's ``bpe_merges_batched`` proves CORRECTNESS at
``n_merges=8, batch_k=4``; the 100 TB claim is a ~k-fold round
reduction at tokenizer-sized merge counts (32k merges, batch_k~256).
This probe runs a production-SHAPED slice of that claim on the sf0.1
documents table — ``n_merges=64`` at ``batch_k=1`` vs ``batch_k=16``
— and records wall time, driver-loop rounds, and Spark job count, so
SCALE.md §17 carries a measured datapoint that the k-fold round
reduction survives the fixed per-round costs (collect latency, eager
checkpoint) instead of an extrapolation.

Each config runs in its own fresh JVM (same isolation contract as
tools/bench_isolated.py) so neither inherits the other's heap or
relation cache.

Usage:
    python tools/bpe_scale_probe.py                  # both configs
    python tools/bpe_scale_probe.py --worker 16      # internal
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_MERGES = 64


def run_worker(batch_k: int) -> None:
    from pyspark.sql import functions as F

    from text_sentiment_classification_hadoop_spark_spark.operators import bpe
    from text_sentiment_classification_hadoop_spark_spark.session import get_spark
    from text_sentiment_classification_hadoop_spark_spark.sources.tables import load_table

    spark = get_spark(app_name=f"bpe_scale_probe:k{batch_k}")
    # warmup: parquet reader + shuffle + codegen, as bench_isolated does
    (spark.read.parquet(f"{SF}/region.parquet")
     .groupBy(F.lower(F.col("r_name")).alias("k")).count().count())
    docs = load_table(spark, "documents", SF).select("text")
    words = bpe.word_freqs(docs, "text").localCheckpoint(eager=True)
    words.count()  # dictionary build excluded: identical in both configs

    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None))
    t0 = time.perf_counter()
    merges = bpe.bpe_train(words, n_merges=N_MERGES, batch_k=batch_k)
    dt = time.perf_counter() - t0
    jobs_after = len(tracker.getJobIdsForGroup(None))
    print("BPE_PROBE " + json.dumps({
        "batch_k": batch_k, "n_merges": len(merges),
        "sec": round(dt, 2), "jobs": jobs_after - jobs_before,
        "first_merge": merges[0][0], "last_merge": merges[-1][0]}))
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--ks", default="1,16",
                    help="comma list of batch_k configs")
    args = ap.parse_args()
    if args.worker is not None:
        run_worker(args.worker)
        return 0

    for k in (int(x) for x in args.ks.split(",")):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(k)],
            capture_output=True, text=True, cwd=REPO, timeout=3600)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("BPE_PROBE ")), None)
        if proc.returncode != 0 or line is None:
            sys.stderr.write(proc.stderr[-3000:] + "\n")
            return 1
        print(line[len("BPE_PROBE "):], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
