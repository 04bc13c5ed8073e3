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

Round-11 extension (VERDICT r11 ask #4): ``--n-merges`` and
``--corpus`` push the datapoint an order of magnitude toward the
production working point — ``--n-merges 512 --ks 1,64 --corpus
tweets`` runs on the reference's real 25k-tweet corpus (36,653
distinct words; the synthetic documents table's 31-word vocabulary
exhausts its mergeable-pair space near ~200 merges, so it cannot
carry a 512-merge probe). The worker now also reports the per-round
batch-FILL trace (selected merges per round) — whether symbol-disjoint
selection starves as the vocabulary saturates.

Usage:
    python tools/bpe_scale_probe.py                  # both configs
    python tools/bpe_scale_probe.py --n-merges 512 --ks 1,64 --corpus tweets
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
REAL_TWEETS = "/root/reference/input/test1/tweets.csv"


def run_worker(batch_k: int, n_merges: int = N_MERGES,
               corpus: str = "documents", headroom: int = 4) -> None:
    from pyspark.sql import functions as F

    from text_sentiment_classification_hadoop_spark_spark.operators import bpe
    from text_sentiment_classification_hadoop_spark_spark.session import get_spark
    from text_sentiment_classification_hadoop_spark_spark.sources.tables import load_table

    spark = get_spark(app_name=f"bpe_scale_probe:k{batch_k}")
    # warmup: parquet reader + shuffle + codegen, as bench_isolated does
    (spark.read.parquet(f"{SF}/region.parquet")
     .groupBy(F.lower(F.col("r_name")).alias("k")).count().count())
    if corpus == "tweets":
        from text_sentiment_classification_hadoop_spark_spark.sources.tweets import read_tweets_naive
        docs = read_tweets_naive(spark, REAL_TWEETS).select("text")
    else:
        docs = load_table(spark, "documents", SF).select("text")
    words = bpe.word_freqs(docs, "text").localCheckpoint(eager=True)
    words.count()  # dictionary build excluded: identical in both configs

    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None))
    t0 = time.perf_counter()
    round_sizes: list[int] = []
    merges = bpe.bpe_train(words, n_merges=n_merges, batch_k=batch_k,
                           round_sizes=round_sizes, headroom=headroom)
    dt = time.perf_counter() - t0
    jobs_after = len(tracker.getJobIdsForGroup(None))
    fill = (len(merges) / (len(round_sizes) * batch_k)
            if round_sizes else 0.0)
    print("BPE_PROBE " + json.dumps({
        "batch_k": batch_k, "n_merges": len(merges), "corpus": corpus,
        "headroom": headroom,
        "sec": round(dt, 2), "jobs": jobs_after - jobs_before,
        "rounds": len(round_sizes), "fill_rate": round(fill, 4),
        "min_round_fill": min(round_sizes) if round_sizes else 0,
        "first_merge": merges[0][0], "last_merge": merges[-1][0]}))
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--ks", default="1,16",
                    help="comma list of batch_k configs")
    ap.add_argument("--n-merges", type=int, default=N_MERGES)
    ap.add_argument("--corpus", default="documents",
                    choices=("documents", "tweets"))
    ap.add_argument("--headroom", type=int, default=4,
                    help="candidate rows read per round = headroom*k "
                         "(VERDICT r12 ask #6 probe lever)")
    args = ap.parse_args()
    if args.worker is not None:
        run_worker(args.worker, n_merges=args.n_merges, corpus=args.corpus,
                   headroom=args.headroom)
        return 0

    for k in (int(x) for x in args.ks.split(",")):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(k),
             "--n-merges", str(args.n_merges), "--corpus", args.corpus,
             "--headroom", str(args.headroom)],
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
