"""Measure the personalized-PageRank frontier-vs-uniform crossover
(VERDICT r11 ask #3): ``pagerank_personalized(frontier=True)`` joins
only ``rank_micro > 0`` nodes per iteration — bit-identical output
(pytest-pinned in tests/test_graph.py), but the contribution join is
frontier-sized instead of edge-sized. This probe records WHERE each
plan wins:

- ``copurchase``: the registry graph (sf0.1 co-purchase bipartite,
  small diameter — mass saturates by iteration ~2), seeds = 3 smallest
  nodes, iters = 3. Expectation: uniform ties or wins (the filter buys
  nothing once the frontier is the whole graph).
- ``ring``: a synthetic high-diameter graph — an N-node directed ring
  (diameter N-1), 3 seeds, iters = 3. Mass reaches ≤ iters hops from
  the seeds, so the frontier plan's per-iteration join touches
  O(seeds·iters) rows of an N-node edge list. Expectation: frontier
  wins, and the gap grows with N.

Each (topology, plan) cell runs in its own fresh JVM (the
bench_isolated contract), median of ``--repeat`` trials. Results go to
SCALE.md §21.

Usage:
    python tools/ppr_frontier_probe.py [--ring-n 200000] [--repeat 3]
    python tools/ppr_frontier_probe.py --worker copurchase:uniform
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_worker(spec: str, ring_n: int) -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from text_sentiment_classification_hadoop_spark_spark.operators import graph as G
    from text_sentiment_classification_hadoop_spark_spark.session import get_spark

    topo, plan = spec.split(":")
    spark = get_spark(app_name=f"ppr_probe:{spec}")
    (spark.read.parquet(f"{SF}/region.parquet")
     .groupBy(F.lower(F.col("r_name")).alias("k")).count().count())

    if topo == "copurchase":
        edges = G.edges_from_rel(entry._copurchase_rel(spark, SF)) \
            .localCheckpoint(eager=True)
    else:
        # directed ring 0 -> 1 -> ... -> N-1 -> 0: diameter N-1, so with
        # iters=3 the frontier is at most seeds·(iters+1) nodes
        edges = (spark.range(ring_n)
                 .select(F.col("id").alias("src"),
                         ((F.col("id") + 1) % ring_n).alias("dst"))
                 .repartition(32).localCheckpoint(eager=True))
    seeds = [r["node"] for r in
             edges.select(F.col("src").alias("node"))
             .distinct().orderBy("node").limit(3).collect()]

    t0 = time.perf_counter()
    n = G.pagerank_personalized(edges, seeds, iters=3,
                                frontier=(plan == "frontier"),
                                validate_seeds=False).count()
    dt = time.perf_counter() - t0
    print("PPR_PROBE " + json.dumps(
        {"spec": spec, "sec": round(dt, 3), "nodes": n}))
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--ring-n", type=int, default=200_000)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()
    if args.worker:
        run_worker(args.worker, args.ring_n)
        return 0

    results = {}
    for spec in ("copurchase:uniform", "copurchase:frontier",
                 "ring:uniform", "ring:frontier"):
        samples = []
        for _ in range(args.repeat):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", spec, "--ring-n", str(args.ring_n)],
                capture_output=True, text=True, cwd=REPO, timeout=1800)
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith("PPR_PROBE ")), None)
            if proc.returncode != 0 or line is None:
                sys.stderr.write(proc.stderr[-2000:] + "\n")
                return 1
            samples.append(json.loads(line[len("PPR_PROBE "):])["sec"])
        results[spec] = {"median": round(statistics.median(samples), 3),
                         "samples": samples}
        print(f"{spec}: median {results[spec]['median']}s over {samples}",
              flush=True)
    print(json.dumps({"ring_n": args.ring_n, "iters": 3, "seeds": 3,
                      "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
