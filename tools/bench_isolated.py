"""Isolated per-query benchmark: fresh-JVM medians for the expensive tail.

SCALE.md §16 measured ±20% ambient spread on identical-code HEADLINE
totals, so round-over-round regress/win claims need a better signal:
each named query timed in its OWN fresh Spark session (new subprocess →
new JVM, no relation cache, no memoized per-session relations, no heap
pressure inherited from 270 earlier queries), repeated ``--repeat``
times, reported as the median (VERDICT r8 ask #3).

Default query list: the top ``--top`` (20) most expensive registry
entries by the committed ``bench_result.json`` per-query medians.
``--headline`` instead covers EVERY ``bench.HEADLINE_QUERIES`` entry —
since round 11 this full-coverage run is the committed
``BENCH_ISOLATED_r{N}.json``, and round-over-round perf deltas are
read from it; the in-bench ``BENCH_r{N}.json`` is the driver-contract
number only (VERDICT r10 ask #2: the in-bench total moved ±20-25% on
identical code twice, while these isolated medians moved the other
way).

Usage:
    python tools/bench_isolated.py --headline --json BENCH_ISOLATED_r11.json
    python tools/bench_isolated.py --json BENCH_ISOLATED_r9.json   # top-20
    python tools/bench_isolated.py --names jaccard_prefix_pairs --repeat 3
    python tools/bench_isolated.py --worker jaccard_prefix_pairs   # internal

The artifact maps name -> {median, samples, rows}; compare the medians
across rounds — they carry the isolation guarantees the headline total
cannot.
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


def run_worker(name: str, sf_dir: str) -> None:
    """Time ONE query in THIS (fresh) process and print a JSON line."""
    from text_sentiment_classification_hadoop_spark_spark.session import get_spark

    spark = get_spark(app_name=f"bench_isolated:{name}")
    import __spark_entry__ as entry

    from pyspark.sql import functions as F
    # same one-time warmup as bench.py: touch parquet reader, shuffle,
    # codegen — so the measurement is the query, not JVM startup
    (spark.read.parquet(f"{sf_dir}/region.parquet")
     .groupBy(F.lower(F.col("r_name")).alias("k")).count().count())

    fn = entry.queries()[name]
    t0 = time.perf_counter()
    rows = fn(spark, sf_dir).count()
    dt = time.perf_counter() - t0
    print("BENCH_ISOLATED " + json.dumps(
        {"name": name, "sec": round(dt, 3), "rows": rows}))
    spark.stop()


def _write(path: str, args, results: dict) -> None:
    with open(path, "w") as f:
        json.dump({"sf": args.sf, "repeat": args.repeat,
                   "isolation": "fresh JVM per trial (subprocess)",
                   "coverage": ("headline" if args.headline else
                                "names" if args.names else
                                f"top{args.top}"),
                   "queries": results}, f, indent=1, sort_keys=True)


def default_names(top: int) -> list[str]:
    with open(os.path.join(REPO, "bench_result.json")) as f:
        per_query = json.load(f)["queries"]
    ranked = sorted(per_query.items(), key=lambda kv: -kv[1])
    return [k for k, _ in ranked[:top]]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--names", default=None,
                    help="comma list; default = --top by bench_result.json")
    ap.add_argument("--headline", action="store_true",
                    help="cover every bench.HEADLINE_QUERIES entry "
                         "(the committed per-round artifact)")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--json", default=None, metavar="PATH")
    ap.add_argument("--resume", action="store_true",
                    help="seed results from an existing --json artifact "
                         "and skip queries already carrying a median — "
                         "lets a multi-hour headline run be restarted "
                         "(or chunked) without clobbering completed "
                         "medians (the incremental _write otherwise "
                         "rewrites the file with only the current "
                         "process's results)")
    args = ap.parse_args()

    if args.worker:
        run_worker(args.worker, args.sf)
        return 0

    if args.names:
        names = args.names.split(",")
    elif args.headline:
        import glob
        import re

        import bench
        names = list(bench.HEADLINE_QUERIES)
        # queries with no median in the most recent committed artifact
        # run FIRST: a run truncated by the round boundary still covers
        # the entries that have never had an isolated median (the same
        # failure the r12 headline-drift check exists to prevent)
        # only digit-suffixed artifacts (a stray BENCH_ISOLATED_rerun.json
        # must be skipped, not crash the --headline path — ADVICE r12)
        arts = sorted(
            (p for p in glob.glob(os.path.join(REPO, "BENCH_ISOLATED_r*.json"))
             if re.search(r"_r(\d+)\.json$", p)),
            key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)))
        if arts:
            with open(arts[-1]) as f:
                prev = set(json.load(f)["queries"])
            names.sort(key=lambda n: (n in prev))  # stable: new first
    else:
        names = default_names(args.top)
    results: dict[str, dict] = {}
    if args.resume and args.json and os.path.exists(args.json):
        with open(args.json) as f:
            prior = json.load(f)["queries"]
        results.update({k: v for k, v in prior.items()
                        if v.get("median") is not None})
        done = [n for n in names if n in results]
        names = [n for n in names if n not in results]
        print(f"resume: {len(done)} medians carried over, "
              f"{len(names)} to run", flush=True)
    for name in names:
        samples, rows = [], None
        for trial in range(args.repeat):
            # a hung worker must cost one trial, not the whole run —
            # catch TimeoutExpired so every already-collected median
            # still reaches the artifact (ADVICE r9)
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--worker", name, "--sf", args.sf],
                    capture_output=True, text=True, cwd=REPO, timeout=900)
            except subprocess.TimeoutExpired:
                sys.stderr.write(f"[{name} trial {trial}] worker timed out"
                                 " after 900s; recording failed trial\n")
                continue
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith("BENCH_ISOLATED ")), None)
            if proc.returncode != 0 or line is None:
                sys.stderr.write(f"[{name} trial {trial}] worker failed:\n"
                                 + proc.stderr[-2000:] + "\n")
                continue
            rec = json.loads(line[len("BENCH_ISOLATED "):])
            samples.append(rec["sec"])
            rows = rec["rows"]
        med = round(statistics.median(samples), 3) if samples else None
        results[name] = {"median": med, "samples": samples, "rows": rows}
        print(f"{name}: median {med}s over {samples} ({rows} rows)",
              flush=True)
        if args.json:  # incremental: a multi-hour headline run that
            _write(args.json, args, results)  # dies keeps its medians

    if args.json:
        _write(args.json, args, results)
        print(f"wrote {args.json}")
    return 0 if all(r["median"] is not None for r in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
