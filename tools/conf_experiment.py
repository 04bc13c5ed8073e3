"""Guide-§9 configuration experiments (VERDICT r15 ask #5): time a
query set under candidate conf overrides at a chosen scale, interleaved
by config so ambient drift lands on every variant, fresh JVM per trial
(the bench_isolated worker), configs injected via the session factory's
``SPARK_GRAFT_EXTRA_CONF`` env hook — no code edits per variant, local
defaults untouched.

Usage:
    python tools/conf_experiment.py --names q1,q2 --sf DIR \
        [--rounds 2] [--json PATH]

Variants are fixed in CONFIGS below so the committed result table is
reproducible.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS: dict[str, str] = {
    "base": "",
    # shuffle/spill codec: zstd trades CPU for ratio (guide §2.3/§9)
    "io_zstd": "spark.io.compression.codec=zstd",
    # let the planner pick shuffled-hash join when its size conditions
    # are met (guide §3.1/§9)
    "shj": "spark.sql.join.preferSortMergeJoin=false",
    # larger AQE target partitions: fewer, larger reducers (guide §2.2)
    "adv64m": "spark.sql.adaptive.advisoryPartitionSizeInBytes=64m",
}


def trial(name: str, sf: str, conf: str) -> float | None:
    env = dict(os.environ, SPARK_GRAFT_EXTRA_CONF=conf)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/bench_isolated.py"),
             "--worker", name, "--sf", sf],
            capture_output=True, text=True, cwd=REPO, timeout=900, env=env)
    except subprocess.TimeoutExpired:
        return None
    line = next((ln for ln in proc.stdout.splitlines()
                 if ln.startswith("BENCH_ISOLATED ")), None)
    if proc.returncode != 0 or line is None:
        sys.stderr.write(proc.stderr[-1500:] + "\n")
        return None
    return json.loads(line[len("BENCH_ISOLATED "):])["sec"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    names = args.names.split(",")
    res: dict[str, dict[str, list[float]]] = {
        n: {c: [] for c in CONFIGS} for n in names}
    for r in range(args.rounds):
        for n in names:
            for cname, conf in CONFIGS.items():
                t = trial(n, args.sf, conf)
                if t is not None:
                    res[n][cname].append(t)
                print(f"[round {r + 1}] {n} {cname}: {t}", flush=True)
                if args.json:
                    with open(args.json, "w") as f:
                        json.dump(res, f, indent=1)
    print("\n| query | " + " | ".join(CONFIGS) + " |")
    print("|---" * (len(CONFIGS) + 1) + "|")
    for n in names:
        meds = [statistics.median(res[n][c]) if res[n][c] else None
                for c in CONFIGS]
        print("| " + n + " | " + " | ".join(
            f"{m:.2f}" if m is not None else "—" for m in meds) + " |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
