"""Interleaved A/B fresh-JVM battery: alternate OLD-code (a pinned
worktree) and NEW-code (this repo) single-trial workers per query per
pass, so ambient drift lands symmetrically on both sides (the §0.2
window moved identical code ±50-100% across minutes — back-to-back
batteries are not window-safe, interleaving is).

Usage: python tools/interleaved_ab.py --old /root/repo_before \
         --names a,b,c --passes 3 --json /tmp/ab.json
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

NEW = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def trial(repo: str, name: str, sf: str) -> float | None:
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "tools/bench_isolated.py"),
             "--worker", name, "--sf", sf],
            capture_output=True, text=True, cwd=repo, timeout=900)
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
    ap.add_argument("--old", required=True)
    ap.add_argument("--names", required=True)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    names = args.names.split(",")
    res = {n: {"old": [], "new": []} for n in names}
    for p in range(args.passes):
        for n in names:
            for side, repo in (("old", args.old), ("new", NEW)):
                t = trial(repo, n, args.sf)
                if t is not None:
                    res[n][side].append(t)
                print(f"[pass {p+1}] {n} {side}: {t}", flush=True)
                if args.json:
                    with open(args.json, "w") as f:
                        json.dump(res, f, indent=1)
    for n in names:
        o, w = res[n]["old"], res[n]["new"]
        if o and w:
            mo, mw = statistics.median(o), statistics.median(w)
            print(f"{n}: old {mo:.2f} new {mw:.2f} "
                  f"({(mw / mo - 1) * 100:+.1f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
