"""Compare two BENCH_ISOLATED_r{N}.json artifacts on their common
queries — THE round-over-round performance signal since r11 (VERDICT
r10 ask #2: in-bench totals moved ±20-25% on identical code; isolated
fresh-JVM medians are the noise-robust artifact).

Usage:
    python tools/bench_compare.py BENCH_ISOLATED_r10.json BENCH_ISOLATED_r11.json
    python tools/bench_compare.py old.json new.json --threshold 0.25
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.20,
                    help="flag |delta| above this fraction "
                         "(SCALE.md §16 measured ±20-22% identical-code "
                         "spread on single in-bench runs; isolated "
                         "medians should sit well inside it)")
    args = ap.parse_args()
    old = json.load(open(args.old))["queries"]
    new = json.load(open(args.new))["queries"]
    common = sorted(set(old) & set(new))
    rows = []
    for q in common:
        mo, mn = old[q].get("median"), new[q].get("median")
        if mo is None or mn is None:
            continue
        rows.append((q, mo, mn, (mn - mo) / mo if mo else float("inf")))
    rows.sort(key=lambda r: r[3])
    to, tn = sum(r[1] for r in rows), sum(r[2] for r in rows)
    print(f"common queries with medians: {len(rows)}")
    print(f"total: {to:.1f}s -> {tn:.1f}s "
          f"({(tn - to) / to * 100:+.1f}%)" if to else "no common medians")
    flagged = [r for r in rows if abs(r[3]) > args.threshold]
    print(f"\n|delta| > {args.threshold:.0%} ({len(flagged)}):")
    for q, mo, mn, d in flagged:
        print(f"  {q}: {mo:.2f}s -> {mn:.2f}s ({d * 100:+.0f}%)")
    print("\nbest 5 / worst 5:")
    for q, mo, mn, d in rows[:5] + rows[-5:]:
        print(f"  {q}: {mo:.2f}s -> {mn:.2f}s ({d * 100:+.0f}%)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
