"""Round-close artifact regeneration — one invocation, all per-round
artifacts, hard-failing when any artifact's coverage lags the registry
(VERDICT r9 ask #2: two consecutive rounds shipped a stale audit; this
makes regeneration mechanical so it can't happen again).

Regenerates, in order:

1. ``PLANAUDIT.md``            (tools/audit_plans.py, sf0.001)
2. ``SELFCHECK_r{N}.json``     (tools/check_correctness.py, sf0.01)
3. ``SELFCHECK_r{N}_sf0001.json`` (same, sf0.001)
4. ``SELFCHECK_r{N}_sf01.json``   (same, sf0.1 — the BENCH scale;
   VERDICT r10 ask #1: correctness had never been proven above sf0.01)
5. ``BENCH_ISOLATED_r{N}.json`` (tools/bench_isolated.py --headline:
   every bench.HEADLINE_QUERIES entry, fresh-JVM median-of-3 — the
   round-over-round perf artifact since r11, VERDICT r10 ask #2;
   MULTI-HOUR — regenerate once when perf-relevant code settles and
   pass --skip bench_isolated on the final roundclose; the artifact is
   still coverage-verified)

and then verifies, against ``len(__spark_entry__.queries())`` at HEAD:

- PLANAUDIT audited-count == registry count, and cartesian products == 0
- both selfchecks: covered_full_registry, n_fail == 0,
  n_sf_pinned_skip == 0, n_registry == registry count
- isolated bench: full headline coverage, every query a non-null median

Exit 0 only when every check passes. Run as the LAST commit of every
round:

    python tools/roundclose.py --round 10
    python tools/roundclose.py --round 10 --skip bench_isolated  # partial
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = "/root/repo"
sys.path.insert(0, REPO)

STEPS = ("planaudit", "selfcheck_sf001", "selfcheck_sf0001",
         "selfcheck_sf01", "bench_isolated")


def registry_size() -> int:
    import __spark_entry__ as entry
    return len(entry.queries())


def run(cmd: list[str], problems: list[str]) -> None:
    """Run one regeneration step; a non-zero exit is recorded (the
    step's artifact is still verified below — check_correctness writes
    its json before exiting 1) and the remaining steps still run."""
    print(f"\n=== {' '.join(cmd)}", flush=True)
    rc = subprocess.run(cmd, cwd=REPO).returncode
    if rc != 0:
        problems.append(f"step exited {rc}: {' '.join(cmd)}")


def verify_planaudit(n_registry: int, problems: list[str]) -> None:
    with open(f"{REPO}/PLANAUDIT.md") as f:
        text = f.read()
    m = re.search(r"Totals: (\d+) queries audited of (\d+) registered", text)
    if not m:
        problems.append("PLANAUDIT.md: totals line missing")
        return
    audited, registered = int(m.group(1)), int(m.group(2))
    if not (audited == registered == n_registry):
        problems.append(f"PLANAUDIT.md: audited {audited} / registered "
                        f"{registered} != registry {n_registry}")
    cm = re.search(r"cartesian products: (\d+)", text)
    if not cm or cm.group(1) != "0":
        problems.append("PLANAUDIT.md: cartesian products != 0")
    if "## Build failures" in text:
        problems.append("PLANAUDIT.md: has build failures")


def verify_selfcheck(path: str, n_registry: int, problems: list[str]) -> None:
    with open(path) as f:
        rec = json.load(f)
    for field, want in [("n_fail", 0), ("n_sf_pinned_skip", 0),
                        ("n_registry", n_registry),
                        ("covered_full_registry", True)]:
        if rec.get(field) != want:
            problems.append(f"{path}: {field}={rec.get(field)!r}, "
                            f"want {want!r}")


def verify_headline_drift(n_round: int, problems: list[str]) -> None:
    """The FULL registry must be partitioned between
    ``bench.HEADLINE_QUERIES`` (isolated fresh-JVM medians) and the
    per-entry-documented ``bench.HEADLINE_EXCLUDED`` — VERDICT r12
    ask #2 widened the r11 new-queries-only check to every registry
    query, so a pre-existing hole (mllib_nb_confusion, the M7 query
    with no isolated median through r12) can never hide again.
    Overlap, stale names, and uncovered queries are all failures."""
    import bench
    import __spark_entry__ as entry
    registry = set(entry.queries())
    head = set(bench.HEADLINE_QUERIES)
    excl = set(bench.HEADLINE_EXCLUDED)
    missing = sorted(registry - head - excl)
    if missing:
        problems.append(
            "headline sweep: registry queries in neither "
            f"bench.HEADLINE_QUERIES nor HEADLINE_EXCLUDED: {missing}")
    overlap = sorted(head & excl)
    if overlap:
        problems.append(
            f"headline sweep: queries in BOTH lists: {overlap}")
    stale = sorted((head | excl) - registry)
    if stale:
        problems.append(
            f"headline sweep: names not in the registry: {stale}")


def verify_bench_isolated(path: str, problems: list[str],
                          full_coverage: bool = True) -> None:
    """``full_coverage=True`` (round close) demands every CURRENT
    ``bench.HEADLINE_QUERIES`` entry; ``False`` (re-verifying a
    committed artifact from an earlier round, whose headline set was
    smaller) checks only the artifact's internal contract — stamp,
    non-empty, every median present. Full coverage of the THEN-current
    headline was verified when that round closed."""
    with open(path) as f:
        rec = json.load(f)
    bad = [n for n, r in rec["queries"].items() if r["median"] is None]
    if bad:
        problems.append(f"{path}: no median for {bad}")
    if not rec["queries"]:
        problems.append(f"{path}: empty query set")
    # r11+ artifacts carry a "coverage" stamp and must span the FULL
    # headline set (VERDICT r10 ask #2); stamp-less artifacts are
    # legacy top-20 runs (r9/r10) and keep their original contract.
    if "coverage" in rec:
        # "headline" or a superset tagged "headline+..." (r11 carries 4
        # registry-tail heavies for r10 continuity)
        if not str(rec["coverage"]).startswith("headline"):
            problems.append(f"{path}: coverage={rec['coverage']!r}, "
                            "want 'headline'")
        if full_coverage:
            import bench
            missing = sorted(
                set(bench.HEADLINE_QUERIES) - set(rec["queries"]))
            if missing:
                problems.append(f"{path}: headline coverage missing "
                                f"{len(missing)}: {missing[:5]}...")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--skip", action="append", default=[],
                    choices=STEPS, help="skip a regeneration step "
                    "(its artifact is still verified if present)")
    args = ap.parse_args()
    n = args.round
    n_registry = registry_size()
    print(f"registry at HEAD: {n_registry} queries")

    sc1 = f"SELFCHECK_r{n}.json"
    sc2 = f"SELFCHECK_r{n}_sf0001.json"
    sc3 = f"SELFCHECK_r{n}_sf01.json"
    bi = f"BENCH_ISOLATED_r{n}.json"

    problems: list[str] = []
    if "planaudit" not in args.skip:
        run([sys.executable, "tools/audit_plans.py"], problems)
    if "selfcheck_sf001" not in args.skip:
        run([sys.executable, "tools/check_correctness.py",
             "--sf", "/root/testdata/sf0.01", "--json", sc1], problems)
    if "selfcheck_sf0001" not in args.skip:
        run([sys.executable, "tools/check_correctness.py",
             "--sf", "/root/testdata/sf0.001", "--json", sc2], problems)
    if "selfcheck_sf01" not in args.skip:
        run([sys.executable, "tools/check_correctness.py",
             "--sf", "/root/testdata/sf0.1", "--json", sc3], problems)
    if "bench_isolated" not in args.skip:
        run([sys.executable, "tools/bench_isolated.py", "--headline",
             "--json", bi], problems)
    import os

    def check(step: str, path: str, fn) -> None:
        """Verify an artifact; missing is a problem unless its
        regeneration step was explicitly --skip'd."""
        if not os.path.exists(path):
            if step in args.skip:
                print(f"(skipped {step}; {path} absent — not verified)")
            else:
                problems.append(f"{path}: missing")
            return
        fn(path)

    check("planaudit", f"{REPO}/PLANAUDIT.md",
          lambda p: verify_planaudit(n_registry, problems))
    check("selfcheck_sf001", f"{REPO}/{sc1}",
          lambda p: verify_selfcheck(p, n_registry, problems))
    check("selfcheck_sf0001", f"{REPO}/{sc2}",
          lambda p: verify_selfcheck(p, n_registry, problems))
    check("selfcheck_sf01", f"{REPO}/{sc3}",
          lambda p: verify_selfcheck(p, n_registry, problems))
    check("bench_isolated", f"{REPO}/{bi}",
          lambda p: verify_bench_isolated(p, problems))
    verify_headline_drift(n, problems)
    # every public operator function must be registry-exercised or
    # carry a documented waiver (VERDICT r12 ask #1: capability must
    # never ship driver-unverifiable again)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import operator_registry_audit
    for finding in operator_registry_audit.audit():
        problems.append(f"operator-registry audit: {finding}")

    if problems:
        print("\nROUNDCLOSE FAILED:")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(f"\nROUNDCLOSE OK: all artifacts at registry={n_registry}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
