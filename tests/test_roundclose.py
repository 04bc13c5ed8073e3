"""Unit tests for tools/roundclose.py's artifact verification — the
guard that keeps per-round artifacts pinned to the registry (VERDICT
r9 ask #2). The regeneration steps are exercised by the real round
close; here we pin the CHECKS: a lagging count, a cartesian product,
a failed/skipped selfcheck, or a missing isolated median must each be
reported, and a conforming artifact set must pass clean."""

import importlib.util
import json

spec = importlib.util.spec_from_file_location(
    "roundclose", "/root/repo/tools/roundclose.py")
rc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rc)


def _planaudit_text(audited, registered, carts=0, failures=False):
    txt = (f"# PLANAUDIT\n\n| q | ... |\n\n**Totals: {audited} queries "
           f"audited of {registered} registered; 5 exchange-free; "
           f"cartesian products: {carts}.**\n")
    if failures:
        txt += "\n## Build failures\n\n- broken_query: boom\n"
    return txt


def test_verify_planaudit_pass_and_failures(tmp_path, monkeypatch):
    monkeypatch.setattr(rc, "REPO", str(tmp_path))
    p = tmp_path / "PLANAUDIT.md"

    p.write_text(_planaudit_text(281, 281))
    probs = []
    rc.verify_planaudit(281, probs)
    assert probs == []

    p.write_text(_planaudit_text(279, 281))        # lagging audit
    probs = []
    rc.verify_planaudit(281, probs)
    assert any("279" in x for x in probs)

    p.write_text(_planaudit_text(281, 281, carts=2))  # cartesian leak
    probs = []
    rc.verify_planaudit(281, probs)
    assert any("cartesian" in x for x in probs)

    p.write_text(_planaudit_text(281, 281, failures=True))
    probs = []
    rc.verify_planaudit(281, probs)
    assert any("failures" in x for x in probs)


def test_verify_selfcheck_fields(tmp_path):
    good = {"n_fail": 0, "n_sf_pinned_skip": 0, "n_registry": 281,
            "covered_full_registry": True}
    f = tmp_path / "SELFCHECK.json"
    f.write_text(json.dumps(good))
    probs = []
    rc.verify_selfcheck(str(f), 281, probs)
    assert probs == []

    for field, bad in [("n_fail", 3), ("n_sf_pinned_skip", 2),
                       ("n_registry", 278),
                       ("covered_full_registry", False)]:
        rec = dict(good)
        rec[field] = bad
        f.write_text(json.dumps(rec))
        probs = []
        rc.verify_selfcheck(str(f), 281, probs)
        assert probs and field in probs[0]


def test_verify_bench_isolated_medians(tmp_path):
    """Since r11 the artifact must cover the FULL headline set with a
    median for every query (VERDICT r10 ask #2)."""
    import bench
    full = {q: {"median": 1.2} for q in bench.HEADLINE_QUERIES}
    f = tmp_path / "BI.json"
    f.write_text(json.dumps({"coverage": "headline", "queries": full}))
    probs = []
    rc.verify_bench_isolated(str(f), probs)
    assert probs == []

    nulled = dict(full)
    nulled[bench.HEADLINE_QUERIES[0]] = {"median": None}
    f.write_text(json.dumps({"coverage": "headline", "queries": nulled}))
    probs = []
    rc.verify_bench_isolated(str(f), probs)
    assert probs and bench.HEADLINE_QUERIES[0] in probs[0]

    partial = {q: {"median": 1.2} for q in bench.HEADLINE_QUERIES[:20]}
    f.write_text(json.dumps({"coverage": "headline", "queries": partial}))
    probs = []
    rc.verify_bench_isolated(str(f), probs)
    assert probs and "headline coverage missing" in probs[0]

    # a tagged superset passes
    f.write_text(json.dumps({"coverage": "headline+tail_top",
                             "queries": full}))
    probs = []
    rc.verify_bench_isolated(str(f), probs)
    assert probs == []

    # wrong mode is rejected even if fully covered
    f.write_text(json.dumps({"coverage": "top20", "queries": full}))
    probs = []
    rc.verify_bench_isolated(str(f), probs)
    assert probs and "want 'headline'" in probs[0]

    # legacy artifact (no stamp, r9/r10): only the median contract
    f.write_text(json.dumps({"queries": partial}))
    probs = []
    rc.verify_bench_isolated(str(f), probs)
    assert probs == []

    f.write_text(json.dumps({"queries": {}}))
    probs = []
    rc.verify_bench_isolated(str(f), probs)
    assert probs and any("empty" in p for p in probs)


def test_latest_committed_artifact_set_is_internally_consistent():
    """The LATEST committed artifact set must be internally green and
    agree with itself on registry size — the r7/r9 failure mode was one
    artifact lagging the others. (The vs-HEAD pin is enforced by
    roundclose at close time, not here, so adding a query mid-round
    doesn't red the suite before the closing regeneration.)"""
    import glob
    import re

    rounds = sorted(
        int(re.search(r"_r(\d+)\.json$", p).group(1))
        for p in glob.glob("/root/repo/SELFCHECK_r*.json")
        if re.search(r"_r(\d+)\.json$", p))
    n_round = rounds[-1]
    sc1 = json.load(open(f"/root/repo/SELFCHECK_r{n_round}.json"))
    n = sc1["n_registry"]
    probs = []
    rc.verify_planaudit(n, probs)
    rc.verify_selfcheck(f"/root/repo/SELFCHECK_r{n_round}.json", n, probs)
    sc2 = f"/root/repo/SELFCHECK_r{n_round}_sf0001.json"
    rc.verify_selfcheck(sc2, n, probs)
    import os
    sc3 = f"/root/repo/SELFCHECK_r{n_round}_sf01.json"
    if os.path.exists(sc3):  # the bench-scale check exists since r11
        rc.verify_selfcheck(sc3, n, probs)
    bi = f"/root/repo/BENCH_ISOLATED_r{n_round}.json"
    # full_coverage=False: the committed artifact covered the headline
    # set AS OF its round (verified at that close); mid-round headline
    # promotions must not retroactively red it (r13: the one-time
    # sweep promoted 25 pre-existing queries)
    rc.verify_bench_isolated(bi, probs, full_coverage=False)
    assert probs == [], probs


def test_operator_registry_audit_is_clean_and_detects_orphans(tmp_path):
    """The public-operator audit (VERDICT r12 ask #1): HEAD must carry
    zero unwaived uncovered public functions, and a synthetic orphan
    module must be flagged."""
    spec2 = importlib.util.spec_from_file_location(
        "operator_registry_audit",
        "/root/repo/tools/operator_registry_audit.py")
    ora = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(ora)
    assert ora.audit() == []
    # a module whose public function nothing references must be caught
    mod = (tmp_path / "orphan_op.py")
    mod.write_text("def shiny_new_operator(df):\n    return df\n")
    orig = ora._package_sources
    ora._package_sources = lambda: orig() + [str(mod)]
    try:
        findings = ora.audit()
    finally:
        ora._package_sources = orig
    assert any("shiny_new_operator" in f for f in findings)
