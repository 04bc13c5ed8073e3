"""BPE tokenizer training/apply: hand-computed merges on a tiny corpus,
run-of-repeats replace semantics, and train->apply consistency.

Reference context: the reference tokenizes by whitespace only
(`SVM.py:29`, `NB.java:118`); BPE is north-star LLM-pipeline surface
(Sennrich et al. 2016).
"""

import pytest

from text_sentiment_classification_hadoop_spark_spark.operators import bpe as BPE


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_word_freqs(spark):
    wf = {r["word"]: r["freq"] for r in
          BPE.word_freqs(_docs(spark, ["the cat the", "Cat hat!"])).collect()}
    assert wf == {"the": 2, "cat": 2, "hat": 1}


def test_bpe_merges_hand_computed(spark):
    # corpus: low x5, lower x2, newest x6, widest x3  (the classic
    # Sennrich worked example). Symbol pairs, freq-weighted:
    #   'e s' appears in newest(6)+widest(3) = 9  -> merge 1
    #   'es t' then 9 -> merge 2; 'est </w>' 9 -> merge 3; 'l o' 7 ...
    texts = (["low"] * 5) + (["lower"] * 2) + (["newest"] * 6) + (["widest"] * 3)
    wf = BPE.word_freqs(_docs(spark, [" ".join(texts)]))
    merges = BPE.bpe_train(wf, n_merges=4)
    assert merges[0] == ("e s", 9)
    assert merges[1] == ("es t", 9)
    assert merges[2] == ("est </w>", 9)
    assert merges[3] == ("l o", 7)


def test_bpe_tie_break_is_pair_ascending(spark):
    # 'ab' and 'cd' both once: tie on freq -> lexicographically smallest
    # pair of the maximal pairs wins. Pairs: 'a b','b </w>','c d','d </w>'
    # all freq 1 -> 'a b' first.
    wf = BPE.word_freqs(_docs(spark, ["ab cd"]))
    merges = BPE.bpe_train(wf, n_merges=1)
    assert merges[0] == ("a b", 1)


def test_merge_run_of_repeats_left_to_right(spark):
    # 'aaaa' -> 'a a a a </w>'; merging 'a a' left-to-right greedily
    # gives 'aa aa </w>' (the canonical BPE result) thanks to the
    # multi-pass replace (one pass alone under-merges to 'aa a a </w>').
    wf = BPE.word_freqs(_docs(spark, ["aaaa aaaa aab"]))
    merges = BPE.bpe_train(wf, n_merges=1)
    assert merges[0][0] == "a a"
    toks = {r["token"]: r["freq"] for r in
            BPE.bpe_segment_counts(
                _docs(spark, ["aaaa aaaa aab"]), ["a a"]).collect()}
    # aaaa x2 -> aa aa </w>;  aab -> aa b </w>
    assert toks == {"aa": 5, "b": 1, "</w>": 3}


def test_segment_counts_conserve_symbols(spark):
    # total merged-symbol mass: each merge of a pair reduces the symbol
    # count by 1 per occurrence; with zero merges, token mass equals
    # chars + one </w> per word occurrence.
    texts = ["the cat sat", "the hat"]
    toks = BPE.bpe_segment_counts(_docs(spark, texts), []).collect()
    total = sum(r["freq"] for r in toks)
    n_chars = sum(len(w) for t in texts for w in t.split())
    n_words = sum(len(t.split()) for t in texts)
    assert total == n_chars + n_words


def test_entry_oracle_parity_sf0001(spark):
    """The unrolled SQL oracle reproduces the Spark merge table exactly
    at sf0.001 (the driver checks sf0.01 — same mechanism)."""
    import json
    import subprocess
    import sys

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in entry.queries()["bpe_merges"](spark, sf).collect()]
    # DuckDB runs in a subprocess: the long-lived Spark JVM in this
    # pytest session can exhaust the process fd limit, which surfaces
    # as a spurious duckdb "Too many open files".
    script = (
        "import json, sys, duckdb\n"
        "sys.path.insert(0, '/root/repo')\n"
        "import __spark_entry__ as entry\n"
        "con = duckdb.connect()\n"
        f"con.execute(\"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'\")\n"
        "print(json.dumps(con.execute(entry.oracle_sql()['bpe_merges']).fetchall()))\n"
    )
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, check=True)
    want = [tuple(r) for r in json.loads(out.stdout)]
    assert got == want


def test_bpe_doc_token_counts(spark):
    # zero merges: every word contributes chars + 1 (</w>) subwords
    docs = _docs(spark, ["the cat", "a bee"])
    got = {r["doc_id"]: r["n_subwords"] for r in
           BPE.bpe_doc_token_counts(docs, []).collect()}
    assert got == {0: (3 + 1) + (3 + 1), 1: (1 + 1) + (3 + 1)}
    # one merge 'e </w>' shortens 'the' and 'bee' by one each
    got2 = {r["doc_id"]: r["n_subwords"] for r in
            BPE.bpe_doc_token_counts(docs, ["e </w>"]).collect()}
    assert got2 == {0: got[0] - 1, 1: got[1] - 1}


def _py_bpe_reference(word_freqs, n_merges, passes=3):
    """Single-node reference of the exact distributed semantics:
    pair counts weighted by word freq, argmax (freq desc, pair asc),
    fixed-pass padded left-to-right replace."""
    seqs = {w: " ".join(w) + " </w>" for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, f in word_freqs.items():
            syms = seqs[w].split(" ")
            for a, b in zip(syms, syms[1:]):
                counts[f"{a} {b}"] = counts.get(f"{a} {b}", 0) + f
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        merges.append((pair, counts[pair]))
        merged = pair.replace(" ", "")
        for w in seqs:
            s = f" {seqs[w]} "
            for _ in range(passes):
                s = s.replace(f" {pair} ", f" {merged} ")
            seqs[w] = s.strip()
    return merges


def test_bpe_matches_python_reference_random(spark):
    import random

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(st.text(alphabet="ab", min_size=1, max_size=6),
                    min_size=1, max_size=12),
           st.integers(1, 4))
    def check(words, n_merges):
        text = " ".join(words)
        wf = {}
        for w in words:
            wf[w] = wf.get(w, 0) + 1
        want = _py_bpe_reference(wf, n_merges)
        got = BPE.bpe_train(
            BPE.word_freqs(_docs(spark, [text])), n_merges=n_merges)
        assert got == want

    check()


def test_merge_table_save_load_roundtrip(spark, tmp_path):
    texts = (["low"] * 5) + (["newest"] * 6)
    wf = BPE.word_freqs(_docs(spark, [" ".join(texts)]))
    merges = BPE.bpe_train(wf, n_merges=3)
    path = str(tmp_path / "merges")
    BPE.save_merges(spark, merges, path)
    assert BPE.load_merges(spark, path) == merges
    # loaded merges drive apply identically to in-memory ones
    docs = _docs(spark, ["low newest low"])
    direct = sorted(map(tuple, BPE.bpe_segment_counts(
        docs, [p for p, _ in merges]).collect()))
    loaded = sorted(map(tuple, BPE.bpe_segment_counts(
        docs, [p for p, _ in BPE.load_merges(spark, path)]).collect()))
    assert direct == loaded


def test_vocab_curve_monotone_and_bounded(spark):
    docs = _docs(spark, ["the cat the hat", "the bat"])
    total = sum(r["freq"] for r in
                BPE.bpe_segment_counts(docs, []).collect())
    rows = BPE.vocab_coverage_curve(docs, [], top=50).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    cums = [r["cum_freq"] for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == total  # top >= vocab size -> full coverage
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)


def test_fertility_by_group_bounds_and_consistency(spark):
    """Fertility is >= 1 (a word yields at least one subword), exact
    counts tie out against the per-word dictionary, and a group made
    of un-merged words shows strictly higher fertility than one whose
    words the merges fully fuse."""
    from text_sentiment_classification_hadoop_spark_spark.operators import bpe as BPE
    rows = [
        (1, "aa aa aa aa aa aa", "fused"),
        (2, "aa aa aa aa", "fused"),
        (3, "xyz qrs xyz", "raw"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    merges = [p for p, _ in BPE.bpe_train(BPE.word_freqs(docs), 2)]
    got = {r["lang"]: r for r in
           BPE.fertility_by_group(docs, merges).collect()}
    assert got["fused"]["n_words"] == 10 and got["raw"]["n_words"] == 3
    assert all(r["fertility_frac"] >= 1.0 for r in got.values())
    # 'aa' merges to one token after the first merge; xyz/qrs never do
    assert got["fused"]["fertility_frac"] < got["raw"]["fertility_frac"]


def test_bpe_batch_k1_is_sequential_semantics(spark):
    """batch_k=1 must degenerate bit-exactly to sequential BPE: the
    Sennrich worked example's merge list is pinned above; the batched
    code path with k=1 must reproduce it (VERDICT r8 ask #4 contract —
    the registry's bpe_merges hash rides on this)."""
    texts = (["low"] * 5) + (["lower"] * 2) + (["newest"] * 6) + (["widest"] * 3)
    wf = BPE.word_freqs(_docs(spark, [" ".join(texts)]))
    assert BPE.bpe_train(wf, n_merges=4, batch_k=1) == [
        ("e s", 9), ("es t", 9), ("est </w>", 9), ("l o", 7)]


def test_bpe_batched_rounds_select_symbol_disjoint_pairs(spark):
    """batch_k>1: each round's pairs are symbol-disjoint (commuting
    rewrites), conflicting candidates defer to later rounds, and the
    full quota of merges is still learned.

    On the Sennrich corpus with batch_k=2, round 1 ranks 'e s' (9)
    first and must SKIP 'es t' (shares 's'... actually shares no raw
    symbol with {'e','s'}? 'es t' has symbols 'es','t' — but 'es'
    only exists after the merge; pre-merge ranking contains 'e s'(9),
    's t'(9), 't </w>'(9)... 's t' shares 's' -> deferred; 't </w>'
    is disjoint from {'e','s'} -> selected). Assert exactly that."""
    texts = (["low"] * 5) + (["lower"] * 2) + (["newest"] * 6) + (["widest"] * 3)
    wf = BPE.word_freqs(_docs(spark, [" ".join(texts)]))
    merges = BPE.bpe_train(wf, n_merges=4, batch_k=2)
    assert len(merges) == 4
    # round 1: 'e s' (top) + the best symbol-disjoint runner-up
    assert merges[0] == ("e s", 9)
    a0 = set(merges[0][0].split(" "))
    a1 = set(merges[1][0].split(" "))
    assert not (a0 & a1), "round-1 pairs must be symbol-disjoint"
    # divergence from sequential BPE is allowed for ranks 2+ but every
    # reported frequency must be the true pre-round count (a BIGINT > 0)
    assert all(f > 0 for _, f in merges)


def test_bpe_batch_selection_defers_output_input_collisions():
    """ADVICE r9 (medium): a candidate whose INPUT equals an earlier-
    selected pair's merged OUTPUT must defer ('th e' after 't h' →
    output 'th'), else the round's chained rewrites merge occurrences
    created mid-round that were never counted. The reverse direction
    ('t h' after 'th e') must defer too — its rewrite would produce a
    symbol the earlier rewrite consumes, breaking commutation."""
    ranked = [("t h", 10), ("th e", 9), ("a b", 8)]
    assert BPE.select_batch(ranked, 3) == [("t h", 10), ("a b", 8)]
    ranked_rev = [("th e", 10), ("t h", 9), ("a b", 8)]
    assert BPE.select_batch(ranked_rev, 3) == [("th e", 10), ("a b", 8)]
    # plain input-symbol sharing still defers; quota still honored
    assert BPE.select_batch([("e s", 9), ("s t", 9), ("t w", 8)], 2) == [
        ("e s", 9), ("t w", 8)]


def test_bpe_headroom_lifts_starved_fill(spark):
    """VERDICT r13 ask #1: the candidate window (``headroom·k`` driver
    rows) is what a starved round is limited by. Corpus built so the
    top of the ranking is symbol-entangled ('a b'/'b </w>'/'a c' all
    collide) while disjoint candidates sit just below the narrow
    window: headroom=1 fills 1/3 in round 1, headroom=8 fills 3/3 —
    and the selected pairs under the wide window are exactly the
    greedy symbol-disjoint picks over the TRUE pre-round counts (the
    semantics the bpe_merges_headroom16 oracle re-derives)."""
    text = " ".join(["ab"] * 100 + ["ac"] * 99 + ["xy"] * 10)
    wf = BPE.word_freqs(_docs(spark, [text])).cache()
    narrow_fills, wide_fills = [], []
    narrow = BPE.bpe_train(wf, n_merges=3, batch_k=3,
                           round_sizes=narrow_fills, headroom=1)
    wide = BPE.bpe_train(wf, n_merges=3, batch_k=3,
                         round_sizes=wide_fills, headroom=8)
    assert narrow_fills[0] == 1 and wide_fills[0] == 3
    # wide window, round 1: 'a b'(100) wins; 'b </w>'(100) and
    # 'a c'(99) defer (shared symbols); 'c </w>'(99) and 'x y'(10)
    # are the deeper disjoint picks the narrow window never saw
    assert wide == [("a b", 100), ("c </w>", 99), ("x y", 10)]
    assert narrow[0] == ("a b", 100) and narrow != wide


def test_bpe_batch_k_rejects_nonpositive(spark):
    wf = BPE.word_freqs(_docs(spark, ["ab cd"]))
    with pytest.raises(ValueError):
        BPE.bpe_train(wf, n_merges=1, batch_k=0)


def test_bpe_select_batch_properties():
    """Hypothesis: for any ranked candidate list, select_batch yields
    (1) at most k pairs, (2) pairwise disjoint over inputs AND merged
    outputs, (3) a subsequence of the ranked order, (4) greedy-maximal:
    every skipped candidate (up to the quota point) conflicts with an
    earlier selection."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sym = st.text(alphabet="abct</w>", min_size=1, max_size=3)
    cand = st.tuples(st.tuples(sym, sym), st.integers(1, 100))

    @settings(max_examples=200, deadline=None)
    @given(st.lists(cand, max_size=12), st.integers(1, 5))
    def run(raw, k):
        ranked = [(f"{a} {b}", f) for (a, b), f in raw]
        sel = BPE.select_batch(ranked, k)
        assert len(sel) <= k
        # symbol-disjoint over inputs + outputs
        used = set()
        for pair, _ in sel:
            a, b = pair.split(" ")
            assert not ({a, b, a + b} & used)
            used |= {a, b, a + b}
        # subsequence of ranked order
        idxs = []
        pos = 0
        for item in sel:
            pos = ranked.index(item, pos)
            idxs.append(pos)
            pos += 1
        assert idxs == sorted(idxs)
        # greedy-maximal: any candidate before the quota filled that
        # was skipped must conflict with the used-set at that point
        if len(sel) < k:
            used2 = set()
            for pair, f in ranked:
                a, b = pair.split(" ")
                if (pair, f) in sel:
                    used2 |= {a, b, a + b}
                else:
                    assert {a, b, a + b} & used2

    run()
