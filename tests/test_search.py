"""Search/retrieval operators: inverted index + BM25 ranking."""

import math

from text_sentiment_classification_hadoop_spark_spark.operators import search as SR


def test_inverted_index_exact(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "a")], "doc_id long, text string")
    out = {r["w"]: (r["df"], r["postings"])
           for r in SR.inverted_index(docs).collect()}
    assert out == {"a": (2, "1,3"), "b": (2, "1,2"), "c": (1, "2")}


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "x x y"),       # tf(x)=2, dl=3
         (2, "x z z z"),     # tf(x)=1, dl=4
         (3, "z z z")],      # no query terms
        "doc_id long, text string")
    rows = SR.bm25_topk(docs, "x", k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert ids == [1, 2]                   # doc 3 never matches
    k1, b = SR.BM25_K1, SR.BM25_B
    n, dfx, avgdl = 3, 2, (3 + 4 + 3) / 3
    idf = math.log((n - dfx + 0.5) / (dfx + 0.5) + 1.0)

    def w(tf, dl):
        raw = idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
        return math.floor(raw * 1e6 + 0.5) / 1e6

    got = {r["doc_id"]: r["score"] for r in rows}
    assert got[1] == math.floor(w(2, 3) * 1e6 + 0.5) / 1e6
    assert got[2] == math.floor(w(1, 4) * 1e6 + 0.5) / 1e6
    assert got[1] > got[2]                 # higher tf, shorter doc wins


def test_bm25_multi_term_additivity(spark):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x q"), (3, "q q")], "doc_id long, text string")
    both = {r["doc_id"]: r["score"]
            for r in SR.bm25_topk(docs, "x y", k=10).collect()}
    # doc 1 matches both terms, doc 2 one; doc 3 none
    assert set(both) == {1, 2}
    assert both[1] > both[2]


def test_cms_never_underestimates_and_is_tight_here(spark, sf_dir):
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # probe every token in the corpus vocabulary
    vocab = [r["w"] for r in
             docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
             .filter(F.length("w") > 0).distinct().collect()]
    rows = SR.cms_estimate(docs, vocab).collect()
    assert len(rows) == len(vocab)
    for r in rows:
        assert r["est_count"] >= r["exact_count"]      # CMS overestimates
    # with |vocab| << width the collision rate is tiny: most estimates
    # are exact
    exact_hits = sum(r["est_count"] == r["exact_count"] for r in rows)
    assert exact_hits >= 0.9 * len(rows)


def test_cms_merge_by_addition(spark):
    # sketches of two corpus halves summed == sketch of the union
    from pyspark.sql import functions as F
    a = spark.createDataFrame([(1, "x y"), (2, "x z")], "doc_id long, text string")
    b = spark.createDataFrame([(3, "x q")], "doc_id long, text string")
    u = a.unionAll(b)
    sa = {(r["j"], r["col"]): r["cnt"] for r in SR.cms_build(a).collect()}
    sb = {(r["j"], r["col"]): r["cnt"] for r in SR.cms_build(b).collect()}
    su = {(r["j"], r["col"]): r["cnt"] for r in SR.cms_build(u).collect()}
    merged = dict(sa)
    for k, v in sb.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == su


def test_ppl_band_filter_keeps_middle_band(spark):
    from text_sentiment_classification_hadoop_spark_spark.operators.text_analysis import (
        bigram_lm_score,
        ppl_band_filter,
    )
    texts = ["the cat sat on the mat", "the dog sat on the mat",
             "zz qq xx vv ww yy", "the cat sat on the mat again",
             "aa bb cc dd ee ff", "the mat sat on the cat"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    kept = ppl_band_filter(docs, lo=0.25, hi=0.75)
    scored = {r["doc_id"]: r["avg_logp_nats"]
              for r in bigram_lm_score(docs).collect()}
    got = {r["doc_id"] for r in kept.collect()}
    # band is non-trivial: something kept, something dropped
    assert 0 < len(got) < len(texts)
    # every kept doc scores >= every dropped doc's distance ordering:
    # kept scores lie inside [min(kept), max(kept)] and dropped ones
    # are outside that closed band
    lo = min(scored[d] for d in got)
    hi = max(scored[d] for d in got)
    for d in set(scored) - got:
        assert scored[d] < lo or scored[d] > hi


def test_tfidf_doc_pairs_identical_docs_cos1(spark):
    from text_sentiment_classification_hadoop_spark_spark.operators.search import tfidf_doc_pairs
    docs = spark.createDataFrame([
        (0, "rare unique tokens here"),
        (1, "rare unique tokens here"),          # exact dup -> cosine 1.0
        (2, "entirely different vocabulary set"),
    ], "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in tfidf_doc_pairs(docs, threshold=0.5).collect()}
    assert got == {(0, 1): 1.0}


def test_tfidf_doc_pairs_df_pruning_drops_common_terms(spark):
    from text_sentiment_classification_hadoop_spark_spark.operators.search import tfidf_doc_pairs
    # 'shared' appears in every doc; with max_df=2 it is pruned, so the
    # only candidate link left is the rare 'zebra' pair
    docs = spark.createDataFrame([
        (0, "shared zebra alpha"),
        (1, "shared zebra beta"),
        (2, "shared gamma delta"),
    ], "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in
           tfidf_doc_pairs(docs, threshold=0.1, max_df=2).collect()}
    assert got == {(0, 1)}


def test_rrf_fuse_hand_computed(spark):
    from text_sentiment_classification_hadoop_spark_spark.operators.search import rrf_fuse
    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int")
    dense = spark.createDataFrame(
        [(20, 1), (10, 2), (40, 3)], "doc_id long, rank int")
    got = [(r["doc_id"], r["rrf_micro"], r["rank"])
           for r in rrf_fuse([lex, dense], k=4).collect()]
    c = lambda r: 1000000 // (60 + r)
    # 10: r1+r2, 20: r2+r1 (tie with 10 -> doc_id asc), 30: r3, 40: r3
    assert got == [(10, c(1) + c(2), 1), (20, c(2) + c(1), 2),
                   (30, c(3), 3), (40, c(3), 4)]


def test_phrase_search_matches_python_scan(spark, sf_dir):
    """Every returned (doc, start) is a real consecutive occurrence,
    and none is missed — verified against a plain Python scan."""
    from text_sentiment_classification_hadoop_spark_spark.operators.search import phrase_search
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    phrase = ["scan", "slow"]
    got = sorted((r["doc_id"], r["start_pos"])
                 for r in phrase_search(docs, " ".join(phrase)).collect())
    want = []
    for r in docs.collect():
        toks = r["text"].lower().split(" ")
        for i in range(len(toks) - len(phrase) + 1):
            if toks[i:i + len(phrase)] == phrase:
                want.append((r["doc_id"], i))
    assert got == sorted(want) and got


def test_phrase_search_single_term_and_shared_postings(spark, sf_dir):
    from text_sentiment_classification_hadoop_spark_spark.operators.search import (
        phrase_search,
        positional_postings,
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    post = positional_postings(docs).localCheckpoint(eager=True)
    one = phrase_search(docs, "merge", postings=post)
    assert one.count() == post.filter("term = 'merge'").count()


def test_pmi_collocations_matches_python(spark, sf_dir):
    """PMI over a small corpus equals a from-scratch Python count."""
    import collections
    import math

    from text_sentiment_classification_hadoop_spark_spark.operators.search import pmi_collocations
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").limit(80)
    got = [(r["w1"], r["w2"], r["n_pair"], r["pmi"])
           for r in pmi_collocations(docs, min_count=3, k=10).collect()]
    uni = collections.Counter()
    pc = collections.Counter()
    for r in docs.collect():
        toks = [t for t in r["text"].lower().split(" ") if t]
        uni.update(toks)
        for i, a in enumerate(toks):
            for o in (1, 2, 3):
                if i + o < len(toks):
                    b = toks[i + o]
                    if a != b:
                        pc[tuple(sorted((a, b)))] += 1
    n_p = sum(pc.values())
    n_u = sum(uni.values())
    scored = []
    for (a, b), c in pc.items():
        if c >= 3:
            pmi = math.floor(math.log((c / n_p) / ((uni[a] / n_u)
                                                   * (uni[b] / n_u)))
                             * 1e6 + 0.5) / 1e6
            scored.append((pmi, a, b, c))
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = [(a, b, c, p) for p, a, b, c in scored[:10]]
    assert got == want


def test_textrank_prefers_connected_hub(spark):
    """A term wired into every sentence must outrank a peripheral one."""
    from text_sentiment_classification_hadoop_spark_spark.operators.search import textrank_keywords
    rows = [(i, f"hub t{i} filler{i % 3} hub extra{i}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = textrank_keywords(docs, min_count=2, k=10).collect()
    assert out[0]["term"] == "hub"
    assert [r["rk"] for r in out] == list(range(1, len(out) + 1))
