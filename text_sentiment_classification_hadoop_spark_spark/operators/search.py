"""Search / retrieval operators (north star §2.11 adjacent): inverted
index construction and BM25 ranking — the lexical-retrieval
counterpart to the embedding ANN family (a training-data pipeline uses
both: BM25 for decontamination-by-retrieval and hard-negative mining,
ANN for semantic dedup).

Determinism contract: per-term BM25 weights are quantized to INTEGER
micro-units before the per-doc sum (the LM micro-nat pattern), so
scores are independent of aggregation order across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import local_frame

from ..functions.rounding import pround

BM25_K1 = 1.2
BM25_B = 0.75


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (df.select(F.col(id_col),
                      F.explode(F.split(F.lower(F.col(text_col)), " "))
                      .alias("w"))
            .filter(F.length("w") > 0))


def inverted_index(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Inverted index → ``(w, df, postings)`` with postings as the
    comma-joined ascending doc-id list.

    One distinct + one hash aggregate, both map-side partial; the
    postings string is built from ``array_sort`` so it is independent
    of arrival order. At 100 TB postings become the bucketed join-side
    table for retrieval — the string form here is the oracle-friendly
    dump."""
    pairs = _tokens(df, text_col, id_col).distinct()
    return (pairs.groupBy("w")
            .agg(F.count(F.lit(1)).alias("df"),
                 F.array_join(
                     F.transform(F.array_sort(F.collect_list(id_col)),
                                 lambda x: x.cast("string")),
                     ",").alias("postings")))


def bm25_topk(df: DataFrame, query: str, k: int = 20,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """BM25 (Robertson/Lucene idf variant) top-``k`` →
    ``(doc_id, score, rank)`` for a literal query string.

    Plan shape: one pass for doc lengths (partial-agg count), one pass
    filtered to the query's terms for tf (the filter prunes the explode
    to matching tokens before any shuffle), df per term, the N/avgdl
    scalars as a broadcast 1-row join (J4). Per-(doc, term) weight:

        idf  = ln((N - df + 0.5) / (df + 0.5) + 1)
        w    = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    quantized to integer micro-units, summed per doc (exact), then
    sort+limit → TakeOrderedAndProject, tie-break on doc_id."""
    terms = sorted({w for w in query.lower().split(" ") if w})
    toks = _tokens(df, text_col, id_col)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    scalars = dl.agg(F.sum("dl").alias("sum_dl"),
                     F.count(F.lit(1)).alias("n_docs"))
    qtoks = toks.filter(F.col("w").isin(terms))
    tf = qtoks.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (qtoks.select(id_col, "w").distinct()
             .groupBy("w").agg(F.count(F.lit(1)).alias("dfreq")))
    j = (tf.join(F.broadcast(dfreq), "w")
         .join(dl, id_col)
         .crossJoin(F.broadcast(scalars)))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log((F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
                / (F.col("dfreq") + F.lit(0.5)) + F.lit(1.0))
    w = idf * (F.col("tf") * F.lit(k1 + 1.0)) \
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
                                      + F.lit(b) * F.col("dl") / avgdl))
    per_term = j.select(
        F.col(id_col),
        F.floor(w * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("wu"))
    scored = (per_term.groupBy(id_col)
              .agg(F.sum("wu").alias("su"))
              .select(F.col(id_col),
                      pround(F.col("su").cast("double") / F.lit(1000000.0), 6)
                      .alias("score")))
    from pyspark.sql import Window
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    win = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (top.withColumn("rank", F.row_number().over(win).cast("int"))
            .orderBy("rank"))


CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_build(df: DataFrame, text_col: str = "text",
              depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Count-min sketch of corpus token frequencies →
    ``(j, col, cnt)``: ``depth × width`` counters, counter ``(j, c)``
    summing every token whose ``j``-th salted portable hash lands in
    column ``c``.

    The canonical mergeable frequency sketch: counters are sums, so
    partial aggregation combines map-side and sketches from separate
    corpora/days merge by addition — the 100 TB path to "how often
    does this phrase appear" without a full-vocab table. Unlike the
    HLL sketch (engine-specific registers, rows-only checked), CMS
    over the portable md5 hash is bit-deterministic, so the driver
    hash-checks it end-to-end. One explode (constant ``depth``
    fan-out) + one hash aggregate of at most depth×width groups."""
    from ..functions.hashing import portable_hash64
    toks = _tokens(df, text_col, "doc_id" if "doc_id" in df.columns
                   else df.columns[0])
    rows = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 (portable_hash64(F.concat(F.lit(f"cms{j}:"), F.col("w")))
                  % width).cast("int").alias("col"))
        for j in range(depth)])
    return (toks.select(F.explode(rows).alias("r"))
            .groupBy(F.col("r.j").alias("j"), F.col("r.col").alias("col"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(df: DataFrame, terms: list[str], text_col: str = "text",
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """CMS point estimates vs exact counts for ``terms`` →
    ``(w, est_count, exact_count)``. The estimate is the min over the
    term's ``depth`` counters (CMS never underestimates:
    est ≥ exact, within ε·N with probability 1−δ for
    ε = e/width, δ = e^−depth). The probe side is ``depth`` literal
    (term, j, col) rows broadcast against the sketch."""
    import hashlib
    spark = df.sparkSession
    probes = []
    for t in sorted(set(terms)):
        for j in range(depth):
            h = int(hashlib.md5(f"cms{j}:{t}".encode()).hexdigest()[:15], 16)
            probes.append((t, j, h % width))
    probe_df = local_frame(spark, probes, "w string, j int, col int")
    sketch = cms_build(df, text_col, depth, width)
    est = (sketch.join(F.broadcast(probe_df), ["j", "col"])
           .groupBy("w").agg(F.min("cnt").alias("est_count")))
    toks = _tokens(df, text_col, "doc_id" if "doc_id" in df.columns
                   else df.columns[0])
    exact = (toks.filter(F.col("w").isin(list(set(terms))))
             .groupBy("w").agg(F.count(F.lit(1)).alias("exact_count")))
    return est.join(exact, "w", "left") \
        .select("w", "est_count",
                F.coalesce("exact_count", F.lit(0)).cast("long")
                .alias("exact_count"))


def tfidf_doc_pairs(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    threshold: float = 0.5,
                    max_df: int = 64) -> DataFrame:
    """Sparse all-pairs TF-IDF cosine similarity via the inverted index
    → ``(id_a, id_b, cosine)`` for pairs ≥ ``threshold`` — the lexical
    sparse-vector twin of the dense ``embedding_near_dups`` join.

    Candidates come from sharing at least one DISCRIMINATIVE term: the
    similarity space is restricted to terms with ``df <= max_df``
    (df-pruning — the standard prefix-filtering idea from all-pairs
    similarity search, Bayardo et al. 2007 "Scaling Up All Pairs
    Similarity Search": frequent terms generate O(df²) candidate rows
    while carrying near-zero idf weight, so dropping them bounds the
    term-keyed join's fan-out at corpus scale).

    Determinism: weights are INTEGER micro-units
    (``floor(tf·idf·1e6 + 0.5)`` as BIGINT), so per-pair dot products
    and per-doc squared norms are exact 64-bit sums — order-independent
    — and the final cosine is a single double op on exact integers.
    Overflow headroom: |w| ≤ tf·ln(N)·1e6; at tf ≤ 10³, N ≤ 10¹², the
    per-term product ≤ ~8·10²⁰ would overflow — cap tf or widen SCALE
    down at that envelope (documented, asserted nowhere near here)."""
    toks = _tokens(df, text_col, id_col)
    n_docs = df.select(id_col).distinct().count()
    tf = toks.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (toks.select(id_col, "w").distinct()
             .groupBy("w").agg(F.count(F.lit(1)).alias("df"))
             .filter(F.col("df") <= max_df))
    idf = F.log(F.lit(float(n_docs + 1)) / (F.col("df") + F.lit(1.0)))
    w = (tf.join(F.broadcast(dfreq), "w")
         .select(F.col(id_col), F.col("w"),
                 F.floor(F.col("tf") * idf * F.lit(1000000.0) + F.lit(0.5))
                 .cast("long").alias("wt")))
    norms = w.groupBy(id_col).agg(F.sum(F.col("wt") * F.col("wt")).alias("n2"))
    a = w.select(F.col("w"), F.col(id_col).alias("id_a"), F.col("wt").alias("wa"))
    b = w.select(F.col("w"), F.col(id_col).alias("id_b"), F.col("wt").alias("wb"))
    dots = (a.join(b, "w").filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot")))
    na = norms.select(F.col(id_col).alias("id_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("n2").alias("nb2"))
    cosine = (F.col("dot").cast("double")
              / (F.sqrt(F.col("na2").cast("double"))
                 * F.sqrt(F.col("nb2").cast("double"))))
    return (dots.join(na, "id_a").join(nb, "id_b")
            .select("id_a", "id_b", pround(cosine, 6).alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def rrf_fuse(ranked_lists: list[DataFrame], id_col: str = "doc_id",
             rank_col: str = "rank", c: int = 60, k: int = 10) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009 —
    "Reciprocal Rank Fusion outperforms Condorcet and individual Rank
    Learning Methods") of N ranked lists → ``(doc_id, rrf_micro,
    rank)`` top-``k``.

    The hybrid-retrieval staple: lexical BM25 and dense cosine ranks
    fuse without score calibration because RRF only consumes RANKS.
    Contribution per list is the integer ``1_000_000 div (c + rank)``
    (micro-units — BIGINT sums are exact and order-independent, the
    same determinism discipline as the BM25 weights themselves); items
    missing from a list simply contribute nothing (union, not join).
    Plan: union of k-sized inputs → one tiny groupBy → sort+limit
    (TakeOrdered). All inputs are top-k sized, so this costs nothing
    at any corpus scale."""
    parts = [
        df.select(F.col(id_col),
                  F.expr(f"CAST(1000000 AS BIGINT) div ({c} + {rank_col})")
                  .alias("c"))
        for df in ranked_lists
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    scored = u.groupBy(id_col).agg(F.sum("c").alias("rrf_micro"))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("rrf_micro"), F.asc(id_col))
    return (scored.select(id_col, "rrf_micro",
                          F.row_number().over(w).cast("int").alias("rank"))
            .filter(F.col("rank") <= k).orderBy("rank"))


def positional_postings(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Positional postings → ``(term, doc_id, pos)`` (0-based token
    offset) — the index layout phrase/proximity search needs that the
    plain :func:`inverted_index` (doc-ids only) cannot serve.

    One posexplode pass; at scale this materializes bucketed by
    ``term`` so phrase joins co-partition, and doc-id delta + position
    gap encoding (parquet dictionary/RLE does it for free here) keeps
    it near the classic Lucene size."""
    return (docs.select(F.col(id_col),
                        F.posexplode(F.split(F.lower(F.col(text_col)), " "))
                        .alias("pos", "term"))
            .filter(F.length("term") > 0)
            .select("term", id_col, F.col("pos").cast("long").alias("pos")))


def phrase_search(docs: DataFrame, phrase: str, id_col: str = "doc_id",
                  text_col: str = "text",
                  postings: DataFrame | None = None) -> DataFrame:
    """Exact phrase query over positional postings →
    ``(doc_id, start_pos)`` for every occurrence: term i of the phrase
    must appear at ``start_pos + i``. The classic consecutive-position
    join — k−1 equi-joins on ``(doc_id, pos)``, each join keyed and
    co-partitioned, never a scan of raw text at query time.

    Scale: the first (rarest-term-first would be the optimizer here;
    Catalyst reorders the chain by size once the postings are a real
    table with stats) postings list bounds the candidate set; every
    subsequent join only narrows. Pass a shared ``postings`` frame to
    amortize the index across queries."""
    terms = [t for t in phrase.lower().split(" ") if t]
    if not terms:
        raise ValueError("empty phrase")
    if postings is None:
        postings = positional_postings(docs, id_col, text_col)
    out = (postings.filter(F.col("term") == terms[0])
           .select(id_col, F.col("pos").alias("start_pos")))
    for i, t in enumerate(terms[1:], start=1):
        nxt = (postings.filter(F.col("term") == t)
               .select(F.col(id_col), (F.col("pos") - i).alias("start_pos")))
        out = out.join(nxt, [id_col, "start_pos"])
    return out.select(id_col, "start_pos").orderBy(id_col, "start_pos")


def pmi_collocations(docs: DataFrame, max_dist: int = 3,
                     min_count: int = 5, k: int = 50,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Collocation mining → the top-``k`` token pairs by pointwise
    mutual information, ``(w1, w2, n_pair, pmi)``: pairs co-occurring
    within ``max_dist`` positions far more often than their unigram
    frequencies predict — the phrase-discovery pass behind tokenizer
    merge seeding and query expansion (Church & Hanks 1990).

    ``PMI = ln( (c_ab/N_p) / ((c_a/N_u)·(c_b/N_u)) )``, per-PAIR row
    arithmetic over exact integer counts (engine-stable; the pair
    table is vocabulary²-bounded and df-pruned by ``min_count``).

    Shape: the proximity join is LINEAR, not doc-quadratic — each
    position explodes into ``max_dist`` (doc, pos+o) probe keys and
    equi-joins the postings, the interval-join bucketization trick.
    Pair order is normalized (w1 < w2) so (a,b) and (b,a) collapse.
    """
    from pyspark.sql import Window
    post = positional_postings(docs, id_col, text_col)
    probes = post.select(
        id_col, F.col("term").alias("_t1"),
        F.explode(F.array(*[F.lit(o) for o in range(1, max_dist + 1)]))
        .alias("_o"), F.col("pos"))
    right = post.select(id_col, F.col("term").alias("_t2"),
                        F.col("pos").alias("_p2"))
    pairs = (probes.join(right,
                         (probes[id_col] == right[id_col])
                         & (F.col("pos") + F.col("_o") == F.col("_p2")))
             .select(F.least("_t1", "_t2").alias("w1"),
                     F.greatest("_t1", "_t2").alias("w2"))
             .filter(F.col("w1") != F.col("w2")))
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    uni = post.groupBy("term").agg(F.count(F.lit(1)).alias("n_term"))
    totals = (pc.agg(F.sum("n_pair").alias("n_p"))
              .crossJoin(uni.agg(F.sum("n_term").alias("n_u"))))
    a = uni.select(F.col("term").alias("w1"), F.col("n_term").alias("_ca"))
    b = uni.select(F.col("term").alias("w2"), F.col("n_term").alias("_cb"))
    scored = (pc.filter(F.col("n_pair") >= min_count)
              .join(F.broadcast(a), "w1").join(F.broadcast(b), "w2")
              .crossJoin(F.broadcast(totals))
              .select("w1", "w2", F.col("n_pair").cast("long").alias("n_pair"),
                      (F.floor(F.log(
                          (F.col("n_pair").cast("double") / F.col("n_p"))
                          / ((F.col("_ca").cast("double") / F.col("n_u"))
                             * (F.col("_cb").cast("double") / F.col("n_u"))))
                          * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0))
                      .alias("pmi")))
    top = scored.orderBy(F.col("pmi").desc(), F.col("w1").asc(),
                         F.col("w2").asc()).limit(k)
    w = Window.orderBy(F.col("pmi").desc(), F.col("w1").asc(),
                       F.col("w2").asc())
    return (top.withColumn("rank", F.row_number().over(w).cast("int"))
            .orderBy("rank"))


def cooccurrence_edges(docs: DataFrame, max_dist: int = 3,
                       min_count: int = 3, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Symmetric weighted co-occurrence graph → ``(src, dst, w)`` with
    ``w`` the windowed pair count (the :func:`pmi_collocations`
    proximity join, kept as counts): the text graph TextRank walks."""
    post = positional_postings(docs, id_col, text_col)
    probes = post.select(
        id_col, F.col("term").alias("_t1"),
        F.explode(F.array(*[F.lit(o) for o in range(1, max_dist + 1)]))
        .alias("_o"), F.col("pos"))
    right = post.select(id_col, F.col("term").alias("_t2"),
                        F.col("pos").alias("_p2"))
    pairs = (probes.join(right,
                         (probes[id_col] == right[id_col])
                         & (F.col("pos") + F.col("_o") == F.col("_p2")))
             .select(F.least("_t1", "_t2").alias("w1"),
                     F.greatest("_t1", "_t2").alias("w2"))
             .filter(F.col("w1") != F.col("w2")))
    pc = (pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("w"))
          .filter(F.col("w") >= min_count))
    fwd = pc.select(F.col("w1").alias("src"), F.col("w2").alias("dst"), "w")
    rev = pc.select(F.col("w2").alias("src"), F.col("w1").alias("dst"), "w")
    return fwd.unionAll(rev)


def textrank_keywords(docs: DataFrame, max_dist: int = 3,
                      min_count: int = 3, iters: int = 3,
                      k: int = 30, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) →
    the top-``k`` terms by weighted-PageRank centrality over the
    co-occurrence graph, ``(term, rank_micro, rk)`` — graph-based
    keyword salience vs c-TF-IDF's frequency contrast; a term is
    central because CENTRAL terms co-occur with it.

    Pure composition: :func:`cooccurrence_edges` (text graph) feeds
    ``graph.pagerank_fixed_point`` (BIGINT micro ranks — bit-exact
    under any partitioning), so the whole chain inherits both
    components' scale stories and the unrolled-SQL oracle pattern."""
    from pyspark.sql import Window

    from .graph import pagerank_fixed_point
    edges = cooccurrence_edges(docs, max_dist, min_count, id_col, text_col)
    ranks = pagerank_fixed_point(edges, iters=iters, weight_col="w")
    top = (ranks.orderBy(F.col("rank_micro").desc(), F.col("node").asc())
           .limit(k))
    named = top.select(F.col("node").alias("term"), "rank_micro")
    w = Window.orderBy(F.col("rank_micro").desc(), F.col("term").asc())
    return (named.withColumn("rk", F.row_number().over(w).cast("int"))
            .orderBy("rk"))
