"""End-to-end corpus curation (north star, §2.11): the single pass a
pretraining pipeline runs before tokenization — language gate, quality
gate, repetition gate, near-dup resolution — with a per-document
verdict and the FIRST failing reason.

Composes the individually-verified operators (`text_analysis.lang_id`,
`quality_score`, `repetition_stats`; `dedup.minhash_near_dups` +
`canonical_docs`); the composition itself adds only doc_id-keyed
joins, which co-partition after the first exchange. See SCALE.md §5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import local_frame

from . import dedup as D
from . import text_analysis as TA


def curation_pipeline(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", min_quality: float = 0.6,
                      jaccard_threshold: float = 0.5,
                      sigs: DataFrame | None = None) -> DataFrame:
    """Verdict per document → ``(doc_id, kept, reject_reason)`` where
    ``reject_reason`` ∈ {'lang', 'quality', 'repetitive', 'duplicate',
    NULL}: the FIRST failing gate in pipeline order, NULL if kept.

    Gate order mirrors real pipelines (cheap narrow screens first, the
    shuffling dedup last — at scale you'd materialize after the narrow
    gates and run dedup only on survivors; here every doc is scored so
    the verdict table is complete). ``filter(kept == 1)`` is the
    training corpus."""
    lang = TA.lang_id(docs, text_col, id_col).select(id_col, "pred_lang")
    qual = TA.quality_score(docs, text_col, id_col).select(id_col, "quality")
    rep = TA.repetition_stats(docs, text_col, id_col) \
        .select(id_col, "repetitive")
    pairs = D.minhash_near_dups(docs, text_col, id_col,
                                threshold=jaccard_threshold, sigs=sigs)
    canon = D.canonical_docs(docs, pairs, id_col).select(id_col, "is_dup")
    j = (docs.select(F.col(id_col))
         .join(lang, id_col).join(qual, id_col)
         .join(rep, id_col).join(canon, id_col))
    reason = (F.when(F.col("pred_lang") == "unk", F.lit("lang"))
              .when(F.col("quality") < F.lit(min_quality), F.lit("quality"))
              .when(F.col("repetitive") == 1, F.lit("repetitive"))
              .when(F.col("is_dup") == 1, F.lit("duplicate")))
    return j.select(
        F.col(id_col),
        F.when(reason.isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("int").alias("kept"),
        reason.alias("reject_reason"))


def corpus_report(docs: DataFrame, group_col: str = "source",
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-group corpus health report — the dashboard a curation run
    publishes → ``(group, n_docs, mean_quality, pct_repetitive,
    mean_ws_tokens)``.

    Means are computed from exact integer sums: ``quality`` is already
    6-dp-quantized, so ``floor(q*1e6 + 0.5)`` recovers its integer
    micro-value losslessly; token counts are ints. Group sums are
    therefore associative and order-independent (the micro-unit
    contract). Shape: narrow gates + doc_id-keyed joins, then one tiny
    group rollup."""
    qual = TA.quality_score(docs, text_col, id_col).select(id_col, "quality")
    rep = TA.repetition_stats(docs, text_col, id_col) \
        .select(id_col, "repetitive")
    toks = TA.token_counts(docs, text_col, id_col).select(id_col, "ws_tokens")
    j = (docs.select(F.col(id_col), F.col(group_col).alias("group"))
         .join(qual, id_col).join(rep, id_col).join(toks, id_col))
    qu = F.floor(F.col("quality") * F.lit(1000000.0) + F.lit(0.5)) \
        .cast("long")
    agg = (j.groupBy("group")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(qu).alias("qsum"),
                F.sum("repetitive").alias("nrep"),
                F.sum(F.col("ws_tokens").cast("long")).alias("tsum")))
    from ..functions.rounding import pround
    return agg.select(
        "group",
        F.col("n_docs").cast("long").alias("n_docs"),
        pround(F.col("qsum").cast("double") / F.col("n_docs") / F.lit(1000000.0), 6)
        .alias("mean_quality"),
        pround(F.col("nrep").cast("double") / F.col("n_docs"), 6)
        .alias("pct_repetitive"),
        pround(F.col("tsum").cast("double") / F.col("n_docs"), 6)
        .alias("mean_ws_tokens"))


def corpus_diff(old: DataFrame, new: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Snapshot diff between two corpus versions — the dataset-
    versioning audit (what changed between crawl N and N+1) →
    ``(doc_id, status)`` with status ∈ {added, removed, changed,
    unchanged}.

    FULL OUTER join on the id over content digests: the shuffle
    carries (id, 32-byte md5) pairs, never documents, and the join is
    id-keyed — co-partitioned, uniform. At 100 TB both snapshots
    would be bucketed by id so the diff is exchange-free."""
    o = old.select(F.col(id_col), F.md5(F.col(text_col)).alias("h_old"))
    n = new.select(F.col(id_col), F.md5(F.col(text_col)).alias("h_new"))
    j = o.join(n, id_col, "full_outer")
    status = (F.when(F.col("h_old").isNull(), F.lit("added"))
              .when(F.col("h_new").isNull(), F.lit("removed"))
              .when(F.col("h_old") != F.col("h_new"), F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    return j.select(F.col(id_col), status.alias("status"))


def narrow_verdict(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_quality: float = 0.6) -> DataFrame:
    """The curation verdict restricted to the STATELESS gates (lang,
    quality, repetition) → ``(doc_id, pred_lang, quality, repetitive,
    kept_narrow, reject_reason)``.

    Built as chained narrow selects — each gate forwards what the next
    needs via its ``extra`` columns — so there is NO join: the whole
    verdict is one map pass, legal on a streaming DataFrame with no
    watermark or state. This is the per-file screen of the continuous-
    ingest deployment (`curation_pipeline` adds the near-dup gate in
    the batch pass)."""
    g1 = TA.lang_id(docs, text_col, id_col, extra=(text_col,))
    g2 = TA.quality_score(g1, text_col, id_col, extra=(text_col, "pred_lang"))
    g3 = TA.repetition_stats(g2, text_col, id_col,
                             extra=("pred_lang", "quality"))
    reason = (F.when(F.col("pred_lang") == "unk", F.lit("lang"))
              .when(F.col("quality") < F.lit(min_quality), F.lit("quality"))
              .when(F.col("repetitive") == 1, F.lit("repetitive")))
    return g3.select(
        F.col(id_col), "pred_lang", "quality", "repetitive",
        F.when(reason.isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("int").alias("kept_narrow"),
        reason.alias("reject_reason"))


# target sampling weight per language: >1 upsamples (extra full
# epochs), a fractional part admits a deterministic hash-chosen subset
# for the final partial epoch — the LLaMA/C4-style mixture recipe
MIXTURE_WEIGHTS = [("en", 1.5), ("de", 1.0), ("fr", 0.75),
                   ("es", 0.5), ("zh", 0.25)]


def mixture_sample(docs: DataFrame, weights=None, id_col: str = "doc_id",
                   lang_col: str = "lang",
                   seed: str = "mix:v1") -> DataFrame:
    """Deterministic training-mixture sampler →
    ``(doc_id, lang, epoch)``: each document appears ``floor(w)`` times
    plus once more iff its seeded portable hash-fraction < frac(w) —
    so every language converges to exactly its target weight with
    zero RNG state and stable membership across runs/engines.

    Scale shape: the weight table broadcasts (≤ |languages| rows), the
    gate is a narrow hash expression, and the epoch fan-out is
    ``explode(sequence(1, n))`` inside the same narrow stage — no
    shuffle at all; at 100 TB this is a map-only pass whose output
    feeds ``pack_sequences``. Languages absent from the weight table
    sample at weight 0 (the inner join drops them)."""
    from ..functions.hashing import portable_hash64
    if weights is None:
        weights = MIXTURE_WEIGHTS
    w_df = local_frame(docs.sparkSession,
                       weights, f"{lang_col} string, w double")
    h = portable_hash64(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    frac_gate = ((h % 1000000) / F.lit(1000000.0)) \
        < (F.col("w") - F.floor(F.col("w")))
    n = (F.floor(F.col("w")).cast("int")
         + F.when(frac_gate, F.lit(1)).otherwise(F.lit(0)))
    return (
        docs.join(F.broadcast(w_df), lang_col)
        .withColumn("_n", n)
        .filter(F.col("_n") >= 1)
        .select(F.col(id_col), F.col(lang_col),
                F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("epoch"))
        .orderBy(id_col, "epoch")
    )


def expectation_report(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Data-quality expectations (the dbt-test / Great-Expectations
    pattern, rebuilt as ONE aggregation): each rule is a SQL boolean
    over a row; the report is ``(rule, n_violations, violation_rate)``
    per rule, in rule-declaration order.

    Shape matters at 100 TB: all rules evaluate in a single corpus
    pass — one scan, one scalar aggregate (every ``sum(CASE …)``
    partial-aggregates map-side), then a constant-size explode to long
    form. NULL rule results count as violations (an expectation that
    cannot be evaluated is not satisfied), matching SQL oracles via
    ``cond IS NOT TRUE``."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, cond in enumerate(rules.values()):
        aggs.append(F.sum(
            F.when(F.expr(cond).isNotNull() & F.expr(cond), 0).otherwise(1)
        ).cast("long").alias(f"_v{i}"))
    one = df.agg(*aggs)
    rows = [
        F.struct(F.lit(i + 1).alias("rule_order"), F.lit(name).alias("rule"),
                 F.col(f"_v{i}").alias("n_violations"),
                 (F.col(f"_v{i}").cast("double") / F.col("_n"))
                 .alias("violation_rate"))
        for i, name in enumerate(rules)
    ]
    return (one.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.rule_order", "r.rule", "r.n_violations",
                    "r.violation_rate")
            .orderBy("rule_order"))


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
# 2023, arXiv:2302.03169). Public-method rebuild: hashed n-gram bag
# features, bucketed unigram+bigram counts for a target domain vs the
# raw corpus, per-document importance weight = sum over the doc's
# features of log(p_target[bucket] / p_raw[bucket]).

DSIR_BUCKETS = 4096
DSIR_ALPHA = 0.5
DSIR_SEED = "dsir:v1:"


def dsir_scores(docs: DataFrame, target_lang: str = "en",
                n_buckets: int = DSIR_BUCKETS, alpha: float = DSIR_ALPHA,
                id_col: str = "doc_id", text_col: str = "text",
                lang_col: str = "lang") -> DataFrame:
    """Per-document DSIR importance weight against a target domain →
    ``(doc_id, n_feats, dsir_micro_nats)``; selection is then
    ``ORDER BY dsir_micro_nats DESC LIMIT budget`` (or a hash-seeded
    Gumbel top-k for the sampled variant — deterministic ranking kept
    here so the result is oracle-checkable).

    Features are unigrams + word bigrams hashed into ``n_buckets``
    buckets (the paper's hashed n-gram generative model); the target
    distribution here is the ``lang = target_lang`` slice — any
    predicate-definable slice works identically. Add-``alpha``
    smoothing on both distributions keeps every bucket finite.

    Determinism contract: bucket log-ratios are INTEGER micro-nats
    (``floor(ln(p_t/p_r)·1e6 + 0.5)``) — the document score is an exact
    integer sum, independent of partial-aggregation order (same
    discipline as ``text_analysis.unigram_lm``).

    Scale shape: two feature passes collapse into ONE explode (union of
    unigram/bigram arrays built per row, no second scan); bucket tables
    are ``n_buckets``-sized — the weight table broadcasts, so scoring
    is scan → broadcast-join → integer partial-agg. No corpus-keyed
    shuffle other than the final doc_id aggregation. The reference has
    no analog (pure extension; cf. SURVEY §2.11 north star).
    """
    from ..functions.hashing import portable_hash64, shingles_expr

    low = F.lower(F.col(text_col))
    uni = F.filter(F.split(low, " "), lambda w: F.length(w) > 0)
    bi = shingles_expr(low, 2)
    feats = (
        docs.select(F.col(id_col), F.col(lang_col),
                    F.explode(F.concat(uni, bi)).alias("g"))
        .select(id_col, lang_col,
                (portable_hash64(F.concat(F.lit(DSIR_SEED), F.col("g")))
                 % F.lit(n_buckets)).alias("b"))
    )
    raw = feats.groupBy("b").agg(F.count(F.lit(1)).alias("cnt_r"))
    tgt = (feats.filter(F.col(lang_col) == target_lang)
           .groupBy("b").agg(F.count(F.lit(1)).alias("cnt_t")))
    totals = (raw.agg(F.sum("cnt_r").alias("n_r"))
              .crossJoin(tgt.agg(F.sum("cnt_t").alias("n_t"))))
    p_t = (F.coalesce(F.col("cnt_t"), F.lit(0)) + F.lit(alpha)) \
        / (F.col("n_t") + F.lit(alpha) * n_buckets)
    p_r = (F.col("cnt_r") + F.lit(alpha)) \
        / (F.col("n_r") + F.lit(alpha) * n_buckets)
    lam = (raw.join(F.broadcast(tgt), "b", "left")
           .crossJoin(F.broadcast(totals))
           .select("b", F.floor(F.log(p_t / p_r) * F.lit(1000000.0)
                                + F.lit(0.5)).cast("long").alias("lam")))
    per_doc = (feats.join(F.broadcast(lam), "b")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_feats"),
                    F.sum("lam").alias("dsir_micro_nats")))
    return (docs.select(id_col).join(per_doc, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_feats", F.lit(0)).cast("long")
                    .alias("n_feats"),
                    F.coalesce("dsir_micro_nats", F.lit(0)).cast("long")
                    .alias("dsir_micro_nats"))
            .orderBy(id_col))


def shuffle_split(docs: DataFrame, id_col: str = "doc_id",
                  seed: str = "split:v1", test_pct: int = 10,
                  val_pct: int = 10, n_shards: int = 16) -> DataFrame:
    """Deterministic global shuffle + train/val/test assignment →
    ``(doc_id, shuffle_key, split, shard)`` — the step that turns a
    curated corpus into training shards.

    The shuffle IS the hash: ``shuffle_key = portable_hash64(seed ‖
    doc_id)`` defines a pseudo-random total order with zero RNG state —
    stable under re-runs, engine-portable, and new documents interleave
    uniformly instead of appending at the end. Split membership uses
    ``key % 100`` (test < test_pct ≤ val < test+val ≤ train) so a
    document NEVER migrates between splits when the corpus grows — the
    leakage-safety property frac-based ``randomSplit`` lacks. Shard =
    the next two key digits, independent of the split digits.

    Scale: one narrow pass — no shuffle at all. A writer materializes
    the physical order via ``repartition(n_shards, shard)
    .sortWithinPartitions(shuffle_key)``: one exchange, per-shard
    sorted files, never a global sort.
    """
    from ..functions.hashing import portable_hash64
    key = portable_hash64(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    d = docs.select(F.col(id_col), key.alias("shuffle_key"))
    bucket = F.col("shuffle_key") % 100
    split = (F.when(bucket < test_pct, F.lit("test"))
             .when(bucket < test_pct + val_pct, F.lit("val"))
             .otherwise(F.lit("train")))
    shard = F.expr(f"(shuffle_key div 100) % {int(n_shards)}")
    return (d.select(id_col, "shuffle_key", split.alias("split"),
                     shard.cast("int").alias("shard"))
            .orderBy(id_col))


def quota_select(docs: DataFrame, cap: int = 50, group_col: str = "lang",
                 score_col: str = "n_chars",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-group quota selection → ``(doc_id, group, score, rk)``: keep
    the ``cap`` best documents of each group (here: longest per
    language — any precomputed score column plugs in, e.g.
    ``lm_quality_score`` or ``dsir_scores`` output joined on doc_id).
    The balancing step that stops a dominant domain/language from
    swamping the mixture before ``mixture_sample`` reweights epochs.

    Shape: one window (`row_number` partitioned by group, ordered by
    score desc / id asc — deterministic under ties) over a
    group-keyed exchange; partial ranks never materialize beyond the
    cap filter. Per-group skew is bounded by the groups themselves —
    for a pathological single-group corpus, pre-aggregate a per-group
    count and salt the window's partition key the same way
    ``skew.word_counts_salted`` salts the hot token.
    """
    from pyspark.sql import Window
    return (docs.select(F.col(id_col), F.col(group_col).alias("grp"),
                        F.col(score_col).cast("long").alias("score"))
            .withColumn("rk", F.row_number().over(
                Window.partitionBy("grp").orderBy(
                    F.col("score").desc(), F.col(id_col).asc())))
            .filter(F.col("rk") <= cap)
            .select(id_col, "grp", "score",
                    F.col("rk").cast("int").alias("rk"))
            .orderBy("grp", "rk"))


def mixture_token_plan(docs: DataFrame, weights=None,
                       budget_tokens: int = 1_000_000,
                       id_col: str = "doc_id", lang_col: str = "lang",
                       text_col: str = "text") -> DataFrame:
    """Token-budget mixture planning → per-language
    ``(lang, n_docs, n_tokens, w, target_tokens, epochs_micro)``:
    given target mixture weights and a total training-token budget,
    how many tokens each language should contribute
    (``target = budget · w/Σw``, largest-remainder exact: targets sum
    to EXACTLY the budget) and the oversampling factor that implies
    (``epochs_micro = target·1e6 div n_tokens`` — fixed-point so the
    plan is integer-deterministic).

    The planning input is one corpus pass (whitespace token counts per
    language, map-side combined into ≤|languages| rows); everything
    after operates on the broadcast-sized language table. The output
    feeds :func:`mixture_sample` (whose per-doc epoch gate realizes
    the plan) and ``text_analysis.pack_sequences``.

    Largest-remainder apportionment in pure BIGINT: base share
    ``(budget·w_i) div Σw`` with weights scaled to integers (×1000),
    then +1 token to the languages with the largest remainders (ties →
    lang order) until the budget is exact — the same discipline as the
    multi-touch credit split.

    Weighted languages ABSENT from the corpus cannot contribute
    tokens, so Σw is the sum over weights×corpus languages (a window
    over the ≤|languages|-row plan table, not the static weight list).
    Renormalizing this way keeps the exact-budget invariant: leftover
    = budget − Σ base is always < the number of surviving rows, so the
    +1 distribution lands fully. (With the static Σw, a missing
    language would leave leftover ≫ rows and the targets would sum to
    less than the budget.) A present language whose documents hold
    zero tokens still receives its target, but its oversampling factor
    is undefined — ``epochs_micro`` is NULL there instead of a
    divide-by-zero null-surprise downstream.
    """
    if weights is None:
        weights = MIXTURE_WEIGHTS
    w_int = [(lang, int(round(w * 1000))) for lang, w in weights]
    w_df = local_frame(docs.sparkSession,
                       w_int, f"{lang_col} string, w_mill long")

    stats = (docs.select(F.col(lang_col),
                         F.size(F.filter(F.split(F.col(text_col), " "),
                                         lambda t: F.length(t) > 0))
                         .cast("long").alias("_nt"))
             .groupBy(lang_col)
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("_nt").alias("n_tokens")))
    j = stats.join(F.broadcast(w_df), lang_col, "inner")
    b = int(budget_tokens)
    full = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    tw = F.sum("w_mill").over(full)  # Σw over PRESENT languages
    wnd = Window.orderBy(F.col("_rem").desc(), F.col(lang_col).asc())
    leftover = F.lit(b) - F.sum("_base").over(full)
    planned = (j.withColumn("_tw", tw)
               .withColumn("_rem", F.expr(f"({b}L * w_mill) % _tw"))
               .withColumn("_base", F.expr(f"({b}L * w_mill) div _tw"))
               .withColumn("_rk", F.row_number().over(wnd))
               .withColumn("_extra",
                           F.when(F.col("_rk") <= leftover, F.lit(1))
                           .otherwise(F.lit(0)))
               .withColumn("target_tokens", F.col("_base") + F.col("_extra")))
    return (planned.select(
        F.col(lang_col).alias("lang"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("w_mill").cast("double") / F.lit(1000.0)).alias("w"),
        F.col("target_tokens").cast("long").alias("target_tokens"),
        F.when(F.col("n_tokens") > 0,
               F.expr("(target_tokens * 1000000) div n_tokens"))
        .cast("long").alias("epochs_micro"))
        .orderBy("lang"))


def training_manifest(docs: DataFrame, cap: int = 50,
                      id_col: str = "doc_id") -> DataFrame:
    """The end-to-end data-prep pass, composed from the verified
    parts → ``(doc_id, lang, n_chars, rk, dsir_micro_nats, split,
    shard)``: per-language quota selection (:func:`quota_select`),
    DSIR importance score carried along for downstream weighting
    (:func:`dsir_scores`), deterministic split/shard assignment
    (:func:`shuffle_split`). ``filter(split = 'train') ORDER BY
    shuffle order`` is the shard writer's input.

    Composition adds only ``doc_id``-keyed joins — co-partitioned
    after the first exchange, no new shuffle classes; each component
    keeps its own scale story."""
    q = quota_select(docs, cap=cap)
    ds = dsir_scores(docs).select(id_col, "dsir_micro_nats")
    sp = shuffle_split(docs).select(id_col, "split", "shard")
    return (q.select(F.col(id_col), F.col("grp").alias("lang"),
                     F.col("score").alias("n_chars"), "rk")
            .join(ds, id_col).join(sp, id_col)
            .orderBy(id_col))


def split_leakage_report(pairs: DataFrame, splits: DataFrame,
                         id_a: str = "id_a", id_b: str = "id_b",
                         id_col: str = "doc_id") -> DataFrame:
    """Cross-split near-duplicate leakage audit →
    ``(split_a, split_b, n_pairs)``: count near-dup pairs whose members
    landed in different splits. A (train, test) row > 0 means eval
    answers leak into training through paraphrase-level copies — the
    check every pipeline should run AFTER splitting, because document-
    level hash splits are only safe up to exact identity.

    Inputs compose the verified parts: ``pairs`` from any dedup family
    (:mod:`..operators.dedup`), ``splits`` from :func:`shuffle_split`.
    The pair endpoints join the split table on the id (two broadcast-
    or co-partitioned joins, pair-table-sized); the output is
    ≤ |splits|² rows. The split pair is order-normalized
    (``least/greatest``) so (train,test) and (test,train) collapse.
    """
    s = splits.select(F.col(id_col), F.col("split"))
    a = s.select(F.col(id_col).alias(id_a), F.col("split").alias("_sa"))
    b = s.select(F.col(id_col).alias(id_b), F.col("split").alias("_sb"))
    return (pairs.select(id_a, id_b).join(a, id_a).join(b, id_b)
            .select(F.least("_sa", "_sb").alias("split_a"),
                    F.greatest("_sa", "_sb").alias("split_b"))
            .groupBy("split_a", "split_b")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .orderBy("split_a", "split_b"))


def quota_select_salted(docs: DataFrame, cap: int = 50,
                        group_col: str = "lang",
                        score_col: str = "n_chars",
                        id_col: str = "doc_id",
                        n_salts: int = 8) -> DataFrame:
    """:func:`quota_select`'s documented skew remedy, realized: the
    mono-group (or heavy-group) case turns the single window into one
    reducer. Two phases fix it — (1) rank within ``(group, salt)``
    where ``salt = portable_hash(id) % n_salts`` and keep each salt's
    top ``cap`` (the global top ``cap`` must survive: every kept row
    beats at most ``cap−1`` rows of its own salt); (2) re-rank the
    ≤ ``cap·n_salts`` survivors per group. Phase 1 spreads the heavy
    group over ``n_salts`` reducers; phase 2's input is cap-bounded.

    Output is IDENTICAL to :func:`quota_select` (same deterministic
    tie-break), proven by the equality test — the salting changes the
    execution shape only."""
    from ..functions.hashing import portable_hash64
    base = docs.select(F.col(id_col), F.col(group_col).alias("grp"),
                       F.col(score_col).cast("long").alias("score"),
                       (portable_hash64(F.concat(F.lit("qsalt:"),
                                                 F.col(id_col).cast("string")))
                        % n_salts).alias("_salt"))
    w1 = Window.partitionBy("grp", "_salt").orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    survivors = (base.withColumn("_rk1", F.row_number().over(w1))
                 .filter(F.col("_rk1") <= cap))
    w2 = Window.partitionBy("grp").orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    return (survivors.withColumn("rk", F.row_number().over(w2).cast("int"))
            .filter(F.col("rk") <= cap)
            .select(id_col, "grp", "score", "rk")
            .orderBy("grp", "rk"))


def weighted_sample(docs: DataFrame, k: int = 200,
                    weight_col: str = "n_chars", id_col: str = "doc_id",
                    seed: str = "wsample:v1") -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, A-ES) → the ``k`` documents drawn with probability
    proportional to ``weight_col``, deterministically: each row gets
    the exponential key ``-ln(u)/w`` with ``u`` a seeded portable
    hash-fraction, and the sample is the ``k`` SMALLEST keys — one
    narrow pass + a global top-k (TakeOrdered, no sort). The
    importance-weighted subsample step (e.g. ∝ quality or DSIR
    weight) that plain `hash_sample` (uniform) can't express.

    Distributed-correct by construction: keys are independent per row,
    so top-k commutes with partitioning — no coordination, no
    rejection loop, exactly k rows. Zero RNG state: re-runs and
    engines agree bit-for-bit (ln of the same double, same division).
    ``u`` is shifted to (0,1]: u=0 would give key=+inf and ln(0)
    errors under ANSI."""
    from ..functions.hashing import portable_hash64
    u = ((portable_hash64(F.concat(F.lit(seed + ":"),
                                   F.col(id_col).cast("string")))
          % 1000000) + 1).cast("double") / F.lit(1000000.0)
    w = F.col(weight_col).cast("double")
    key = -F.log(u) / w
    ranked = (docs.select(F.col(id_col), F.col(weight_col).cast("long")
                          .alias("weight"), key.alias("_key"))
              .orderBy(F.col("_key").asc(), F.col(id_col).asc())
              .limit(k))
    from pyspark.sql import Window
    wnd = Window.orderBy(F.col("_key").asc(), F.col(id_col).asc())
    return (ranked.withColumn("rk", F.row_number().over(wnd).cast("int"))
            .select(id_col, "weight", "rk")
            .orderBy("rk"))


def dsir_resample(docs: DataFrame, k: int = 100, tau: float = 1.0,
                  id_col: str = "doc_id",
                  seed: str = "dsir-sample:v1") -> DataFrame:
    """THE DSIR selection step (Xie et al. 2023 §3: sample ∝ importance
    weight, without replacement): :func:`dsir_scores` importance in
    nats → weight ``exp(score/τ)`` → A-ES exponential-key draw
    (:func:`weighted_sample`'s machinery) → the ``k`` resampled
    documents, ``(doc_id, dsir_micro_nats, rk)``.

    Deterministic end to end (hash-seeded keys, no RNG state), so the
    resample is reproducible and engine-portable — the paper's Gumbel
    top-k sampling with the randomness made auditable. ``τ`` tempers:
    large τ → uniform, small τ → argmax-like. Composition shape: the
    scoring pass's shuffles plus one narrow key map and a global
    TakeOrdered top-k.

    The A-ES key is ranked in LOG space: ``ln(−ln u) − s/τ`` is
    strictly monotone in the textbook ``−ln(u)/exp(s/τ)`` (same
    selection, same order) but never saturates — the direct form
    overflows to +inf above s/τ ≈ 709 nats and underflows to 0 below
    ≈ −745, collapsing every saturated key to a tie and degrading the
    draw to doc_id order exactly where the weights matter most. The
    one non-monotone corner, u = 1 ⇒ −ln u = 0, maps to −inf
    explicitly (Spark's ``log(0)`` is NULL, not −inf)."""
    from ..functions.hashing import portable_hash64
    scores = dsir_scores(docs, id_col=id_col)
    u = ((portable_hash64(F.concat(F.lit(seed + ":"),
                                   F.col(id_col).cast("string")))
          % 1000000) + 1).cast("double") / F.lit(1000000.0)
    log_w = (F.col("dsir_micro_nats").cast("double")
             / F.lit(1000000.0) / F.lit(float(tau)))
    key = (F.when(u >= 1.0, F.lit(float("-inf")))
           .otherwise(F.log(-F.log(u)) - log_w))
    from pyspark.sql import Window
    ranked = (scores.select(F.col(id_col), "dsir_micro_nats",
                            key.alias("_key"))
              .orderBy(F.col("_key").asc(), F.col(id_col).asc())
              .limit(k))
    wnd = Window.orderBy(F.col("_key").asc(), F.col(id_col).asc())
    return (ranked.withColumn("rk", F.row_number().over(wnd).cast("int"))
            .select(id_col, "dsir_micro_nats", "rk")
            .orderBy("rk"))


def corpus_datacard(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    lang_col: str = "lang") -> DataFrame:
    """One-row corpus data card → ``(n_docs, n_langs, n_sources,
    total_ws_tokens, mean_doc_tokens, n_exact_dup_docs,
    dup_rate)`` — the header block of a dataset card (Gebru et al.,
    "Datasheets for Datasets"), computed in two passes: one narrow
    scan for counts/tokens and one digest aggregation for exact-dup
    mass. All integers plus two integer-exact rounded ratios, so the
    card is engine-stable."""
    tok = F.size(F.filter(F.split(F.col(text_col), " "),
                          lambda t: F.length(t) > 0)).cast("long")
    base = docs.select(F.col(id_col), F.col(lang_col), F.col("source"),
                       tok.alias("_nt"), F.md5(F.col(text_col)).alias("_h"))
    dup_docs = (base.groupBy("_h").agg(F.count(F.lit(1)).alias("_c"))
                .filter(F.col("_c") > 1)
                .agg(F.coalesce(F.sum("_c"), F.lit(0)).alias("n_dup")))
    head = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(lang_col).alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("_nt").alias("total_ws_tokens"))
    j = head.crossJoin(F.broadcast(dup_docs))
    from ..functions.rounding import sql_pround_iratio
    return j.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_langs").cast("long").alias("n_langs"),
        F.col("n_sources").cast("long").alias("n_sources"),
        F.col("total_ws_tokens").cast("long").alias("total_ws_tokens"),
        F.expr(sql_pround_iratio("total_ws_tokens", "n_docs"))
        .alias("mean_doc_tokens"),
        F.col("n_dup").cast("long").alias("n_exact_dup_docs"),
        F.expr(sql_pround_iratio("n_dup", "n_docs"))
        .alias("dup_rate"))


def source_quality_report(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          lang_col: str = "lang") -> DataFrame:
    """Per-source data-governance rollup → ``(source, n_docs, n_langs,
    total_ws_tokens, mean_doc_tokens, n_dup_docs, n_cross_source_dups,
    top_lang)`` — the :func:`corpus_datacard` broken out by provenance,
    which is how curation decisions are actually made (drop/downweight
    a feed, renegotiate a crawl). ``n_dup_docs`` counts this source's
    docs whose exact text appears ≥ 2× ANYWHERE in the corpus;
    ``n_cross_source_dups`` counts those whose text also appears in a
    DIFFERENT source — the syndication/mirror signal a within-source
    dedup can't see. ``top_lang`` is the source's modal language (ties
    → lexicographically first, deterministic).

    Shape: one narrow scan (tokens + md5), one digest aggregation
    (corpus-wide, carries ``count`` + ``countDistinct(source)`` per
    digest — digest-sized, not doc-sized), one digest-keyed join back
    (co-partitions with the digest agg's exchange), then a
    |sources|-row rollup and a tiny modal-language window. All
    integers plus one integer-exact rounded mean — engine-stable."""
    from pyspark.sql import Window

    tok = F.size(F.filter(F.split(F.col(text_col), " "),
                          lambda t: F.length(t) > 0)).cast("long")
    base = docs.select(F.col(id_col), F.col(lang_col), F.col("source"),
                       tok.alias("_nt"), F.md5(F.col(text_col)).alias("_h"))
    digests = (base.groupBy("_h")
               .agg(F.count(F.lit(1)).alias("_c"),
                    F.countDistinct("source").alias("_nsrc")))
    enriched = base.join(digests, "_h")
    per_source = (enriched.groupBy("source")
                  .agg(F.count(F.lit(1)).alias("n_docs"),
                       F.countDistinct(lang_col).alias("n_langs"),
                       F.sum("_nt").alias("total_ws_tokens"),
                       F.sum(F.when(F.col("_c") > 1, 1).otherwise(0))
                       .alias("n_dup_docs"),
                       F.sum(F.when(F.col("_nsrc") > 1, 1).otherwise(0))
                       .alias("n_cross_source_dups")))
    lang_counts = (base.groupBy("source", lang_col)
                   .agg(F.count(F.lit(1)).alias("_lc")))
    modal = (lang_counts.withColumn(
        "_rk", F.row_number().over(
            Window.partitionBy("source")
            .orderBy(F.col("_lc").desc(), F.col(lang_col).asc())))
        .filter(F.col("_rk") == 1)
        .select("source", F.col(lang_col).alias("top_lang")))
    from ..functions.rounding import sql_pround_iratio
    return (per_source.join(modal, "source")
            .select(
                "source",
                F.col("n_docs").cast("long").alias("n_docs"),
                F.col("n_langs").cast("long").alias("n_langs"),
                F.col("total_ws_tokens").cast("long").alias("total_ws_tokens"),
                F.expr(sql_pround_iratio("total_ws_tokens", "n_docs"))
                .alias("mean_doc_tokens"),
                F.col("n_dup_docs").cast("long").alias("n_dup_docs"),
                F.col("n_cross_source_dups").cast("long")
                .alias("n_cross_source_dups"),
                "top_lang")
            .orderBy("source"))


def ngram_novelty(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 3) -> DataFrame:
    """Per-document n-gram NOVELTY against everything that came before
    it in corpus order → ``(doc_id, n_grams, n_novel, novelty)``:
    of a doc's DISTINCT word ``k``-grams, the fraction whose first
    corpus occurrence (minimum ``doc_id`` over all docs containing the
    gram) is this doc. A curriculum/ordering signal: late documents
    that introduce nothing score ~0, the first doc of any template
    family scores ~1 — the streaming-ingest complement to pairwise
    near-dup detection (it prices REDUNDANCY without materializing any
    pair).

    Shape: explode → distinct (doc, gram-hash) → gram-keyed min
    aggregation (map-side partials; a boilerplate gram appearing in
    every doc collapses per partition before the exchange) → hash-keyed
    join back (co-partitions with the agg's exchange) → doc-keyed
    count rollup. Every shuffle key is a hash or doc id — uniform; the
    gram table is |distinct grams|, never |occurrences|. Docs with
    fewer than ``k`` tokens have no grams and are absent (nothing to
    price). ``novelty`` is the remainder-exact half-up integer ratio
    (engine-stable)."""
    from ..functions.hashing import portable_hash64, shingles_expr
    from ..functions.rounding import sql_pround_iratio
    sh = docs.select(
        F.col(id_col),
        F.explode(shingles_expr(F.col(text_col), k=k)).alias("_sh"))
    h = (sh.filter(F.col("_sh").isNotNull())
         .select(F.col(id_col), portable_hash64(F.col("_sh")).alias("_h"))
         .distinct())
    first = h.groupBy("_h").agg(F.min(id_col).alias("_first"))
    per_doc = (h.join(first, "_h")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_grams"),
                    F.sum((F.col("_first") == F.col(id_col)).cast("long"))
                    .alias("n_novel")))
    return (per_doc.select(
        F.col(id_col),
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_novel").cast("long").alias("n_novel"),
        F.expr(sql_pround_iratio("n_novel", "n_grams")).alias("novelty"))
        .orderBy(id_col))


def temperature_mixture_plan(docs: DataFrame, tau: float = 0.3,
                             budget_tokens: int = 1_000_000,
                             lang_col: str = "lang",
                             text_col: str = "text") -> DataFrame:
    """Temperature-based mixture planning (the mT5/XLM-R recipe) →
    per-language ``(lang, n_tokens, p_micro, w_micro, target_tokens)``:
    sampling weights ∝ ``p_l^τ`` where ``p_l`` is the language's token
    share — τ=1 keeps natural proportions, τ→0 flattens toward uniform,
    upsampling the tail languages a raw-proportion mixture starves.
    Complements :func:`mixture_token_plan` (explicit weights): here
    the weights are DERIVED from the corpus itself.

    Determinism: ``p_l`` and ``p_l^τ`` are quantized to integer
    micro-units at the row edge (6-dp half-up — ``pow`` is the one op
    in this engine without a cross-engine bit guarantee, and the
    quantization absorbs its ≤1-ulp variance), then the budget is
    apportioned from those INTEGER weights by largest remainder
    (exact: targets sum to the budget, ties → lang order) — the same
    BIGINT discipline as :func:`mixture_token_plan`. One corpus pass
    for token counts (map-side combined to ≤|languages| rows);
    everything else is window math on the tiny plan table."""
    from ..functions.rounding import sql_pround_iratio
    stats = (docs.select(F.col(lang_col),
                         F.size(F.filter(F.split(F.col(text_col), " "),
                                         lambda t: F.length(t) > 0))
                         .cast("long").alias("_nt"))
             .groupBy(lang_col)
             .agg(F.sum("_nt").alias("n_tokens")))
    full = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    total = F.sum("n_tokens").over(full)
    b = int(budget_tokens)
    with_p = (stats.withColumn("_total", total)
              # recover the integer micro-share M with a half-up floor,
              # NOT a truncating cast: the ratio comes back as the
              # double M/1e6, and (M/1e6)*1e6 lands at M−ε for ~1.2%
              # of micro values — cast('long') truncated those to M−1
              # while the oracle's rounding CAST kept M (round-6
              # review finding; floor(x+0.5) absorbs ±0.5 exactly)
              .withColumn("p_micro",
                          F.floor(F.expr(sql_pround_iratio("n_tokens",
                                                           "_total"))
                                  * F.lit(1000000.0) + F.lit(0.5))
                          .cast("long"))
              .withColumn(
                  "w_micro",
                  F.floor(F.pow(F.col("p_micro").cast("double")
                                / F.lit(1000000.0), F.lit(float(tau)))
                          * F.lit(1000000.0) + F.lit(0.5)).cast("long")))
    tw = F.sum("w_micro").over(full)
    wnd = Window.orderBy(F.col("_rem").desc(), F.col(lang_col).asc())
    leftover = F.lit(b) - F.sum("_base").over(full)
    planned = (with_p.withColumn("_tw", tw)
               .withColumn("_rem", F.expr(f"({b}L * w_micro) % _tw"))
               .withColumn("_base", F.expr(f"({b}L * w_micro) div _tw"))
               .withColumn("_rk", F.row_number().over(wnd))
               .withColumn("target_tokens",
                           F.col("_base")
                           + F.when(F.col("_rk") <= leftover, F.lit(1))
                           .otherwise(F.lit(0))))
    return (planned.select(
        F.col(lang_col).alias("lang"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "p_micro", "w_micro",
        F.col("target_tokens").cast("long").alias("target_tokens"))
        .orderBy("lang"))


def length_percentile_docs(docs: DataFrame, id_col: str = "doc_id",
                           len_col: str = "n_chars") -> DataFrame:
    """Per-document EXACT length percentile (cumulative distribution
    rank) WITHOUT a global sort → ``(doc_id, n_chars, pct_rank)``
    where pct_rank = |docs with length ≤ this|/n, half-up 6 dp.

    The distributed-CDF shape (§12 discipline): a length histogram
    aggregate (one corpus shuffle, |distinct lengths| rows), ONE
    partition-less cumulative window over that bounded histogram —
    never over the corpus — and a broadcast join back on the length
    key. The rank ratio uses the remainder-exact integer protocol
    (:func:`..functions.rounding.pround_iratio`), so the percentile is
    engine-stable with no double-rounding at cut boundaries. The
    classic ``cume_dist()`` window over all docs would range-sort the
    corpus through one partition; this form replaces it with a
    histogram-sized window plus a narrow join."""
    from ..functions.rounding import pround_iratio

    h = (docs.groupBy(F.col(len_col).alias("_v"))
         .agg(F.count(F.lit(1)).alias("_c")))
    wc = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select("_v", F.sum("_c").over(wc).alias("_cle"))
    n = docs.agg(F.count(F.lit(1)).alias("_n"))
    return (docs.select(id_col, len_col)
            .join(F.broadcast(cum), F.col(len_col) == F.col("_v"))
            .join(F.broadcast(n))
            .select(F.col(id_col),
                    F.col(len_col).cast("long").alias("n_chars"),
                    pround_iratio(F.col("_cle"), F.col("_n"))
                    .alias("pct_rank"))
            .orderBy(id_col))


def doc_length_gini(docs: DataFrame, len_col: str = "n_chars"
                    ) -> DataFrame:
    """Corpus length-inequality coefficient (Gini over document
    lengths) → one row ``(n_docs, total_chars, gini)`` — the
    diversity/imbalance diagnostic a mixture planner reads before
    setting sampling temperatures.

    Exact and sort-free: Gini needs the rank-weighted sum
    Σᵢ rankᵢ·xᵢ over ascending lengths, which the histogram form
    computes per DISTINCT value v (count c, cumulative-before C) as
    v·(c·C + c(c+1)/2) — all integer arithmetic. One histogram
    aggregate, one partition-less window over the |distinct lengths|-
    row histogram (bounded — §12 inventory), and the final
    G = (2·Σranks − (n+1)·T)/(n·T) via the remainder-exact integer
    ratio. No corpus sort, no driver collect; magnitudes hold to the
    same decimal(30,0) envelope as every other iratio in the repo."""
    from ..functions.rounding import pround_iratio

    h = (docs.groupBy(F.col(len_col).alias("_v"))
         .agg(F.count(F.lit(1)).alias("_c")))
    wb = Window.orderBy("_v") \
        .rowsBetween(Window.unboundedPreceding, -1)
    cum = h.select("_v", "_c",
                   F.coalesce(F.sum("_c").over(wb), F.lit(0)).alias("_cb"))
    s = cum.agg(
        F.sum(F.col("_v")
              * (F.col("_c") * F.col("_cb")
                 + F.expr("_c * (_c + 1) DIV 2"))).alias("_sr"),
        F.sum(F.col("_v") * F.col("_c")).alias("_t"),
        F.sum("_c").alias("_n"))
    return s.select(
        F.col("_n").cast("long").alias("n_docs"),
        F.col("_t").cast("long").alias("total_chars"),
        pround_iratio(F.lit(2) * F.col("_sr")
                      - (F.col("_n") + 1) * F.col("_t"),
                      F.col("_n") * F.col("_t")).alias("gini"))


def source_diversity_index(docs: DataFrame, group_col: str = "source",
                           label_col: str = "lang") -> DataFrame:
    """Per-source language-diversity census → one row per source
    ``(source, n_docs, n_langs, top_lang_share_frac, simpson_frac)``
    — the concentration screen a curation pipeline reads before
    weighting sources: a source whose docs are 95% one language
    contributes less distributional diversity than its row count
    suggests.

    Diversity is the GINI-SIMPSON index 1 − Σ(c_l/n)², chosen over
    Shannon entropy deliberately: it needs no ln() (a libm call whose
    last ulp is engine-variant — the PSI-drift lesson), so the whole
    statistic is exact integer arithmetic (n² − Σc²) followed by one
    remainder-exact 6-dp ratio. top_lang_share is max(c)/n under the
    same protocol.

    Scale: one (source, lang) hash aggregate with map-side partials,
    then one |sources|-group rollup — shuffle volume is label-
    cardinality-sized at any corpus size."""
    from ..functions.rounding import pround_iratio

    per = (docs.groupBy(group_col, label_col)
           .agg(F.count(F.lit(1)).alias("_c")))
    g = per.groupBy(group_col).agg(
        F.sum("_c").alias("_n"),
        F.count(F.lit(1)).alias("_k"),
        F.max("_c").alias("_mx"),
        F.sum(F.col("_c") * F.col("_c")).alias("_ssq"))
    return (g.select(
        F.col(group_col),
        F.col("_n").cast("long").alias("n_docs"),
        F.col("_k").cast("long").alias("n_langs"),
        pround_iratio(F.col("_mx"), F.col("_n"))
        .alias("top_lang_share_frac"),
        pround_iratio(F.col("_n") * F.col("_n") - F.col("_ssq"),
                      F.col("_n") * F.col("_n")).alias("simpson_frac"))
        .orderBy(group_col))
