"""Text-analysis operators for training-data curation (north star,
§2.11): language ID, quality scoring, token counting, fingerprinting.

All pure column expressions (codegen, zero UDF, narrow until the
optional aggregations) — these run as a single map pass over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, shingles_expr
from ..functions.rounding import pround

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
# (Public common function words; the heuristic is ratio-of-hits.)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "para"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "nicht"],
}

EN_STOPWORDS = LANG_PROFILES["en"]


def _hit_ratio(tokens: Column, vocab: list[str]) -> Column:
    """Fraction of tokens that appear in ``vocab`` (empty → 0)."""
    hits = F.size(F.filter(tokens, lambda t: t.isin(vocab)))
    n = F.size(tokens)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", min_ratio: float = 0.05) -> DataFrame:
    """Stopword-profile language ID → ``(doc_id, pred_lang, best_ratio)``.

    Scores each profile by stopword hit-ratio; argmax with deterministic
    tie-break on language code; below ``min_ratio`` → 'unk'. (A real
    deployment swaps profiles for char-n-gram tables — same plan shape.)
    """
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    scores = [
        F.struct(pround(_hit_ratio(toks, vocab), 6).alias("ratio"),
                 F.lit(lang).alias("lang"))
        for lang, vocab in sorted(LANG_PROFILES.items())
    ]
    # array_max on struct(ratio, lang): max ratio, tie → max lang code;
    # deterministic on both engines.
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        F.when(best["ratio"] >= min_ratio, best["lang"]).otherwise(F.lit("unk")).alias("pred_lang"),
        best["ratio"].alias("best_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score →
    ``(doc_id, n_chars, n_tokens, mean_token_len, alpha_ratio,
    stopword_ratio, quality)``.

    quality = mean of three bounded signals (length in [20,2000] chars,
    stopword ratio ≥ 0.05, mean token length in [3,12]) — the classic
    cheap pre-filters a corpus pipeline runs before expensive dedup."""
    text = F.col(text_col)
    toks = F.split(text, r"\s+")
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    mean_tok = F.when(n_tokens > 0,
                      (F.length(F.regexp_replace(text, r"\s+", "")) / n_tokens)
                      ).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0,
                         (F.length(F.regexp_replace(text, r"[^a-zA-Z]", "")) / n_chars)
                         ).otherwise(F.lit(0.0))
    stop_ratio = _hit_ratio(F.transform(toks, F.lower), EN_STOPWORDS)
    sig_len = F.when((n_chars >= 20) & (n_chars <= 2000), 1.0).otherwise(0.0)
    sig_stop = F.when(stop_ratio >= 0.05, 1.0).otherwise(0.0)
    sig_tok = F.when((mean_tok >= 3.0) & (mean_tok <= 12.0), 1.0).otherwise(0.0)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        pround(mean_tok, 6).alias("mean_token_len"),
        pround(alpha_ratio, 6).alias("alpha_ratio"),
        pround(stop_ratio, 6).alias("stopword_ratio"),
        pround((sig_len + sig_stop + sig_tok) / 3.0, 6).alias("quality"),
    )


def token_counts(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Token counting two ways → ``(doc_id, ws_tokens, bpe_ish_tokens)``:
    whitespace split, and a BPE-ish regex (``[a-z]+|[0-9]+|\\S``) that
    approximates subword segmentation for budget estimation."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(F.split(text, r"\s+")).alias("ws_tokens"),
        F.regexp_count(F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]")).alias("bpe_ish_tokens"),
    )


def fingerprints(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Document fingerprint → ``(doc_id, content_hash, min_shingle_hash)``:
    full-content digest plus the minimum k-shingle hash (a 1-perm
    MinHash — the winnowing-style anchor used for fast prefiltering)."""
    sh = shingles_expr(F.col(text_col), k=k)
    hashes = F.transform(sh, lambda s: portable_hash64(s))
    return df.select(
        F.col(id_col),
        portable_hash64(F.col(text_col)).alias("content_hash"),
        F.coalesce(F.array_min(hashes), portable_hash64(F.col(text_col))).alias("min_shingle_hash"),
    )

def tfidf_long(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """DataFrame-native TF-IDF in long form → ``(doc_id, word, tf, df,
    tfidf)`` — the SQL-checkable twin of the MLlib HashingTF+IDF vector
    path (SURVEY.md §2.4 T5-T6), unhashed so there are no bucket
    collisions.

    ``idf = ln((N + 1) / (df + 1))`` — the ``pyspark.ml.feature.IDF``
    formula. Two aggregations (term counts keyed on (doc, word);
    document frequencies keyed on word) + a scalar N folded in as a
    literal; the df table joins back by word. At 100 TB the df table is
    vocabulary-sized — broadcast — and both aggregations partial
    map-side. tfidf is portably rounded at 6 dp (cross-engine ln/sum
    order safety).
    """
    import math

    toks = df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")) \
        .filter(F.length("word") > 0)
    n_docs = df.select(id_col).distinct().count()
    tf = toks.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (toks.select(id_col, "word").distinct()
             .groupBy("word").agg(F.count(F.lit(1)).alias("df")))
    out = tf.join(F.broadcast(dfreq), "word")
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1.0)))
    return out.select(
        F.col(id_col), "word",
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        pround(F.col("tf") * idf, 6).alias("tfidf"),
    )


def hash_sample(df: DataFrame, id_col: str = "doc_id",
                pct: int = 10, mod: int = 100,
                salt: str = "sample:v1") -> DataFrame:
    """Deterministic hash-based sampling — the reproducible alternative
    to ``df.sample()`` for training-data pipelines: keep a row iff
    ``portable_hash64(salt || id) % mod < pct``.

    Unlike seeded random sampling this is stable across engines,
    partitionings, and re-runs (a row's fate depends only on its id and
    the salt), so train/val/test splits stay disjoint across pipeline
    versions: disjoint pct-ranges of the same salt partition the
    corpus. Pure narrow map — no shuffle, filter runs scan-side."""
    h = portable_hash64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return df.filter((h % mod) < pct)


def stratified_hash_sample(df: DataFrame, rates: dict[str, int],
                           stratum_col: str = "lang",
                           id_col: str = "doc_id", mod: int = 100,
                           default_pct: int = 0,
                           salt: str = "sample:v1") -> DataFrame:
    """Deterministic stratified sampling: per-stratum keep-rates (e.g.
    downsample dominant languages, keep all of rare ones) with the same
    hash-based reproducibility as :func:`hash_sample` — the idiomatic
    replacement for ``df.sampleBy()``, whose seeded Bernoulli draws
    differ across engines/partitionings. Strata absent from ``rates``
    keep ``default_pct``. Pure narrow map: the rate lookup is a CASE
    expression, the filter runs scan-side, no shuffle."""
    h = portable_hash64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.filter((h % mod) < rate)
