"""Skew-mitigation utilities for 100 TB-scale shuffles (SURVEY.md §7
step 9; north-star scale design).

A natural-language vocabulary is Zipfian: at corpus scale a handful of
words ("the", "a") carry orders of magnitude more token occurrences
than the median word, so a single ``groupBy(word)`` or a shuffle join
keyed on ``word`` sends those keys to one reducer each — the straggler
that decides job latency.

Two standing answers, both result-identical to their naive forms (the
``word_counts_salted`` driver query is hash-checked against the same
oracle as ``word_counts``):

- **Salted two-phase aggregation**: shuffle once on ``(key, salt)``
  (hot keys spread over N reducers), then once more on ``key`` over the
  N-times-smaller partial table. For algebraic aggregates Spark already
  does map-side partial aggregation, which handles *moderate* skew;
  explicit salting is for when a single key's partials still dominate a
  reducer — at 1000 executors the second shuffle moves only
  |distinct keys| × N rows.
- **Salted broadcast-free join** (`salted_join`): replicate the small
  side N ways (explode over salt), salt the big side's key randomly —
  the classic fallback when the small side is too big to broadcast AND
  the key is skewed. Prefer ``F.broadcast`` when it fits; prefer AQE's
  ``skewJoin`` (on by default in ``session.get_spark``) when the skew
  is detectable at runtime; reach for explicit salting only for the
  pathological always-hot keys known in advance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def _salt_col(key: Column, n: int) -> Column:
    """Deterministic salt (hash of the key's row identity would be
    constant per key — useless), so salt on a uniform per-row value:
    ``monotonically_increasing_id() % n`` spreads a hot key's rows
    round-robin-ish without an RNG (reproducible plans)."""
    return (F.monotonically_increasing_id() % n).cast("int")


def salted_count(df: DataFrame, key_col: str, n_salts: int = DEFAULT_SALTS,
                 count_alias: str = "n") -> DataFrame:
    """Two-phase count: ``groupBy(key, salt).count`` →
    ``groupBy(key).sum`` — identical result to
    ``df.groupBy(key).count()`` with hot keys spread over ``n_salts``
    reducers in phase one."""
    phase1 = (
        df.select(F.col(key_col), _salt_col(F.col(key_col), n_salts).alias("_salt"))
        .groupBy(key_col, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return (
        phase1.groupBy(key_col)
        .agg(F.sum("_partial").alias(count_alias))
    )


def salted_join(big: DataFrame, small: DataFrame, key_col: str,
                n_salts: int = DEFAULT_SALTS, how: str = "inner") -> DataFrame:
    """Join a skewed big side to a non-broadcastable small side:
    big gets a per-row salt, small is exploded ``n_salts`` ways, and the
    join key becomes ``(key, salt)`` — each hot key now lands on
    ``n_salts`` reducers. Small-side blowup is the price: use only when
    |small| × n_salts ≪ |big|'s hot-key volume."""
    salted_big = big.withColumn("_salt", _salt_col(F.col(key_col), n_salts))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")))
    out = salted_big.join(salted_small, [key_col, "_salt"], how)
    return out.drop("_salt")


def bloom_semi_join(big: DataFrame, small: DataFrame, key_col: str,
                    n_bits: int = 1 << 16, k: int = 4) -> DataFrame:
    """Exact semi-join with a Bloom-filter pre-filter on the big side —
    the hand-rolled form of Spark's runtime-injected bloom filter
    (InjectRuntimeFilter), for when the small side is too large to
    broadcast as a hash relation but its *bitmap* (8 KiB here) is not.

    Phase 1 builds the bitmap distributively: k seeded ``xxhash64``
    positions per small-side key, packed into ``n_bits / 64`` longs via
    ``bit_or`` partial aggregation — the shuffle carries at most
    ``n_bits/64`` rows regardless of small-side size. The one-row
    collect is the J4 scalar-broadcast pattern (SURVEY §2). Phase 2 is a
    NARROW filter on the big side (array-literal word lookup + bit
    test, whole-stage codegen, no exchange) that discards most
    non-matching rows before the exact shuffle semi-join that removes
    the Bloom's false positives. At 100 TB the win is shuffle volume:
    only rows that pass the bitmap are exchanged."""
    seeds = list(range(k))

    def _pos(i: int) -> Column:
        return (F.abs(F.xxhash64(F.col(key_col), F.lit(i)))
                % F.lit(n_bits))

    bits = small.select(
        F.explode(F.array(*[_pos(i) for i in seeds])).alias("_bit"))
    words = (
        bits.select(
            (F.col("_bit") / 64).cast("int").alias("_w"),
            F.expr("shiftleft(1L, CAST(_bit % 64 AS INT))").alias("_m"))
        .groupBy("_w").agg(F.bit_or("_m").alias("_word"))
    )
    packed = {r["_w"]: r["_word"] for r in words.collect()}
    lit_words = F.array(*[F.lit(packed.get(i, 0)).cast("long")
                          for i in range(n_bits // 64)])

    probe = big.withColumn("_bf", lit_words)
    cond = None
    for i in seeds:
        pos = f"abs(xxhash64(`{key_col}`, {i})) % {n_bits}"
        hit = F.expr(
            f"(shiftright(get(_bf, CAST(({pos}) / 64 AS INT)), "
            f"CAST(({pos}) % 64 AS INT)) & 1) = 1")
        cond = hit if cond is None else (cond & hit)
    prefiltered = probe.filter(cond).drop("_bf")
    return prefiltered.join(
        small.select(key_col).distinct(), key_col, "left_semi")
