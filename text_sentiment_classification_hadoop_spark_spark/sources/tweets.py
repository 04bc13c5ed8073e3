"""Tweet-CSV ingestion (SURVEY.md §1.1, §2.1-§2.2).

The reference's input is a line-oriented CSV parsed by a naive
``split(",")`` with NO RFC-4180 quote handling (``NB.java:53``,
``NaiveBayes.py:13``). Two readers:

- :func:`read_tweets_naive` — compat mode, replicates the reference
  bit-for-bit including the comma-erasing tail re-stitch
  (``NB.java:57-61``: ``columns[3] += columns[i]`` — interior commas are
  destroyed) and the SVM-Hadoop variant (``SVM.java:73-76``: text
  truncated at the first interior comma, rows with <4 fields dropped).
- :func:`read_tweets_strict` — idiomatic mode: RFC-4180 CSV via
  ``spark.read.csv`` for users who want correct comma/quote handling.

All parsing is native column expressions over ``spark.read.text`` —
line scans parallelize by file split exactly like ``TextInputFormat``
(S1-S4); partition count is governed by
``spark.sql.files.maxPartitionBytes`` (the Spark-native analog of the
reference's ``setMaxInputSplitSize`` tuning, ``NB.java:301``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TWEET_COLUMNS = ["tweet_id", "sentiment", "text"]


def parse_tweets_lines(lines: DataFrame, value_col: str = "value",
                       mode: str = "nb", java_split: bool = False) -> DataFrame:
    """Parse raw lines into ``(tweet_id, sentiment, text)``.

    mode="nb"  — stitch semantics (P1+P2+P3): cols>4 ⇒ tail concatenated
                 onto col 3 WITHOUT the comma (``NB.java:57-61``); no
                 malformed-row filter (NB has none).
    mode="svm" — truncate semantics (``SVM.java:73-76``): text = col 3
                 only; rows with <4 comma-fields dropped (P4, the only
                 row filter in the reference).
    """
    # Fidelity note: Java's ``String.split(",")`` (limit 0) DROPS
    # trailing empty fields, while Spark's ``F.split`` (limit -1) and
    # DuckDB's ``string_split`` both keep them — so a line ending in a
    # comma has one more field here than in the reference JVM by
    # default. ``java_split=True`` restores the Java behavior by
    # stripping the trailing comma run before the split (equivalent to
    # dropping the trailing empty fields for every line with ≥1
    # non-empty field; an all-comma line yields [''] here vs Java's [] —
    # both land in the <4-field handling either way). Spark and the
    # DuckDB oracle agree with each other in both settings; the oracles
    # pin the default.
    src = F.regexp_replace(F.col(value_col), ",+$", "") if java_split \
        else F.col(value_col)
    parts = F.split(src, ",")
    # F.get (not getItem): the reference's NB crashes the whole job on a
    # <4-field row (unguarded ``cols[3]``, ``NB.java:212``); a scale
    # engine must not abort a 100 TB scan for one malformed line, so NB
    # mode yields NULL text instead (documented divergence — downstream
    # empty-text guards drop the row from tokenization).
    tweet_id = F.get(parts, 0).alias("tweet_id")
    sentiment = F.get(parts, 1).alias("sentiment")
    if mode == "nb":
        # columns[3] += columns[4..]: join tail with EMPTY separator —
        # replicates the comma loss exactly (``NB.java:57-61``).
        text = F.when(
            F.size(parts) > 4,
            F.concat(F.get(parts, 3), F.array_join(F.slice(parts, 5, 2_000_000_000), "")),
        ).otherwise(F.get(parts, 3)).alias("text")
        return lines.select(tweet_id, sentiment, text)
    if mode == "svm":
        text = F.get(parts, 3).alias("text")
        return lines.filter(F.size(parts) >= 4).select(tweet_id, sentiment, text)
    raise ValueError(f"unknown mode: {mode!r}")


def read_tweets_naive(spark: SparkSession, paths: str | list[str],
                      mode: str = "nb", java_split: bool = False) -> DataFrame:
    """Compat reader over one or more text paths (multi-path = the
    reference's union-of-dirs scan S3, ``SVM.java:180-182``)."""
    if isinstance(paths, str):
        paths = [paths]
    return parse_tweets_lines(spark.read.text(list(paths)), mode=mode,
                              java_split=java_split)


def read_tweets_strict(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Strict RFC-4180 reader (rebuild-only improvement): quoted fields
    with interior commas survive intact."""
    if isinstance(paths, str):
        paths = [paths]
    df = (
        spark.read.option("header", "false")
        .option("quote", '"')
        .option("escape", '"')
        .csv(list(paths))
    )
    cols = df.columns
    out = df.select(
        F.col(cols[0]).alias("tweet_id"),
        F.col(cols[1]).alias("sentiment"),
        F.col(cols[3]).alias("text"),
    )
    return out


def label_col(sentiment_col: str = "sentiment"):
    """P6 label recode: '1' → 1.0 (positive), anything else → 0.0
    (``NB.java:75-87``: only the exact string "1" is positive)."""
    return F.when(F.col(sentiment_col) == "1", F.lit(1.0)).otherwise(F.lit(0.0))
