"""The reference's two text-cleaning chains as native column expressions.

Both chains are Java-regex pipelines in the reference; Spark SQL's
``regexp_replace`` uses the same Java regex engine, so the patterns port
verbatim and behavior is bit-identical (SURVEY.md §2.3).

Chain A — NB Hadoop + both reference Spark programs
  (reference ``Hadoop/NB/NB.java:67-73``,
   ``Spark/NaiveBayes/python/NaiveBayes.py:20-29``,
   ``Spark/SVM/python/SVM.py:20-29``), applied in order:
  1. strip URLs (4-alternative regex, case-insensitive, with a
     ``(?!www)`` negative lookahead)
  2. strip ``#``/``@``/``&`` + the following word (lazy ``.*?\\w+`` —
     also eats HTML entities like ``&lt;``)
  3. strip digits
  4. non-alpha -> space
  5. lowercase
  6. trim
  7. collapse whitespace runs to single spaces

Chain B — SVM Hadoop (reference ``Hadoop/SVM/SVM.java:39-40,47-50``):
  lowercase FIRST, then URL ``(?i)(https?://\\S+)`` -> " ",
  ``[^a-zA-Z ]`` -> " ", collapse ``\\s+`` -> " ", trim LAST.
  (Mentions lose only the sigil, keeping the word — unlike chain A.)

These are codegen-able column expressions: no UDF, no Python in the
executor hot path, safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Verbatim Java-regex patterns (semantics per SURVEY.md §2.3).
URL_PATTERN_A = (
    r"(?i)(https?:\/\/(?:www\.|(?!www))[a-zA-Z0-9][a-zA-Z0-9-]+[a-zA-Z0-9]\.[^\s]{2,}"
    r"|www\.[a-zA-Z0-9][a-zA-Z0-9-]+[a-zA-Z0-9]\.[^\s]{2,}"
    r"|https?:\/\/(?:www\.|(?!www))[a-zA-Z0-9]+\.[^\s]{2,}"
    r"|www\.[a-zA-Z0-9]+\.[^\s]{2,})"
)
TAG_PATTERN_A = r"(#|@|&).*?\w+"
DIGITS_PATTERN = r"\d+"
NON_ALPHA_PATTERN = r"[^a-zA-Z ]"
WS_RUN_PATTERN = r"\s+"
URL_PATTERN_B = r"(?i)(https?:\/\/\S+)"


def clean_chain_a(col: Column) -> Column:
    """Chain A: url → tag → digit → non-alpha → lower → trim → collapse."""
    c = F.regexp_replace(col, URL_PATTERN_A, "")
    c = F.regexp_replace(c, TAG_PATTERN_A, "")
    c = F.regexp_replace(c, DIGITS_PATTERN, "")
    c = F.regexp_replace(c, NON_ALPHA_PATTERN, " ")
    c = F.lower(c)
    c = F.trim(c)
    c = F.regexp_replace(c, WS_RUN_PATTERN, " ")
    return c


def clean_chain_b(col: Column) -> Column:
    """Chain B: lower → url(→space) → non-alpha(→space) → collapse → trim."""
    c = F.lower(col)
    c = F.regexp_replace(c, URL_PATTERN_B, " ")
    c = F.regexp_replace(c, NON_ALPHA_PATTERN, " ")
    c = F.regexp_replace(c, WS_RUN_PATTERN, " ")
    c = F.trim(c)
    return c
