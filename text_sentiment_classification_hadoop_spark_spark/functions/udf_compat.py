"""Pandas-UDF escape hatch (SURVEY.md §2.10 U-1).

The reference's Spark programs run row-at-a-time Python lambdas
(``split_csv`` / ``clean_text``, ``NaiveBayes.py:12-29``) — the slowest
possible path (per-row pickle, codegen barrier). This engine's default
is native column expressions (``functions.cleaning``), but users
porting custom Python cleaning logic need a sanctioned slot: these
Arrow-batched ``pandas_udf`` twins are that slot — ~10-100× faster than
row-at-a-time UDFs, still slower than the native chain (documented,
measured in ``tests/test_udf_compat.py``).

Rule of thumb encoded here: reach for the pandas_udf ONLY when the
transformation cannot be said in ``pyspark.sql.functions``; the test
asserts the twins agree with the native chains so a migration back to
the fast path is always verifiable.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from .cleaning import (
    DIGITS_PATTERN,
    NON_ALPHA_PATTERN,
    TAG_PATTERN_A,
    URL_PATTERN_A,
    URL_PATTERN_B,
    WS_RUN_PATTERN,
)

# Python `re` compiles the same patterns; Java and Python regex agree on
# these constructs (alternation, lazy quantifiers, lookahead, classes).
_URL_A = re.compile(URL_PATTERN_A)
_TAG_A = re.compile(TAG_PATTERN_A)
_DIGITS = re.compile(DIGITS_PATTERN)
_NON_ALPHA = re.compile(NON_ALPHA_PATTERN)
_WS = re.compile(WS_RUN_PATTERN)
_URL_B = re.compile(URL_PATTERN_B)


@pandas_udf(StringType())
def clean_chain_a_pudf(s: pd.Series) -> pd.Series:
    """Arrow-batched twin of ``cleaning.clean_chain_a``."""
    def one(t: str | None) -> str | None:
        if t is None:
            return None
        t = _URL_A.sub("", t)
        t = _TAG_A.sub("", t)
        t = _DIGITS.sub("", t)
        t = _NON_ALPHA.sub(" ", t)
        t = t.lower().strip()
        return _WS.sub(" ", t)
    return s.map(one)


@pandas_udf(StringType())
def clean_chain_b_pudf(s: pd.Series) -> pd.Series:
    """Arrow-batched twin of ``cleaning.clean_chain_b``."""
    def one(t: str | None) -> str | None:
        if t is None:
            return None
        t = t.lower()
        t = _URL_B.sub(" ", t)
        t = _NON_ALPHA.sub(" ", t)
        t = _WS.sub(" ", t)
        return t.strip()
    return s.map(one)
