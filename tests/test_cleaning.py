"""Chain A/B regex parity against an independent Python ``re`` oracle
(Java and Python regex agree on these patterns; SURVEY.md §2.3) plus
idempotence properties (SURVEY.md §5.2 item 3)."""

import re

import pytest
from pyspark.sql import functions as F

from text_sentiment_classification_hadoop_spark_spark.functions.cleaning import (
    clean_chain_a,
    clean_chain_b,
)

# FIXTURES.md quirk quotas: URLs both forms, mentions, hashtags, HTML
# entities, digits, non-ASCII, quotes, empty-after-cleaning, already-clean.
CASES = [
    "I love this so much http://foo.bar/x #happy day 123",
    "@user you are &lt;bad&gt; :( www.spam.com",
    "check https://www.example-site.com/path?q=1 now",
    "visit www.ab.cd quickly",
    "Tiếng Việt có dấu 123",
    "1234567890",
    "!!! ... ???",
    '"quoted text" with \'apostrophes\'',
    "plain lowercase already clean",
    "  leading and trailing  ",
    "MIXED Case TEXT",
    "#tag1 #tag2 @m1 @m2 &amp; more",
    "a,b,c,d,e",
    "",
]


def py_chain_a(t):
    t = re.sub(r"(?i)(https?:\/\/(?:www\.|(?!www))[a-zA-Z0-9][a-zA-Z0-9-]+[a-zA-Z0-9]\.[^\s]{2,}|www\.[a-zA-Z0-9][a-zA-Z0-9-]+[a-zA-Z0-9]\.[^\s]{2,}|https?:\/\/(?:www\.|(?!www))[a-zA-Z0-9]+\.[^\s]{2,}|www\.[a-zA-Z0-9]+\.[^\s]{2,})", "", t)
    t = re.sub(r"(#|@|&).*?\w+", "", t)
    t = re.sub(r"\d+", "", t)
    t = re.sub(r"[^a-zA-Z ]", " ", t)
    t = t.lower().strip()
    t = re.sub(r"\s+", " ", t)
    return t


def py_chain_b(t):
    t = t.lower()
    t = re.sub(r"(?i)(https?:\/\/\S+)", " ", t)
    t = re.sub(r"[^a-zA-Z ]", " ", t)
    t = re.sub(r"\s+", " ", t)
    return t.strip()


@pytest.fixture(scope="module")
def cleaned(spark):
    df = spark.createDataFrame([(c,) for c in CASES], ["text"])
    rows = df.select(
        "text",
        clean_chain_a(F.col("text")).alias("a"),
        clean_chain_b(F.col("text")).alias("b"),
    ).collect()
    return {r["text"]: (r["a"], r["b"]) for r in rows}


def test_chain_a_matches_reference_semantics(cleaned):
    for case in CASES:
        assert cleaned[case][0] == py_chain_a(case), f"chain A diverges on {case!r}"


def test_chain_b_matches_reference_semantics(cleaned):
    for case in CASES:
        assert cleaned[case][1] == py_chain_b(case), f"chain B diverges on {case!r}"


def test_chains_differ_on_mentions(cleaned):
    # chain A eats the word after '@'; chain B keeps it (SURVEY §2.3)
    a, b = cleaned["@user you are &lt;bad&gt; :( www.spam.com"]
    assert "user" not in a.split()
    assert "user" in b.split()


def test_chain_a_idempotent(spark, cleaned):
    once = [v[0] for v in cleaned.values()]
    df = spark.createDataFrame([(t,) for t in once], ["text"])
    twice = [r["t2"] for r in df.select(clean_chain_a(F.col("text")).alias("t2")).collect()]
    assert twice == once


def test_chain_b_idempotent(spark, cleaned):
    once = [v[1] for v in cleaned.values()]
    df = spark.createDataFrame([(t,) for t in once], ["text"])
    twice = [r["t2"] for r in df.select(clean_chain_b(F.col("text")).alias("t2")).collect()]
    assert twice == once


def test_empty_after_cleaning(cleaned):
    assert cleaned["1234567890"][0] == ""
    assert cleaned["!!! ... ???"][0] == ""
