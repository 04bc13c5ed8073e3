"""P1/P2/P3/P4 parse semantics (SURVEY.md §1.1, §2.2) — golden tests on
the reference's quirk classes (FIXTURES.md §A)."""

import pytest
from pyspark.sql import functions as F

from text_sentiment_classification_hadoop_spark_spark.sources.tweets import (
    label_col,
    parse_tweets_lines,
    read_tweets_naive,
    read_tweets_strict,
)

LINES = [
    "1,1,Sentiment140,simple text",
    "2,0,Sentiment140,with, interior, commas here",   # stitch: commas erased
    '3,1,Sentiment140,"quoted, text stays quoted"',   # quotes NOT unquoted
    "4,0,Sentiment140",                                # only 3 fields
    "5,1,Sentiment140,trailing,",                      # empty tail field
]


@pytest.fixture(scope="module")
def lines_df(spark):
    return spark.createDataFrame([(l,) for l in LINES], ["value"])


def rows_by_id(df):
    return {r["tweet_id"]: r for r in df.collect()}


def test_nb_mode_stitch_erases_commas(lines_df):
    rows = rows_by_id(parse_tweets_lines(lines_df, mode="nb"))
    # cols[3] += cols[4..] without the comma (NB.java:57-61)
    assert rows["2"]["text"] == "with interior commas here"
    assert rows["1"]["text"] == "simple text"
    # quoted text: split at interior comma, re-stitched without it;
    # quotes flow through untouched (SURVEY §1.1)
    assert rows["3"]["text"] == '"quoted text stays quoted"'


def test_nb_mode_keeps_malformed_as_null(lines_df):
    rows = rows_by_id(parse_tweets_lines(lines_df, mode="nb"))
    assert rows["4"]["text"] is None  # documented divergence: null, not crash
    assert len(rows) == 5


def test_svm_mode_truncates_and_filters(lines_df):
    rows = rows_by_id(parse_tweets_lines(lines_df, mode="svm"))
    # SVM.java:73-76: text = cols[3] only; <4 fields dropped
    assert rows["2"]["text"] == "with"
    assert "4" not in rows
    assert len(rows) == 4


def test_empty_tail_field_stitch(lines_df):
    rows = rows_by_id(parse_tweets_lines(lines_df, mode="nb"))
    assert rows["5"]["text"] == "trailing"  # "trailing" + "" joined


def test_bad_mode_raises(lines_df):
    with pytest.raises(ValueError):
        parse_tweets_lines(lines_df, mode="nope")


def test_strict_reader_preserves_commas(spark, tmp_path):
    path = str(tmp_path / "tweets.csv")
    with open(path, "w") as f:
        f.write('1,1,Sentiment140,"kept, commas"\n2,0,Sentiment140,plain\n')
    rows = rows_by_id(read_tweets_strict(spark, path))
    assert rows["1"]["text"] == "kept, commas"


def test_naive_reader_from_file(spark, tmp_path):
    path = str(tmp_path / "tweets.csv")
    with open(path, "w") as f:
        f.write("\n".join(LINES) + "\n")
    assert read_tweets_naive(spark, path, mode="nb").count() == 5


def test_label_recode_only_exact_one_is_positive(spark):
    # NB.java:75-87: "1" → positive, ANYTHING else → negative
    df = spark.createDataFrame(
        [("1",), ("0",), ("2",), ("",), ("true",)], ["sentiment"]
    ).select(label_col().alias("y"))
    assert [r["y"] for r in df.collect()] == [1.0, 0.0, 0.0, 0.0, 0.0]
