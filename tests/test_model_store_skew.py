"""Model persistence round-trip (S5-S7) and skew utilities."""

import pytest
from pyspark.sql import functions as F

from text_sentiment_classification_hadoop_spark_spark.operators import nb as NB
from text_sentiment_classification_hadoop_spark_spark.operators import sentiment as S
from text_sentiment_classification_hadoop_spark_spark.operators.skew import salted_count, salted_join
from text_sentiment_classification_hadoop_spark_spark.sources import model_store as MS


@pytest.fixture(scope="module")
def nb_model(spark, sf_dir):
    train, _ = S.train_test(S.labeled_documents(spark, sf_dir))
    model, _stats = NB.nb_train(train)
    return model


def test_model_roundtrip(spark, nb_model, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("models") / "nb")
    MS.save_model(nb_model, path)
    MS.save_model(nb_model, path)  # S7: overwrite is idempotent
    back = MS.load_model(spark, path)
    # nullability flags may differ after a parquet round-trip; names and
    # types must not
    assert [(f.name, f.dataType) for f in back.schema.fields] \
        == [(f.name, f.dataType) for f in nb_model.schema.fields]
    orig = sorted(nb_model.collect())
    assert sorted(back.collect()) == orig


def test_reference_format_export(spark, nb_model, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("models") / "nb_txt")
    MS.export_reference_format(nb_model, path, fmt="nb")
    lines = spark.read.text(path).collect()
    # word\tpos@neg, word-sorted (NB.java:100-102 layout)
    words = []
    for r in lines:
        word, v = r["value"].split("\t")
        pos, neg = v.split("@")
        int(pos), int(neg)
        words.append(word)
    assert words == sorted(words) and len(words) == nb_model.count()


def test_salted_count_equals_naive(spark, sf_dir):
    from text_sentiment_classification_hadoop_spark_spark.functions.tokenize import explode_tokens
    docs = S.labeled_documents(spark, sf_dir)
    toks = explode_tokens(docs, text_col="text").select("word")
    naive = {r["word"]: r["n"] for r in
             toks.groupBy("word").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["word"]: r["n"] for r in salted_count(toks, "word").collect()}
    assert salted == naive


def test_salted_join_equals_naive(spark, sf_dir):
    from text_sentiment_classification_hadoop_spark_spark.sources.tables import load_table
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name") \
        .withColumnRenamed("c_custkey", "o_custkey")
    naive = orders.join(cust, "o_custkey").count()
    salted = salted_join(orders, cust, "o_custkey").count()
    assert salted == naive
