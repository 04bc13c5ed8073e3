"""Python Data Source for the reference's text-KV model format:
read path parses the exact artifacts `export_reference_format` emits;
write path round-trips through `spark.read.format("refmodel")`."""

import pytest
from pyspark.sql import functions as F

from text_sentiment_classification_hadoop_spark_spark.operators import sentiment as S
from text_sentiment_classification_hadoop_spark_spark.sources.model_store import (
    export_reference_format,
)
from text_sentiment_classification_hadoop_spark_spark.sources.refmodel_source import (
    register_refmodel,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_refmodel(spark)


def test_nb_export_reads_back(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("kv") / "nb_model")
    model, _ = S._nb_trained(spark, sf_dir)
    want = [(r["word"], r["pos_count"], r["neg_count"])
            for r in model.select("word", "pos_count", "neg_count")
            .orderBy("word").collect()]
    export_reference_format(
        model.select("word", "pos_count", "neg_count"), path, fmt="nb")
    got = [(r["word"], r["pos_count"], r["neg_count"])
           for r in spark.read.format("refmodel").option("model", "nb")
           .load(path).orderBy("word").collect()]
    assert got == want and len(got) > 0


def test_svm_write_read_roundtrip(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("kv") / "svm_model")
    df = spark.createDataFrame(
        [("alpha", 0.5), ("beta", -1.25), ("gamma", 3e-07)],
        "word string, weight double")
    df.write.format("refmodel").option("model", "svm").mode("overwrite") \
        .save(path)
    got = {r["word"]: r["weight"]
           for r in spark.read.format("refmodel").option("model", "svm")
           .load(path).collect()}
    assert got == {"alpha": 0.5, "beta": -1.25, "gamma": 3e-07}
    # overwrite replaces, not appends
    df.limit(1).write.format("refmodel").option("model", "svm") \
        .mode("overwrite").save(path)
    assert (spark.read.format("refmodel").option("model", "svm")
            .load(path).count() == 1)


def test_reader_skips_markers_and_blank_lines(spark, tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    (d / "part-00000").write_text("a\t1@2\n\nb\t3@4\n")
    (d / "_SUCCESS").write_text("")
    rows = sorted((r["word"], r["pos_count"], r["neg_count"])
                  for r in spark.read.format("refmodel")
                  .load(str(d)).collect())
    assert rows == [("a", 1, 2), ("b", 3, 4)]
