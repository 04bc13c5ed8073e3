"""Bucketed-layout contracts (SCALE.md §3-§4): co-bucketed tables join
without exchanges; the ANN probe over a bucketed embedding table prunes
to one bucket's files."""

import pytest
from pyspark.sql import functions as F

from text_sentiment_classification_hadoop_spark_spark.operators.dedup import minhash_signatures
from text_sentiment_classification_hadoop_spark_spark.plans.explain import plan_string
from text_sentiment_classification_hadoop_spark_spark.sources.layout import read_table, write_bucketed
from text_sentiment_classification_hadoop_spark_spark.sources.tables import load_table


@pytest.fixture(scope="module", autouse=True)
def no_broadcast(spark):
    """Force shuffle-join planning so the assertion is about bucketing,
    not about the small fixtures fitting a broadcast."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cobucketed_join_has_no_exchange(spark, sf_dir):
    sigs = minhash_signatures(load_table(spark, "documents", sf_dir))
    write_bucketed(sigs, "sigs_a", "doc_id", 4, sort_col="doc_id")
    write_bucketed(sigs, "sigs_b", "doc_id", 4, sort_col="doc_id")
    joined = read_table(spark, "sigs_a").alias("a").join(
        read_table(spark, "sigs_b").alias("b"), "doc_id")
    plan = plan_string(joined)
    assert "Exchange" not in plan, plan
    assert joined.count() == sigs.count()


def test_unbucketed_same_join_needs_exchange(spark, sf_dir):
    """Control: the identical join over plain parquet DOES shuffle —
    proving the bucket metadata, not the data size, removed it."""
    sigs = minhash_signatures(load_table(spark, "documents", sf_dir))
    joined = sigs.alias("a").join(sigs.alias("b"), "doc_id")
    assert "Exchange" in plan_string(joined)


def test_bucketed_agg_skips_exchange(spark, sf_dir):
    """Aggregation keyed on the bucket column reads pre-partitioned
    data — no exchange before the final agg."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    write_bucketed(docs, "docs_bucketed", "doc_id", 4)
    agg = read_table(spark, "docs_bucketed").groupBy("doc_id") \
        .agg(F.count(F.lit(1)).alias("n"))
    assert "Exchange" not in plan_string(agg)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path_factory):
    from text_sentiment_classification_hadoop_spark_spark.sources.layout import write_partitioned
    e = load_table(spark, "events", sf_dir).withColumn(
        "day", F.to_date("ts"))
    path = str(tmp_path_factory.mktemp("part") / "events_by_day")
    write_partitioned(e, path, "day")
    back = spark.read.parquet(path)
    one_day = back.select("day").distinct().head()["day"]
    q = back.filter(F.col("day") == one_day)
    plan = plan_string(q)
    # the partition filter must reach the scan, not a post-scan Filter
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters", 1)[1][:200]
    assert q.count() == e.filter(F.col("day") == one_day).count()
