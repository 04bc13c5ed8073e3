"""Physical table layout for repeated-query workloads (SCALE.md §3-§4).

At 100 TB the dominant recurring costs are the shuffles that *re-derive
the same partitioning every run*: joining signatures to signatures,
probing LSH buckets, joining documents to per-doc features. Spark's
bucketed tables fix the partitioning at WRITE time: two tables bucketed
on the same key with the same bucket count join with NO exchange on
either side (asserted in ``tests/test_bucketing.py``).

Guidance encoded here:
- bucket dedup signature tables by ``doc_id`` (pair-verify joins),
- bucket embedding tables by the sign-LSH ``bucket`` id (ANN probes
  become a single-bucket pruned scan),
- choose bucket counts as a multiple of cluster parallelism
  (e.g. 4× cores) so every core gets work without tiny files.

Bucketing requires the session catalog (``saveAsTable``); plain
``parquet(path)`` writes cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int, sort_col: str | None = None) -> None:
    """Persist ``df`` as a bucketed catalog table (overwrite).

    With the default in-memory catalog, a table dir left by a PREVIOUS
    session is unknown to this one, so ``mode("overwrite")`` cannot drop
    it and the write fails with LOCATION_ALREADY_EXISTS — drop both the
    catalog entry and any stale location first."""
    import os
    import shutil
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(wh.removeprefix("file:"), table)
    shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet") \
        .bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back — scans report the bucket spec, and
    joins/aggregations on the bucket column skip their exchange."""
    return spark.table(table)


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Directory-partitioned parquet (e.g. events by day): readers with
    a filter on the partition column scan only matching directories —
    `PartitionFilters` in the plan, zero I/O elsewhere. The standard
    layout for time-organized 100 TB tables."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
