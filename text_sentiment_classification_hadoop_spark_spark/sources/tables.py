"""Parquet table loaders for the driver testdata (TESTDATA.md).

Columnar scans: Catalyst pushes filters/projections into the parquet
reader (check with ``.explain`` → ``PushedFilters`` / ``ReadSchema``),
so callers should select/filter on the returned DataFrame directly
rather than materializing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    from ..session import ensure_engine_confs
    ensure_engine_confs(spark)  # caller-provided sessions included
    sf_dir = sf_dir or DEFAULT_SF_DIR
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is INT64 TIMESTAMP(NANOS); with
    # spark.sql.legacy.parquet.nanosAsLong it arrives as a raw ns long —
    # truncate to microseconds (same as DuckDB's ns→us cast) and restore
    # TimestampType so downstream time logic is engine-agnostic.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view (for the SQL entry points)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
