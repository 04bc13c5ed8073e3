"""SparkSession factory.

Local test shape is ``local[N]`` (single JVM), but every config here is
chosen to also be the right default on a 1000-executor cluster reading
~100 TB:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  broadcast conversion replace hand-tuned reducer counts (the reference
  hand-tunes split sizes / reducer counts — ``NB.java:295,301``,
  ``SVM.java:183-184`` — all subsumed by AQE).
- ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; AQE
  coalesces down. At cluster scale you'd raise it to ~2-3x total cores.
- Arrow enabled for the (rare) Pandas-UDF paths.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# Confs the engine NEEDS for correctness and that Spark allows setting
# at runtime — applied defensively by the table loaders so the engine
# behaves correctly even on a caller-provided SparkSession built without
# session.get_spark (e.g. the driver's own session):
# - nanosAsLong: events.parquet carries INT64 TIMESTAMP(NANOS); without
#   this flag the scan ABORTS (PARQUET_TYPE_ILLEGAL)
# - UTC session tz: timestamp values must render identically to the
#   DuckDB oracle regardless of host timezone
# - Arrow: the multimodal mapInPandas stages should batch-transfer
RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_engine_confs(spark: SparkSession) -> None:
    """Apply the runtime-settable confs the engine requires (no-op when
    already set, e.g. under :func:`get_spark`)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build: keep going, reads may still work


def widen(df, min_parts: int | None = None):
    """Guarded repartition for CPU-bound narrow stages.

    A single-row-group parquet file scans as ONE task no matter how many
    cores exist; expression-heavy stages (md5 per shingle, regex chains)
    then run serially. When the input has fewer partitions than the
    cluster's parallelism, one tiny round-robin shuffle of the (narrow)
    input buys full-width execution. At real scale the guard makes this
    a no-op: a 100 TB table scans as ~800k splits, which is already
    ≥ defaultParallelism, so no shuffle is added.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def get_spark(
    app_name: str = "text_sentiment_classification_hadoop_spark_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session. Honors ``SPARK_GRAFT_CPUS``."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Spark 4 rejects INT64 TIMESTAMP(NANOS) parquet columns (the
        # events table) unless they are surfaced as raw longs; the
        # events loader converts ns-longs back to timestamps.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


from contextlib import contextmanager


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int):
    """Scope ``spark.sql.shuffle.partitions`` around an ITERATIVE loop
    over a small table (CC, PageRank, k-core, BPE): each round's jobs
    pay task-scheduling latency proportional to the partition count,
    which dominates when per-partition data is tiny — measured ~30%
    off the co-purchase CC at sf0.1 going 32 → 8. Only valid around
    operators whose results are partitioning-independent (the integer
    discipline guarantees it); restored on exit, so plans the caller
    materializes later use the session default. The streaming twin is
    ``streaming.pipeline.stream_shuffle_partitions`` (state-store
    sizing, a different concern)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(int(n)))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
