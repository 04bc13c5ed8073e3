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


def zorder_key_txt(col_exprs: list[str], bits: int = 16) -> str:
    """SQL text for a Morton (Z-order) key over ``len(col_exprs)``
    non-negative integer expressions: output bit ``i·n + j`` is bit
    ``i`` of column ``j``, so the key interleaves the columns'
    low-order bits and rows close in EVERY dimension get close keys.

    Plain integer shifts/masks — bit-identical in DuckDB, so the key
    itself is oracle-checkable (``zorder_keys`` driver query). ``bits``
    low bits of each column participate; pre-bucket wider domains
    (e.g. ``value % 65536`` or an epoch-day) before interleaving.

    Each column expression is CAST to BIGINT first: shift positions
    reach ``bits·n − 1``, which on an INT column would hit the sign
    bit (an ANSI overflow error, or negative keys) as soon as
    ``bits·n > 31``."""
    n = len(col_exprs)
    terms = [
        f"((((CAST(({e}) AS BIGINT)) >> {i}) & 1) << {i * n + j})"
        for i in range(bits)
        for j, e in enumerate(col_exprs)
    ]
    return "(" + " + ".join(terms) + ")"


def write_zordered(df: DataFrame, path: str, col_exprs: list[str],
                   n_files: int = 8, bits: int = 16) -> None:
    """Z-order-clustered parquet: range-partition + sort on the Morton
    key of ``col_exprs``, then drop the key. Each output file then
    covers a small range of EVERY interleaved dimension, so parquet
    row-group/file min-max stats prune scans filtered on ANY of the
    columns — the multi-dimensional generalization of sorting by one
    column, and the standard recurring-scan layout at 100 TB (a sort
    by custkey alone leaves orderdate spans at full width; Z-order
    bounds both). Locality is asserted quantitatively in
    ``tests/test_bucketing.py``."""
    from pyspark.sql import functions as F
    keyed = df.withColumn("_zkey", F.expr(zorder_key_txt(col_exprs, bits)))
    (keyed.repartitionByRange(n_files, "_zkey")
     .sortWithinPartitions("_zkey")
     .drop("_zkey")
     .write.mode("overwrite").parquet(path))


def write_training_shards(manifest_docs: DataFrame, path: str,
                          n_shards: int = 16) -> None:
    """Materialize the training corpus in shuffled shard order — the
    writer half of ``curation.shuffle_split``'s contract: input is the
    manifest joined back to payload columns (must carry ``split``,
    ``shard``, ``shuffle_key``), output is parquet partitioned by
    ``split`` with ONE file per shard, rows inside each file sorted by
    ``shuffle_key`` (the pseudo-random training order).

    Layout: ``split=<s>/shard=<n>/`` directories — a trainer maps
    workers to shard dirs and streams each in shuffled order with zero
    runtime shuffling. Exactly one exchange: ``repartition(n_shards,
    shard)`` hash-routes every row to its shard's task;
    ``sortWithinPartitions(split, shard, shuffle_key)`` sorts per
    task — never a global sort. The sort LEADS with the partition
    columns deliberately: a dynamic-partition write requires rows
    ordered by them and would otherwise insert its own
    (shuffle_key-destroying) sort; with the required prefix already
    present the planner keeps ours. Re-runs produce byte-identical
    shards (hash order, no RNG). At 100 TB pick ``n_shards`` ≈ total
    size / 1 GB — same single exchange."""
    from pyspark.sql import functions as F
    (manifest_docs
     .repartition(n_shards, F.col("shard"))
     .sortWithinPartitions("split", "shard", "shuffle_key")
     .write.mode("overwrite").partitionBy("split", "shard").parquet(path))


def write_packed_shards(docs: DataFrame, packing: DataFrame,
                        path: str, id_col: str = "doc_id",
                        n_buckets: int = 8) -> None:
    """Materialize a first-fit-decreasing packing plan
    (``text_analysis.pack_sequences_ffd`` output: doc_id, bucket,
    seq_id, offset_in_seq, n_tok) joined back to its payload columns —
    parquet partitioned by ``bucket`` with ONE file per bucket, rows
    sorted by ``(seq_id, offset_in_seq)``: a trainer maps workers to
    bucket dirs and streams each in order, concatenating rows into
    fixed-token-budget sequences with zero runtime shuffling (the
    packed-sequence twin of :func:`write_training_shards`; same
    single-exchange discipline — ``repartition(bucket)`` routes every
    row to its bucket's task, the sort is within-partition and LEADS
    with the partition column so the dynamic-partition write keeps it
    rather than inserting its own)."""
    from pyspark.sql import functions as F
    (docs.join(packing, id_col)
     .repartition(max(int(n_buckets), 1), F.col("bucket"))
     .sortWithinPartitions("bucket", "seq_id", "offset_in_seq")
     .write.mode("overwrite").partitionBy("bucket").parquet(path))


def read_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read: union parquet generations whose schemas
    DIFFER (columns added over time) into one frame —
    ``mergeSchema=true``, the per-file footer union Spark does lazily.
    Old files yield NULL for later-added columns; no rewrite of
    historical data. The 100 TB posture: schema evolution is a READ
    concern (footer merge per file group), never a backfill job —
    pair with explicit ``withColumn(...cast...)`` normalization when a
    column's TYPE changed rather than was added (type conflicts fail
    loudly here, by design)."""
    return (spark.read.option("mergeSchema", "true")
            .parquet(*paths))


def compact_files(spark: SparkSession, src_path: str, dst_path: str,
                  target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Small-files compaction (the maintenance job every streaming
    sink needs): rewrite a directory of many small parquet files into
    ``ceil(total_bytes / target_file_bytes)`` files, content-identical.
    Returns the output file count.

    Sizing reads the SOURCE's on-disk bytes (driver-side listing — a
    metadata walk, not data), then one ``repartition(n)`` write: a
    single round-robin exchange of the data, the same cost any rewrite
    pays, with no driver materialization. At real scale this runs per
    partition directory (compact yesterday's partition, not the
    table), so the exchange is day-sized; target = the scan-optimal
    file size (≈ one row group per ``files.maxPartitionBytes``)."""
    import math
    import os
    total = 0
    for root, _dirs, files in os.walk(src_path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src_path).repartition(n) \
        .write.mode("overwrite").parquet(dst_path)
    return sum(1 for f in os.listdir(dst_path) if f.endswith(".parquet"))
