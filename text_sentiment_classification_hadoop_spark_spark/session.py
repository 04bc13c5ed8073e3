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


def local_frame(spark: SparkSession, rows, schema):
    """Driver-side rows → a single-batch JVM ``LocalRelation`` (via a
    ``pyarrow.Table``) instead of ``createDataFrame(list)``'s pickled
    Python RDD.

    Why (optimization guide §4 — eliminate the Python boundary):
    ``spark.createDataFrame(list, schema)`` parallelizes the PICKLED
    rows over ``defaultParallelism`` slices, so every scan of the frame
    — a broadcast build, a ``coalesce(1)`` artifact write, one round of
    an iterative loop — launches Python workers to unpickle 32 trivial
    partitions. Measured on local[32], Spark 4.1: a 2-row frame costs
    ~2 s per parallel scan and ~8 s under ``coalesce(1)`` (the single
    task drains all 32 Python sub-partitions sequentially); the Arrow
    path plans as ``LocalTableScan`` (~0.3 s, no Python workers, and
    broadcast builds read it driver-side with no job at all). On a real
    cluster the same frames ride query plans shipped to every executor,
    so the win is the same boundary removal, not a local quirk.

    Results are bit-identical: the Arrow schema is derived from the
    Spark schema (``to_arrow_schema``), so values round-trip through
    exactly the declared types. Any row/type shape the Arrow path can't
    express falls back to plain ``createDataFrame``.
    """
    from pyspark.sql import types as T
    # materialize ONCE up front (ADVICE r15): the Arrow attempt below
    # iterates `rows`, and its blanket-except fallback iterates again —
    # a generator argument would silently yield an empty/partial frame
    # on the second pass
    rows = list(rows)
    if isinstance(schema, str):
        try:
            st = T.StructType.fromDDL(schema)
        except Exception:
            return spark.createDataFrame(rows, schema)
    else:
        st = schema
    try:
        import pyarrow as pa

        # local Spark→Arrow type mapping: pyspark's to_arrow_schema
        # lives in pyspark.sql.pandas.* whose import pulls in pandas
        # (~1.5 s per fresh process — measured as a +1–2 s regression
        # on every small query whose RESULT is a local frame)
        def atype(dt):
            m = {T.LongType: pa.int64(), T.IntegerType: pa.int32(),
                 T.ShortType: pa.int16(), T.ByteType: pa.int8(),
                 T.DoubleType: pa.float64(), T.FloatType: pa.float32(),
                 T.StringType: pa.string(), T.BooleanType: pa.bool_(),
                 T.BinaryType: pa.binary(), T.DateType: pa.date32()}
            for k, v in m.items():
                if isinstance(dt, k):
                    return v
            if isinstance(dt, T.DecimalType):
                return pa.decimal128(dt.precision, dt.scale)
            if isinstance(dt, T.ArrayType):
                return pa.list_(atype(dt.elementType))
            if isinstance(dt, T.MapType):
                return pa.map_(atype(dt.keyType), atype(dt.valueType))
            if isinstance(dt, T.StructType):
                return pa.struct([pa.field(f.name, atype(f.dataType))
                                  for f in dt.fields])
            raise TypeError(f"no arrow mapping for {dt}")

        arrow_schema = pa.schema(
            [pa.field(f.name, atype(f.dataType)) for f in st.fields])

        def conv(v, dt):
            if v is None:
                return None
            if isinstance(dt, T.StructType):
                return {f.name: conv(x, f.dataType)
                        for f, x in zip(dt.fields, tuple(v))}
            if isinstance(dt, T.ArrayType):
                return [conv(x, dt.elementType) for x in v]
            if isinstance(dt, T.MapType):
                # keys need conversion too (ADVICE r15): a struct/array
                # key left unconverted would silently fall back to the
                # pickled path
                return {conv(k, dt.keyType): conv(x, dt.valueType)
                        for k, x in dict(v).items()}
            return v

        pyl = [{f.name: conv(x, f.dataType)
                for f, x in zip(st.fields, tuple(r))} for r in rows]
        tbl = pa.Table.from_pylist(pyl, schema=arrow_schema)
        return spark.createDataFrame(tbl, schema=st)
    except Exception:
        return spark.createDataFrame(rows, st)


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
    # scale/deployment-dependent conf overrides WITHOUT code edits
    # (guide §9 experiments stay parameterized: local defaults above
    # are the measured-best for the driver's local[N] bench; cluster
    # values are justified per-experiment in OPTIMIZATION_r16.md):
    #   SPARK_GRAFT_EXTRA_CONF="k1=v1;k2=v2"
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for kv in filter(None, env_conf.split(";")):
        k, _, v = kv.partition("=")
        b = b.config(k.strip(), v.strip())
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
