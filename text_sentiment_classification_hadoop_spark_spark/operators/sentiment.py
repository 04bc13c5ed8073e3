"""End-to-end sentiment pipelines over the driver's ``documents`` table.

The reference's workload is tweets; the driver testdata carries
``documents(doc_id, text, …)`` instead (FIXTURES.md §B). Labels and the
train/test split are deterministic expressions so the DuckDB oracle can
reproduce them exactly:

- ``label`` = 1.0 if ``doc_id % 2 == 1`` else 0.0 (FIXTURES.md: "or
  synthesized as a deterministic expression (e.g. doc_id % 2)").
- test = ``doc_id % 8 IN (0, 5)`` (~25%, hitting BOTH label parities —
  a plain ``% 4`` test split would contain only even ids and therefore
  only negatives); train is the complement. This mirrors the
  reference's 75/25 protocol (``README.md:17``) but is deterministic
  instead of ``randomSplit`` so it is SQL-checkable; the seeded
  ``randomSplit([0.75,0.25], 1234)`` path lives in
  ``svm.mllib_pipeline`` for reference parity M1.

Cleaning uses chain A (the NB/Spark chain) before tokenization, exactly
as the reference orders it (clean → split, ``NB.java:67-92``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import clean_chain_a
from ..functions.rounding import pround
from ..session import local_frame, widen
from . import metrics as M
from . import nb as NB
from . import svm as SVM
from ..sources.tables import load_table


# ~15 driver queries start from the identical cleaned+labeled corpus;
# memoize its localCheckpoint per (application, sf_dir) so the regex
# chain and scan run once per session instead of once per query. Lazy
# (eager=False): materialized by the first query that acts on it.
_DOCS_CACHE: dict[tuple[str, str], DataFrame] = {}


def labeled_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(doc_id, text, label)`` with cleaned text + deterministic label.

    Widened before the regex chain: the chain is the CPU-heavy narrow
    stage of every sentiment pipeline, and the testdata parquet is a
    single row group (one scan task); see ``session.widen``."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _DOCS_CACHE:
        d = widen(load_table(spark, "documents", sf_dir).select("doc_id", "text"))
        out = d.select(
            "doc_id",
            clean_chain_a(F.col("text")).alias("text"),
            F.when(F.col("doc_id") % 2 == 1, F.lit(1.0)).otherwise(F.lit(0.0)).alias("label"),
        )
        _DOCS_CACHE[key] = out.localCheckpoint(eager=False)
    return _DOCS_CACHE[key]


def train_test(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    is_test = (F.col("doc_id") % 8).isin(0, 5)
    return docs.filter(~is_test), docs.filter(is_test)


# The driver invokes each query independently, and four of them (model,
# stats, predictions, confusion) train the identical NB model on the
# identical split. Memoize per (application, sf_dir): the model is a
# checkpointed vocabulary-sized DataFrame, so holding it is cheap and
# recomputation-free. Keyed on applicationId so a new session never sees
# a stale handle.
_NB_CACHE: dict[tuple[str, str], tuple[DataFrame, object]] = {}


def _nb_trained(spark: SparkSession, sf_dir: str):
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _NB_CACHE:
        train, _ = train_test(labeled_documents(spark, sf_dir))
        _NB_CACHE[key] = NB.nb_train(train)
    return _NB_CACHE[key]


# predictions/confusion/metrics all act on the identical scored test
# split (3 driver queries per algorithm) — memoize the scored DF like
# the model: checkpointed, test-split-sized, recomputation-free.
_SCORED_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def nb_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, "nb")
    if key not in _SCORED_CACHE:
        _, test = train_test(labeled_documents(spark, sf_dir))
        model, stats = _nb_trained(spark, sf_dir)
        _SCORED_CACHE[key] = NB.nb_score(test, model, stats) \
            .localCheckpoint(eager=False)
    return _SCORED_CACHE[key]


def svm_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, "svm")
    if key not in _SCORED_CACHE:
        train, test = train_test(labeled_documents(spark, sf_dir))
        w = SVM.svm_effective_train(train)
        _SCORED_CACHE[key] = SVM.svm_score(test, w) \
            .localCheckpoint(eager=False)
    return _SCORED_CACHE[key]


def nb_model_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/M2: the NB count model on the training split."""
    model, _ = _nb_trained(spark, sf_dir)
    return model.select("word", "pos_count", "neg_count").orderBy("word")


def nb_predictions_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2+M3+J1: train on 75%, score the 25% — returns
    ``(doc_id, label, prediction)``."""
    scored = nb_scored(spark, sf_dir)
    return scored.select("doc_id", "label", "prediction").orderBy("doc_id")


def nb_confusion_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 over the NB predictions."""
    return M.confusion_matrix(nb_scored(spark, sf_dir)) \
        .orderBy("prediction", "label")


def nb_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3-A5/J4: the six scalar training stats as one row (the
    reference's Configuration scalars, ``NB.java:305-316``)."""
    _model, s = _nb_trained(spark, sf_dir)
    return local_frame(
        spark, [(s.tweets_size, s.pos_tweets_size, s.neg_tweets_size,
          s.pos_words_size, s.neg_words_size, s.features_size)],
        "tweets_size bigint, pos_tweets_size bigint, neg_tweets_size bigint, "
        "pos_words_size bigint, neg_words_size bigint, features_size bigint",
    )


def svm_weights_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 compat: effective SVM weights, rounded at the output edge."""
    train, _ = train_test(labeled_documents(spark, sf_dir))
    w = SVM.svm_effective_train(train)
    return w.select("word", pround(F.col("weight"), 6).alias("weight")).orderBy("word")


def svm_predictions_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5+M6+J3: effective-SVM train + signed-sum scoring."""
    scored = svm_scored(spark, sf_dir)
    return scored.select("doc_id", "label", "prediction").orderBy("doc_id")


def svm_confusion_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.confusion_matrix(svm_scored(spark, sf_dir)) \
        .orderBy("prediction", "label")
