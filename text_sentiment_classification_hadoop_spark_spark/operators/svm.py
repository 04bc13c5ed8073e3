"""Linear SVM operators: the reference's *effective* model (compat), the
*declared* Pegasos-style SGD (strict), and the MLlib vector path.

Reference semantics (SURVEY.md §2.9 M4-M6):

- **Effective / compat** (``SVM.java:49-50,169`` load-path bug): every
  epoch's mapper loads the *current* epoch's not-yet-written model, so
  weights are always empty, the hinge condition always fires, and each
  epoch independently produces
  ``w[word] = η_e · (pos_token_count(word) − neg_token_count(word))``.
  Scoring uses ``model_epoch_5`` with ``η_5 = 0.1 / (1 + 5·0.01)``
  (``SVM.java:36,49``). One SQL-expressible aggregation.
- **Declared / strict** (``SVM.java:42-106,167-187``): 5 epochs of
  mini-batch SGD: per violating sample (``y·(w·x) < 1``,
  ``SVM.java:86``) emit ``+η·y`` per token plus L2 decay ``−η·λ·w_j``
  for ALL weights (``SVM.java:87-94``); reducer sums deltas into the
  next model. Rebuilt as a driver loop of DataFrame jobs with the
  weights broadcast each epoch — the exact workload class where the
  report measured Spark 21× over MR (report §4.2 p.23) because the
  epoch loop stays in memory instead of round-tripping HDFS.
- **Scoring** (``SVM.java:139-144``): ``score = Σ_token w[token]``
  (missing → 0), ``pred = score ≥ 0 ? +1 : −1`` — tie → POSITIVE
  (opposite of NB's tie rule).

Hyperparameters (``SVM.java:34-36``): EPOCHS=5, LR=0.1, λ=0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import pround
from ..functions.tokenize import explode_tokens

# Hinge margins are rounded here before the `< 1` test so the violation
# set (and hence the whole epoch chain) is independent of fp summation
# order — the same portability rule the scorers apply at 6 dp.
MARGIN_DP = 9

EPOCHS = 5
LR = 0.1
LAMBDA = 0.01


def epoch_lr(epoch: int) -> float:
    """``η_e = 0.1 / (1 + epoch·0.01)`` (``SVM.java:36,49``)."""
    return LR / (1 + epoch * 0.01)


def svm_effective_train(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", label_col: str = "label",
                        epoch: int = EPOCHS) -> DataFrame:
    """M5 compat model: ``(word, weight)`` with
    ``weight = η_epoch · (pos_occurrences − neg_occurrences)``."""
    eta = epoch_lr(epoch)
    tokens = explode_tokens(docs.select(id_col, label_col, text_col), text_col=text_col)
    y = F.when(F.col(label_col) == 1.0, F.lit(1.0)).otherwise(F.lit(-1.0))
    return (
        tokens.groupBy("word")
        .agg(F.sum(y).alias("_net"))
        .select("word", (F.lit(eta) * F.col("_net")).alias("weight"))
    )


def svm_score(docs: DataFrame, weights: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """M6: docs + ``score`` + ``prediction`` (1.0 iff score ≥ 0;
    tie → POSITIVE, ``SVM.java:144``). Broadcast join on ``word``;
    unmatched tokens contribute 0 (``SVM.java:141``:
    ``getOrDefault(w, 0.0)``)."""
    tokens = explode_tokens(docs.select(id_col, text_col), text_col=text_col)
    sums = (
        tokens.join(F.broadcast(weights), "word", "inner")
        .groupBy(id_col)
        .agg(F.sum("weight").alias("_s"))
    )
    # Portably rounding the score to 6 dp before the sign test keeps
    # the prediction independent of fp summation order (cross-engine
    # stable; real scores are multiples of η ≈ 0.095); tie (rounded
    # score == 0) → POSITIVE via ``>= 0``, preserving ``SVM.java:144``.
    return (
        docs.join(sums, id_col, "left")
        .withColumn("score", F.coalesce(F.col("_s"), F.lit(0.0)))
        .drop("_s")
        .withColumn("prediction",
                    F.when(pround(F.col("score"), 6) >= 0, F.lit(1.0)).otherwise(F.lit(0.0)))
    )


def svm_train_declared(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", label_col: str = "label",
                       epochs: int = EPOCHS, lr: float = LR,
                       lam: float = LAMBDA) -> DataFrame:
    """M4 strict training with the epoch chain actually wired up
    (the fix for the reference's load-path bug).

    Per epoch: margin per doc via broadcast join of current weights;
    for violating docs emit ``+η·y`` per token; every violating sample
    also emits L2 decay ``−η·λ·w_j`` for ALL weights, so the summed
    decay is ``−η·λ·V·w_j`` with V = violation count; new weights =
    old + deltas (``SVM.java:87-106``).

    The tokenized corpus is cached across epochs — the in-memory
    iteration the reference's own report credits for Spark's 21×
    speedup (report §4.2 p.23).
    """
    tokens = explode_tokens(
        docs.select(id_col, label_col, text_col), text_col=text_col
    ).cache()  # materialized by epoch 1's first job, reused by all epochs

    y_expr = F.when(F.col(label_col) == 1.0, F.lit(1.0)).otherwise(F.lit(-1.0))
    weights: DataFrame | None = None  # epoch 1 starts empty (w = 0)

    for epoch in range(1, epochs + 1):
        eta = epoch_lr(epoch)
        if weights is None:
            # w = 0 ⇒ every sample violates the margin, and there are no
            # weights to decay — no violation count needed.
            violating = tokens.select(id_col, y_expr.alias("_y"), "word")
            grads = (
                violating.groupBy("word")
                .agg((F.lit(eta) * F.sum("_y")).alias("delta"))
            )
            new_weights = grads.select("word", F.col("delta").alias("weight"))
        else:
            w = F.broadcast(weights)
            margins = (
                tokens.join(w, "word", "left")
                .groupBy(id_col)
                .agg(F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("_dot"),
                     F.first(y_expr).alias("_y"))
                .withColumn("_violates",
                            (F.col("_y") * pround(F.col("_dot"), MARGIN_DP)) < 1.0)
            )
            # violations feed two consumers (the decay factor's count,
            # the gradient join): materialize the doc-sized table once
            # instead of re-running the margin join
            viol = margins.filter("_violates").select(id_col, "_y") \
                .localCheckpoint(eager=True)
            grads = (
                tokens.join(viol, id_col, "inner")
                .groupBy("word")
                .agg((F.lit(eta) * F.sum("_y")).alias("delta"))
            )
            # the violation count stays in-plan (broadcast 1-row cross
            # join) rather than round-tripping a driver collect per
            # epoch; ((η·λ)·V) evaluation order matches the SQL oracle
            nv = viol.agg(F.count(F.lit(1)).alias("_v"))
            decayed = weights.crossJoin(F.broadcast(nv)).select(
                "word",
                (F.col("weight")
                 * (F.lit(1.0) - F.lit(eta) * F.lit(lam) * F.col("_v"))).alias("weight"),
            )
            new_weights = (
                decayed.join(grads, "word", "outer")
                .select("word",
                        (F.coalesce(F.col("weight"), F.lit(0.0))
                         + F.coalesce(F.col("delta"), F.lit(0.0))).alias("weight"))
            )
        # Materialize the (vocabulary-sized) model each epoch to cut the
        # lineage — the columnar analog of the reference's per-epoch
        # model_epoch_{e} files, but in memory.
        weights = new_weights.localCheckpoint(eager=True)
    tokens.unpersist()
    return weights


def mllib_pipeline(docs: DataFrame, algorithm: str = "nb", text_col: str = "text",
                   label_col: str = "label", seed: int = 1234,
                   num_features: int = 1 << 18):
    """The reference's Spark-side vector path (T3+T5+T6+M1+M7/M8):
    Tokenizer → HashingTF(2^18) → IDF → {NaiveBayes | LinearSVC},
    ``randomSplit([0.75, 0.25], seed=1234)``.

    Quirk preserved as documented (``NaiveBayes.py:56-61``): IDF is fit
    on the FULL dataset before the train/test split (leakage) — exactly
    what the reference does.

    Returns ``(predictions_df, model)``.
    """
    from pyspark.ml.classification import LinearSVC, NaiveBayes
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    base = docs.select(F.col(label_col).cast("double").alias("label"),
                       F.col(text_col).alias("tweet"))
    tok = Tokenizer(inputCol="tweet", outputCol="words")
    words = tok.transform(base)
    tf = HashingTF(inputCol="words", outputCol="rawFeatures", numFeatures=num_features)
    featurized = tf.transform(words)
    idf = IDF(inputCol="rawFeatures", outputCol="features").fit(featurized)
    rescaled = idf.transform(featurized)
    train, test = rescaled.randomSplit([0.75, 0.25], seed=seed)
    if algorithm == "nb":
        est = NaiveBayes(featuresCol="features", labelCol="label")
    elif algorithm == "svm":
        est = LinearSVC(featuresCol="features", labelCol="label",
                        maxIter=10, regParam=0.1)
    else:
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    model = est.fit(train)
    return model.transform(test), model
