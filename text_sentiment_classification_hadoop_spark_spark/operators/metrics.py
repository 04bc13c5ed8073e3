"""Evaluation metrics as single-pass aggregations (SURVEY.md §2.5 A6-A9).

The reference computes TP/FP/TN/FN with cluster counters
(``NB.java:250-267``, ``SVM.java:144-149``) and derives
accuracy/precision/recall/F1 on the driver (``NB.java:337-341``,
``SVM.java:217-221``; formulas report §3.6 p.20). The Spark-side
programs use ``MulticlassMetrics`` (``NaiveBayes.py:70-74``) whose F1 is
the *weighted* F-measure — a different number from binary F1; both are
provided (A8 vs A9).

Everything is one ``groupBy(prediction, label).count()`` — a 4-row
aggregate regardless of input size, the cheapest possible full-scan
reduction at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(preds: DataFrame, pred_col: str = "prediction",
                     label_col: str = "label") -> DataFrame:
    """A6: ``(prediction, label, cnt)`` counts."""
    return (preds.groupBy(F.col(pred_col).alias("prediction"),
                          F.col(label_col).alias("label"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def confusion_counts(preds: DataFrame, pred_col: str = "prediction",
                     label_col: str = "label") -> dict[str, int]:
    """TP/FP/TN/FN scalars (positive class = 1.0)."""
    p, l = F.col(pred_col), F.col(label_col)
    row = preds.agg(
        F.sum(F.when((p == 1.0) & (l == 1.0), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((p == 1.0) & (l != 1.0), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((p != 1.0) & (l != 1.0), 1).otherwise(0)).alias("tn"),
        F.sum(F.when((p != 1.0) & (l == 1.0), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    return {k: int(row[k] or 0) for k in ("tp", "fp", "tn", "fn")}


def binary_metrics(counts: dict[str, int]) -> dict[str, float]:
    """A8 formulas (``NB.java:337-341``; report §3.6 p.20)."""
    tp, fp, tn, fn = counts["tp"], counts["fp"], counts["tn"], counts["fn"]
    total = tp + fp + tn + fn
    accuracy = (tp + tn) / total if total else 0.0
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    recall = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {"accuracy": accuracy, "precision": precision, "recall": recall, "f1": f1}


def weighted_f_measure(preds: DataFrame, pred_col: str = "prediction",
                       label_col: str = "label") -> float:
    """A9: support-weighted mean of per-class F1 — the quantity the
    reference prints as ``MulticlassMetrics.weightedFMeasure()``
    (``NaiveBayes.py:74``), computed from one confusion aggregation."""
    cm = confusion_matrix(preds, pred_col, label_col).collect()
    by_label: dict[float, int] = {}
    tp_: dict[float, int] = {}
    pred_totals: dict[float, int] = {}
    for r in cm:
        by_label[r["label"]] = by_label.get(r["label"], 0) + r["cnt"]
        pred_totals[r["prediction"]] = pred_totals.get(r["prediction"], 0) + r["cnt"]
        if r["prediction"] == r["label"]:
            tp_[r["label"]] = tp_.get(r["label"], 0) + r["cnt"]
    total = sum(by_label.values())
    wf = 0.0
    for lbl, support in by_label.items():
        tp = tp_.get(lbl, 0)
        prec = tp / pred_totals.get(lbl, 0) if pred_totals.get(lbl, 0) else 0.0
        rec = tp / support if support else 0.0
        f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
        wf += (support / total) * f1
    return wf
