"""Evaluation operators (A10, LP.ipynb:827-848 cell 21): confusion matrix
as a grouped aggregate, classification metrics via MLlib evaluators."""

from __future__ import annotations

from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.sql import DataFrame, functions as F


def confusion_matrix(pred: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> DataFrame:
    """sklearn confusion_matrix as a distributed groupBy — cells are
    (label, prediction) counts."""
    return (
        pred.groupBy(label_col, pred_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(label_col, pred_col)
    )


def classification_metrics(pred: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> dict[str, float]:
    """accuracy / weighted precision / weighted recall / f1 — the
    classification_report surface."""
    out = {}
    for metric, key in [
        ("accuracy", "accuracy"),
        ("weightedPrecision", "precision"),
        ("weightedRecall", "recall"),
        ("f1", "f1"),
    ]:
        ev = MulticlassClassificationEvaluator(
            labelCol=label_col, predictionCol=pred_col, metricName=metric
        )
        out[key] = ev.evaluate(pred)
    return out
