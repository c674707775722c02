"""Evaluation operators (A10, LP.ipynb:827-848 cell 21): confusion matrix
as a grouped aggregate, classification metrics via MLlib evaluators,
ranking metrics (ROC AUC / PR AUC) over the probability column."""

from __future__ import annotations

from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
)
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


def ranking_metrics(
    pred: DataFrame, label_col: str = "label", raw_col: str = "probability"
) -> dict[str, float]:
    """Threshold-free quality: areaUnderROC / areaUnderPR over the score
    column (the classification_report has no analog; the reference never
    looked at its probabilities beyond app.py's single-row display).
    MLlib computes both from a distributed score-sorted aggregation —
    no driver-side sort."""
    out = {}
    for metric, key in [("areaUnderROC", "roc_auc"), ("areaUnderPR", "pr_auc")]:
        ev = BinaryClassificationEvaluator(
            labelCol=label_col, rawPredictionCol=raw_col, metricName=metric
        )
        out[key] = ev.evaluate(pred)
    return out


def feature_importances(model, scored: DataFrame, features_col: str = "features") -> list[tuple[str, float]]:
    """Named feature importances from a fitted tree-ensemble pipeline.

    Maps the classifier's ``featureImportances`` vector back to human
    feature names via the ML attribute metadata the VectorAssembler
    stamped on the features column (one-hot slots surface as
    ``col_value``). Driver-side work is just the vector + metadata —
    no data movement. Returns (name, importance) sorted descending;
    importances sum to 1 for RF/GBT.
    """
    clf = model.stages[-1]
    if not hasattr(clf, "featureImportances"):
        raise TypeError(f"{type(clf).__name__} exposes no featureImportances")
    imp = clf.featureImportances
    attrs_meta = scored.schema[features_col].metadata["ml_attr"]["attrs"]
    names: dict[int, str] = {}
    for group in attrs_meta.values():  # "numeric" / "binary" / "nominal"
        for a in group:
            names[a["idx"]] = a["name"]

    # A StandardScaler drops its input's per-slot attribute names, so
    # scaled slots surface as "<outputCol>_<i>". Recover the originals by
    # walking the fitted stages: scaler outputCol -> its assembler's
    # inputCols (imputer "__imp" suffixes stripped back to raw columns).
    scaled_slots: dict[str, list[str]] = {}
    stages = list(getattr(model, "stages", []))
    for st in stages:
        if type(st).__name__ == "StandardScalerModel":
            in_col = st.getInputCol()
            for up in stages:
                if (
                    type(up).__name__ == "VectorAssembler"
                    and up.getOutputCol() == in_col
                ):
                    scaled_slots[st.getOutputCol()] = [
                        c.removesuffix("__imp") for c in up.getInputCols()
                    ]

    def resolve(name: str) -> str:
        for scaled, originals in scaled_slots.items():
            prefix = scaled + "_"
            if name.startswith(prefix) and name[len(prefix):].isdigit():
                i = int(name[len(prefix):])
                if i < len(originals):
                    return originals[i]
        return name.removesuffix("__imp")

    pairs = [(resolve(names.get(i, f"f{i}")), float(imp[i])) for i in range(imp.size)]
    return sorted(pairs, key=lambda p: (-p[1], p[0]))
