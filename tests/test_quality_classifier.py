"""fastText-style hashed linear quality classifier: feature semantics,
training separation, scoring totality, and artifact round-trip."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
    quality_classifier as Q,
)


def test_hashed_bow_buckets_and_sublinear_tf(spark):
    df = spark.createDataFrame(
        [(1, "alpha alpha alpha beta"), (2, "  "), (3, None), (4, "beta")],
        "doc_id long, text string",
    )
    feats = {(r["id"], r["bucket"]): r["tf"] for r in Q.hashed_bow(df).collect()}
    # doc 1: two buckets (alpha x3 -> 1+ln3, beta x1 -> 1.0); docs 2/3 no rows
    ids = {i for i, _ in feats}
    assert ids == {1, 4}
    tfs = sorted(tf for (i, _), tf in feats.items() if i == 1)
    assert tfs[0] == 1.0 and abs(tfs[1] - (1.0 + math.log(3.0))) < 1e-12
    # same token -> same bucket everywhere (deterministic md5 fold)
    beta_buckets = {b for (i, b), tf in feats.items() if tf == 1.0}
    assert len(beta_buckets) == 1


def test_fit_separates_synthetic_classes_and_scores_everywhere(spark):
    """Cleanly separable toy corpus: the distributed Adagrad fit finds
    it, every doc gets a score (token-free docs score sigmoid(bias)),
    and save/load round-trips the artifact bit-for-bit."""
    good = [(i, "insight rigor clarity depth nuance") for i in range(40)]
    bad = [(100 + i, "spam spam spam click click buy") for i in range(40)]
    df = spark.createDataFrame(good + bad, "doc_id long, text string")
    labels = df.select(
        F.col("doc_id").alias("id"), (F.col("doc_id") < 100).cast("double").alias("label")
    )
    feats = Q.hashed_bow(df)
    w, b = Q.fit_linear_classifier(feats, labels, iters=25, lr=20.0)
    scored = {r["doc_id"]: r["quality"] for r in Q.score_documents(df, w, b).collect()}
    assert all(scored[i] > 0.5 for i, _ in good)
    assert all(scored[i] < 0.5 for i, _ in bad)
    # totality: a token-free doc scores sigmoid(bias), not NULL/missing
    empty = spark.createDataFrame([(999, "")], "doc_id long, text string")
    s = Q.score_documents(empty, w, b).collect()[0]
    assert abs(s["quality"] - 1.0 / (1.0 + math.exp(-b))) < 1e-6

    path = None
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/weights.parquet"
        Q.save_weights(spark, w, b, path)
        w2, b2 = Q.load_weights(spark, path)
        assert w2 == list(w) and b2 == b


def test_load_weights_ignores_metadata_rows(spark, tmp_path):
    rows = [(0, 0.5), (1, -0.25), (-1, 0.125), (-2, 500.0), (-3, 12345.0)]
    p = str(tmp_path / "w.parquet")
    spark.createDataFrame(rows, "bucket int, w double").write.parquet(p)
    w, b = Q.load_weights(spark, p)
    assert w == [0.5, -0.25] and b == 0.125
