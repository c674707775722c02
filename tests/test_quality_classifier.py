"""fastText-style hashed linear quality classifier: feature semantics,
training separation, scoring totality, and artifact round-trip."""

from __future__ import annotations

import pytest

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


@pytest.mark.slow
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


def _toy_corpus(spark):
    good = [(i, "insight rigor clarity depth nuance") for i in range(40)]
    bad = [(100 + i, "spam spam spam click click buy") for i in range(40)]
    df = spark.createDataFrame(good + bad, "doc_id long, text string")
    labels = df.select(
        F.col("doc_id").alias("id"),
        (F.col("doc_id") < 100).cast("double").alias("label"),
    )
    return df, labels


def test_early_stopping_is_deterministic_and_cuts_iterations(spark):
    """tol stops the loop once the steepest gradient coordinate goes
    quiet; the stop iteration and the weights are bit-reproducible
    because the norm is computed from the 9-dp-rounded sums."""
    df, labels = _toy_corpus(spark)
    runs = []
    for _ in range(2):
        norms: list = []
        w, b = Q.fit_linear_classifier(
            Q.hashed_bow(df), labels, iters=60, lr=20.0, tol=0.02, grad_norms=norms
        )
        runs.append((w, b, len(norms)))
    (w1, b1, k1), (w2, b2, k2) = runs
    assert k1 == k2 < 60  # stopped early, at the SAME iteration
    assert w1 == w2 and b1 == b2  # bit-identical rebuild
    scored = {r["doc_id"]: r["quality"] for r in Q.score_documents(df, w1, b1).collect()}
    assert all(v > 0.5 for i, v in scored.items() if i < 100)
    assert all(v < 0.5 for i, v in scored.items() if i >= 100)


@pytest.mark.slow
def test_minibatch_mode_converges_and_is_deterministic(spark):
    """Hash-sliced mini-batches (pure function of id — retry/AQE/
    partitioning-immune) still separate the toy classes, and two fits
    produce bit-identical weights."""
    df, labels = _toy_corpus(spark)
    fits = [
        Q.fit_linear_classifier(
            Q.hashed_bow(df), labels, iters=32, lr=20.0, batch_count=4
        )
        for _ in range(2)
    ]
    assert fits[0] == fits[1]
    w, b = fits[0]
    scored = {r["doc_id"]: r["quality"] for r in Q.score_documents(df, w, b).collect()}
    assert all(v > 0.5 for i, v in scored.items() if i < 100)
    assert all(v < 0.5 for i, v in scored.items() if i >= 100)


def test_minibatch_slices_cover_all_documents(spark):
    """Round-robin slice coverage: with batch_count=K and iters=K every
    document's slice is visited exactly once — the per-slice counts the
    normalizer uses must partition the corpus."""
    from pyspark.sql import functions as SF

    _, labels = _toy_corpus(spark)
    k = 4
    sl = SF.pmod(SF.xxhash64(SF.col("id")), SF.lit(k)).cast("int")
    counts = {
        r["s"]: r["c"]
        for r in labels.withColumn("s", sl).groupBy("s").agg(SF.count("*").alias("c")).collect()
    }
    assert sum(counts.values()) == 80
    assert set(counts) <= set(range(k))


def test_load_weights_ignores_metadata_rows(spark, tmp_path):
    rows = [(0, 0.5), (1, -0.25), (-1, 0.125), (-2, 500.0), (-3, 12345.0)]
    p = str(tmp_path / "w.parquet")
    spark.createDataFrame(rows, "bucket int, w double").write.parquet(p)
    w, b = Q.load_weights(spark, p)
    assert w == [0.5, -0.25] and b == 0.125
