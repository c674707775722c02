"""Structural invariants of the event-sequence analytics — properties
the DuckDB hash-compare can't express (it only proves equality, not
that both engines compute a *sensible* thing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_funnel_counts_monotone_non_increasing(spark):
    row = QUERIES["funnel_conversion"].fn(spark, SF).first()
    assert row["n_signup"] >= row["n_click"] >= row["n_purchase"] >= 0
    assert 0.0 <= row["purchase_rate"] <= row["click_rate"] <= 1.0


def test_transition_probabilities_sum_to_one(spark):
    out = QUERIES["event_transitions"].fn(spark, SF)
    sums = out.groupBy("prev_type").agg(F.sum("p").alias("s")).collect()
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-4, (r["prev_type"], r["s"])


def test_scd2_intervals_tile_each_user_timeline(spark):
    out = QUERIES["scd2_intervals"].fn(spark, SF)
    # exactly one open (is_current) interval per user
    open_counts = (
        out.where(F.col("is_current"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert open_counts.where(F.col("n") != 1).isEmpty()
    # closed intervals chain: effective_to equals the next effective_from
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("effective_from")
    chained = out.withColumn("next_from", F.lead("effective_from").over(w))
    broken = chained.where(
        F.col("next_from").isNotNull() & (F.col("effective_to") != F.col("next_from"))
    )
    assert broken.isEmpty()
    # no zero-length or inverted intervals
    bad = out.where(
        F.col("effective_to").isNotNull()
        & (F.col("effective_to") <= F.col("effective_from"))
    )
    assert bad.isEmpty()


def test_rolling_wau_bounds_dau(spark):
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.loaders import (
        load_table,
    )

    out = QUERIES["rolling_active_users"].fn(spark, SF).collect()
    total_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    for r in out:
        assert 1 <= r["active_1d"] <= r["active_7d"] <= total_users


def test_stratified_sample_exact_per_stratum(spark):
    out = QUERIES["stratified_sample"].fn(spark, SF)
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.loaders import (
        load_table,
    )

    avail = {r["lang"]: r["n"] for r in
             load_table(spark, SF, "documents").groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(10, avail[lang]), (lang, n, avail[lang])
    # deterministic: a second run picks the identical rows
    a = {tuple(r) for r in out.collect()}
    b = {tuple(r) for r in QUERIES["stratified_sample"].fn(spark, SF).collect()}
    assert a == b
