"""Gopher rule table + temperature mixture: hand-computed semantics on
tiny frames (the parity rows cover corpus scale)."""

from __future__ import annotations

import string

from pyspark.sql import functions as F

from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.quality_rules import (
    RULE_NAMES,
    gopher_flags,
    gopher_report,
)


def _letters(i: int) -> str:
    a = string.ascii_lowercase
    return "tok" + a[i % 26] + a[(i // 26) % 26]


def test_gopher_flags_hand_computed(spark):
    long_ok = "the quick brown fox jumps over the lazy dog and then " + " ".join(
        _letters(i) for i in range(45)
    )  # 56 words, >=2 stopword hits, all-letter tokens, distinct
    df = spark.createDataFrame(
        [
            (1, long_ok),
            (2, "short text"),                      # fails word_count + stopwords
            (3, " ".join(["dup"] * 60)),            # fails repetition
            (4, " ".join(["1234 5678"] * 30)),      # fails alpha_ratio
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in df.select("doc_id", *gopher_flags("text")).collect()}
    assert not any(rows[1][f"fail_{n}"] for n in RULE_NAMES), rows[1]
    assert rows[2]["fail_word_count"] and rows[2]["fail_stopword_hits"]
    assert rows[3]["fail_repetition"] and not rows[3]["fail_word_count"]
    assert rows[4]["fail_alpha_ratio"]


def test_gopher_report_counts_and_pass_all(spark):
    good = "the cat sat on a mat of wool and " + " ".join(
        _letters(i) for i in range(41)
    )
    df = spark.createDataFrame(
        [("s1", good), ("s1", "tiny"), ("s2", good)], "source string, text string"
    )
    rep = {r["source"]: r for r in gopher_report(df).collect()}
    assert rep["s1"]["n_docs"] == 2 and rep["s1"]["n_pass_all"] == 1
    assert rep["s1"]["n_fail_word_count"] == 1
    assert rep["s2"]["n_pass_all"] == 1


def test_temperature_mixture_upweights_rare_sources(spark, tmp_path):
    """alpha<1 compresses shares: a 90/10 corpus must give the rare
    source keep rate 1.0 (capped upweight) and the dominant source a
    rate strictly below 1; kept counts respect the deterministic hash
    threshold; weights re-derive from p^alpha normalization exactly."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.llm_data import (
        _TM_ALPHA,
        temperature_mixture,
    )

    docs = spark.createDataFrame(
        [(i, "filler words here", "en", "big", 17) for i in range(90)]
        + [(1000 + i, "filler words here", "en", "small", 17) for i in range(10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in temperature_mixture(spark, str(tmp_path)).collect()}

    p_big, p_small = 0.9, 0.1
    pa_b, pa_s = p_big**_TM_ALPHA, p_small**_TM_ALPHA
    w_b, w_s = pa_b / (pa_b + pa_s), pa_s / (pa_b + pa_s)
    assert out["small"]["keep_rate"] == 1.0        # min(1, w/p) capped
    assert out["big"]["keep_rate"] == round(w_b / p_big, 6) < 1.0
    assert out["small"]["target_weight"] == round(w_s, 6)
    assert out["big"]["n_total"] == 90
    assert 0 < out["big"]["n_kept"] < 90           # thresholded subset
    assert out["small"]["n_kept"] == 10            # rate 1 keeps all


def test_gopher_pass_subset_and_unknown_rule(spark):
    """gopher_pass composes an arbitrary rule subset into one gate; an
    unknown rule name errors instead of silently gating on nothing."""
    import pytest
    from pyspark.sql import functions as F

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.quality_rules import (
        FUNNEL_RULES,
        RULE_NAMES,
        gopher_pass,
    )

    # ~8 tokens: fails word_count (floor 50) but passes the funnel's
    # content-shape subset
    docs = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog and cat",)],
        "text string",
    )
    row = docs.select(
        gopher_pass("text").alias("full"),
        gopher_pass("text", FUNNEL_RULES).alias("subset"),
    ).first()
    assert row["full"] is False  # word_count floor trips the full table
    assert row["subset"] is True  # content-shape rules all pass
    with pytest.raises(ValueError, match="unknown gopher rules"):
        gopher_pass("text", ("word_count", "nope"))
    assert set(FUNNEL_RULES) < set(RULE_NAMES)


def test_rule_sql_predicates_cover_rule_names():
    """The oracle-side predicate table is keyed exactly by RULE_NAMES —
    the r10 drift (rules added Spark-side only) is now impossible to
    reintroduce silently."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.quality_rules import (
        RULE_NAMES,
        rule_sql_predicates,
    )

    preds = rule_sql_predicates()
    assert set(preds) == set(RULE_NAMES)
    assert all(p.strip() for p in preds.values())
