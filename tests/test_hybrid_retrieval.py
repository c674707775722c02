"""Unit + plan-quality tests for the hybrid-retrieval surface
(VERDICT r11/r12 #3 — previously guarded only by the driver's oracle
hash): ``rrf_fuse`` edge cases (one-sided rankings, rank ties, k
truncation, empty sides), ``keep_best_representative`` quality-tie
determinism and singleton handling, and the ``hybrid_rrf_topk`` /
``canonical_keep_best`` physical plans (broadcast query sides, no
cartesian)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import dedup as D
from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
    retrieval as R,
)

SF = "/root/testdata/sf0.001"


def _rank_df(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, doc_id long, rank int"
    )


# ---------------------------------------------------------------------------
# rrf_fuse
# ---------------------------------------------------------------------------


def test_rrf_fuse_scores_are_exact_reciprocal_rank_sums(spark):
    lex = _rank_df(spark, [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3)])
    sem = _rank_df(spark, [("q1", 11, 1), ("q1", 13, 2)])
    got = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in R.rrf_fuse([lex, sem], c=60, k=10).collect()
    }
    # doc 11 appears in BOTH systems: 1/(60+2) + 1/(60+1)
    assert got[11][0] == round(1 / 62 + 1 / 61, 6)
    # one-sided docs contribute exactly their single system's term
    assert got[10][0] == round(1 / 61, 6)
    assert got[13][0] == round(1 / 62, 6)
    assert got[12][0] == round(1 / 63, 6)
    # the two-system doc outranks every one-sided doc
    assert got[11][1] == 1
    # equal one-sided contributions (10 from lex rank 1, 13 from sem
    # rank 2 -> different; 10 vs nothing) — full order check:
    order = [r["doc_id"] for r in R.rrf_fuse([lex, sem]).orderBy("rank").collect()]
    assert order == [11, 10, 13, 12]


def test_rrf_fuse_score_ties_break_on_ascending_doc_id(spark):
    # same rank in the same single system -> identical fused scores
    a = _rank_df(spark, [("q1", 7, 1), ("q1", 3, 2)])
    b = _rank_df(spark, [("q1", 9, 1), ("q1", 5, 2)])
    rows = R.rrf_fuse([a, b]).orderBy("rank").collect()
    # 7 and 9 tie at 1/61; 3 and 5 tie at 1/62 — id ascending within tie
    assert [(r["doc_id"], r["rank"]) for r in rows] == [
        (7, 1),
        (9, 2),
        (3, 3),
        (5, 4),
    ]


def test_rrf_fuse_k_truncates_per_query_not_globally(spark):
    lex = _rank_df(
        spark,
        [("q1", d, r + 1) for r, d in enumerate(range(100, 105))]
        + [("q2", d, r + 1) for r, d in enumerate(range(200, 205))],
    )
    out = R.rrf_fuse([lex], k=3).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert sorted(per_q["q1"]) == [1, 2, 3]
    assert sorted(per_q["q2"]) == [1, 2, 3]


def test_rrf_fuse_empty_side_and_empty_list(spark):
    lex = _rank_df(spark, [("q1", 1, 1)])
    empty = _rank_df(spark, [])
    rows = R.rrf_fuse([lex, empty]).collect()
    assert [(r["doc_id"], r["score"], r["rank"]) for r in rows] == [
        (1, round(1 / 61, 6), 1)
    ]
    # both sides empty -> empty result with the full output schema
    none = R.rrf_fuse([empty, empty])
    assert none.columns == ["query_id", "doc_id", "score", "rank"]
    assert none.count() == 0
    with pytest.raises(ValueError, match="at least one ranking"):
        R.rrf_fuse([])


def test_rrf_fuse_custom_c_and_single_system_preserves_order(spark):
    lex = _rank_df(spark, [("q1", 5, 1), ("q1", 6, 2), ("q1", 7, 3)])
    rows = R.rrf_fuse([lex], c=1).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [5, 6, 7]
    assert rows[0]["score"] == round(1 / 2, 6)
    assert rows[2]["score"] == round(1 / 4, 6)


def test_rrf_fuse_is_rank_only_score_scales_cannot_leak(spark):
    """Fusion must depend on the rank column alone — inputs with and
    without extra score columns fuse identically (the robustness
    property RRF is chosen for)."""
    lex = _rank_df(spark, [("q1", 1, 1), ("q1", 2, 2)])
    with_scores = lex.withColumn("score", F.col("doc_id") * 1e9)
    a = sorted(map(tuple, R.rrf_fuse([lex]).collect()))
    b = sorted(map(tuple, R.rrf_fuse([with_scores.select("query_id", "doc_id", "rank")]).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# keep_best_representative (the canonical_keep_best core)
# ---------------------------------------------------------------------------


def _mq(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, component long, q double")


def test_keep_best_picks_highest_quality_member(spark):
    m = _mq(
        spark,
        [(1, 1, 0.2), (2, 1, 0.9), (3, 1, 0.5), (7, 7, 0.1)],
    )
    got = {r["component"]: r for r in D.keep_best_representative(m).collect()}
    assert got[1]["kept_id"] == 2 and got[1]["kept_q"] == 0.9
    assert got[1]["n_members"] == 3
    # singleton keeps itself
    assert got[7]["kept_id"] == 7 and got[7]["n_members"] == 1


def test_keep_best_quality_ties_break_on_ascending_id(spark):
    m = _mq(spark, [(9, 1, 0.5), (4, 1, 0.5), (6, 1, 0.5)])
    (row,) = D.keep_best_representative(m).collect()
    assert row["kept_id"] == 4  # NOT partition-order-dependent
    # and the result is stable under a different physical layout
    (row2,) = D.keep_best_representative(m.repartition(7)).collect()
    assert row2["kept_id"] == 4


def test_keep_best_empty_input(spark):
    m = _mq(spark, [])
    out = D.keep_best_representative(m)
    assert out.columns == ["component", "n_members", "kept_id", "kept_q"]
    assert out.count() == 0


def test_canonical_keep_best_query_invariants(spark):
    """End-to-end invariants of the registered query at sf0.001: every
    corpus doc lands in exactly one component; each keeper has the max
    quality in its component (ties -> min id); sizes sum to the corpus."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.registry import (
        QUERIES,
    )
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.loaders import (
        load_table,
    )

    rows = QUERIES["canonical_keep_best"].fn(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_members"] for r in rows) == n_docs
    comps = [r["component"] for r in rows]
    assert len(comps) == len(set(comps))
    kept = {r["component"]: r["kept_id"] for r in rows}
    # keeper belongs to a real doc id space
    assert all(0 <= k < n_docs for k in kept.values())
    assert any(r["n_members"] > 1 for r in rows), "fixture has near-dup cliques"


# ---------------------------------------------------------------------------
# plan quality
# ---------------------------------------------------------------------------


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_rrf_fuse_plan_no_cartesian_single_agg_exchange(spark):
    lex = _rank_df(spark, [("q1", 1, 1)])
    sem = _rank_df(spark, [("q1", 2, 1)])
    plan = _plan_of(R.rrf_fuse([lex, sem]))
    assert "CartesianProduct" not in plan


def test_hybrid_rrf_topk_plan_broadcasts_small_sides_no_cartesian(spark):
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.registry import (
        QUERIES,
    )

    plan = _plan_of(QUERIES["hybrid_rrf_topk"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    # the BM25 term filter / scorer and the ANN centroid dim are
    # broadcast — corpus-sized sides never shuffle for tiny dims
    assert "BroadcastHashJoin" in plan


def test_canonical_keep_best_plan_no_cartesian(spark):
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.registry import (
        QUERIES,
    )

    plan = _plan_of(QUERIES["canonical_keep_best"].fn(spark, SF))
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# retrieval_quality_metrics vs the oracle metric tail (ADVICE r13 low):
# a query with ZERO all-terms-relevant docs, or a relevant query ABSENT
# from the ranking, must appear on BOTH sides with zero metrics — the
# old oracle tail inner-joined them away while the Spark side emitted
# them via its full_outer join.
# ---------------------------------------------------------------------------


def test_quality_metrics_zero_relevant_and_unranked_queries_match_oracle(spark):
    import duckdb

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.llm_data import (
        _IR_METRIC_TAIL,
    )

    # q1: two relevant docs, both ranked (normal metrics)
    # q2: its term matches NO doc -> zero relevant, but ranked
    # q3: one relevant doc, but q3 never ranked
    ranking = _rank_df(
        spark, [("q1", 1, 1), ("q1", 2, 2), ("q1", 9, 3), ("q2", 1, 1)]
    )
    relevance = spark.createDataFrame(
        [("q1", 1), ("q1", 2), ("q3", 3)], "query_id string, doc_id long"
    )
    got = {
        r["query_id"]: (
            r["n_relevant"], r["recall_at_k"], r["precision_at_k"],
            r["mrr"], r["ndcg_at_k"],
        )
        for r in R.retrieval_quality_metrics(ranking, relevance, k=10).collect()
    }
    assert set(got) == {"q1", "q2", "q3"}
    assert got["q2"] == (0, 0.0, 0.0, 0.0, 0.0)  # ranked, nothing relevant
    assert got["q3"] == (1, 0.0, 0.0, 0.0, 0.0)  # relevant, never ranked

    # the oracle tail on stub q/t2/rr CTEs that induce the same inputs
    oracle = duckdb.sql(
        f"""
        WITH q AS (
          SELECT * FROM (VALUES ('q1', 'apple'), ('q2', 'zzz'), ('q3', 'pear'))
          AS t(query_id, term)
        ),
        t2 AS (
          SELECT * FROM (VALUES (1, 'apple'), (2, 'apple'), (9, 'other'), (3, 'pear'))
          AS t(doc_id, tok)
        ),
        rr AS (
          SELECT * FROM (VALUES ('q1', 1, 1), ('q1', 2, 2), ('q1', 9, 3), ('q2', 1, 1))
          AS t(query_id, doc_id, rank)
        ),
        {_IR_METRIC_TAIL}
        """
    ).fetchall()
    want = {
        row[0]: (row[1], float(row[2]), float(row[3]), float(row[4]), float(row[5]))
        for row in oracle
    }
    assert want == got
