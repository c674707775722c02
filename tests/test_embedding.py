"""Unit tests for the deterministic text encoder (feature-hashed TF-IDF
signed projection, operators/embedding.py) — the contract the
ann_text_embed_topk / retrieval_quality_hybrid_textemb oracles and the
sf1 fixture generator all lean on."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
    embedding as E,
)
from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.loaders import (
    load_table,
)

SF = "/root/testdata/sf0.001"


def test_embeddings_unit_norm_fixed_dim_deterministic(spark):
    docs = load_table(spark, SF, "documents").limit(100)
    emb = E.hashed_tfidf_embed(docs, dim=64)
    rows = emb.collect()
    assert len(rows) == 100
    for r in rows:
        assert len(r["embedding"]) == 64
        nrm = math.sqrt(sum(x * x for x in r["embedding"]))
        assert nrm == 0.0 or abs(nrm - 1.0) < 1e-9
    again = {r["doc_id"]: tuple(r["embedding"]) for r in emb.collect()}
    assert again == {r["doc_id"]: tuple(r["embedding"]) for r in rows}


def test_near_duplicate_texts_embed_nearby_unrelated_far(spark):
    """The property the sf1 fixture relies on: a one-token edit moves
    the embedding barely; disjoint token streams are near-orthogonal."""
    docs = spark.createDataFrame(
        [
            (0, "spark shuffle join filter scan hash table group window sort"),
            (1, "spark shuffle join filter scan hash table group window"),
            (2, "entirely different words about cooking pasta tomato basil"),
        ],
        "doc_id long, text string",
    )
    emb = {r["doc_id"]: r["embedding"] for r in E.hashed_tfidf_embed(docs, dim=64).collect()}

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    assert cos(emb[0], emb[1]) > 0.8
    assert abs(cos(emb[0], emb[2])) < 0.3


def test_query_embedding_oov_terms_contribute_nothing(spark):
    """embed_terms under the corpus feature table: a term unseen in the
    corpus has no df/idf row and must drop out (the OOV contract); a
    query of ONLY unseen terms yields no vector at all."""
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha delta")], "doc_id long, text string"
    )
    feats = E.hashed_token_features(docs, dim=64)
    terms = spark.createDataFrame(
        [("q1", "alpha"), ("q1", "zzz_unseen"), ("q2", "zzz_unseen")],
        "query_id string, term string",
    )
    q = {r["query_id"]: r["qv"] for r in E.embed_terms(terms, feats, dim=64).collect()}
    only_alpha = spark.createDataFrame([("q1", "alpha")], "query_id string, term string")
    q_ref = {r["query_id"]: r["qv"] for r in E.embed_terms(only_alpha, feats, dim=64).collect()}
    assert q["q1"] == q_ref["q1"]  # the OOV term changed nothing
    assert "q2" not in q  # all-OOV query has no embedding


def test_query_doc_alignment(spark):
    """A query embedding built from a document's own distinct tokens
    points at that document: its cosine to the source doc exceeds its
    cosine to every other doc in the fixture sample."""
    docs = load_table(spark, SF, "documents").limit(50).cache()
    feats = E.hashed_token_features(docs, dim=64)
    demb = {r["doc_id"]: r["embedding"] for r in E.hashed_tfidf_embed(docs, dim=64).collect()}
    target = docs.where(F.col("doc_id") == 7)
    terms = target.select(
        F.lit("q").alias("query_id"),
        F.explode(F.split(F.trim("text"), " ")).alias("term"),
    ).where(F.col("term") != "")
    qv = E.embed_terms(terms, feats, dim=64).first()["qv"]

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    scores = {d: cos(qv, e) for d, e in demb.items()}
    assert max(scores, key=scores.get) == 7


def test_centering_restores_near_orthogonal_ambient_similarity(spark):
    """all-but-the-top (Mu & Viswanath 2018): on a shared-vocabulary
    corpus, raw projections make every pair look similar; centering
    must drop ambient cosine while keeping a near-duplicate pair at
    cosine ~1 — the property the sf1 fixture embeddings (and any
    cosine-thresholded component query over them) depend on."""
    docs = load_table(spark, SF, "documents").limit(200)
    near = docs.where(F.col("doc_id") == 0).select(
        F.lit(100000).cast("long").alias("doc_id"),
        F.concat_ws(" ", F.col("text"), F.element_at(F.split(F.trim("text"), " "), 1)).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(near)

    def pairwise(embdf):
        rows = {r["doc_id"]: r["embedding"] for r in embdf.collect()}
        import itertools

        def cos(a, b):
            return sum(x * y for x, y in zip(a, b))

        amb = [
            cos(rows[a], rows[b])
            for a, b in itertools.combinations(sorted(rows)[:40], 2)
            if a != 0 and b != 0
        ]
        return rows, sum(amb) / len(amb), cos(rows[0], rows[100000])

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.embedding import (
        hashed_tfidf_embed,
    )

    _, amb_raw, near_raw = pairwise(hashed_tfidf_embed(corpus, dim=64))
    _, amb_c, near_c = pairwise(hashed_tfidf_embed(corpus, dim=64, center=True))
    assert amb_raw > 0.5          # the degenerate regime centering fixes
    assert abs(amb_c) < 0.25      # ambient ~orthogonal after centering
    assert near_c > 0.9           # the near-dup pair survives centering
    assert near_raw > 0.9
