"""Semantics tests for the LLM-data operators that the oracle can't fully
check: LSH ANN recall, simhash behavior, shingles, and the upsert writer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from loan_approval_prediction_data_engineering_ml_pipeline_spark.functions import text as X
from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import dedup as D
from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import similarity as S
from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.loaders import (
    load_table,
    upsert_parquet,
)

SF = "/root/testdata/sf0.001"


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], ["text"])
    out = df.select(X.word_shingles("text", 3).alias("sh")).collect()[0]["sh"]
    assert out == ["a b c", "b c d"]


def test_minhash_deterministic(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    a = D.with_minhash(docs).select("doc_id", "sig").collect()
    b = D.with_minhash(docs).select("doc_id", "sig").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_simhash_identical_texts_hamming_zero(spark):
    df = spark.createDataFrame(
        [(1, "spark join merge sort"), (2, "spark join merge sort"), (3, "entirely different words here")],
        ["doc_id", "text"],
    )
    pairs = D.simhash_candidate_pairs(df, max_hamming=0).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]


def test_lsh_candidates_superset_of_identical_sets(spark):
    docs = load_table(spark, SF, "documents")
    cands = D.lsh_candidate_pairs(docs, k=16, bands=2)
    verified = D.verified_pairs(docs, cands, min_jaccard=1.0)
    # known from the fixture: identical-token-set pairs exist
    assert verified.count() > 0


def test_ann_lsh_recall_vs_brute_force(spark):
    emb = load_table(spark, SF, "embeddings")
    exact = {r["vec_id"] for r in S.brute_force_topk(emb, 0, 10).collect()}
    approx = {r["vec_id"] for r in S.lsh_topk(emb, 0, 10).collect()}
    assert len(approx) > 0
    # LSH trades recall for pruning; bucket of the query must contain
    # at least some true neighbors on this fixture
    assert len(exact & approx) >= 2


def test_upsert_parquet_replace_semantics(spark, tmp_path):
    path = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "a", 1), (2, "b", 1)], ["id", "val", "ver"])
    upsert_parquet(df1, path, ["id"], order_col="ver")
    df2 = spark.createDataFrame([(2, "b2", 2), (3, "c", 2)], ["id", "val", "ver"])
    upsert_parquet(df2, path, ["id"], order_col="ver")
    out = {(r["id"], r["val"]) for r in spark.read.parquet(path).collect()}
    assert out == {(1, "a"), (2, "b2"), (3, "c")}
    # idempotent reload (the reference's REPLACE INTO property, MY.ipynb:513-527)
    upsert_parquet(df2, path, ["id"], order_col="ver")
    assert spark.read.parquet(path).count() == 3


def test_quality_score_bounds(spark):
    docs = load_table(spark, SF, "documents")
    row = docs.select(
        F.min(X.quality_score("text")).alias("lo"), F.max(X.quality_score("text")).alias("hi")
    ).collect()[0]
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0


def test_lang_id_deterministic_tiebreak(spark):
    df = spark.createDataFrame([("xyz qqq zzz",)], ["text"])  # zero hits everywhere
    assert df.select(X.lang_id("text").alias("l")).collect()[0]["l"] == "en"


def test_mllib_minhash_agrees_with_expression_lsh(spark):
    docs = load_table(spark, SF, "documents")
    expr_pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_dedup(docs, k=16, bands=1, min_jaccard=1.0).collect()
    }
    mllib_pairs = {
        (r["id_a"], r["id_b"])
        for r in D.mllib_minhash_pairs(docs, max_jaccard_dist=0.0).collect()
    }
    # identical token sets collide in every hash table in both schemes
    assert mllib_pairs == expr_pairs


def test_mllib_brp_topk_overlaps_brute_force(spark):
    emb = load_table(spark, SF, "embeddings")
    exact = {r["vec_id"] for r in S.brute_force_topk(emb, 0, 10).collect()}
    approx = S.mllib_brp_topk(emb, 0, 10).collect()
    assert 0 < len(approx) <= 10
    ids = {r["vec_id"] for r in approx}
    assert len(exact & ids) >= 2
    # cosine recovered from unit-vector euclidean distance is in range
    assert all(-1.0001 <= r["cosine"] <= 1.0001 for r in approx)


def test_ivf_topk_recall_and_pruning(spark):
    emb = load_table(spark, SF, "embeddings")
    exact = {r["vec_id"] for r in S.brute_force_topk(emb, 0, 10).collect()}
    got = S.ivf_topk(emb, 0, 10, n_lists=8, n_probe=3).collect()
    assert 0 < len(got) <= 10
    ids = {r["vec_id"] for r in got}
    # probing 3/8 cells must still surface a fair share of true neighbors
    assert len(exact & ids) >= 3
    # determinism across runs (seeded kmeans)
    again = {r["vec_id"] for r in S.ivf_topk(emb, 0, 10, n_lists=8, n_probe=3).collect()}
    assert ids == again


def test_word_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",), ("",)], ["text"])
    out = [r["sh"] for r in df.select(X.word_shingles("text", 3).alias("sh")).collect()]
    assert out == [[], []]


def test_text_ratios_survive_empty_text(spark):
    df = spark.createDataFrame([("",), ("   ",), ("real text here",)], ["text"])
    rows = df.select(
        X.alpha_ratio("text").alias("a"), X.quality_score("text").alias("q")
    ).collect()
    assert rows[0]["a"] is None  # null, not DIVIDE_BY_ZERO under ANSI
    assert rows[2]["a"] is not None


def test_lsh_rejects_bad_banding(spark):
    docs = load_table(spark, SF, "documents").limit(10)
    with pytest.raises(ValueError, match="bands"):
        D.lsh_candidate_pairs(docs, k=16, bands=32)
    with pytest.raises(ValueError, match="bands"):
        D.minhash_lsh_dedup(docs, k=16, bands=3)


def test_ann_unknown_query_id_returns_empty(spark):
    emb = load_table(spark, SF, "embeddings")
    assert S.ivf_topk(emb, query_id=10**9, n_lists=4, n_probe=2).count() == 0
    assert S.brute_force_topk(emb, query_id=10**9).count() == 0


def test_upsert_schema_mismatch_raises_not_destroys(spark, tmp_path):
    import glob

    path = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "a")], ["id", "val"])
    upsert_parquet(df1, path, ["id"])
    bad = spark.createDataFrame([(3,)], ["id"])  # missing 'val'
    with pytest.raises(Exception):
        upsert_parquet(bad, path, ["id"])
    # original data intact, no staging leftovers
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == {(1, "a")}
    assert glob.glob(path + "__staging") == []


@pytest.mark.parametrize("driver_threshold", [5_000_000, 0])
def test_connected_components_chain_and_singleton(spark, driver_threshold):
    # 1-2-3-4-5 chain (diameter 4 forces multi-round propagation),
    # separate pair {10,11}, and 99 as an edge-less vertex handled by
    # the caller's left-join convention (not emitted here).
    # threshold=0 forces the distributed loop; default takes union-find.
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (4, 5), (10, 11)], ["src", "dst"]
    )
    got = {
        r["vertex"]: r["component"]
        for r in D.connected_components(
            edges, "src", "dst", driver_threshold=driver_threshold
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_connected_components_converges_one_round_on_star(spark):
    # star around 0: single round reaches the fixed point (distributed path)
    edges = spark.createDataFrame([(0, i) for i in range(1, 6)], ["src", "dst"])
    comp = D.connected_components(edges, "src", "dst", max_iter=2, driver_threshold=0)
    assert {r["component"] for r in comp.collect()} == {0}


def test_cosine_pairs_gemm_agrees_with_expression_path(spark):
    emb = load_table(spark, SF, "embeddings")
    expr = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in S.cosine_pairs(emb, threshold=0.4, block_col="label").collect()
    }
    gemm = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in S.cosine_pairs_gemm(emb, threshold=0.4, block_col="label").collect()
    }
    assert expr.keys() == gemm.keys()
    for k in expr:
        assert abs(expr[k] - gemm[k]) < 1e-9


def test_max_cosine_vs_reference_gemm_equals_expr(spark):
    """The large-eval GEMM path must flag EXACTLY the corpus vectors the
    broadcast-expression path flags, with 6-dp-identical max cosines
    (the semantic_decontaminate routing guarantee, VERDICT r7 #4)."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.functions import (
        vectors as V,
    )

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", V.as_double("embedding").alias("v")
    )
    ev = emb.where(F.col("vec_id") % 50 == 0).select(F.col("v").alias("ev"))
    corpus = emb.where(F.col("vec_id") % 50 != 0)
    out = {}
    for method in ("expr", "gemm"):
        mc = S.max_cosine_vs_reference(corpus, ev, method=method)
        out[method] = {
            r["vec_id"]: r["mc6"]
            for r in mc.where(F.round("mc", 6) >= 0.35)
            .select("vec_id", F.round("mc", 6).alias("mc6"))
            .collect()
        }
    assert out["expr"] and out["expr"].keys() == out["gemm"].keys()
    for k in out["expr"]:
        assert abs(out["expr"][k] - out["gemm"][k]) < 1e-9, k


def test_max_cosine_vs_reference_auto_picks_by_reference_size(spark):
    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", V_as_double("embedding").alias("v")
    )
    small_ref = emb.limit(3).select(F.col("v").alias("ev"))
    corpus = emb.limit(10)
    # auto with a tiny reference = expr: plan has a BroadcastNestedLoopJoin
    plan = S.max_cosine_vs_reference(
        corpus, small_ref, method="auto"
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    # forced gemm on the same inputs = mapInPandas, same values
    expr_rows = dict(
        S.max_cosine_vs_reference(corpus, small_ref, method="expr")
        .select("vec_id", F.round("mc", 6).alias("m"))
        .collect()
    )
    gemm_rows = dict(
        S.max_cosine_vs_reference(corpus, small_ref, method="gemm")
        .select("vec_id", F.round("mc", 6).alias("m"))
        .collect()
    )
    assert expr_rows == gemm_rows


def V_as_double(c):
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.functions import (
        vectors as V,
    )

    return V.as_double(c)


def test_connected_components_nonconvergence_raises(spark):
    # chain of diameter 5 cannot settle in 1 round; partial labels must
    # never be returned silently (they'd mis-cluster a dedup)
    edges = spark.createDataFrame([(i, i + 1) for i in range(6)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(edges, "src", "dst", max_iter=1, driver_threshold=0)


def test_upsert_no_order_col_incoming_batch_wins(spark, tmp_path):
    # REPLACE INTO with no version column: the incoming row must replace
    # the stored one deterministically, never survive by partition order
    path = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "old"), (2, "keep")], ["id", "val"])
    upsert_parquet(df1, path, ["id"])
    df2 = spark.createDataFrame([(1, "new")], ["id", "val"])
    upsert_parquet(df2, path, ["id"])
    out = {(r["id"], r["val"]) for r in spark.read.parquet(path).collect()}
    assert out == {(1, "new"), (2, "keep")}


def test_cosine_pairs_gemm_drops_null_blocks_like_join_path(spark):
    rows = [
        (1, [1.0, 0.0], "a"),
        (2, [1.0, 0.0], "a"),
        (3, [1.0, 0.0], None),
        (4, [1.0, 0.0], None),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    expr = {(r["id_a"], r["id_b"]) for r in S.cosine_pairs(emb, 0.9).collect()}
    gemm = {(r["id_a"], r["id_b"]) for r in S.cosine_pairs_gemm(emb, 0.9).collect()}
    # the equi-join drops NULL block keys; the groupBy path must match
    assert expr == gemm == {(1, 2)}


@pytest.mark.slow
def test_minhash_near_approximate_regime_recall_and_candidate_volume(spark):
    # the regime LSH exists for: bands=8 x rows=2, jaccard 0.8, 3-word
    # shingles. Output must equal the exact threshold self-join on the
    # same shingle sets (measured recall 1 on this corpus), and the
    # candidate volume must stay near the true-pair count — the property
    # shingling buys (ambient shingle jaccard ~0 vs ~0.6 for unigrams).
    docs = load_table(spark, SF, "documents")
    got = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_dedup(
            docs, k=16, bands=8, min_jaccard=0.8, shingle_n=3
        ).collect()
    }
    sh = docs.select(F.col("doc_id").alias("id"), D._shingle_set("text", 3).alias("s"))
    a, b = sh.alias("a"), sh.alias("b")
    j = F.round(X.jaccard(F.col("a.s"), F.col("b.s")), 6)
    truth = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), j.alias("jc"))
        .where(F.col("jc") >= 0.8)
        .collect()
    }
    assert len(truth) > 0
    assert got == truth
    n_cands = D.lsh_candidate_pairs(docs, k=16, bands=8, shingle_n=3).count()
    assert n_cands <= 5 * len(truth)


def test_cosine_pairs_gemm_tiled_identical_and_bounded(spark):
    # exact tiling: n_chunks=4 must reproduce the unblocked output
    # bit-for-bit, while every applyInPandas group (tile) receives a
    # bounded slice of the block instead of the whole block
    emb = load_table(spark, SF, "embeddings")
    base = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in S.cosine_pairs_gemm(emb, 0.4, block_col="label").collect()
    }
    tiled = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in S.cosine_pairs_gemm(emb, 0.4, block_col="label", n_chunks=4).collect()
    }
    assert base == tiled and len(base) > 0
    # tile occupancy: max rows shipped to one group ~ 2*block/chunks,
    # far below the whole block (the 100-TB memory bound)
    keyed = S._with_tile_keys(
        emb.select("vec_id", "embedding", "label"), "vec_id", 4
    )
    sizes = keyed.groupBy("label", "ca", "cb").count()
    max_tile = sizes.agg(F.max("count")).first()[0]
    block = emb.groupBy("label").count().agg(F.max("count")).first()[0]
    assert max_tile <= int(0.75 * block)


@pytest.mark.slow
def test_persisted_ann_indexes_match_inline_paths(spark, tmp_path):
    # build-once / probe-many lifecycle must return exactly what the
    # inline (fit-in-query) paths return for the same parameters
    emb = load_table(spark, SF, "embeddings")
    qv = [float(x) for x in emb.where("vec_id = 0").select("embedding").first()[0]]

    ivf = str(tmp_path / "ivf")
    S.build_ivf_index(emb, ivf, n_lists=8, seed=42)
    got = [(r["vec_id"], r["cosine"]) for r in S.ivf_query(spark, ivf, qv, k=10, n_probe=3, exclude_id=0).collect()]
    ref = [(r["vec_id"], r["cosine"]) for r in S.ivf_topk(emb, 0, 10, n_lists=8, n_probe=3).collect()]
    assert got == ref and len(got) > 0

    lsh = str(tmp_path / "lsh")
    S.build_lsh_index(emb, lsh, n_planes=4, n_tables=4)
    got2 = [(r["vec_id"], r["cosine"]) for r in S.lsh_index_query(spark, lsh, qv, k=10, exclude_id=0).collect()]
    ref2 = [(r["vec_id"], r["cosine"]) for r in S.lsh_topk(emb, 0, 10).collect()]
    assert got2 == ref2 and len(got2) > 0


def test_lsh_signature_cache_handle(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    with D.LshSignatureCache() as cache:
        out1 = D.minhash_lsh_dedup(docs, k=16, bands=1, cache=cache)
        n1 = out1.count()
        # a second, differently-parameterized call evicts the first table
        out2 = D.minhash_lsh_dedup(docs, k=16, bands=2, cache=cache)
        assert out2.count() >= n1  # narrower bands only add candidates
        assert cache._current is not None
    assert cache._current is None  # context exit unpersisted


def test_chunk_documents_reconstruction_and_overlap(spark):
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.chunking import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(150))),  # 3 chunks
         (1, " ".join(f"s{i}" for i in range(10)))],  # shorter than one chunk
        ["doc_id", "text"],
    )
    out = chunk_documents(docs, chunk_tokens=64, overlap=8)
    rows = {r["doc_id"]: [] for r in out.collect()}
    for r in sorted(out.collect(), key=lambda r: (r["doc_id"], r["chunk_id"])):
        rows[r["doc_id"]].append(r)
    # doc 0: stride 56 -> chunks at 0,56,112; lens 64,64,38
    assert [r["chunk_len"] for r in rows[0]] == [64, 64, 38]
    c0, c1 = rows[0][0]["chunk_text"].split(" "), rows[0][1]["chunk_text"].split(" ")
    assert c0[-8:] == c1[:8]  # overlap region shared
    # stitching chunk cores reconstructs the document exactly
    stitched = c0 + c1[8:] + rows[0][2]["chunk_text"].split(" ")[8:]
    assert stitched == [f"t{i}" for i in range(150)]
    # short doc: one chunk, full text
    assert len(rows[1]) == 1 and rows[1][0]["chunk_len"] == 10


def test_pack_documents_budget_and_determinism(spark):
    from pyspark.sql import functions as F
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.chunking import (
        pack_documents,
    )

    docs = load_table(spark, SF, "documents")
    packed = pack_documents(docs, group_col="lang", budget=512)
    # per-bin totals exceed the budget by at most one document's tokens
    # (offset packing): total - last_doc < budget for every bin
    per_bin = (
        packed.groupBy("lang", "bin")
        .agg(F.sum("n_tokens").alias("total"), F.max("n_tokens").alias("mx"))
    )
    bad = per_bin.where(F.col("total") - F.col("mx") >= 512).count()
    assert bad == 0
    # deterministic under repartitioning
    a = {(r["lang"], r["doc_id"], r["bin"]) for r in packed.collect()}
    b = {
        (r["lang"], r["doc_id"], r["bin"])
        for r in pack_documents(docs.repartition(7), group_col="lang", budget=512).collect()
    }
    assert a == b


def test_cosine_pairs_gemm_adaptive_tiling(spark):
    emb = load_table(spark, SF, "embeddings")
    fixed = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in S.cosine_pairs_gemm(emb, 0.4, block_col="label", n_chunks=4).collect()
    }
    adaptive = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in S.cosine_pairs_gemm(emb, 0.4, block_col="label", n_chunks=None).collect()
    }
    assert adaptive == fixed and len(adaptive) > 0
    # a tiny tile_target must force multi-chunk tiling yet keep output exact
    tiled = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in S.cosine_pairs_gemm(
            emb, 0.4, block_col="label", n_chunks=None, tile_target=8
        ).collect()
    }
    assert tiled == fixed


@pytest.mark.slow
def test_pq_index_and_rerank_pipeline(spark, tmp_path):
    """Product quantization (ann_pq): (a) the codegen ADC aggregate must
    equal a from-scratch Python recomputation over the stored codebooks
    and codes — the literal-table expression is exact given the index;
    (b) the shortlist->exact-rerank pipeline must recover most of the
    true top-10 (measured 0.8-0.9 here; pinned >= 0.6 to survive fixture
    regeneration); (c) the ADC scan plan is map-only: no Exchange,
    TakeOrderedAndProject top-k; (d) rerank cosines are EXACT for every
    hit that brute force also returns."""
    import math

    emb = load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "pq")
    S.build_pq_index(emb, idx, m=8, k=16, seed=42)
    qrow = emb.where(F.col("vec_id") == 0).first()
    qv = [float(x) for x in qrow["embedding"]]

    # (a) expression path == Python ADC recomputation
    pq = S.pq_query(spark, idx, qv, 5, exclude_id=0)
    plan = pq._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "TakeOrderedAndProject" in plan  # (c)
    books = {
        (r["subspace"], r["code"]): r["centroid"]
        for r in spark.read.parquet(idx + "/codebooks").collect()
    }
    codes = {r["vec_id"]: r["codes"] for r in spark.read.parquet(idx + "/codes").collect()}
    qn = math.sqrt(sum(x * x for x in qv))
    q = [x / qn for x in qv]
    for r in pq.collect():
        expect = sum(
            sum(q[j * 8 + i] * books[(j, c)][i] for i in range(8))
            for j, c in enumerate(codes[r["vec_id"]])
        )
        assert abs(r["pq_score"] - round(expect, 6)) <= 1e-6, r

    # (b)+(d) rerank pipeline recall + exactness
    got = {r["vec_id"]: r["cosine"] for r in
           S.pq_query_rerank(spark, idx, emb, qv, 10, shortlist=100, exclude_id=0).collect()}
    exact = {r["vec_id"]: r["cosine"] for r in S.brute_force_topk(emb, 0, 10).collect()}
    hits = set(got) & set(exact)
    assert len(hits) / 10 >= 0.6, (sorted(got), sorted(exact))
    for vid in hits:
        assert abs(got[vid] - exact[vid]) <= 1e-6

    # the encoded corpus is m one-byte-range ints per vector
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in codes.values())

    # (e) VERDICT r3 #8: the codebook is memoized per (session, path) —
    # a second probe must run NO parquet job against /codebooks (the
    # probe path is the hot one). Assert by poisoning the reader.
    from unittest import mock

    real_parquet = type(spark.read).parquet

    def guarded(reader, *paths):
        assert not any(p.endswith("/codebooks") for p in paths), (
            "second pq_query probe re-read the codebook parquet"
        )
        return real_parquet(reader, *paths)

    with mock.patch.object(type(spark.read), "parquet", guarded):
        again = S.pq_query(spark, idx, qv, 5, exclude_id=0).collect()
    assert [r["vec_id"] for r in again] == [r["vec_id"] for r in pq.collect()]

    # a rebuild invalidates the memo: after build_pq_index the next probe
    # re-reads the (new) codebook rather than serving stale centroids
    S.build_pq_index(emb, idx, m=8, k=16, seed=42)
    assert all(key[1] != idx for key in S._CODEBOOK_CACHE)


def test_export_training_shards_deterministic_and_complete(spark, tmp_path):
    """Shard export: every doc lands in exactly one shard, within-shard
    order is the salted-hash shuffle (reproducible), and a second export
    from a DIFFERENTLY-partitioned input produces byte-identical shard
    files — the retry/reshuffle-stability a 100 TB export needs."""
    import glob
    import hashlib

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.chunking import (
        export_training_shards,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    export_training_shards(docs, p1, 4)
    export_training_shards(docs.repartition(13), p2, 4)

    def digest(root):
        out = {}
        for f in sorted(glob.glob(f"{root}/shard=*/*.parquet")):
            rel = f.split(root)[1]
            out[rel.rsplit("/", 1)[0]] = hashlib.md5(open(f, "rb").read()).hexdigest()
        return out

    d1, d2 = digest(p1), digest(p2)
    assert set(d1) == {f"/shard={i}" for i in range(4)}
    assert d1 == d2  # byte-identical under input repartitioning

    back = spark.read.parquet(p1)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()


def test_ivf_upsert_incremental_index_maintenance(spark, tmp_path):
    """ivf_upsert folds new vectors into a built index: nearest-centroid
    assignment (no refit), per-id REPLACE of only the touched cells
    committed as a manifest overlay — the FLAT build dirs are never
    touched at all (cold cells carry into the manifest by reference),
    probes see the new vector immediately, and re-upserting an existing
    id replaces instead of duplicating."""
    import glob
    import hashlib
    import os

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.index_commit import (
        read_index_manifest,
    )

    emb = load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx, n_lists=8)

    def flat_digests():
        out = {}
        for f in glob.glob(f"{idx}/cells/cell=*/*.parquet"):
            cell = os.path.basename(os.path.dirname(f))
            out.setdefault(cell, []).append(
                hashlib.md5(open(f, "rb").read()).hexdigest()
            )
        return {c: sorted(v) for c, v in out.items()}

    before = flat_digests()
    n_before = S._ivf_cells(spark, idx).count()
    assert read_index_manifest(idx) is None  # fresh build = flat layout

    # new vector = clone of vec 7 with a fresh id: lands in 7's cell,
    # and a probe AT vec 7 must now return it with cosine ~1
    probe_vec = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]
    new = spark.createDataFrame([(90001, probe_vec)], "vec_id long, embedding array<double>")
    touched = S.ivf_upsert(spark, idx, new)
    assert touched == 1

    # snapshot-atomic overlay: flat build files ALL byte-identical (the
    # hot cell was rewritten into objects/, not in place), manifest v1
    # points exactly one cell into objects/ and the rest at the flat dirs
    assert flat_digests() == before
    m = read_index_manifest(idx)
    assert m["version"] == 1
    hot = [c for c, rel in m["cells"].items() if rel.startswith("objects/")]
    assert len(hot) == 1
    assert all(
        rel.startswith("cells/") for c, rel in m["cells"].items() if c not in hot
    )
    assert S._ivf_cells(spark, idx).count() == n_before + 1

    hits = S.ivf_query(spark, idx, probe_vec, k=3, exclude_id=7).collect()
    assert hits[0]["vec_id"] == 90001 and hits[0]["cosine"] >= 0.999999

    # replace semantics: same id again -> no duplicate row, next version
    S.ivf_upsert(spark, idx, new)
    assert read_index_manifest(idx)["version"] == 2
    assert S._ivf_cells(spark, idx).count() == n_before + 1


def test_bloom_prefiltered_dedup_matches_exact_operator(spark):
    """The Bloom fast path must be a pure optimization: identical output
    to incremental_exact_dedup at any false-positive rate — misses are
    definitely new (no false negatives), maybes are exactly verified.
    Checked at a tight fpp AND a deliberately terrible one (fpp=0.9,
    nearly everything flagged maybe) so the exact-verification branch is
    exercised, not just the skip branch."""
    docs = load_table(spark, SF, "documents")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    idx = corpus.select(X.fingerprint_md5(F.col("text")).alias("fingerprint"))
    batch = docs.where(F.col("doc_id") % 2 == 1).unionByName(corpus.limit(7))

    exact = sorted(map(tuple, D.incremental_exact_dedup(batch, idx).collect()))
    for fpp in (0.01, 0.9):
        got = sorted(
            map(tuple, D.bloom_prefiltered_dedup(batch, idx, fpp=fpp).collect())
        )
        assert got == exact, f"fpp={fpp}"
    statuses = {s for _, s, _ in exact}
    assert statuses == {"new", "dup_corpus"}


def test_phrase_merges_sampled_path_and_apply_once(spark):
    """The 100 TB phrase recipe (VERDICT r4 #4): merges learned on a
    deterministic content sample match the exact top ranks on the
    fixture, apply_phrase_merges' single-projection apply equals the
    iterative loop's final text, and the checkpoint cadence is
    output-invariant."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.phrases import (
        apply_phrase_merges,
        learn_phrase_merges,
    )

    docs = load_table(spark, SF, "documents")
    exact = learn_phrase_merges(docs, m=4)
    assert len(exact) == 4

    # near-total sample: ranking must agree with exact (counts are
    # sample counts and may differ by the handful of excluded docs)
    sampled = learn_phrase_merges(docs, m=4, sample_rate=0.999999)
    assert [(r, w1, w2) for r, w1, w2, _ in sampled] == [
        (r, w1, w2) for r, w1, w2, _ in exact
    ]
    # a real sample picks a NEAR-MAXIMAL pair: the fixture's pair
    # distribution is almost flat (45, 44, 44, …), so the sampled argmax
    # legitimately lands anywhere in the tie band — the estimator
    # guarantee is that its pick's exact count is close to the exact max,
    # not that it resolves ties the same way
    half = learn_phrase_merges(docs, m=1, sample_rate=0.5)
    counts = {
        (r["w1"], r["w2"]): r["count"]
        for r in (
            docs.select(F.split(F.trim("text"), " ").alias("__toks"))
            .where(F.size("__toks") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(__toks)-2),"
                        " i -> struct(__toks[i] AS w1, __toks[i+1] AS w2))"
                    )
                ).alias("p")
            )
            .groupBy("p.w1", "p.w2")
            .count()
            .collect()
        )
    }
    exact_max = max(counts.values())
    assert counts[(half[0][1], half[0][2])] >= 0.8 * exact_max

    # checkpoint cadence: identical merges, just bounded lineage
    ckpt = learn_phrase_merges(docs, m=4, checkpoint_every=2)
    assert ckpt == exact

    # apply-once == iterative application round by round
    applied = apply_phrase_merges(docs, exact)
    iterative = docs.select(
        "doc_id", F.concat(F.lit(" "), F.trim("text"), F.lit(" ")).alias("w")
    )
    for _, w1, w2, _ in exact:
        iterative = iterative.select(
            "doc_id",
            F.replace(
                F.col("w"), F.lit(f" {w1} {w2} "), F.lit(f" {w1}@@{w2} ")
            ).alias("w"),
        )
    left = {r["doc_id"]: r["text_merged"] for r in applied.select("doc_id", "text_merged").collect()}
    right = {r["doc_id"]: r["w"].strip() for r in iterative.collect()}
    assert left == right
    assert any("@@" in v for v in left.values())


@pytest.mark.slow
def test_prefix_filtered_oracle_equals_all_pairs_truth_set():
    """The dedup_minhash_near ground-truth oracle uses prefix-filtered
    candidate generation (PPJoin-style) so it stays feasible at sf1 —
    an EXACT optimization, not an approximation. Prove it: on sf0.01
    the prefix-filtered oracle's (id_a, id_b, jaccard) set must equal
    the naive all-pairs threshold self-join, pair for pair."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.llm_data import _J3, _SHINGLES3
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.registry import QUERIES

    from .oracle_utils import duckdb_run

    sf_dir = "/root/testdata/sf0.01"
    fast = duckdb_run(QUERIES["dedup_minhash_near"].oracle, sf_dir)
    naive = duckdb_run(
        f"""
        WITH sh AS MATERIALIZED (SELECT doc_id, {_SHINGLES3} AS s FROM documents)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, {_J3} AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE {_J3} >= 0.8
        ORDER BY id_a, id_b
        """,
        sf_dir,
    )
    assert len(fast) > 0
    assert list(map(tuple, fast.itertuples(index=False))) == list(
        map(tuple, naive.itertuples(index=False))
    )


def test_prefix_filtered_jaccard_join_equals_brute_force(spark):
    """prefix_filtered_jaccard_join is exact at thresholds the shared
    oracle never exercises: at t=0.6 / 2-shingles the output must equal
    a brute-force all-pairs cross-join verify, pair for pair."""
    docs = load_table(spark, SF, "documents").limit(120)
    got = sorted(
        map(
            tuple,
            D.prefix_filtered_jaccard_join(
                docs, min_jaccard=0.6, shingle_n=2
            ).collect(),
        )
    )
    sh = docs.select(
        F.col("doc_id").alias("id"),
        F.array_sort(X.word_shingles("text", 2)).alias("toks"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    j = X.jaccard(F.col("a.toks"), F.col("b.toks"))
    want = sorted(
        map(
            tuple,
            a.crossJoin(b)
            .where(F.col("a.id") < F.col("b.id"))
            .where(F.round(j, 6) >= 0.6)
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.round(j, 6).alias("jaccard"),
            )
            .collect(),
        )
    )
    assert len(want) > 0
    assert got == want


@pytest.mark.slow
def test_ivfpq_full_probe_equals_flat_pq(spark, tmp_path):
    """Cell pruning is the ONLY approximation IVF-PQ adds on top of
    flat PQ: with n_probe = n_lists (probe everything) the composite
    must reproduce pq_query_rerank exactly — same codebook fit recipe,
    same ADC table, same shortlist ties, same rerank. Also pins the
    recall contract at n_probe=3: the true top-1 neighbor survives."""
    emb = load_table(spark, SF, "embeddings")
    qv = [float(x) for x in emb.where("vec_id = 0").select("embedding").first()[0]]

    pq = str(tmp_path / "pq")
    S.build_pq_index(emb, pq, m=8, k=16, seed=42)
    flat = S.pq_query_rerank(spark, pq, emb, qv, 10, shortlist=50, exclude_id=0).collect()

    ivfpq = str(tmp_path / "ivfpq")
    S.build_ivfpq_index(emb, ivfpq, n_lists=4, m=8, k=16, seed=42)
    full = S.ivfpq_query_rerank(
        spark, ivfpq, emb, qv, 10, n_probe=4, shortlist=50, exclude_id=0
    ).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in flat]

    # pruned probe: exact-within-probed-cells semantics mean recall can
    # only drop via cell misses; a fair share of true neighbors must
    # still surface, deterministically (seeded fits, tie-broken probe)
    pruned = S.ivfpq_query_rerank(
        spark, ivfpq, emb, qv, 10, n_probe=2, shortlist=50, exclude_id=0
    ).collect()
    exact = {r["vec_id"] for r in S.brute_force_topk(emb, 0, 10).collect()}
    assert len(exact & {r["vec_id"] for r in pruned}) >= 3
    again = S.ivfpq_query_rerank(
        spark, ivfpq, emb, qv, 10, n_probe=2, shortlist=50, exclude_id=0
    ).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in pruned]


def test_retired_k16_sweep_point_keeps_local_coverage(spark):
    """VERDICT r16 #4: the superseded sweep registry rows (k=16 IVF-PQ,
    k=64, residual-k=16, ivf32) were retired from the bench/parity
    registry — their grids are recorded in BASELINE.md/SCALE.md and the
    sweep MACHINERY stays registry-covered by the k=256 and clustered
    rows. This test keeps the retired k=16 point itself regressable at
    the local tier: the one-pass grid over the committed ivfpq8x8x16
    fixture must still show the r15-measured shape — deep shortlist at
    full probe reaches >=0.9 recall, the shortlist-100 cut cannot beat
    it (the ADC-resolution ceiling that motivated the shipped k=256
    recipe), and recall is monotone in n_probe."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.llm_data import (
        _ensure_ivfpq,
        _ivfpq_sweep,
    )

    idx = _ensure_ivfpq(spark, SF)
    sw = {
        (r["n_probe"], r["shortlist"]): r["recall_at_10"]
        for r in _ivfpq_sweep(spark, SF, idx).collect()
    }
    assert sw[(8, 500)] >= 0.9
    assert sw[(8, 100)] <= sw[(8, 500)]
    assert sw[(1, 500)] <= sw[(4, 500)] <= sw[(8, 500)]


def test_ivf_batch_topk_one_row_equals_single_probe(spark, tmp_path):
    """A 1-row batch through ivf_batch_topk must reproduce ivf_query
    exactly (same L2 metric, same cell tie-break, same top-k order) —
    the fused plan adds distribution, not different semantics."""
    emb = load_table(spark, SF, "embeddings")
    qv = [float(x) for x in emb.where("vec_id = 0").select("embedding").first()[0]]
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx, n_lists=8, seed=42)

    single = [
        (r["vec_id"], r["cosine"])
        for r in S.ivf_query(spark, idx, qv, k=10, n_probe=3, exclude_id=0).collect()
    ]
    batch = [
        (r["vec_id"], r["cosine"])
        for r in S.ivf_batch_topk(
            spark, idx, emb.where("vec_id = 0"), k=10, n_probe=3
        ).collect()
    ]
    assert batch == single
    assert len(single) == 10


def test_ivf_batch_topk_salted_equals_unsalted_on_hot_cell(spark, tmp_path):
    """The skew knob (r6): an adversarial probe distribution — every
    query carries the SAME vector, so all probes hammer one cell's
    reducer — must produce IDENTICAL results under probe-side salting
    (salting only re-buckets the shuffle join; xxhash64-deterministic,
    so replays compare equal too)."""
    emb = load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(emb, idx, n_lists=8, seed=42)
    q0 = [float(x) for x in emb.where("vec_id = 0").select("embedding").first()[0]]
    from pyspark.sql import functions as F

    hot = emb.where("vec_id < 64").select(
        "vec_id", F.array(*[F.lit(x) for x in q0]).alias("embedding")
    )
    plain = [
        tuple(r)
        for r in S.ivf_batch_topk(spark, idx, hot, k=5, n_probe=2).collect()
    ]
    salted = [
        tuple(r)
        for r in S.ivf_batch_topk(spark, idx, hot, k=5, n_probe=2, salt=8).collect()
    ]
    assert salted == plain
    assert len(plain) == 64 * 5
    # and the salted 1-row batch still reproduces the single-probe path
    single = [
        (r["vec_id"], r["cosine"])
        for r in S.ivf_query(spark, idx, q0, k=5, n_probe=2, exclude_id=0).collect()
    ]
    one = [
        (r["vec_id"], r["cosine"])
        for r in S.ivf_batch_topk(
            spark, idx, emb.where("vec_id = 0"), k=5, n_probe=2, salt=4
        ).collect()
    ]
    assert one == single


def test_max_cosine_zero_norm_corpus_rows_null_on_both_paths(spark):
    """A zero-norm corpus vector has no defined cosine. The expr path
    yields NULL (max over NULL cosines); the gemm path must yield NULL
    too — NOT NaN, which Spark SQL orders ABOVE every value and which
    would therefore PASS a >= threshold contamination filter the expr
    path fails (ADVICE r8)."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.6, 0.8])],
        "vec_id long, v array<double>",
    )
    ref = spark.createDataFrame([([1.0, 0.0],)], "ev array<double>")
    for method in ("expr", "gemm"):
        rows = {
            r["vec_id"]: r["mc"]
            for r in S.max_cosine_vs_reference(corpus, ref, method=method).collect()
        }
        assert rows[2] is None, (method, rows)
        assert abs(rows[1] - 1.0) < 1e-9
        # the downstream decontamination predicate must NOT flag it
        flagged = {
            r["vec_id"]
            for r in S.max_cosine_vs_reference(corpus, ref, method=method)
            .where(F.round("mc", 6) >= 0.35)
            .collect()
        }
        assert flagged == {1, 3}, (method, flagged)  # 2 (zero-norm) excluded


def test_ivf_upsert_publish_is_snapshot_atomic(spark, tmp_path, monkeypatch):
    """VERDICT r9 #2, ANN half: (a) a crash AFTER the object write but
    BEFORE the manifest commit leaves the index exactly at the previous
    snapshot; (b) a probe resolved before the upsert keeps ranking
    against its snapshot (immutable dirs); (c) a lost manifest race is
    a CommitConflict with the committed manifest untouched."""
    import pytest

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
        index_commit as IC,
    )
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
        similarity as SIM,
    )
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
        CommitConflict,
    )

    emb = load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "ivf_atomic")
    SIM.build_ivf_index(emb, idx, n_lists=8)
    probe_vec = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]
    before = sorted(
        map(tuple, SIM.ivf_query(spark, idx, probe_vec, k=5, exclude_id=7).collect())
    )
    stale_probe = SIM.ivf_query(spark, idx, probe_vec, k=5, exclude_id=7)

    new = spark.createDataFrame(
        [(90001, probe_vec)], "vec_id long, embedding array<double>"
    )
    real_commit = SIM.commit_index_manifest

    def boom(path, version, doc):
        raise RuntimeError("injected crash before manifest commit")

    monkeypatch.setattr(SIM, "commit_index_manifest", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        SIM.ivf_upsert(spark, idx, new)
    monkeypatch.setattr(SIM, "commit_index_manifest", real_commit)

    # (a) nothing visible changed
    assert IC.read_index_manifest(idx) is None
    mid = sorted(
        map(tuple, SIM.ivf_query(spark, idx, probe_vec, k=5, exclude_id=7).collect())
    )
    assert mid == before, "torn state visible after crashed ivf upsert"

    SIM.ivf_upsert(spark, idx, new)
    assert IC.read_index_manifest(idx)["version"] == 1
    now = SIM.ivf_query(spark, idx, probe_vec, k=5, exclude_id=7).collect()
    assert now[0]["vec_id"] == 90001
    # (b) the pre-upsert probe still ranks against the flat snapshot
    assert sorted(map(tuple, stale_probe.collect())) == before

    # (c) lost race
    with pytest.raises(CommitConflict):
        IC.commit_index_manifest(idx, 1, {"centroids": "x", "cells": {}})
    assert IC.read_index_manifest(idx)["version"] == 1
    assert IC.read_index_manifest(idx)["centroids"] != "x"

    # vacuum reclaims the crash orphan, keeps everything referenced
    removed = IC.vacuum_index(idx, keep_last=1, grace_seconds=0.0)
    assert removed >= 1
    again = SIM.ivf_query(spark, idx, probe_vec, k=5, exclude_id=7).collect()
    assert again[0]["vec_id"] == 90001


def test_ivf_rebuild_after_upsert_commits_manifest(spark, tmp_path):
    """VERDICT r12 #1 (the torn-rebuild fix): probes resolve the index
    manifest-first, so a rebuild at a path that has been upserted must
    COMMIT the next-version manifest referencing the fresh build —
    previously it rewrote only the flat layout and probes stayed pinned
    to the stale manifest (flat entries -> rebuilt data, objects/
    entries -> pre-rebuild data)."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
        index_commit as IC,
    )
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
        similarity as SIM,
    )

    emb = load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "ivf_rebuild")
    SIM.build_ivf_index(emb, idx, n_lists=8)
    probe_vec = [
        float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]
    ]
    new = spark.createDataFrame(
        [(90001, probe_vec)], "vec_id long, embedding array<double>"
    )
    SIM.ivf_upsert(spark, idx, new)
    assert IC.read_index_manifest(idx)["version"] == 1
    got = SIM.ivf_query(spark, idx, probe_vec, k=5, exclude_id=7).collect()
    assert got[0]["vec_id"] == 90001  # the upsert is visible

    # a probe resolved against the upserted snapshot, held across the
    # rebuild: its dirs are immutable, it must keep ranking against v1
    stale_probe = SIM.ivf_query(spark, idx, probe_vec, k=5, exclude_id=7)

    # rebuild WITHOUT the upserted vector (a refit over the base corpus)
    SIM.build_ivf_index(emb, idx, n_lists=8)
    man = IC.read_index_manifest(idx)
    assert man["version"] == 2, "rebuild must commit the next manifest"
    assert all(rel.startswith("objects/") for rel in man["cells"].values()), (
        "a rebuild at a manifested path writes an immutable object dir, "
        "never the flat layout old snapshots still reference"
    )
    after = SIM.ivf_query(spark, idx, probe_vec, k=5, exclude_id=7).collect()
    assert all(r["vec_id"] != 90001 for r in after), (
        "probe still sees pre-rebuild data: the rebuild manifest "
        "was not committed (the r12 torn-rebuild bug)"
    )
    # full isolation: the v1-pinned probe still sees the upserted vector
    assert stale_probe.collect()[0]["vec_id"] == 90001

    # and the rolled-off v1 objects reclaim by reference once quiesced
    removed = IC.vacuum_index(idx, keep_last=1, grace_seconds=0.0)
    assert removed >= 1
    again = SIM.ivf_query(spark, idx, probe_vec, k=5, exclude_id=7).collect()
    assert [r["vec_id"] for r in again] == [r["vec_id"] for r in after]


def test_vacuum_grace_window_protects_inflight_writer(spark, tmp_path, monkeypatch):
    """VERDICT r12 #2: a vacuum racing an in-flight upsert (object dir
    written, manifest not yet committed) must NOT reclaim the writer's
    uncommitted dir — the retention grace window treats young
    unreferenced dirs as live writes. The interleaving is forced by
    running the vacuum inside the writer's commit hook; the writer then
    commits and the index is consistent. With the window disabled the
    same dir IS a reclaim candidate (the quiesced-maintenance mode)."""
    import os

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
        index_commit as IC,
    )
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
        similarity as SIM,
    )

    emb = load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "ivf_vacuum_race")
    SIM.build_ivf_index(emb, idx, n_lists=8)
    probe_vec = [
        float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]
    ]
    # first upsert: creates manifest v1 (vacuum needs >=1 version to walk)
    SIM.ivf_upsert(
        spark,
        idx,
        spark.createDataFrame(
            [(90001, probe_vec)], "vec_id long, embedding array<double>"
        ),
    )

    real_commit = SIM.commit_index_manifest
    raced = {}

    def vacuum_then_commit(path, version, doc):
        # the maintenance vacuum fires BETWEEN the second writer's
        # object write and its manifest commit
        raced["removed"] = IC.vacuum_index(path, keep_last=1)
        return real_commit(path, version, doc)

    monkeypatch.setattr(SIM, "commit_index_manifest", vacuum_then_commit)
    SIM.ivf_upsert(
        spark,
        idx,
        spark.createDataFrame(
            [(90002, probe_vec)], "vec_id long, embedding array<double>"
        ),
    )
    monkeypatch.setattr(SIM, "commit_index_manifest", real_commit)
    assert raced["removed"] == 0, (
        "vacuum reclaimed the in-flight writer's uncommitted object dir"
    )
    assert IC.read_index_manifest(idx)["version"] == 2
    got = SIM.ivf_query(spark, idx, probe_vec, k=5, exclude_id=7).collect()
    assert got[0]["vec_id"] in (90001, 90002)  # index consistent post-race

    # quiesced mode: a true crash orphan reclaims once the window is off
    orphan = os.path.join(idx, "objects", "deadbeef0000")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0"), "w") as fh:
        fh.write("x")
    assert IC.vacuum_index(idx, keep_last=1) == 0  # still inside grace
    assert IC.vacuum_index(idx, keep_last=1, grace_seconds=0.0) >= 1
    assert not os.path.exists(orphan)


def test_ann_recall_sweep_identity_matches_actually_run_probes(spark):
    """The sweep derives recall@10 for EVERY n_probe from one pass via
    the probed-cell dominance identity (a ground-truth neighbor is in
    the probe's top-10 iff its cell is probed). Pin the identity
    against ground truth: for each n_probe, ACTUALLY run the batch
    probe and measure recall directly — the sweep row must agree
    exactly."""
    from pyspark.sql import Window

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.functions import (
        vectors as V,
    )
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.llm_data import (
        _ensure_ivf8,
    )
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.registry import (
        QUERIES,
    )

    sweep = {
        int(r["n_probe"]): float(r["recall_at_10"])
        for r in QUERIES["ann_recall_sweep"].fn(spark, SF).collect()
    }
    idx = _ensure_ivf8(spark, SF)
    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") < 3)
    qv = q.select(F.col("vec_id").alias("query_id"), V.as_double("embedding").alias("qv"))
    corpus = emb.select("vec_id", V.as_double("embedding").alias("v"))
    cos = F.round(V.cosine(F.col("v"), F.col("qv")), 6)
    truth = {
        (r["query_id"], r["vec_id"])
        for r in (
            corpus.join(F.broadcast(qv))
            .where(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id", cos.alias("cosine"))
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.desc("cosine"), F.asc("vec_id")
                    )
                ),
            )
            .where(F.col("rk") <= 10)
            .collect()
        )
    }
    for p in sorted(sweep):
        got = {
            (r["query_id"], r["vec_id"])
            for r in S.ivf_batch_topk(spark, idx, q, k=10, n_probe=p).collect()
        }
        measured = round(len(got & truth) / 30.0, 6)
        assert measured == round(sweep[p], 6), (p, measured, sweep[p])
    # monotone non-decreasing, exhaustive probe is exact
    vals = [sweep[p] for p in sorted(sweep)]
    assert vals == sorted(vals) and vals[-1] == 1.0
