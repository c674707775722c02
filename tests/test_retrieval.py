"""BM25 retrieval: exact scores vs a hand-rolled reference, tie
determinism, top-k truncation, and plan shape (broadcast, no Python)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.retrieval import (
    bm25_topk,
)


def _bm25_ref(corpus: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    """Driver-side reference implementation (plain Python)."""
    toks = {d: [t for t in txt.split() if t] for d, txt in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in terms:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, v in toks.items():
            tf = v.count(term)
            if tf:
                s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
                scores[d] = scores.get(d, 0.0) + s
    return {d: round(s, 6) for d, s in scores.items()}


def test_bm25_matches_reference_formula(spark):
    corpus = {
        1: "spark shuffle join join join",
        2: "spark join",
        3: "filter scan filter scan filter scan filter scan",
        4: "join shuffle spark scan spark spark",
    }
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    q = spark.createDataFrame(
        [("a", "join"), ("a", "scan")], "query_id string, term string"
    )
    got = {r["doc_id"]: r["score"] for r in bm25_topk(docs, q, k=10).collect()}
    assert got == _bm25_ref(corpus, ["join", "scan"])


def test_bm25_rank_order_and_tf_length_tradeoff(spark):
    # hand-computed (k1=1.2, b=0.75, avgdl=4): doc2 tf=2 dl=2 -> 1.600,
    # doc3 tf=1 dl=2 -> 1.257, doc1 tf=2 dl=8 -> 1.073 — the short tf=1
    # doc outranks the 4x-longer tf=2 doc (length normalization working)
    docs = spark.createDataFrame(
        [
            (1, "java java pad pad pad pad pad pad"),
            (2, "java java"),
            (3, "java pad"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([("q", "java")], "query_id string, term string")
    ranked = [r["doc_id"] for r in bm25_topk(docs, q).orderBy("rank").collect()]
    assert ranked == [2, 3, 1]


def test_bm25_ties_break_on_doc_id_and_k_truncates(spark):
    docs = spark.createDataFrame(
        [(i, "same text here") for i in (5, 3, 9, 1)], "doc_id long, text string"
    )
    q = spark.createDataFrame([("q", "same")], "query_id string, term string")
    out = bm25_topk(docs, q, k=3).orderBy("rank").collect()
    assert [r["doc_id"] for r in out] == [1, 3, 5]  # identical scores -> id order
    assert len({r["score"] for r in out}) == 1


def test_bm25_unmatched_query_returns_nothing_and_multi_query_isolated(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    q = spark.createDataFrame(
        [("hit", "beta"), ("miss", "zzz")], "query_id string, term string"
    )
    out = bm25_topk(docs, q).collect()
    assert {r["query_id"] for r in out} == {"hit"}
    assert len(out) == 2


def test_bm25_plan_broadcasts_terms_and_has_no_python(spark):
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 7).cast("string"), F.lit(" filler")).alias(
            "text"
        ),
    )
    q = spark.createDataFrame([("q", "tok3")], "query_id string, term string")
    plan = bm25_topk(docs, q)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # built-ins only
    # the corpus-side token filter must be a broadcast join, never a
    # shuffled join on the full token stream
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_bm25_indexed_equals_direct_and_pushes_term_filter(spark, tmp_path):
    """The persisted posting-list path must return the direct path's
    exact rows, and its probe must push the term filter into the
    parquet scan (PushedFilters) — the corpus text is never re-read."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.retrieval import (
        build_bm25_index,
        bm25_topk_indexed,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha tok{i % 11} beta gamma tok{i % 7}") for i in range(300)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [("q1", "tok3"), ("q1", "beta"), ("q2", "tok5")],
        "query_id string, term string",
    )
    idx = str(tmp_path / "bm25")
    build_bm25_index(docs, idx)
    direct = bm25_topk(docs, q, k=7).collect()
    probe = bm25_topk_indexed(spark, idx, q, k=7)
    indexed = probe.collect()
    assert sorted(map(tuple, indexed)) == sorted(map(tuple, direct))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(tok" in plan or "tok IN" in plan
    assert "Python" not in plan


def test_bm25_indexed_large_workload_keeps_terms_relational(spark, tmp_path):
    """VERDICT r16 #5: past the 512-term literal-IN bound, the probe
    must keep the workload's term set as a RELATION (broadcast semi-join
    against the bucket-pruned postings) with NO driver-side term list —
    and return exactly the rows the small-workload literal path returns
    for the same real queries. The 520 noise terms ride under their own
    query ids and match nothing, so the real queries' rankings are a
    direct equality check across the two paths."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.retrieval import (
        build_bm25_index,
        bm25_topk_indexed,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha tok{i % 11} beta gamma tok{i % 7}") for i in range(300)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bm25")
    build_bm25_index(docs, idx)
    real = [("q1", "tok3"), ("q1", "beta"), ("q2", "tok5")]
    noise = [(f"zq{i}", f"zzznoise{i:04d}") for i in range(520)]
    q_small = spark.createDataFrame(real, "query_id string, term string")
    q_big = spark.createDataFrame(real + noise, "query_id string, term string")

    small = bm25_topk_indexed(spark, idx, q_small, k=7).collect()
    big_probe = bm25_topk_indexed(spark, idx, q_big, k=7)
    big = big_probe.collect()
    assert sorted(map(tuple, big)) == sorted(map(tuple, small))

    plan = big_probe._jdf.queryExecution().executedPlan().toString()
    # relational path: semi-join on tok, and no 500-literal IN anywhere
    assert "LeftSemi" in plan
    assert "zzznoise0400" not in plan  # no driver literal term list
    assert "Python" not in plan


def test_bm25_index_lengths_written_in_parallel(spark, tmp_path):
    """lengths/ is corpus-sized (one row per document) — the build must
    not funnel it through a single task. With n_files>1 the directory
    holds multiple part files, and the probe still matches the direct
    path exactly."""
    import glob

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.retrieval import (
        build_bm25_index,
        bm25_topk_indexed,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha tok{i % 5} beta") for i in range(400)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bm25p")
    build_bm25_index(docs, idx, n_files=4)
    parts = glob.glob(f"{idx}/objects/*/lengths/lb=*/part-*.parquet")
    assert len(parts) > 1, "lengths/ must not be a single-writer stage"
    q = spark.createDataFrame(
        [("q1", "tok3"), ("q1", "beta")], "query_id string, term string"
    )
    direct = bm25_topk(docs, q, k=5).collect()
    indexed = bm25_topk_indexed(spark, idx, q, k=5).collect()
    assert sorted(map(tuple, indexed)) == sorted(map(tuple, direct))


@pytest.mark.slow
def test_bm25_upsert_equals_fresh_build_and_keeps_cold_buckets(spark, tmp_path):
    """upsert_bm25_index folds a NEW-doc batch in and a probe must
    equal a fresh bm25_topk over the union corpus; only the posting
    buckets the delta's tokens hash to are rewritten — cold buckets
    carry over into the next manifest BY REFERENCE (same immutable
    dir, byte-identical — stronger than the S6 / ivf_upsert
    byte-identical-rewrite standard)."""
    import glob
    import hashlib as hl

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.retrieval import (
        _py_tok_bucket,
        bm25_topk_indexed,
        build_bm25_index,
        read_index_manifest,
        upsert_bm25_index,
    )

    a = spark.createDataFrame(
        [(i, f"alpha tok{i % 11} beta gamma tok{i % 7}") for i in range(300)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(1000 + i, f"delta tok3 epsilon") for i in range(40)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bm25u")
    build_bm25_index(a, idx, n_buckets=8)

    def _dir_digest(rel: str) -> str:
        h = hl.md5()
        for f in sorted(glob.glob(f"{idx}/{rel}/part-*")):
            h.update(open(f, "rb").read())
        return h.hexdigest()

    delta_buckets = {_py_tok_bucket(t, 8) for t in ("delta", "tok3", "epsilon")}
    cold = [bk for bk in range(8) if bk not in delta_buckets]
    assert cold, "fixture must leave at least one cold bucket"
    m1 = read_index_manifest(idx)
    before = {bk: _dir_digest(m1["postings"][str(bk)]) for bk in cold}

    touched = upsert_bm25_index(spark, b, idx)
    assert touched == len(delta_buckets)
    m2 = read_index_manifest(idx)
    assert m2["version"] == m1["version"] + 1
    for bk in cold:
        # carried over by reference: SAME dir, untouched bytes
        assert m2["postings"][str(bk)] == m1["postings"][str(bk)]
        assert _dir_digest(m2["postings"][str(bk)]) == before[bk]
    for bk in sorted(delta_buckets):
        assert m2["postings"][str(bk)] != m1["postings"].get(str(bk))
    # retried ingest step: re-applying the SAME delta is a no-op for
    # correctness (per-key replace in postings AND lengths — no
    # duplicated length rows)
    upsert_bm25_index(spark, b, idx)

    q = spark.createDataFrame(
        [("q1", "tok3"), ("q1", "beta"), ("q2", "delta")],
        "query_id string, term string",
    )
    fresh = bm25_topk(a.unionByName(b), q, k=9).collect()
    probed = bm25_topk_indexed(spark, idx, q, k=9).collect()
    assert sorted(map(tuple, probed)) == sorted(map(tuple, fresh))


def test_bm25_indexed_probe_prunes_partitions_to_term_buckets(spark, tmp_path):
    """The probe must read ONLY the posting dir its term hashes to —
    under the manifest layout the pruning is driver-side dir selection
    (cold dirs are never even listed), so assert on the files the scan
    actually reads instead of a PartitionFilters plan entry."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.retrieval import (
        _py_tok_bucket,
        bm25_topk_indexed,
        build_bm25_index,
        read_index_manifest,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha tok{i % 11} beta") for i in range(200)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bm25pp")
    build_bm25_index(docs, idx, n_buckets=8)
    q = spark.createDataFrame([("q1", "alpha")], "query_id string, term string")
    probe = bm25_topk_indexed(spark, idx, q, k=5)
    m = read_index_manifest(idx)
    want = m["postings"][str(_py_tok_bucket("alpha", 8))]
    posting_files = [f for f in probe.inputFiles() if "/postings/" in f]
    assert posting_files, "probe must read the posting index"
    assert all(f"/{want}/" in f for f in posting_files), (
        "probe read a posting dir outside its term's bucket"
    )


def test_bm25_phrase_topk_matches_reference(spark):
    """Phrase tf = count of exact consecutive-token matches; scoring is
    BM25 in n-gram units, re-derived in plain Python."""
    import math

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.retrieval import (
        bm25_phrase_topk,
    )

    corpus = {1: "a b a b c", 2: "a b x", 3: "x y z a"}
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    pq = spark.createDataFrame(
        [("q1", "a b"), ("q1", "y z"), ("q2", "a b c")],
        "query_id string, phrase string",
    )
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_phrase_topk(docs, pq, k=5).collect()
    }

    def ref_scores(phrases):
        L = len(phrases[0].split())
        grams = {
            d: [" ".join(t.split()[i : i + L]) for i in range(len(t.split()) - L + 1)]
            for d, t in corpus.items()
        }
        n = len(corpus)
        avgdl = sum(len(g) for g in grams.values()) / n
        out = {}
        for ph in phrases:
            df = sum(1 for g in grams.values() if ph in g)
            if not df:
                continue
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            for d, g in grams.items():
                tf = g.count(ph)
                if tf:
                    s = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(g) / avgdl))
                    out[d] = out.get(d, 0.0) + s
        return out

    q1 = {d: round(s, 6) for d, s in ref_scores(["a b"]).items()}
    yz = ref_scores(["y z"])
    for d, s in yz.items():
        q1[d] = round(q1.get(d, 0.0) + s, 6)
    q2 = {d: round(s, 6) for d, s in ref_scores(["a b c"]).items()}
    assert {d: got[("q1", d)][0] for d in q1} == q1
    assert {d: got[("q2", d)][0] for d in q2} == q2
    # doc1 has tf=2 for "a b": must outrank doc2 in q1
    assert got[("q1", 1)][1] < got[("q1", 2)][1]
    # trigram query matches only doc1
    assert [d for (q, d) in got if q == "q2"] == [1]


def test_bm25_phrase_plan_is_python_free(spark):
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.retrieval import (
        bm25_phrase_topk,
    )

    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(20)], "doc_id long, text string"
    )
    pq = spark.createDataFrame([("q", "a b")], "query_id string, phrase string")
    plan = bm25_phrase_topk(docs, pq)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


@pytest.mark.slow
def test_bm25_phrase_indexed_equals_direct_across_lengths(spark, tmp_path):
    """Per-length gram indexes probed and unioned must return the direct
    phrase path's exact rows; each probe prunes to its term buckets and
    the upsert lifecycle (new docs folded into the bigram index) keeps
    parity with a fresh direct run over the union corpus."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.retrieval import (
        bm25_phrase_topk,
        bm25_phrase_topk_indexed,
        build_bm25_index,
        upsert_bm25_index,
    )

    a = spark.createDataFrame(
        [(i, f"alpha tok{i % 5} beta gamma tok{i % 3} delta") for i in range(200)],
        "doc_id long, text string",
    )
    pq = spark.createDataFrame(
        [("q1", "beta gamma"), ("q1", "alpha tok2"),
         ("q2", "beta gamma tok1"), ("q2", "gamma tok2 delta")],
        "query_id string, phrase string",
    )
    paths = {2: str(tmp_path / "g2"), 3: str(tmp_path / "g3")}
    for L, p in paths.items():
        build_bm25_index(a, p, gram=L, n_buckets=4)
    direct = bm25_phrase_topk(a, pq, k=8).collect()
    probe = bm25_phrase_topk_indexed(spark, paths, pq, k=8)
    assert sorted(map(tuple, probe.collect())) == sorted(map(tuple, direct))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    # manifest-side dir pruning: the probe reads only gram-index dirs
    assert all("/objects/" in f for f in probe.inputFiles())

    # missing-length guard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no gram index for phrase length"):
        bm25_phrase_topk_indexed(spark, {2: paths[2]}, pq)

    # incremental: fold new docs into BOTH gram indexes, probe == fresh
    b = spark.createDataFrame(
        [(1000 + i, "beta gamma tok1 extra words here") for i in range(30)],
        "doc_id long, text string",
    )
    for p in paths.values():
        upsert_bm25_index(spark, b, p)
    fresh = bm25_phrase_topk(a.unionByName(b), pq, k=8).collect()
    again = bm25_phrase_topk_indexed(spark, paths, pq, k=8).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, fresh))


from hypothesis import HealthCheck, given, settings as hyp_settings
from hypothesis import strategies as st

from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.retrieval import (
    bm25_topk_indexed,
    build_bm25_index,
    upsert_bm25_index,
)

_WORD = st.sampled_from(["spark", "join", "scan", "merge", "hash", "row", "col"])
_DOC = st.lists(_WORD, min_size=1, max_size=6).map(" ".join)


@hyp_settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(_DOC, min_size=2, max_size=6),
    delta=st.lists(_DOC, min_size=1, max_size=4),
    terms=st.lists(_WORD, min_size=1, max_size=3, unique=True),
)
@pytest.mark.slow
def test_bm25_index_lifecycle_property(spark, tmp_path, base, delta, terms):
    """For ARBITRARY small corpora, delta batches, and query terms:
    build -> probe == direct, upsert -> probe == direct over the union,
    re-applied upsert is a value-level no-op. The fixed-case tests pin
    plans and layouts; this pins the algebra."""
    import uuid

    idx = str(tmp_path / f"bm25_{uuid.uuid4().hex[:8]}")
    a = spark.createDataFrame(list(enumerate(base)), "doc_id long, text string")
    b = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(delta)], "doc_id long, text string"
    )
    q = spark.createDataFrame(
        [("q", t) for t in terms], "query_id string, term string"
    )
    build_bm25_index(a, idx, n_buckets=4, n_files=2)
    probe = bm25_topk_indexed(spark, idx, q, k=10).collect()
    direct = bm25_topk(a, q, k=10).collect()
    assert sorted(map(tuple, probe)) == sorted(map(tuple, direct))

    upsert_bm25_index(spark, b, idx)
    upsert_bm25_index(spark, b, idx)  # idempotent re-apply
    probe2 = bm25_topk_indexed(spark, idx, q, k=10).collect()
    direct2 = bm25_topk(a.unionByName(b), q, k=10).collect()
    assert sorted(map(tuple, probe2)) == sorted(map(tuple, direct2))


def test_phrase_empty_queries_and_gram_mismatch(spark, tmp_path):
    """ADVICE r9: an empty phrase workload returns the empty
    (query_id, doc_id, score, rank) shape instead of IndexError, and a
    mis-wired per-length index map (unigram index under key 2) raises
    instead of silently ranking in the wrong unit space."""
    import pytest

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.retrieval import (
        bm25_phrase_topk,
        bm25_phrase_topk_indexed,
        bm25_topk_indexed,
        build_bm25_index,
    )

    docs = spark.createDataFrame(
        [(1, "red fox jumps"), (2, "red red fox")], "doc_id long, text string"
    )
    empty_q = spark.createDataFrame([], "query_id string, phrase string")
    out = bm25_phrase_topk(docs, empty_q)
    assert out.columns == ["query_id", "doc_id", "score", "rank"]
    assert out.count() == 0

    uni = str(tmp_path / "uni")
    build_bm25_index(docs, uni, n_buckets=2, n_files=1, gram=1)
    out2 = bm25_phrase_topk_indexed(spark, {2: uni}, empty_q)
    assert out2.count() == 0

    bi_q = spark.createDataFrame(
        [("q", "red fox")], "query_id string, phrase string"
    )
    with pytest.raises(ValueError, match="gram=1.*gram=2"):
        bm25_phrase_topk_indexed(spark, {2: uni}, bi_q).collect()

    # unigram probe path also guards (expects gram=1) and an empty
    # term workload short-circuits to the empty shape
    bi = str(tmp_path / "bi")
    build_bm25_index(docs, bi, n_buckets=2, n_files=1, gram=2)
    tq = spark.createDataFrame([("q", "red")], "query_id string, term string")
    with pytest.raises(ValueError, match="gram=2.*gram=1"):
        bm25_topk_indexed(spark, bi, tq).collect()
    empty_t = spark.createDataFrame([], "query_id string, term string")
    assert bm25_topk_indexed(spark, uni, empty_t).count() == 0


def test_upsert_incremental_meta_matches_full_rescan(spark, tmp_path):
    """VERDICT r9 #8: after build + two upserts (one pure-append, one
    re-apply that REPLACES existing ids), the incrementally-maintained
    meta (n, avgdl, sum_dl) equals a from-scratch recompute over the
    lengths relation."""
    from pyspark.sql import functions as F

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.retrieval import (
        _Bm25Snapshot,
        build_bm25_index,
        upsert_bm25_index,
    )

    a = spark.createDataFrame(
        [(i, f"alpha tok{i % 5} beta " + "pad " * (i % 3)) for i in range(60)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(100 + i, "gamma tok1 word " + "x " * i) for i in range(9)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "incmeta")
    build_bm25_index(a, idx, n_buckets=4, n_files=2)
    upsert_bm25_index(spark, b, idx)   # pure append
    upsert_bm25_index(spark, b, idx)   # re-apply: every id replaced

    snap = _Bm25Snapshot(spark, idx)
    meta = snap.meta_df().first()
    truth = snap.lengths().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").cast("long").alias("sum_dl"),
    ).first()
    assert meta["n"] == truth["n"] == 69
    assert meta["sum_dl"] == truth["sum_dl"]
    assert abs(meta["avgdl"] - truth["sum_dl"] / truth["n"]) < 1e-12


def test_upsert_preserves_tok_sort_within_buckets(spark, tmp_path):
    """ADVICE r9: the upsert rewrite re-clusters merged posting
    partitions by (tok, id), preserving the row-group min/max pruning
    the build-time layout promises."""
    import glob

    import pyarrow.parquet as pq

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.retrieval import (
        build_bm25_index,
        upsert_bm25_index,
    )

    a = spark.createDataFrame(
        [(i, f"w{i % 37} w{(i * 7) % 37} common") for i in range(400)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(1000 + i, f"w{i % 37} fresh") for i in range(50)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "sorted")
    build_bm25_index(a, idx, n_buckets=4)
    upsert_bm25_index(spark, b, idx)
    checked = 0
    for f in glob.glob(f"{idx}/objects/*/postings/bucket=*/part-*"):
        col = pq.read_table(f, columns=["tok", "id"]).to_pydict()
        rows = list(zip(col["tok"], col["id"]))
        assert rows == sorted(rows), f"unsorted postings in {f}"
        checked += 1
    assert checked > 0


@pytest.mark.slow
def test_upsert_publish_is_snapshot_atomic(spark, tmp_path, monkeypatch):
    """VERDICT r9 #2: (a) a crash AFTER the object writes but BEFORE the
    manifest commit leaves the index exactly at the previous version —
    a probe sees the old index in full, never new postings with old
    meta; (b) a probe plan resolved before an upsert keeps reading the
    version it resolved (immutable dirs); (c) a lost manifest race
    raises CommitConflict with nothing partially visible; (d) vacuum
    reclaims the crash orphan and the rolled-off version's objects
    while keeping every dir the retained manifest references."""
    import os

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
        retrieval as R,
    )
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
        CommitConflict,
    )

    a = spark.createDataFrame(
        [(i, f"alpha tok{i % 7} beta") for i in range(120)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(1000 + i, "beta tok3 fresh") for i in range(20)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [("q1", "tok3"), ("q1", "beta")], "query_id string, term string"
    )
    idx = str(tmp_path / "atomic")
    R.build_bm25_index(a, idx, n_buckets=4, n_files=2)
    before = sorted(map(tuple, R.bm25_topk_indexed(spark, idx, q, k=9).collect()))

    # (b) resolve a probe against v1 BEFORE mutating
    stale_probe = R.bm25_topk_indexed(spark, idx, q, k=9)

    # (a) crash injection: objects written, manifest commit never runs
    real_commit = R._commit_index_manifest

    def boom(path, version, doc):
        raise RuntimeError("injected crash before manifest commit")

    monkeypatch.setattr(R, "_commit_index_manifest", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected crash"):
        R.upsert_bm25_index(spark, b, idx)
    monkeypatch.setattr(R, "_commit_index_manifest", real_commit)

    assert R.read_index_manifest(idx)["version"] == 1
    mid = sorted(map(tuple, R.bm25_topk_indexed(spark, idx, q, k=9).collect()))
    assert mid == before, "torn state visible after crashed upsert"

    # real upsert now succeeds; the crash orphan does not interfere
    R.upsert_bm25_index(spark, b, idx)
    assert R.read_index_manifest(idx)["version"] == 2
    fresh = sorted(
        map(tuple, R.bm25_topk(a.unionByName(b), q, k=9).collect())
    )
    assert (
        sorted(map(tuple, R.bm25_topk_indexed(spark, idx, q, k=9).collect()))
        == fresh
    )
    # (b) the stale probe still ranks against v1 — its dirs are immutable
    assert sorted(map(tuple, stale_probe.collect())) == before

    # (c) lost race: committing a version another writer already
    # published raises CommitConflict (write_exclusive EEXIST), leaving
    # the existing manifest untouched
    with _pytest.raises(CommitConflict):
        R._commit_index_manifest(idx, 2, {"meta": "x", "postings": {}, "lengths": {}})
    assert R.read_index_manifest(idx)["version"] == 2
    assert "n_buckets" in R.read_index_manifest(idx)  # not the loser's doc

    # (d) vacuum: keep only v2; crash orphan + v1-only objects reclaimed
    n_objects_before = len(os.listdir(os.path.join(idx, "objects")))
    removed = R.vacuum_bm25_index(idx, keep_last=1, grace_seconds=0.0)
    assert removed >= 1  # at least the crash orphan
    assert len(os.listdir(os.path.join(idx, "objects"))) == n_objects_before - removed
    assert R._index_versions(idx) == [2]
    assert (
        sorted(map(tuple, R.bm25_topk_indexed(spark, idx, q, k=9).collect()))
        == fresh
    )


@pytest.mark.slow
def test_bm25_catalog_routes_by_manifest_gram(spark, tmp_path):
    """VERDICT r9 #6: the phrase catalog's gram->index routing derives
    from the children's committed manifests, equals the mapping the
    build returned, and the catalog probe matches the direct phrase
    path; a duplicate-gram catalog is an error."""
    import pytest as _pytest

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
        retrieval as R,
    )

    a = spark.createDataFrame(
        [(i, f"alpha tok{i % 5} beta gamma tok{i % 3} delta") for i in range(150)],
        "doc_id long, text string",
    )
    pq_ = spark.createDataFrame(
        [("q1", "beta"), ("q1", "beta gamma"), ("q2", "beta gamma tok1")],
        "query_id string, phrase string",
    )
    cat = str(tmp_path / "cat")
    built = R.build_bm25_catalog(a, cat, grams=(1, 2, 3), n_buckets=4)
    assert R.catalog_paths_by_gram(cat) == built
    direct = R.bm25_phrase_topk(a, pq_, k=8).collect()
    routed = R.bm25_phrase_topk_catalog(spark, cat, pq_, k=8).collect()
    assert sorted(map(tuple, routed)) == sorted(map(tuple, direct))

    # upsert the whole catalog; parity holds over the union corpus
    b = spark.createDataFrame(
        [(1000 + i, "beta gamma tok1 more words") for i in range(25)],
        "doc_id long, text string",
    )
    touched = R.upsert_bm25_catalog(spark, b, cat)
    assert set(touched) == {1, 2, 3} and all(v > 0 for v in touched.values())
    fresh = R.bm25_phrase_topk(a.unionByName(b), pq_, k=8).collect()
    again = R.bm25_phrase_topk_catalog(spark, cat, pq_, k=8).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, fresh))

    # duplicate gram = mis-built catalog, loud error
    R.build_bm25_index(a, f"{cat}/g1_dup", gram=1, n_buckets=4)
    with _pytest.raises(ValueError, match="two indexes for gram=1"):
        R.catalog_paths_by_gram(cat)


@hyp_settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(_DOC, min_size=3, max_size=6),
    delta=st.lists(_DOC, min_size=1, max_size=3),
    phrases=st.lists(
        st.tuples(_WORD, _WORD, st.sampled_from([None, "scan", "row"])).map(
            lambda t: " ".join(w for w in t if w)
        ),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
@pytest.mark.slow
def test_bm25_catalog_lifecycle_property(spark, tmp_path, base, delta, phrases):
    """VERDICT r9 #6 done-criterion: for ARBITRARY corpora, deltas, and
    mixed length-2/3 phrase workloads, catalog build -> routed probe ==
    direct, catalog upsert -> routed probe == direct over the union."""
    import uuid as _uuid

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
        retrieval as R,
    )

    cat = str(tmp_path / f"cat_{_uuid.uuid4().hex[:8]}")
    a = spark.createDataFrame(list(enumerate(base)), "doc_id long, text string")
    b = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(delta)], "doc_id long, text string"
    )
    pq_ = spark.createDataFrame(
        [(f"q{i}", p) for i, p in enumerate(phrases)],
        "query_id string, phrase string",
    )
    R.build_bm25_catalog(a, cat, grams=(1, 2, 3), n_buckets=4, n_files=2)
    probe = R.bm25_phrase_topk_catalog(spark, cat, pq_, k=10).collect()
    direct = R.bm25_phrase_topk(a, pq_, k=10).collect()
    assert sorted(map(tuple, probe)) == sorted(map(tuple, direct))

    R.upsert_bm25_catalog(spark, b, cat)
    probe2 = R.bm25_phrase_topk_catalog(spark, cat, pq_, k=10).collect()
    direct2 = R.bm25_phrase_topk(a.unionByName(b), pq_, k=10).collect()
    assert sorted(map(tuple, probe2)) == sorted(map(tuple, direct2))


@pytest.mark.slow
def test_upsert_conflict_retry_rebases_on_new_snapshot(spark, tmp_path, monkeypatch):
    """retries=N turns a lost manifest race into an OCC rebase: the
    upsert re-resolves the WINNER's snapshot and recomputes, so the
    final index equals a sequential application of both writers."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
        retrieval as R,
    )

    a = spark.createDataFrame(
        [(i, f"alpha tok{i % 5} beta") for i in range(60)],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(1000, "beta tok1 fresh")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(2000, "beta tok2 fresher")], "doc_id long, text string"
    )
    idx = str(tmp_path / "occ")
    R.build_bm25_index(a, idx, n_buckets=4, n_files=2)

    # simulate: writer B commits v2 between writer A's snapshot resolve
    # and commit — A's first commit loses, the retry rebases on v2
    real_commit = R._commit_index_manifest
    state = {"injected": False}

    def race(path, version, doc):
        if not state["injected"]:
            state["injected"] = True
            R.upsert_bm25_index(spark, b2, path)  # writer B wins v2
        return real_commit(path, version, doc)

    monkeypatch.setattr(R, "_commit_index_manifest", race)
    R.upsert_bm25_index(spark, b1, idx, retries=1)
    monkeypatch.setattr(R, "_commit_index_manifest", real_commit)

    assert R.read_index_manifest(idx)["version"] == 3  # build, B, A-rebased
    q = spark.createDataFrame(
        [("q", "tok1"), ("q", "tok2"), ("q", "beta")],
        "query_id string, term string",
    )
    fresh = R.bm25_topk(a.unionByName(b1).unionByName(b2), q, k=12).collect()
    probed = R.bm25_topk_indexed(spark, idx, q, k=12).collect()
    assert sorted(map(tuple, probed)) == sorted(map(tuple, fresh))

    # retries=0 (default): the conflict surfaces
    import pytest as _pytest

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
        CommitConflict,
    )

    state["injected"] = False
    monkeypatch.setattr(R, "_commit_index_manifest", race)
    with _pytest.raises(CommitConflict):
        R.upsert_bm25_index(spark, b1, idx)


@pytest.mark.slow
def test_upsert_four_writer_race_serializes_via_occ(spark, tmp_path):
    """Four concurrent writers, each upserting a DISJOINT delta with
    OCC retries: the manifest log must serialize them (versions
    2..5, one per writer), and the final index must rank exactly like
    a fresh direct run over base + all four deltas — the
    blind-append-race standard the lakehouse commit protocol meets,
    applied to the posting index."""
    import threading

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
        retrieval as R,
    )

    a = spark.createDataFrame(
        [(i, f"alpha tok{i % 5} beta") for i in range(80)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "race")
    R.build_bm25_index(a, idx, n_buckets=4, n_files=2)

    deltas = [
        spark.createDataFrame(
            [(1000 * (w + 1) + i, f"writer{w} tok{i % 3} beta") for i in range(10)],
            "doc_id long, text string",
        )
        for w in range(4)
    ]
    errors: list[Exception] = []
    barrier = threading.Barrier(4)

    def work(w: int) -> None:
        try:
            barrier.wait()
            R.upsert_bm25_index(spark, deltas[w], idx, retries=8)
        except Exception as exc:  # surfaced below
            errors.append(exc)

    threads = [threading.Thread(target=work, args=(w,)) for w in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert not errors, errors
    assert R.read_index_manifest(idx)["version"] == 5  # build + 4 serialized

    union = a
    for d in deltas:
        union = union.unionByName(d)
    q = spark.createDataFrame(
        [("q", "beta"), ("q", "tok1"), ("q2", "writer2")],
        "query_id string, term string",
    )
    fresh = sorted(map(tuple, R.bm25_topk(union, q, k=15).collect()))
    probed = sorted(map(tuple, R.bm25_topk_indexed(spark, idx, q, k=15).collect()))
    assert probed == fresh


@pytest.mark.slow
def test_upsert_rejects_mismatched_delta_id_type(spark, tmp_path):
    """ADVICE r11 / VERDICT r12 #3: a delta whose id TYPE differs from
    the build's must be rejected loudly. xxhash64 buckets by binary
    representation, so a widened (e.g. string) id would hash to lb dirs
    a probe of the built type never reads, the per-id REPLACE anti-join
    would silently match nothing, and the write would leave
    mixed-schema lengths dirs. The old behavior 'fell back' to
    full-rescan meta but still wrote the poisoned dirs."""
    import pytest as _pytest

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
        retrieval as R,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha tok{i % 5} beta") for i in range(40)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idtype")
    R.build_bm25_index(docs, idx, n_buckets=4, n_files=2)

    bad = spark.createDataFrame(
        [("900", "beta tok3 fresh")], "doc_id string, text string"
    )
    with _pytest.raises(ValueError, match="id type"):
        R.upsert_bm25_index(spark, bad, idx)
    # nothing committed, nothing poisoned: the index is still v1 and a
    # probe over it matches the pre-upsert corpus exactly
    assert R.read_index_manifest(idx)["version"] == 1
    q = spark.createDataFrame([("q1", "tok3")], "query_id string, term string")
    assert sorted(map(tuple, R.bm25_topk_indexed(spark, idx, q, k=5).collect())) == sorted(
        map(tuple, R.bm25_topk(docs, q, k=5).collect())
    )

    # the same delta with the id CAST to the built type is accepted
    good = bad.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    assert R.upsert_bm25_index(spark, good, idx) >= 1
    assert R.read_index_manifest(idx)["version"] == 2
    fresh = R.bm25_topk(docs.unionByName(good), q, k=5)
    assert sorted(map(tuple, R.bm25_topk_indexed(spark, idx, q, k=5).collect())) == sorted(
        map(tuple, fresh.collect())
    )


def test_flat_layout_meta_not_memoized_across_rebuild(spark, tmp_path):
    """ADVICE r17: a legacy FLAT index's meta dir is the constant
    "meta", so memoizing its row would serve stale (n, avgdl,
    n_buckets) after an in-place rebuild at the same path. Flat
    snapshots must re-read meta; manifest-backed snapshots may memoize
    (their meta dir is an immutable per-version object dir)."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.retrieval import (
        _Bm25Snapshot,
    )

    idx = str(tmp_path / "flatmeta")
    spark.createDataFrame(
        [(10, 5.0, 4, 2, 1)], "n long, avgdl double, n_buckets int, n_files int, gram int"
    ).coalesce(1).write.parquet(idx + "/meta")
    first = _Bm25Snapshot(spark, idx).meta_row()
    assert int(first["n"]) == 10
    # in-place rebuild: same path, same "meta" rel, different content
    spark.createDataFrame(
        [(99, 7.0, 4, 2, 1)], "n long, avgdl double, n_buckets int, n_files int, gram int"
    ).coalesce(1).write.mode("overwrite").parquet(idx + "/meta")
    assert int(_Bm25Snapshot(spark, idx).meta_row()["n"]) == 99
