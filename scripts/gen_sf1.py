"""Generate an sf1 dataset (10x sf0.1) for the scale-validation pass
(VERDICT r3 #3) at /root/repo/.testdata/sf1 (gitignored — ~170 MB,
regenerate on demand).

The driver fixtures are read-only and stop at sf0.1, so sf1 is a
deterministic 10x upsample of sf0.1 that preserves the star schema's FK
structure: copy c (0..9) offsets every key space by c * (max_key + 1),
so orders copy c reference customer copy c, lineitem copy c references
orders/part/supplier copy c, etc. Measure-values get small
deterministic (xxhash64-derived) jitter so the copies are not exact
duplicates — distinct counts, dedup pair structure, and aggregate
values all scale instead of collapsing onto the originals. Document
text gains a per-copy token (copies become NEAR-duplicates — the
worst-case load for the LSH/MinHash family); embeddings are
TEXT-DERIVED (r14: the deterministic feature-hashing encoder over the
sf1 documents), so copies are near-neighbors — the worst-case load for
ANN — AND semantic similarity correlates with lexical content, which is
what makes the hybrid fusion-gain measurement possible.

Everything is expression-level (no UDFs); generation is one map-only
job per copy per table.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from loan_approval_prediction_data_engineering_ml_pipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DEST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".testdata", "sf1")
N_COPIES = 10


def _jitter(*cols, scale: float) -> F.Column:
    """Deterministic jitter in (-scale/2, +scale/2)."""
    return (F.pmod(F.xxhash64(*cols), F.lit(10000)) / 10000.0 - 0.5) * scale


def _documents_copy(df: DataFrame, c: int, doc_off: int) -> DataFrame:
    """One upsample copy of the documents table, with the r12 #5 fix:
    the curation queries split eval/train on ``doc_id % 97 == 0``, and
    on the plain near-dup upsample EVERY stage-4 keeper ended up
    sharing a 3-shingle with the 10x eval split, so the funnel's
    decontamination stage zeroed all survivors and stages 6-8 verified
    trivially at sf1 (BASELINE r11 footnote). Fix: DECOUPLE most of the
    eval split from the near-dup cliques — eval-id docs get fully
    synthetic per-doc-unique token streams (md5-derived, digits mapped
    to letters so every token is alphabetic and unique to the doc: no
    3-gram can be shared with any pool doc). A small slice of the eval ids
    (doc_id DIV 97 divisible by 64, ~8 docs at sf1) KEEP their natural
    upsampled text,
    so decontamination still flags a real, bounded contaminated stratum
    — stages 5-8 are all non-trivial and both engines re-derive the
    same split from the written table alone."""
    new_id = F.col("doc_id") + c * doc_off
    # copies c > 0 APPEND a repeat of one of the doc's OWN tokens
    # (chosen by (copy, doc)) instead of the old shared-"copytoken{c}"
    # marker (r14): a marker shared by all 5k copy-c docs had df ~ N/10
    # and idf ~ 2.3 over this common-word corpus, so the text-derived
    # embeddings clustered by COPY BAND instead of by family — real
    # paraphrases don't share a stylistic token with 5,000 strangers.
    # Repeating an in-vocabulary token keeps the copy's embedding next
    # to its family (one tf bumps by 1, no new hash bucket) AND keeps
    # pair Jaccard at the r13 level (~S/(S+2) >= 0.9: only the 2
    # trailing shingles change), so the 8x2 LSH banding's recall stays
    # measurably 1 — a DROPPED token (the first r14 attempt) pushed
    # pair Jaccard to the 0.8 threshold where banding misses ~2.8e-4 of
    # true pairs and the exact-truth oracle caught the recall gap at
    # sf1's pair count.
    if c == 0:
        nat = F.col("text")
    else:
        ts = F.split(F.trim("text"), " ")
        pick = F.pmod(F.lit(c * 7) + F.col("doc_id"), F.greatest(F.size(ts), F.lit(1)))
        nat = F.concat_ws(
            " ", F.col("text"), F.element_at(ts, (pick + 1).cast("int"))
        )
    uniq_seed = [
        F.translate(
            F.md5(F.concat(new_id.cast("string"), F.lit(f"#{j}"))),
            "0123456789",
            "ghijklmnop",
        )
        for j in range(3)
    ]
    # 3 md5 blocks x 4 tokens of 8 alpha chars = 12 doc-unique tokens
    uniq = F.concat_ws(
        " ",
        *[
            F.substring(s, 1 + 8 * p, 8)
            for s in uniq_seed
            for p in range(4)
        ],
    )
    is_eval = new_id % 97 == F.lit(0)
    keep_natural = (new_id / 97).cast("long") % 64 == F.lit(0)
    text = F.when(is_eval & ~keep_natural, uniq).otherwise(nat)
    return df.select(
        new_id.alias("doc_id"),
        text.alias("text"),
        "lang", "source",
        F.length(text).cast("long").alias("n_chars"),
    )


def _upsample(df: DataFrame, transform) -> DataFrame:
    out = None
    for c in range(N_COPIES):
        part = transform(df, c)
        out = part if out is None else out.unionByName(part)
    return out


def main() -> None:
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.loaders import load_table

    spark = get_spark(app_name="gen_sf1")
    t = {n: spark.read.parquet(f"{SRC}/{n}.parquet") for n in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ]}
    # events has shipped as TIMESTAMP(NANOS) in some driver rounds — go
    # through load_table, which probes and normalizes (ts -> timestamp_ntz)
    t["events"] = load_table(spark, SRC, "events")
    offs = {
        "cust": t["customer"].agg(F.max("c_custkey")).first()[0] + 1,
        "supp": t["supplier"].agg(F.max("s_suppkey")).first()[0] + 1,
        "part": t["part"].agg(F.max("p_partkey")).first()[0] + 1,
        "ord": t["orders"].agg(F.max("o_orderkey")).first()[0] + 1,
        "ev": t["events"].agg(F.max("event_id")).first()[0] + 1,
        "user": t["events"].agg(F.max("user_id")).first()[0] + 1,
        "doc": t["documents"].agg(F.max("doc_id")).first()[0] + 1,
        "vec": t["embeddings"].agg(F.max("vec_id")).first()[0] + 1,
    }

    def customer(df, c):
        return df.select(
            (F.col("c_custkey") + c * offs["cust"]).alias("c_custkey"),
            "c_name", "c_nationkey",
            F.round(F.col("c_acctbal") + _jitter(F.col("c_custkey"), F.lit(c), scale=10.0 * min(c, 1)), 2).alias("c_acctbal"),
            "c_mktsegment",
        )

    def supplier(df, c):
        return df.select(
            (F.col("s_suppkey") + c * offs["supp"]).alias("s_suppkey"),
            "s_name", "s_nationkey",
            F.round(F.col("s_acctbal") + _jitter(F.col("s_suppkey"), F.lit(c), scale=10.0 * min(c, 1)), 2).alias("s_acctbal"),
        )

    def part(df, c):
        return df.select(
            (F.col("p_partkey") + c * offs["part"]).alias("p_partkey"),
            "p_name", "p_brand", "p_type", "p_size",
            F.round(F.col("p_retailprice") + _jitter(F.col("p_partkey"), F.lit(c), scale=5.0 * min(c, 1)), 2).alias("p_retailprice"),
        )

    def orders(df, c):
        return df.select(
            (F.col("o_orderkey") + c * offs["ord"]).alias("o_orderkey"),
            (F.col("o_custkey") + c * offs["cust"]).alias("o_custkey"),
            "o_orderstatus",
            F.round(F.col("o_totalprice") + _jitter(F.col("o_orderkey"), F.lit(c), scale=50.0 * min(c, 1)), 2).alias("o_totalprice"),
            "o_orderdate", "o_orderpriority",
        )

    def lineitem(df, c):
        return df.select(
            (F.col("l_orderkey") + c * offs["ord"]).alias("l_orderkey"),
            (F.col("l_partkey") + c * offs["part"]).alias("l_partkey"),
            (F.col("l_suppkey") + c * offs["supp"]).alias("l_suppkey"),
            "l_linenumber", "l_quantity",
            F.round(F.col("l_extendedprice") + _jitter(F.col("l_orderkey"), F.col("l_linenumber"), F.lit(c), scale=20.0 * min(c, 1)), 2).alias("l_extendedprice"),
            "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        )

    def events(df, c):
        return df.select(
            (F.col("event_id") + c * offs["ev"]).alias("event_id"),
            (F.col("ts") + F.make_interval(secs=F.lit(float(c)))).alias("ts"),
            (F.col("user_id") + c * offs["user"]).alias("user_id"),
            "event_type",
            F.round(F.col("value") + _jitter(F.col("event_id"), F.lit(c), scale=2.0 * min(c, 1)), 4).alias("value"),
            "props",
        )

    def documents(df, c):
        return _documents_copy(df, c, offs["doc"])

    def labels(df, c):
        return df.select(
            (F.col("vec_id") + c * offs["vec"]).alias("vec_id"), "label"
        )

    def embeddings(df, c):
        emb = F.col("embedding") if c == 0 else F.transform(
            "embedding",
            lambda x, i: (
                x + (F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit(c)), F.lit(1000)) / 1000.0 - 0.5) * 0.02
            ).cast("float"),
        )
        return df.select(
            (F.col("vec_id") + c * offs["vec"]).alias("vec_id"),
            emb.alias("embedding"),
            "label",
        )

    os.makedirs(DEST, exist_ok=True)
    # dims stay as-is: region/nation cardinality is fixed in TPC-H too
    t["region"].write.mode("overwrite").parquet(f"{DEST}/region.parquet")
    t["nation"].write.mode("overwrite").parquet(f"{DEST}/nation.parquet")
    for name, fn in [
        ("customer", customer), ("supplier", supplier), ("part", part),
        ("orders", orders), ("lineitem", lineitem), ("events", events),
        ("documents", documents),
    ]:
        _upsample(t[name], fn).write.mode("overwrite").parquet(f"{DEST}/{name}.parquet")
        print(f"wrote {name}")

    # `embeddings.parquet` keeps the ANN-shaped jittered upsample: the
    # cosine-thresholded component/dedup queries (near_dup_components,
    # canonical_keep_best, semantic_dedup, ...) are calibrated for
    # near-orthogonal ambient similarity, and this 31-word-vocabulary
    # corpus gives ANY text-derived encoder a fat ambient-cosine tail
    # (measured: 2.4M label-blocked pairs >= 0.4 even after
    # all-but-the-top centering — the transitive closure degenerates).
    _upsample(t["embeddings"], embeddings).write.mode("overwrite").parquet(
        f"{DEST}/embeddings.parquet"
    )
    print("wrote embeddings (jittered upsample)")

    # `embeddings_text.parquet` is the TEXT-DERIVED table (VERDICT r13
    # #2): the deterministic feature-hashing encoder (all-but-the-top
    # centered) over the sf1 documents, vec_id aligned with doc_id —
    # the semantic side of the hybrid fusion-gain measurement
    # (scripts/measure_fusion_sf1.py), where semantic similarity MUST
    # correlate with lexical content. Near-dup copies differ by one
    # repeated token -> near-identical vectors; the synthetic eval
    # split lands far from everything.
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.embedding import (
        hashed_tfidf_embed,
    )

    sf1_docs = spark.read.parquet(f"{DEST}/documents.parquet")
    emb = hashed_tfidf_embed(sf1_docs, dim=64, center=True).select(
        F.col("doc_id").alias("vec_id"),
        F.col("embedding").cast("array<float>").alias("embedding"),
    )
    lab = _upsample(t["embeddings"], labels)
    emb.join(lab, "vec_id", "left").write.mode("overwrite").parquet(
        f"{DEST}/embeddings_text.parquet"
    )
    print("wrote embeddings_text (text-derived, centered)")

    # the per-SF ANN index cache is keyed by the sf tag and its
    # staleness fingerprint may not catch every regeneration — drop the
    # sf1 caches so every index rebuilds against the new tables
    import shutil

    for stale in [
        os.path.join(os.path.dirname(DEST), "..", ".indexes", "sf1"),
    ]:
        shutil.rmtree(os.path.abspath(stale), ignore_errors=True)
    for n in ["lineitem", "orders", "events", "documents", "embeddings"]:
        print(n, spark.read.parquet(f"{DEST}/{n}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
