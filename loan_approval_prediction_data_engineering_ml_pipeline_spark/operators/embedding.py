"""Deterministic TEXT-DERIVED embeddings: feature-hashed TF-IDF with a
signed projection (Weinberger et al. 2009, "Feature Hashing for Large
Scale Multitask Learning") — the classic hashing-trick featurizer, used
here as the deterministic stand-in for a neural text encoder so the
semantic-retrieval surface (ANN indexes, hybrid RRF fusion, IR quality
metrics) can be measured on embeddings that actually CORRELATE with
document content (VERDICT r13 #2: the synthetic fixture embeddings are
random, so fusion gain was unmeasurable).

Derivation (every step ANSI-SQL re-derivable, shared with the DuckDB
oracles):

- tokens: whitespace split of ``trim(text)``, empty tokens dropped —
  the SAME stream the BM25 CTEs build (one tokenizer, one truth);
- per distinct token: ``H = token_base_hash(tok)`` (md5-derived, in
  [0, 2^31-1), identical in DuckDB), ``bucket = H % dim``,
  ``sign = +1 if (H // dim) % 2 == 0 else -1``,
  ``idf = ln((N + 1) / (df + 1))`` (smoothed; N = corpus size);
- document vector: ``e[bucket] = sum over tokens of sign * tf * idf``,
  then l2-normalized;
- query vector: the same projection over a term set with tf = 1.

Scale shape (100 TB): one token explode + two hash-partitioned
aggregations (tf per (doc, token), df per token) + one broadcast of the
distinct-token feature table back onto the tf relation — the shuffle
carries (doc, bucket, weight) partials, never text, and the result is
dim doubles per document. No UDFs anywhere: the whole derivation is
codegen expressions, so it runs at full JVM speed and doubles as the
deterministic fixture-embedding generator (scripts/gen_sf1.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as X
from ..functions.parallel import ensure_cpu_parallelism


def hashed_token_features(
    docs: DataFrame,
    *,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The distinct-token feature table ``(tok, bucket, sgn, idf)`` a
    corpus induces — the shared half of document AND query embedding
    (both sides must hash/weight tokens identically or cosine between
    them is meaningless). One explode + one groupBy(token); the output
    is vocabulary-sized (broadcastable for any real vocabulary)."""
    ne = F.filter(X.tokens(text_col), lambda t: t != "")
    toks = ensure_cpu_parallelism(docs).select(
        F.col(id_col).alias("__id"), F.explode(ne).alias("tok")
    )
    n = docs.select(F.count(F.lit(1)).alias("__n"))
    dft = toks.groupBy("tok").agg(F.count_distinct("__id").alias("df"))
    h = X.token_base_hash(F.col("tok"))
    return (
        dft.crossJoin(F.broadcast(n))
        .select(
            "tok",
            F.pmod(h, F.lit(dim)).cast("int").alias("bucket"),
            F.when(F.pmod(F.floor(h / F.lit(dim)), F.lit(2)) == 0, F.lit(1.0))
            .otherwise(F.lit(-1.0))
            .alias("sgn"),
            F.log((F.col("__n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))).alias(
                "idf"
            ),
        )
    )


def _assemble(
    vec_long: DataFrame,
    dim: int,
    id_col: str,
    mean_vec: list[float] | None = None,
) -> DataFrame:
    """(id, bucket, v) long form -> (id, embedding array<double>),
    l2-normalized (zero vectors stay zero). With ``mean_vec`` the
    corpus-mean literal is subtracted per dimension BEFORE normalizing
    (note the implicit zeros: a doc missing a bucket centers to
    ``-mean[j]`` there, which is why centering happens at the dense
    array stage, not in the long form)."""
    m = vec_long.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "v"))).alias("__m")
    )
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.coalesce(F.element_at(F.col("__m"), j.cast("int")), F.lit(0.0)),
    )
    if mean_vec is not None:
        from ..functions import vectors as _V

        mu = _V.array_lit(mean_vec)
        arr = F.zip_with(arr, mu, lambda x, m_: x - m_)
    # arr and nrm in their OWN projection steps: inlining them into the
    # per-element normalize would re-evaluate the 64-lookup array build
    # and the 64-term norm aggregate for EVERY element (the minhash
    # base-hash lesson — measured 12 s instead of ~1 s at sf0.1);
    # higher-order functions are not "cheap" for CollapseProject, so
    # the column refs survive optimization.
    dense = m.select(F.col(id_col), arr.alias("__arr"))
    dense = dense.select(
        F.col(id_col),
        F.col("__arr"),
        F.sqrt(
            F.aggregate(F.col("__arr"), F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("__n"),
    )
    unit = F.transform(
        F.col("__arr"),
        lambda x: F.when(F.col("__n") > 0, x / F.col("__n")).otherwise(F.lit(0.0)),
    )
    return dense.select(F.col(id_col), unit.alias("embedding"))


def hashed_tfidf_embed(
    docs: DataFrame,
    *,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    center: bool = False,
    feats: DataFrame | None = None,
) -> DataFrame:
    """Document embeddings ``(id_col, embedding array<double>)`` —
    l2-normalized signed-hash TF-IDF projections of ``text_col``. The
    deterministic text encoder behind ``ann_text_embed_topk`` /
    ``retrieval_quality_hybrid_textemb`` and the sf1 fixture embeddings.

    Pass ``feats`` (a :func:`hashed_token_features` result for the SAME
    corpus/dim) to reuse an already-derived feature table — callers
    that also embed queries (``retrieval_quality_hybrid_textemb``)
    otherwise pay the vocabulary aggregation twice.

    ``center=True`` subtracts the corpus-mean vector before
    normalizing — the "all-but-the-top" common-direction removal (Mu &
    Viswanath, ICLR 2018). On a small-vocabulary corpus every document
    shares most tokens, so raw projections have ambient cosine ~0.8
    and similarity search degenerates (everything is everyone's
    neighbor); removing the shared component restores near-orthogonal
    ambient similarity while near-duplicate structure (shared
    *deviations* from the mean) keeps cosine ~1. Cost: one tiny agg
    (the dim-sized mean collects to the driver as a literal)."""
    if feats is None:
        feats = hashed_token_features(
            docs, dim=dim, text_col=text_col, id_col=id_col
        )
    ne = F.filter(X.tokens(text_col), lambda t: t != "")
    toks = docs.select(F.col(id_col), F.explode(ne).alias("tok"))
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    vec = (
        tf.join(F.broadcast(feats), "tok")
        .groupBy(id_col, "bucket")
        .agg(F.sum(F.col("sgn") * F.col("tf") * F.col("idf")).alias("v"))
    )
    mean_vec = None
    if center:
        n_docs = docs.count()
        sums = {
            int(r["bucket"]): float(r["s"])
            for r in vec.groupBy("bucket").agg(F.sum("v").alias("s")).collect()
        }
        # docs missing a bucket contribute 0 to that dimension's mean
        mean_vec = [sums.get(j, 0.0) / n_docs for j in range(dim)]
    return _assemble(vec, dim, id_col, mean_vec=mean_vec)


def embed_terms(
    terms: DataFrame,
    feats: DataFrame,
    *,
    dim: int = 64,
    query_col: str = "query_id",
    term_col: str = "term",
) -> DataFrame:
    """Query embeddings from a ``(query_id, term)`` relation under the
    SAME corpus feature table (tf = 1 per term): the projection a
    retrieval stack applies to incoming queries. Terms unseen in the
    corpus contribute nothing (no df, no idf) — matching what a fitted
    encoder does with OOV input."""
    vec = (
        terms.select(F.col(query_col), F.col(term_col).alias("tok"))
        .distinct()
        .join(F.broadcast(feats), "tok")
        .groupBy(query_col, "bucket")
        .agg(F.sum(F.col("sgn") * F.col("idf")).alias("v"))
    )
    return _assemble(vec, dim, query_col).withColumnRenamed("embedding", "qv")
