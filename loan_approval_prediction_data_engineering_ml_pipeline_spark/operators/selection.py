"""DSIR-style data selection: hashed n-gram importance resampling
(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023). Given a small TARGET sample of the
distribution you want more of (a quality domain, a benchmark's style)
and a huge RAW candidate pool, estimate bucketed n-gram distributions
for both, weight every candidate by its log importance ratio, and
draw a Gumbel-top-k sample proportional to the weights.

Reference parity note: the reference repo (LP.ipynb / MY.ipynb) has no
corpus tooling — this belongs to the beyond-reference training-data
surface the brief mandates.

Scale design — why this survives 100 TB:

- **The hashing trick bounds every model structure.** Features are
  unigram+bigram hashes folded mod B (the same portable md5 fold the
  classifier and minhash use, so a DuckDB oracle reproduces them
  bit-for-bit). Both distributions are B-row tables regardless of
  corpus size; the log-ratio table broadcasts as kilobytes.
- **Two feature passes, both partial-aggregated.** Target and raw
  bucket counts are explode → groupBy(bucket) with map-side combine —
  shuffle width B, not corpus. Per-document weights are one broadcast
  join + one groupBy(id) sum, the classifier-scoring shape.
- **Sampling is a pure row function.** The Gumbel perturbation derives
  from md5(doc_id) — identical under retry/AQE/partitioning (the
  failure mode rand() has at scale) and re-derivable by the oracle.
  Top-k is TakeOrdered (per-partition heaps + driver merge of k), no
  global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import text as X
from ..functions.parallel import ensure_cpu_parallelism

N_BUCKETS = 1024


def hashed_ngram_counts(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """``(id, bucket, n)`` raw counts of hashed unigrams AND bigrams
    (DSIR's feature space). Bigrams join with ``'_'`` before hashing;
    both gram streams explode from the SAME tokens array in one
    projection — a single corpus scan, one (id, bucket) shuffle."""
    toks = F.filter(X.tokens(text_col), lambda t: t != "")
    # zip tokens with their successors; null-propagating concat marks
    # the trailing unpaired slot, which the filter drops
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit("_"), b),
        ),
        lambda g: g.isNotNull(),
    )
    base = ensure_cpu_parallelism(docs).select(
        F.col(id_col).alias("id"), F.explode(F.concat(toks, bigrams)).alias("g")
    ).where(F.col("g") != "")
    return (
        base.withColumn(
            "bucket", (X.token_base_hash(F.col("g")) % n_buckets).cast("int")
        )
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _bucket_totals(feats: DataFrame) -> DataFrame:
    return feats.groupBy("bucket").agg(F.sum("n").alias("c"))


def importance_weights(
    raw_feats: DataFrame,
    target_feats: DataFrame,
    *,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """``(id, logw)`` per raw document: sum over its hashed grams of
    ``ln p_target(bucket) - ln p_raw(bucket)`` with add-one smoothing
    on both B-row distributions. The ratio table is built from two
    B-bounded aggregates and broadcast back — no corpus-sized state."""
    rc = _bucket_totals(raw_feats)
    tc = _bucket_totals(target_feats)
    totals = (
        rc.agg(F.sum("c").alias("rt"))
        .crossJoin(tc.agg(F.sum("c").alias("tt")))
    )
    lam = (
        rc.withColumnRenamed("c", "cr")
        .join(tc.withColumnRenamed("c", "ct"), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                      / (F.col("tt") + F.lit(float(n_buckets))))
                - F.log((F.col("cr") + F.lit(1.0))
                        / (F.col("rt") + F.lit(float(n_buckets))))
            ).alias("lam"),
        )
    )
    return (
        raw_feats.join(F.broadcast(lam), "bucket")
        .groupBy("id")
        .agg(F.sum(F.col("n") * F.col("lam")).alias("logw"))
    )


def gumbel_key(id_col: F.Column) -> F.Column:
    """Deterministic Gumbel(0,1) perturbation from md5(id): the uniform
    is the portable 60-bit fold mapped into (0, 1) — pure row function,
    identical across retries, partitionings, and engines."""
    u = (X.token_base_hash(id_col.cast("string")) + F.lit(1.0)) / F.lit(
        float(X.MINHASH_PRIME + 1)
    )
    return -F.log(-F.log(u))


def _ranked_topk_local(
    docs: DataFrame, top_rows: list, keyed_schema, id_col: str
) -> DataFrame:
    """(id_col, logw, key, rank) from the already-collected top-k rows:
    a local relation + one k-row window. The k rows crossed the driver
    in the TakeOrdered merge regardless; rebuilding them locally lets
    the persisted feature relation be unpersisted before returning."""
    out = docs.sparkSession.createDataFrame(top_rows, keyed_schema)
    rk = Window.orderBy(F.col("key").desc(), F.col("id").asc())
    return (
        out.withColumn("rank", F.row_number().over(rk))
        .select(F.col("id").alias(id_col), "logw", "key", "rank")
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    *,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    decimals: int = 6,
) -> DataFrame:
    """Top-``k`` of ``docs`` by Gumbel-perturbed log importance weight
    toward ``target``'s hashed n-gram distribution — sampling WITHOUT
    replacement proportional to the importance weights (the Gumbel
    top-k identity), deterministic end to end. Returns
    ``(id_col, logw, key, rank)`` ranked by the rounded key (ties on
    id).

    NOTE (ADVICE r17): EAGER — the feature passes and the bounded
    top-k collect run at DataFrame-BUILD time (the persisted feature
    relation must live and die inside this call), so the returned
    frame is a local snapshot, not a recomputable lineage; plan
    capture / ad-hoc ``explain`` callers pay the full job cost."""
    raw_feats = hashed_ngram_counts(
        docs, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    )
    target_feats = hashed_ngram_counts(
        target, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    )
    # raw_feats feeds two consumers (the bucket-total aggregate and the
    # per-doc weight join): persist it across the two EAGER passes and
    # unpersist deterministically — one tokenize+hash pass instead of
    # two, no storage entry outliving the call (r17; same shape as the
    # flagged variant below)
    raw_feats = raw_feats.persist()
    try:
        w = importance_weights(raw_feats, target_feats, n_buckets=n_buckets)
        keyed = w.select(
            "id",
            F.round("logw", decimals).alias("logw"),
            F.round(F.col("logw") + gumbel_key(F.col("id")), decimals).alias("key"),
        )
        # the heavy path is TakeOrderedAndProject (per-partition heaps +
        # driver merge of k) — the same k rows any top-k ships anyway
        top_rows = (
            keyed.orderBy(F.col("key").desc(), F.col("id").asc()).limit(k).collect()
        )
    finally:
        raw_feats.unpersist()
    return _ranked_topk_local(docs, top_rows, keyed.schema, id_col)


def dsir_select_flagged(
    docs: DataFrame,
    target_pred,
    *,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    decimals: int = 6,
) -> DataFrame:
    """:func:`dsir_select` for the common case where target and pool
    are SPLITS OF THE SAME CORPUS (``target_pred`` is a boolean Column
    over ``docs``): identical results, one fewer corpus pass. The
    membership flag is attached BEFORE the explode (map-only — no join,
    no extra shuffle), so ONE feature aggregation carries both
    distributions as conditional sums, and only the candidate-weight
    pass re-reads the corpus: 2 tokenize passes instead of 3. At 100 TB
    tokenize+hash is the dominant FLOPs term, which makes this the
    preferred entry point for in-corpus targets.

    NOTE (ADVICE r17): EAGER at DataFrame-build time, like
    :func:`dsir_select` — see its note."""
    toks = F.filter(X.tokens(text_col), lambda t: t != "")
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit("_"), b),
        ),
        lambda g: g.isNotNull(),
    )
    base = ensure_cpu_parallelism(docs).select(
        F.col(id_col).alias("id"),
        target_pred.alias("_t"),
        F.explode(F.concat(toks, bigrams)).alias("g"),
    ).where(F.col("g") != "")
    feats = (
        base.withColumn(
            "bucket", (X.token_base_hash(F.col("g")) % n_buckets).cast("int")
        )
        .groupBy("id", "_t", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # ONE tokenize+hash pass total (r17): the feature relation is
    # persisted and BOTH consumers (the B-row distribution aggregate and
    # the candidate-weight pass) read the materialization instead of
    # re-running explode+md5 over the corpus — tokenize+hash is the
    # dominant FLOPs term, so this halves the operator's CPU. Both
    # passes run EAGERLY inside the scope (the result is the bounded
    # top-k, so nothing lazy escapes) and the persisted relation is
    # unpersisted deterministically — no executor-storage entry outlives
    # the call (the ADVICE-r8 contract, test-pinned). feats is
    # O(docs × distinct-buckets-per-doc) rows of 4 small ints and spills
    # to disk if needed; a 100 TB run persists this between stages
    # (SCALE.md §DSIR), which is the same shape.
    feats = feats.persist()
    try:
        # ONE bucket aggregation yields BOTH smoothed distributions; it
        # is <= B rows (kilobytes), so materialize it to the driver and
        # rebuild as a local relation — totals and lambda read that.
        counts_rows = (
            feats.groupBy("bucket")
            .agg(
                F.sum(F.when(~F.col("_t"), F.col("n")).otherwise(F.lit(0))).alias("cr"),
                F.sum(F.when(F.col("_t"), F.col("n")).otherwise(F.lit(0))).alias("ct"),
            )
            .collect()
        )
        counts = docs.sparkSession.createDataFrame(
            counts_rows, "bucket int, cr bigint, ct bigint"
        )
        # totals over ALL buckets (target-only buckets carry target
        # mass); lambda only over the raw pool's buckets (cr > 0),
        # matching importance_weights' rc-left-join-tc construction
        totals = counts.agg(F.sum("cr").alias("rt"), F.sum("ct").alias("tt"))
        lam = (
            counts.where(F.col("cr") > 0)
            .crossJoin(F.broadcast(totals))
            .select(
                "bucket",
                (
                    F.log((F.col("ct") + F.lit(1.0))
                          / (F.col("tt") + F.lit(float(n_buckets))))
                    - F.log((F.col("cr") + F.lit(1.0))
                            / (F.col("rt") + F.lit(float(n_buckets))))
                ).alias("lam"),
            )
        )
        w = (
            feats.where(~F.col("_t"))
            .join(F.broadcast(lam), "bucket")
            .groupBy("id")
            .agg(F.sum(F.col("n") * F.col("lam")).alias("logw"))
        )
        keyed = w.select(
            "id",
            F.round("logw", decimals).alias("logw"),
            F.round(F.col("logw") + gumbel_key(F.col("id")), decimals).alias("key"),
        )
        # TakeOrderedAndProject (per-partition heaps + driver merge of
        # k) — the same k rows any top-k execution ships to the driver
        top_rows = (
            keyed.orderBy(F.col("key").desc(), F.col("id").asc()).limit(k).collect()
        )
    finally:
        feats.unpersist()
    return _ranked_topk_local(docs, top_rows, keyed.schema, id_col)
