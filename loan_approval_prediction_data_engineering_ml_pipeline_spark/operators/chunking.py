"""Chunking / packing operators for LLM training-data preparation.

Two standard context-window operations the reference (a loan-approval
notebook) has no analog for, but any 100 TB pre-training pipeline needs:

- ``chunk_documents``: split each document into fixed-size token windows
  with overlap (retrieval/context chunking). Map-only: sequence +
  slice + posexplode over the token array; output rows = total chunks.
- ``pack_documents``: assign documents to fixed-token-budget training
  sequences (offset packing: a running token offset, bin =
  floor(start_offset / budget)). One window cumsum per packing group —
  the greedy "concat and cut at budget boundaries" packing used for
  pre-training batches, where a document may straddle a boundary (its
  bin is where it STARTS; downstream truncation/continuation is the
  trainer's policy). Exact next-fit (reset-on-overflow) needs per-group
  recursion — deliberately not done distributed; offset packing is the
  shape that scales and is deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import Window as W

from ..functions import text as X


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split each document into token windows of ``chunk_tokens`` with
    ``overlap`` tokens shared between consecutive chunks.

    Stride = chunk_tokens - overlap; chunk i covers tokens
    [i*stride, i*stride + chunk_tokens). The last chunk may be short; a
    document shorter than one chunk yields exactly one chunk. Map-only
    (explode of per-row chunk indexes) — no shuffle, no UDF; output
    volume is corpus_tokens/stride rows, each carrying only its window.
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap
    toks = X.tokens(text_col)
    n = F.size(toks)
    # number of windows: 1 + ceil(max(n - chunk, 0) / stride)
    extra = F.greatest(n - F.lit(chunk_tokens), F.lit(0))
    n_chunks = F.lit(1) + F.ceil(extra / F.lit(stride)).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.posexplode(idx).alias("chunk_id", "__i"),
        )
        .select(
            id_col,
            "chunk_id",
            F.concat_ws(
                " ", F.slice(F.col("__toks"), F.col("__i") * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(
                F.size(F.col("__toks")) - F.col("__i") * stride, F.lit(chunk_tokens)
            ).alias("chunk_len"),
        )
    )


def pack_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = "lang",
    budget: int = 512,
) -> DataFrame:
    """Assign each document a packing bin: documents are laid end-to-end
    in deterministic (group, id) order and cut into ``budget``-token
    sequences; a document's bin is where its first token lands.

    One window cumsum per group (single shuffle on ``group_col``); bins
    are deterministic under any partitioning because the order key is
    the id, not arrival order. Bin totals can exceed ``budget`` by at
    most one document — the trainer truncates or continues (offset
    packing), which is what keeps this a one-pass distributed operator
    instead of a per-group sequential fold.
    """
    part = [group_col] if group_col else []
    w = W.partitionBy(*part).orderBy(id_col)
    n_tok = X.token_count(text_col)
    cum = F.sum(n_tok).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    start = (cum - n_tok).cast("long")
    out_cols = [F.col(group_col)] if group_col else []
    return df.select(
        *out_cols,
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        start.alias("start_offset"),
        F.floor(start / F.lit(budget)).cast("long").alias("bin"),
    )


def shard_key(col: "F.Column", n_shards: int, *, salt: str = "shard") -> "F.Column":
    """Deterministic shard id from an id column: md5(salt || id) first 8
    hex chars as an int, mod n_shards. A pure row function — stable
    across runs, retries, partitionings — and computable identically in
    ANSI SQL (the mixture_sample/stratified_sample hash recipe)."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")).cast("binary"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards).alias("shard")


def shuffle_order_key(col: "F.Column", *, salt: str = "order") -> "F.Column":
    """Deterministic within-shard shuffle order: the full md5 hex of
    (salt || id), compared lexicographically. Reading a shard in this
    order IS the global random shuffle a trainer wants — no stateful
    shuffler, reproducible across reruns."""
    return F.md5(F.concat(F.lit(salt), col.cast("string")).cast("binary")).alias("__ord")


def export_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Final step of a training-data pipeline: write the corpus as
    ``n_shards`` pseudo-randomly shuffled shards
    (``<path>/shard=K/``). Shard membership and within-shard order are
    pure hash functions of the id — the "global shuffle" costs one
    hash-partition exchange plus a per-partition sort, never a global
    sort, and a re-run (or a retried task) reproduces byte-identical
    shards. Trainers stream shards independently; epoch reshuffles come
    from changing the salt, not rewriting data."""
    out = (
        df.withColumn("shard", shard_key(F.col(id_col), n_shards))
        .withColumn("__ord", shuffle_order_key(F.col(id_col)))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "__ord")
        .drop("__ord")
    )
    out.write.mode(mode).partitionBy("shard").parquet(path)
