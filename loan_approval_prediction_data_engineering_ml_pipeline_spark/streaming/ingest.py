"""Continuous corpus ingest with cross-batch exact dedup — the
streaming front door of the dedup family (reference has no streaming;
this is the Spark-first extension of its drop-duplicates semantics,
MY.ipynb cell 9, to an unbounded feed).

Why not :func:`..streaming.events.deduped_stream`? That operator keys
dedup state on the STATE STORE and is therefore watermark-bounded — the
right tool for re-delivery suppression, the wrong one for "have we ever
seen this document?", where the key set is the whole corpus (10^9+ keys,
no eviction horizon). Here the dedup state lives in the LAKEHOUSE
instead: a fingerprint index table, partitioned by ingest batch, that
each micro-batch joins (or Bloom-probes) via the same oracle-verified
batch operators (:func:`...operators.dedup.incremental_exact_dedup` /
:func:`...operators.dedup.bloom_prefiltered_dedup`). Per-trigger cost is
O(batch + index probe); corpus text is never rescanned; state survives
restarts for free because it IS the table.

Exactly-once without a transaction log: every write is scoped to the
batch's own ``ingest_batch=N`` partition directory in overwrite mode, so
at-least-once re-delivery just rewrites the same directories. The one
subtle hazard: a retry AFTER the index write landed would see the
batch's own fingerprints in the index, classify everything
``dup_corpus``, and overwrite the docs partition with nothing — so the
index read EXCLUDES the current batch id (partition pruning makes the
exclusion free). Re-processing is then byte-deterministic regardless of
which writes survived the crash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sources.loaders import _path_exists


def _read_index_excluding(spark, index_dir: str, batch_id: int) -> DataFrame | None:
    """The persisted fingerprint index, minus the current batch's own
    partition (idempotent-retry guard — see module docstring). Returns
    None when no prior batch has committed an index partition."""
    if not _path_exists(spark, index_dir):
        return None
    idx = spark.read.parquet(index_dir).where(F.col("ingest_batch") != batch_id)
    return idx


def stream_corpus_ingest_dedup(
    docs: DataFrame,
    store_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_bloom: bool = False,
    expected_corpus_items: int | None = None,
    checkpoint: str | None = None,
) -> None:
    """Drain a streaming frame of documents into ``store_dir`` keeping
    exactly the first-ever arrival of each distinct (normalized) text:

    - ``store_dir/docs/ingest_batch=N`` — surviving full document rows;
    - ``store_dir/index/ingest_batch=N`` — their fingerprints (what
      later batches join against — 16 bytes/doc, never the text).

    ``use_bloom`` routes the probe through
    :func:`...operators.dedup.bloom_prefiltered_dedup`: definite-new
    rows never shuffle against the index at all — the winning shape when
    batches are mostly novel (the common ingest regime; measured
    crossover in SCALE.md). ``expected_corpus_items`` fixes the Bloom
    geometry without a count pass (pass the corpus manifest count).

    ``availableNow`` trigger: drain-everything-then-stop (the
    replay-to-parity mode the tests use); production would use a
    processing-time trigger plus a durable ``checkpoint``.

    The result equals the batch twin — ``exact_dedup`` over the full
    concatenated feed with arrival order as the tiebreak (within a
    batch: min id, the batch operators' rule) — asserted stream≡batch in
    ``tests/test_streaming.py``.
    """
    from ..operators.dedup import bloom_prefiltered_dedup, incremental_exact_dedup

    docs_dir = f"{store_dir}/docs"
    index_dir = f"{store_dir}/index"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            spark = batch_df.sparkSession
            index = _read_index_excluding(spark, index_dir, batch_id)
            if index is None:
                # genesis batch: no corpus yet — within-batch dedup only
                index = spark.createDataFrame([], "fingerprint string")
            if use_bloom:
                status = bloom_prefiltered_dedup(
                    batch_df,
                    index,
                    text_col,
                    id_col,
                    expected_items=expected_corpus_items,
                )
            else:
                status = incremental_exact_dedup(batch_df, index, text_col, id_col)
            survivors = batch_df.join(
                status.where(F.col("status") == "new").select(id_col, "fingerprint"),
                id_col,
            )
            # batch-scoped overwrite = idempotent under re-delivery
            survivors.drop("fingerprint").write.mode("overwrite").parquet(
                f"{docs_dir}/ingest_batch={batch_id}"
            )
            survivors.select("fingerprint").write.mode("overwrite").parquet(
                f"{index_dir}/ingest_batch={batch_id}"
            )
        finally:
            batch_df.unpersist()

    writer = docs.writeStream.foreachBatch(_sink).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()


def read_corpus(spark, store_dir: str) -> DataFrame:
    """The deduped corpus as one frame (partition column ``ingest_batch``
    records arrival batch — drop it for content-only reads)."""
    return spark.read.parquet(f"{store_dir}/docs")
