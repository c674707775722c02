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

from ..functions import text as X
from ..sources.loaders import _path_exists


def _flat_batch_dirs(store_dir: str, component: str) -> dict[int, str]:
    """The component's flat ``ingest_batch=N`` partition dirs still on
    disk, keyed by batch id."""
    from ..sources.versioned import _join, log_store_for

    comp = _join(store_dir, component)
    out = {}
    for d in log_store_for(store_dir).list_subdirs(comp):
        if d.startswith("ingest_batch="):
            out[int(d.split("=", 1)[1])] = _join(comp, d)
    return out


def _store_snapshot(spark, store_dir: str, component: str) -> DataFrame | None:
    """Snapshot view of a corpus-store component (VERDICT r15 #5): the
    latest FOLD manifest's consolidated object dir (if any) UNION the
    flat ``ingest_batch=N`` dirs with ``N > folded_upto``. Readers see
    the pre-fold or post-fold layout in full — never both copies of a
    folded batch (flat dirs at/below the horizon are excluded by id
    even while they still exist awaiting reclaim) and never a missing
    one. Returns None when the component holds no data at all.
    ``ingest_batch`` survives as an ordinary column in the folded rows,
    so the sinks' replay-exclusion predicate keeps working unchanged."""
    from ..operators.index_commit import read_index_manifest
    from ..sources.versioned import _join

    man = read_index_manifest(store_dir)
    folded_upto = int(man["folded_upto"]) if man else -1
    flat = _flat_batch_dirs(store_dir, component)
    live = [p for b, p in sorted(flat.items()) if b > folded_upto]
    parts = []
    if man and component in man["components"]:
        parts.append(
            spark.read.parquet(_join(store_dir, man["components"][component]))
        )
    if live:
        parts.append(
            spark.read.option("basePath", _join(store_dir, component))
            .parquet(*live)
        )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "ingest_batch", F.col("ingest_batch").cast("int")
    )


def _store_components(store_dir: str, man: dict | None) -> set[str]:
    """Every component the store actually holds: subdirs with flat
    ``ingest_batch=N`` partitions on disk, plus components the current
    fold manifest references (folded-away components may have no flat
    dirs left). ``objects/`` and the manifest log are infrastructure,
    not components — they never contain flat batch dirs, so the
    flat-dir test excludes them naturally."""
    from ..sources.versioned import log_store_for

    comps = set(man["components"]) if man else set()
    for d in log_store_for(store_dir).list_subdirs(store_dir):
        if d in ("objects", "_index_log"):
            continue
        if _flat_batch_dirs(store_dir, d):
            comps.add(d)
    return comps


def fold_ingest_store(
    spark,
    store_dir: str,
    components: tuple[str, ...] | None = None,
    *,
    target_files: int = 1,
) -> int | None:
    """Compact a streaming corpus store's per-batch partition debt
    (VERDICT r15 #5): every committed ``ingest_batch=N`` dir is one-plus
    small files, the same accretion the versioned store's OPTIMIZE pays
    down — over a stream's life the store degrades into thousands of
    tiny partitions that every cross-batch probe (the dedup index join,
    the LSH band join) must open. Fold-in = read the current snapshot
    (prior folded objects + all flat batches), rewrite each component
    consolidated into an IMMUTABLE ``objects/<id>/`` dir, and publish
    ONE fold manifest ``{folded_upto, components}`` through the shared
    atomic index-commit protocol: a concurrent probe resolves the old
    manifest (and reads the still-present flat dirs) or the new one —
    nothing partially visible, exactly the versioned store's
    snapshot-isolation argument. A lost manifest race raises
    CommitConflict with nothing visible; flat dirs at/below the horizon
    become invisible-by-id immediately and are physically reclaimed
    later by :func:`reclaim_ingest_store`.

    Replay interaction: a redelivered batch at/below ``folded_upto``
    rewrites its flat dir, which the snapshot EXCLUDES by id — the
    replay degrades to a harmless orphan write (its content already
    lives in the folded objects). Single maintenance writer, like
    vacuum. Returns the new fold horizon, or None if nothing to fold.

    ``components=None`` (the default) folds EVERY component the store
    holds — discovered from the flat ``ingest_batch=`` dirs on disk
    plus the prior manifest. The fold horizon is GLOBAL (one
    ``folded_upto`` hides flat dirs for every component), so an
    explicit ``components`` that misses a component with unfolded flat
    partitions would silently drop that component's rows from every
    snapshot read (e.g. a neardup store's ``bands`` fingerprints — the
    cross-batch LSH probe would re-admit near-duplicates); that case
    fails fast with ValueError (ADVICE r16). A manifest-referenced
    component excluded from an explicit fold carries forward BY
    REFERENCE. Components whose snapshot is empty are omitted from the
    manifest (never-written object dirs must not be referenced)."""
    from ..operators.index_commit import (
        commit_index_manifest,
        new_object_rel,
        read_index_manifest,
    )
    from ..sources.versioned import _join

    man = read_index_manifest(store_dir)
    folded_upto = int(man["folded_upto"]) if man else -1
    discovered = _store_components(store_dir, man)
    if components is None:
        components = tuple(sorted(discovered))
    else:
        uncovered = sorted(
            c
            for c in discovered - set(components)
            if any(b > folded_upto for b in _flat_batch_dirs(store_dir, c))
        )
        if uncovered:
            raise ValueError(
                f"fold at {store_dir} would hide unfolded flat partitions "
                f"of uncovered component(s) {uncovered} behind the global "
                f"fold horizon — include them in components= (or pass "
                f"components=None to fold everything the store holds)"
            )
    pending = set()
    for comp in components:
        pending.update(
            b for b in _flat_batch_dirs(store_dir, comp) if b > folded_upto
        )
    if not pending:
        return None
    upto = max(pending)
    obj = new_object_rel()
    # manifest-only components not re-folded carry forward by reference
    new_components = dict(man["components"]) if man else {}
    for comp in components:
        snap = _store_snapshot(spark, store_dir, comp)
        if snap is None:
            # nothing ever written for this component: an entry would
            # point at a dir that does not exist (ADVICE r16)
            new_components.pop(comp, None)
            continue
        snap.coalesce(target_files).write.mode("overwrite").parquet(
            _join(store_dir, obj, comp)
        )
        new_components[comp] = f"{obj}/{comp}"
    commit_index_manifest(
        store_dir,
        (int(man["version"]) + 1) if man else 1,
        {"folded_upto": upto, "components": new_components},
    )
    return upto


def reclaim_ingest_store(
    store_dir: str, components: tuple[str, ...] | None = None
) -> list[str]:
    """Physically delete what the latest fold manifest superseded: flat
    ``ingest_batch=N`` dirs at/below ``folded_upto`` and object dirs no
    manifest-referenced component lives in. Same contract as the
    versioned store's ``vacuum`` at zero retention: run it from the
    single maintenance schedule that owns writes, after in-flight
    readers of the PREVIOUS snapshot have drained (a reader pinned to
    the old manifest still reads old object dirs). Returns deleted
    paths."""
    from ..operators.index_commit import read_index_manifest
    from ..sources.versioned import _join, log_store_for

    man = read_index_manifest(store_dir)
    if man is None:
        return []
    store = log_store_for(store_dir)
    folded_upto = int(man["folded_upto"])
    if components is None:
        # every component on disk: a reclaim that missed one would leave
        # its superseded flat dirs as permanent dead weight
        components = tuple(sorted(_store_components(store_dir, man)))
    referenced = {
        rel.split("/", 2)[1]
        for rel in man["components"].values()
        if rel.startswith("objects/")
    }
    removed = []
    for comp in components:
        for b, path in _flat_batch_dirs(store_dir, comp).items():
            if b <= folded_upto:
                store.delete_tree(path)
                removed.append(path)
    obj_root = _join(store_dir, "objects")
    for d in store.list_subdirs(obj_root):
        if d not in referenced:
            full = _join(obj_root, d)
            store.delete_tree(full)
            removed.append(full)
    return removed


def _read_index_excluding(spark, index_dir: str, batch_id: int) -> DataFrame | None:
    """The persisted fingerprint index, minus the current batch's own
    partition (idempotent-retry guard — see module docstring). Returns
    None when no prior batch has committed an index partition.
    Snapshot-resolving: after a fold, reads the consolidated object plus
    only the unfolded flat partitions."""
    import os

    store_dir, comp = os.path.split(index_dir.rstrip("/"))
    idx = _store_snapshot(spark, store_dir, comp)
    if idx is None:
        return None
    return idx.where(F.col("ingest_batch") != batch_id)


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
    """The deduped corpus as one frame (column ``ingest_batch`` records
    arrival batch — drop it for content-only reads). Snapshot-resolving:
    after :func:`fold_ingest_store` the read opens the consolidated
    object dir plus only the unfolded flat partitions."""
    snap = _store_snapshot(spark, store_dir, "docs")
    if snap is None:
        return spark.read.parquet(f"{store_dir}/docs")  # raises like before
    return snap


def stream_corpus_ingest_neardup(
    docs: DataFrame,
    store_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 8,
    min_jaccard: float = 0.8,
    shingle_n: int = 3,
    checkpoint: str | None = None,
) -> None:
    """NEAR-duplicate streaming corpus ingest — the MinHash-LSH sibling
    of :func:`stream_corpus_ingest_dedup`, i.e. the incremental form of
    the web-corpus dedup recipe (Gopher/RefinedWeb-style): each arriving
    batch keeps only documents that are not near-duplicates (exact
    Jaccard >= ``min_jaccard`` on word ``shingle_n``-shingles) of the
    kept corpus or of an earlier keeper in the same batch.

    Lakehouse-resident LSH state: alongside ``docs/ingest_batch=N`` the
    store holds ``bands/ingest_batch=N`` — each keeper's (id, band_id,
    band_key) rows, ``bands``×(id + small string) per document, the only
    thing later batches join against. Per trigger:

    1. batch signatures via :func:`...operators.dedup.signature_table`
       (shingle once; same recipe as the batch operators);
    2. candidates = batch band rows ⋈ persisted band index on
       (band_id, band_key) — ids only shuffle — plus the within-batch
       band self-join;
    3. exact verification joins candidate ids back to shingle sets: the
       batch side from its own signature table, the corpus side
       recomputed from the stored docs of ONLY the candidate ids (a
       semi-join sliver; signatures alone never decide a drop);
    4. a batch document drops if it verifies against any corpus keeper;
       the survivors collapse within-batch near-dup components to their
       minimum id (greedy-by-arrival semantics when ids are monotone
       with arrival — the deterministic tie-break the batch operators
       use).

    Retry-idempotent exactly like the exact-dedup sink: writes are
    scoped to the batch's own partition directories and the index read
    EXCLUDES the current batch id, so replays after any partial crash
    re-derive byte-identical output. Semantics note: ACROSS batches a
    new document is compared against KEPT documents only — matching only
    a previously dropped document never drops it (the greedy frontier
    every streaming dedup — and the reference's sequential
    drop_duplicates, MY.ipynb cell 9 — walks); WITHIN a batch,
    cross-survivors collapse near-dup components to their minimum id,
    the same convention the batch operators use. On transitively-closed
    near-dup cliques the two conventions coincide and the final corpus
    equals global connected-components-min dedup of the whole feed —
    asserted stream ≡ batch in tests.
    """
    from ..operators.dedup import (
        _band_struct_expr,
        connected_components,
        signature_table,
    )
    from ..functions import text as X

    docs_dir = f"{store_dir}/docs"
    bands_dir = f"{store_dir}/bands"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        base = cross_drop = None
        try:
            if batch_df.isEmpty():
                return
            spark = batch_df.sparkSession
            base = signature_table(
                batch_df, id_col=id_col, text_col=text_col, k=k, shingle_n=shingle_n
            ).persist()
            banded = base.select(
                "id", F.explode(_band_struct_expr(k, bands)).alias("bk")
            ).select("id", "bk.band_id", "bk.band_key")

            j = X.jaccard(F.col("ta"), F.col("tb"))
            new_toks = base.select(F.col("id").alias("new_id"), F.col("toks").alias("ta"))

            # --- cross-batch: batch bands vs persisted keeper bands
            # (snapshot-resolving reads: folded object + unfolded flats) ---
            index = _read_index_excluding(spark, bands_dir, batch_id)
            if index is not None:
                cands = (
                    banded.join(
                        index.select(
                            F.col(id_col).alias("old_id"), "band_id", "band_key"
                        ),
                        ["band_id", "band_key"],
                    )
                    .select(F.col("id").alias("new_id"), "old_id")
                    .distinct()
                )
                old_docs = (
                    _store_snapshot(spark, store_dir, "docs")
                    .where(F.col("ingest_batch") != batch_id)
                    .join(
                        cands.select(F.col("old_id").alias(id_col)).distinct(),
                        id_col,
                        "left_semi",
                    )
                )
                old_toks = signature_table(
                    old_docs, id_col=id_col, text_col=text_col, k=k, shingle_n=shingle_n
                ).select(F.col("id").alias("old_id"), F.col("toks").alias("tb"))
                cross_drop = (
                    cands.join(new_toks, "new_id")
                    .join(old_toks, "old_id")
                    .where(F.round(j, 6) >= F.lit(min_jaccard))
                    .select(F.col("new_id").alias("id"))
                    .distinct()
                )

            # --- within-batch: band self-join + verify + component-min,
            # among CROSS-SURVIVORS only (greedy semantics: a document
            # that matched the corpus is already gone and must not speak
            # for its within-batch component) ---
            if cross_drop is not None:
                cross_drop = cross_drop.persist()
                banded = banded.join(cross_drop, "id", "left_anti")
            a, b = banded.alias("a"), banded.alias("b")
            within = (
                a.join(b, ["band_id", "band_key"])
                .where(F.col("a.id") < F.col("b.id"))
                .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
                .distinct()
                .join(new_toks.select(F.col("new_id").alias("id_a"), "ta"), "id_a")
                .join(
                    new_toks.select(
                        F.col("new_id").alias("id_b"), F.col("ta").alias("tb")
                    ),
                    "id_b",
                )
                .where(F.round(j, 6) >= F.lit(min_jaccard))
                .select("id_a", "id_b")
            )
            comp = connected_components(within, "id_a", "id_b")
            within_drop = comp.where(F.col("vertex") != F.col("component")).select(
                F.col("vertex").alias("id")
            )
            dropped = (
                within_drop if cross_drop is None
                else within_drop.unionByName(cross_drop).distinct()
            )
            keep_ids = base.select("id").join(dropped, "id", "left_anti")

            survivors = batch_df.join(
                keep_ids.select(F.col("id").alias(id_col)), id_col
            )
            survivors.write.mode("overwrite").parquet(
                f"{docs_dir}/ingest_batch={batch_id}"
            )
            keeper_bands = banded.join(
                keep_ids, "id", "left_semi"
            ).withColumnRenamed("id", id_col)
            keeper_bands.write.mode("overwrite").parquet(
                f"{bands_dir}/ingest_batch={batch_id}"
            )
        finally:
            # unpersist in finally: a failing batch (which the stream
            # retries) must not leak its cached tables for the lifetime
            # of the session
            if base is not None:
                base.unpersist()
            if cross_drop is not None:
                cross_drop.unpersist()
            batch_df.unpersist()

    writer = docs.writeStream.foreachBatch(_sink).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()


def stream_bm25_index_ingest(
    docs: DataFrame,
    index_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_files: int = 8,
    n_buckets: int = 8,
    gram: int = 1,
    checkpoint: str | None = None,
) -> None:
    """Maintain a STANDING BM25 posting index from a document stream —
    the index-freshness path a production RAG/retrieval stack needs:
    each micro-batch folds into the persisted index through the
    snapshot-atomic upsert, so the index advances one committed
    manifest version per batch and concurrent probes always rank
    against a consistent snapshot while the stream runs. The genesis
    batch builds the index (also an atomic publish).

    Exactly-once WITHOUT a ledger: re-applying the same batch is a
    value-level no-op by construction — postings and lengths are
    per-key REPLACE, and the incremental (n, sum_dl) maintenance
    subtracts exactly what the re-applied ids already contributed — so
    Spark's foreachBatch at-least-once redelivery (crash between sink
    and checkpoint commit) converges to the same index values, just at
    a later version number. A concurrent external writer is handled by
    the upsert's OCC rebase (``retries``).

    Contract carried over from the upsert: each batch must be per-id
    unique (duplicate ids raise loudly) and re-ingested MUTATED texts
    need delete-first semantics.

    ``availableNow`` trigger: drain-everything-then-stop (the
    replay-to-parity mode the tests use); production would use a
    processing-time trigger plus a durable ``checkpoint``."""
    from ..operators.retrieval import (
        build_bm25_index,
        read_index_manifest,
        upsert_bm25_index,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            if read_index_manifest(index_path) is None:
                build_bm25_index(
                    batch_df,
                    index_path,
                    text_col=text_col,
                    id_col=id_col,
                    n_files=n_files,
                    n_buckets=n_buckets,
                    gram=gram,
                )
            else:
                upsert_bm25_index(
                    batch_df.sparkSession,
                    batch_df,
                    index_path,
                    text_col=text_col,
                    id_col=id_col,
                    retries=2,
                )
        finally:
            batch_df.unpersist()

    writer = docs.writeStream.foreachBatch(_sink).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()


def stream_ivf_index_ingest(
    vecs: DataFrame,
    index_path: str,
    *,
    seed_centroids: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: str | None = None,
    drift_log: str | None = None,
    drift_baseline: float | None = None,
    drift_threshold: float = 1.3,
) -> None:
    """Maintain a STANDING IVF ANN index from an embedding stream
    (VERDICT r12 #9 — the ``stream_bm25_index_ingest`` pattern for the
    vector side): each micro-batch assigns its vectors to their nearest
    FROZEN centroid and folds into the persisted index through the
    snapshot-atomic ``ivf_upsert``, so the index advances one committed
    manifest version per batch and concurrent probes always rank
    against a consistent snapshot while the stream runs.

    Centroids are SEEDED from ``seed_centroids`` (a persisted
    ``(cell, centroid)`` table — a prior ``build_ivf_index``'s output)
    and stay frozen across batches: this is how production streaming
    IVF maintenance actually works (FAISS add-with-ids against a
    trained quantizer) — assignment must be a pure function of the
    frozen quantizer or earlier batches would land in different cells
    than later ones. Centroid drift is handled by SCHEDULED
    ``build_ivf_index`` refits, which commit the next manifest version
    atomically (the r12 rebuild fix). Freezing is also what makes the
    final index state exactly re-derivable by the SQL oracle: every
    ingested vector sits in the cell whose seeded centroid is L2-nearest
    (ties to the smallest cell id).

    Exactly-once WITHOUT a ledger, like the BM25 twin: cells are per-id
    REPLACE, so Spark's foreachBatch at-least-once redelivery converges
    to the same index values at a later version number. A concurrent
    external writer is handled by the upsert's OCC rebase.

    The genesis batch installs the seed centroid table MANIFEST-FIRST
    (ADVICE r13): the quantizer writes into an immutable object dir and
    one version-1 manifest commit makes it visible, exactly like every
    other mutation in the lifecycle — a probe racing the first batch
    resolves either "no index yet" or the complete committed quantizer,
    never a partially written centroid table; two streams seeded
    differently against the same path race on the version-1 commit and
    the loser adopts the winner's frozen quantizer (assignment stays a
    pure function of ONE committed quantizer either way).

    DRIFT STALENESS SIGNAL (VERDICT r13 #4): with ``drift_log`` set,
    every batch appends one row of assignment-distance stats — mean/p95
    L2 of the batch's vectors to their nearest FROZEN centroid —
    against ``drift_baseline`` (pass the build-time
    ``ivf_assignment_stats(...)["mean_dist"]``; defaults to the first
    logged batch's mean, i.e. the distribution at freeze time).
    ``drift_ratio = batch_mean / baseline`` and ``refit_due = ratio >
    drift_threshold`` make the "scheduled refit" policy measurable: a
    maintenance job watches the log (:func:`ivf_drift_refit_due`) and
    runs ``build_ivf_index`` — whose manifested-path rebuild commits
    the next version atomically under concurrent probes — when the
    frozen quantizer stops describing the ingest distribution. The
    stats fold into the ingest pass (one broadcast of the k-row
    centroid table + one agg per batch), so the signal is ~free at
    100 TB.

    CONTRACT (ADVICE r15): ``drift_log`` belongs to ONE logical stream.
    The per-batch idempotence probe is read-then-append (a plain
    parquet log, not the versioned store's txn ledger), so two
    CONCURRENT pipelines sharing one drift_log path can both pass the
    existence check for the same batch_id and write duplicate rows.
    Give each pipeline its own drift_log (key it by app/stream id like
    the sink ledger's app_id) — redelivery within one stream stays
    exactly-once, which is what foreachBatch actually replays."""
    from ..operators.index_commit import (
        CommitConflict,
        commit_index_manifest,
        new_object_rel,
        read_index_manifest,
    )
    from ..operators.similarity import ivf_assignment_stats, ivf_upsert
    from ..sources.versioned import log_store_for, _join

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            spark = batch_df.sparkSession
            store = log_store_for(index_path)
            if read_index_manifest(index_path) is None and not store.exists(
                _join(index_path, "centroids")
            ):
                # genesis: install the frozen quantizer atomically —
                # object dir + version-1 manifest (empty cell map; the
                # upsert below commits version 2 with the first cells)
                obj = new_object_rel()
                spark.read.parquet(seed_centroids).coalesce(1).write.parquet(
                    _join(index_path, obj, "centroids")
                )
                try:
                    commit_index_manifest(
                        index_path,
                        1,
                        {"centroids": f"{obj}/centroids", "cells": {}},
                    )
                except CommitConflict:
                    pass  # another writer installed a quantizer first — adopt it
            ivf_upsert(
                spark,
                index_path,
                batch_df,
                id_col=id_col,
                vec_col=vec_col,
                retries=2,
            )
            if drift_log is not None and not _drift_row_exists(
                # idempotent per batch_id like the REPLACE upsert beside
                # it (ADVICE r14): a redelivered micro-batch (failure /
                # restart replay) must not append a duplicate drift row
                spark, drift_log, batch_id
            ):
                stats = ivf_assignment_stats(
                    spark, index_path, batch_df, id_col=id_col, vec_col=vec_col
                )
                base = _drift_baseline(
                    spark, drift_log, drift_baseline, stats["mean_dist"]
                )
                ratio = stats["mean_dist"] / base if base else 1.0
                spark.createDataFrame(
                    [
                        (
                            int(batch_id),
                            stats["n"],
                            round(stats["mean_dist"], 6),
                            round(stats["p95_dist"], 6),
                            round(base, 6),
                            round(ratio, 6),
                            bool(ratio > drift_threshold),
                        )
                    ],
                    "batch_id long, n long, mean_dist double, p95_dist double,"
                    " baseline_mean double, drift_ratio double, refit_due boolean",
                ).coalesce(1).write.mode("append").parquet(drift_log)
        finally:
            batch_df.unpersist()

    writer = vecs.writeStream.foreachBatch(_sink).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()


def _drift_row_exists(spark, drift_log: str, batch_id: int) -> bool:
    """Has this batch already logged its drift row? (Idempotence probe —
    ADVICE r14; the log is one row per batch, so this is a bounded
    read. Single-stream contract: see stream_ivf_index_ingest.)"""
    return (
        _path_exists(spark, drift_log)
        and spark.read.parquet(drift_log)
        .where(F.col("batch_id") == int(batch_id))
        .limit(1)
        .count()
        > 0
    )


def _drift_baseline(spark, drift_log: str, explicit: float | None, fallback: float) -> float:
    """Resolve the drift reference: the caller's build-time value, else
    the FIRST logged batch's recorded baseline (freeze-time reference),
    else this batch's own mean (first batch of a fresh log)."""
    if explicit is not None:
        return explicit
    if _path_exists(spark, drift_log):
        first = (
            spark.read.parquet(drift_log)
            .orderBy("batch_id")
            .select("baseline_mean")
            .first()
        )
        if first is not None:
            return float(first["baseline_mean"])
    return fallback


def stream_text_ivf_ingest(
    docs: DataFrame,
    index_path: str,
    *,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint: str | None = None,
    drift_log: str | None = None,
    drift_baseline: float | None = None,
    drift_threshold: float = 1.3,
    oov_threshold: float = 0.2,
) -> None:
    """Maintain a STANDING text-retrieval IVF index (the
    ``_ensure_ivftext`` layout: persisted encoder vocabulary at
    ``<index>/feats`` + IVF cells over the encoded corpus) from a
    DOCUMENT stream — VERDICT r15 #4: the jittered-vector stream had
    drift/refit wired, the text index did not, and text distributions
    drift faster than synthetic vectors (topics shift, new vocabulary
    floods in).

    Each micro-batch embeds its documents with the FROZEN persisted
    vocabulary (one broadcast of the feats table — frozen-encoder
    semantics, exactly like the frozen quantizer: embedding must be a
    pure function of the committed encoder or early and late batches
    would land in incomparable spaces), then folds into the index via
    the snapshot-atomic ``ivf_upsert``. OOV tokens contribute nothing
    (what a fitted encoder does with unseen input); a document that is
    ALL-new-vocabulary embeds to nothing and is skipped — it re-enters
    at the next encoder refit, which is precisely what the OOV signal
    below schedules. Requires a prior offline build at ``index_path``
    (index + feats), the serving deployment shape.

    TWO drift signals per batch when ``drift_log`` is set, because text
    drifts in two distinguishable ways:

    - ``drift_ratio`` — mean assignment distance vs the frozen
      centroids (the geometric signal shared with
      :func:`stream_ivf_index_ingest`): topics moving away from every
      committed cell.
    - ``oov_rate`` — the fraction of the batch's token OCCURRENCES
      absent from the frozen vocabulary: NEW language the encoder
      cannot even see. This one is text-specific and fires FIRST under
      a vocabulary flood — hashed projections of the residual known
      tokens can still sit near old centroids while the encoder is
      already blind to most of the batch.

    ``refit_due = drift_ratio > drift_threshold OR oov_rate >
    oov_threshold``. The refit itself recomputes the vocabulary over
    the grown corpus and rebuilds index + feats (the
    ``_ensure_ivftext`` rebuild path; ``build_ivf_index`` at a
    manifested path commits the next version atomically under
    concurrent probes). Idempotence and the single-stream drift_log
    contract match :func:`stream_ivf_index_ingest`."""
    from ..operators import embedding as E
    from ..operators.similarity import ivf_assignment_stats, ivf_upsert

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            spark = batch_df.sparkSession
            feats = spark.read.parquet(index_path + "/feats")
            emb = E.hashed_tfidf_embed(
                batch_df, dim=dim, text_col=text_col, id_col=id_col, feats=feats
            ).localCheckpoint(eager=True)  # embed ONCE: upsert + stats
            if not emb.isEmpty():
                ivf_upsert(
                    spark, index_path, emb,
                    id_col=id_col, vec_col="embedding", retries=2,
                )
            if drift_log is not None and not _drift_row_exists(
                spark, drift_log, batch_id
            ):
                if emb.isEmpty():
                    stats = {"n": 0, "mean_dist": 0.0, "p95_dist": 0.0}
                else:
                    stats = ivf_assignment_stats(
                        spark, index_path, emb,
                        id_col=id_col, vec_col="embedding",
                    )
                # OOV rate: token occurrences outside the frozen vocab /
                # all occurrences — one explode + one broadcast anti-join
                # + one count over the batch (the embed already paid the
                # tokenize), so the text signal is ~free like the
                # geometric one
                ne = F.filter(X.tokens(text_col), lambda t: t != "")
                toks = batch_df.select(F.explode(ne).alias("tok"))
                j = toks.join(
                    F.broadcast(
                        feats.select("tok").distinct().withColumn(
                            "known", F.lit(1)
                        )
                    ),
                    "tok",
                    "left",
                ).agg(
                    F.count(F.lit(1)).alias("total"),
                    F.sum(
                        F.when(F.col("known").isNull(), 1).otherwise(0)
                    ).alias("oov"),
                ).first()
                total = int(j["total"] or 0)
                oov_rate = (int(j["oov"] or 0) / total) if total else 0.0
                base = _drift_baseline(
                    spark, drift_log, drift_baseline,
                    stats["mean_dist"] or 1.0,
                )
                ratio = stats["mean_dist"] / base if base else 1.0
                spark.createDataFrame(
                    [
                        (
                            int(batch_id),
                            stats["n"],
                            round(stats["mean_dist"], 6),
                            round(stats["p95_dist"], 6),
                            round(base, 6),
                            round(ratio, 6),
                            round(oov_rate, 6),
                            bool(
                                ratio > drift_threshold
                                or oov_rate > oov_threshold
                            ),
                        )
                    ],
                    "batch_id long, n long, mean_dist double, p95_dist double,"
                    " baseline_mean double, drift_ratio double,"
                    " oov_rate double, refit_due boolean",
                ).coalesce(1).write.mode("append").parquet(drift_log)
        finally:
            batch_df.unpersist()

    writer = docs.writeStream.foreachBatch(_sink).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()


def stream_ivfpq_ingest(
    vecs: DataFrame,
    index_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: str | None = None,
    drift_log: str | None = None,
    drift_baseline: float | None = None,
    drift_threshold: float = 1.3,
) -> None:
    """Maintain a STANDING IVF-PQ index from an embedding stream —
    VERDICT r16 #3: IVF, ivftext, and BM25 had streaming maintenance,
    but nothing streamed into the COMPRESSED tier (the actual 100 TB
    serving shape). Requires a prior offline :func:`build_ivfpq_index`
    at ``index_path`` (the serving-deployment shape, like the text
    twin): both the coarse quantizer AND the codebooks stay FROZEN
    across batches — encoding must be a pure function of the committed
    index or early and late batches would carry incomparable codes.
    Each micro-batch folds in via the snapshot-atomic ``ivfpq_upsert``
    (re-encodes with the persisted books, per-id REPLACE of touched
    cells, cold cells carried by reference, one manifest version per
    batch), so at-least-once redelivery converges to the same index
    values at a later version — the no-ledger exactly-once argument
    shared by every index ingest here.

    DRIFT SIGNAL (the PQ-specific one): with ``drift_log`` set, every
    batch appends its QUANTIZATION-ERROR stats — mean/p95 squared
    reconstruction error of the batch's vectors under the frozen
    codebooks (:func:`...operators.similarity.ivfpq_quantization_stats`;
    residual builds measure the cell-residual error their codes
    actually encode). This is the failure mode coarse geometry cannot
    see: a drifted distribution can still ASSIGN near old centroids
    while the codebooks no longer DESCRIBE it, silently degrading ADC
    ranking (the compressed analog of the text index's oov blindness).
    ``drift_ratio = batch_mean_qerr / baseline`` (pass the build-time
    corpus ``mean_qerr`` as ``drift_baseline``; defaults to the first
    logged batch) and ``refit_due = ratio > drift_threshold`` schedule
    the codebook refit: ``build_ivfpq_index`` over the grown corpus at
    the manifested path commits the next version atomically under
    concurrent probes and RE-RECORDS the calibrated operating point.
    The log schema shares ``batch_id/drift_ratio/refit_due`` with the
    IVF log, so :func:`ivf_drift_refit_due` watches either. Idempotence
    per batch_id and the single-stream drift_log contract match
    :func:`stream_ivf_index_ingest`."""
    from ..operators.similarity import ivfpq_quantization_stats, ivfpq_upsert

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            spark = batch_df.sparkSession
            ivfpq_upsert(
                spark, index_path, batch_df,
                id_col=id_col, vec_col=vec_col, retries=2,
            )
            if drift_log is not None and not _drift_row_exists(
                spark, drift_log, batch_id
            ):
                stats = ivfpq_quantization_stats(
                    spark, index_path, batch_df,
                    id_col=id_col, vec_col=vec_col,
                )
                base = _drift_baseline(
                    spark, drift_log, drift_baseline, stats["mean_qerr"]
                )
                ratio = stats["mean_qerr"] / base if base else 1.0
                spark.createDataFrame(
                    [
                        (
                            int(batch_id),
                            stats["n"],
                            round(stats["mean_qerr"], 6),
                            round(stats["p95_qerr"], 6),
                            round(base, 6),
                            round(ratio, 6),
                            bool(ratio > drift_threshold),
                        )
                    ],
                    "batch_id long, n long, mean_qerr double, p95_qerr double,"
                    " baseline_mean double, drift_ratio double, refit_due boolean",
                ).coalesce(1).write.mode("append").parquet(drift_log)
        finally:
            batch_df.unpersist()

    writer = vecs.writeStream.foreachBatch(_sink).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()


def ivf_drift_refit_due(spark, drift_log: str, *, threshold: float | None = None) -> bool:
    """Read the drift log's LATEST batch row and decide whether the
    frozen quantizer needs a ``build_ivf_index`` refit — the watch half
    of the scheduled-refit policy (the ingest's ``drift_log`` writes
    the signal, this reads it). With ``threshold`` the ratio is
    re-judged at the caller's bar; otherwise the row's recorded
    ``refit_due`` flag (the ingest-time threshold) is returned."""
    if not _path_exists(spark, drift_log):
        return False
    last = spark.read.parquet(drift_log).orderBy(F.desc("batch_id")).first()
    if last is None:
        return False
    if threshold is not None:
        return float(last["drift_ratio"]) > threshold
    return bool(last["refit_due"])
