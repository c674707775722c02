"""Manifest-based versioned parquet tables: snapshot isolation, time
travel, O(1) rollback — the Delta-Lake commit protocol (Armbrust et al.,
"Delta Lake: High-Performance ACID Table Storage over Cloud Object
Stores", VLDB 2020) re-expressed at its minimal core, with plain parquet
data files and JSON manifests instead of a transaction log of actions.

The reference (a pandas/pymysql notebook pipeline) overwrites its MySQL
table in place on every run (MY.ipynb:513-527) — a reader racing the
writer sees a half-loaded table, and yesterday's state is simply gone.
Here, visibility is MANIFEST-driven:

- every write lands its part files in a fresh, version-private directory
  under ``<path>/data/`` — existing files are NEVER mutated or deleted
  by a commit;
- a version becomes visible through exactly one atomic step: the POSIX
  ``rename()`` of ``_manifests/.vN.json.tmp`` → ``_manifests/vN.json``
  listing every file the snapshot contains. A crashed write leaves an
  orphaned data directory that no manifest references — invisible to
  every reader, reclaimed by :func:`vacuum`;
- readers resolve a manifest ONCE, then read a fixed file list: a
  concurrent commit cannot make a running query see a torn state
  (snapshot isolation), and pinning ``version=`` is time travel;
- :func:`rollback` commits a NEW version whose file list equals the old
  one — history only moves forward, the bad version stays auditable;
- concurrent writers are serialized optimistically: the loser of the
  rename race (manifest already exists) gets :class:`CommitConflict`
  and retries on fresh state — first-writer-wins, like Delta.

Scale notes (100 TB): a manifest is O(files), not O(rows), and commits
are O(1) renames — table size never enters the commit path. Listing
avoidance is the point: readers never glob ``data/`` (object-store LIST
is slow and eventually consistent), they read the file list from the
manifest. Append cost is O(manifest) rewrite per commit; at very high
commit rates the Delta refinement (log of deltas + periodic checkpoint)
drops that to O(new files) — documented trade, not needed at this
cadence. The manifest JSON additionally records the snapshot's row
count and schema, so ``table_versions`` answers audit queries without
touching data files.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed this version first — re-read latest
    state and retry (optimistic concurrency, first-writer-wins)."""


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_manifest_dir(path), f"v{version}.json")


def latest_version(path: str) -> int | None:
    """Highest committed version, or None for an uninitialized table."""
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        return None
    versions = [
        int(name[1:-5])
        for name in os.listdir(mdir)
        if name.startswith("v") and name.endswith(".json")
    ]
    return max(versions) if versions else None


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as fh:
        return json.load(fh)


def _commit(path: str, version: int, manifest: dict) -> None:
    """The one atomic step: tmp-write then rename. rename() fails on
    POSIX if the source vanished (another process won a same-name race)
    and never tears; a pre-check turns the common conflict into a
    typed error before any work is wasted."""
    mdir = _manifest_dir(path)
    os.makedirs(mdir, exist_ok=True)
    final = _manifest_path(path, version)
    if os.path.exists(final):
        raise CommitConflict(
            f"version {version} already committed at {path}; reload and retry"
        )
    tmp = os.path.join(mdir, f".v{version}.json.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    try:
        os.rename(tmp, final)
    except OSError as exc:  # lost a rename race on a non-precheckable FS
        os.unlink(tmp)
        raise CommitConflict(str(exc)) from exc


def versioned_write(
    df: DataFrame, path: str, *, mode: str = "append", expected_base: int | None = None
) -> int:
    """Commit ``df`` as the table's next version and return its number.

    ``mode="append"``: the new snapshot = previous file list + the new
    files (no data rewrite — append is metadata-plus-new-files only).
    ``mode="overwrite"``: the new snapshot = the new files alone; prior
    versions remain readable (nothing is deleted).

    ``expected_base`` pins the version this write was DERIVED from
    (read-modify-write transactions): if another writer committed since,
    the write fails with :class:`CommitConflict` before any data lands —
    re-read and retry. Without it, concurrent appends serialize
    first-writer-wins on the manifest rename alone (safe for blind
    appends, lost-update-prone for read-modify-write).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    prev = latest_version(path)
    if expected_base is not None and prev != expected_base:
        raise CommitConflict(
            f"stale base: expected v{expected_base}, table is at "
            f"{'v' + str(prev) if prev is not None else 'uninitialized'}"
        )
    version = 0 if prev is None else prev + 1
    data_dir = os.path.join(path, "data", f"v{version}-{uuid.uuid4().hex[:8]}")
    df.write.mode("error").parquet(data_dir)
    files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    prev_files = []
    if mode == "append" and prev is not None:
        prev_files = _read_manifest(path, prev)["files"]
    n_new = df.sparkSession.read.parquet(data_dir).count()
    n_prev = _read_manifest(path, prev)["rows"] if prev_files else 0
    manifest = {
        "version": version,
        "mode": mode,
        "files": prev_files + files,
        "rows": n_prev + n_new,
        "schema": df.schema.jsonValue(),
    }
    _commit(path, version, manifest)
    return version


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """A pinned snapshot (default: latest committed). The manifest is
    resolved here, once — the returned frame reads a FIXED file list,
    so concurrent commits cannot change what this query sees."""
    if version is None:
        version = latest_version(path)
        if version is None:
            raise FileNotFoundError(f"no committed version at {path}")
    manifest = _read_manifest(path, version)
    files = manifest["files"]
    if not files:
        return spark.createDataFrame([], _schema_of(manifest))
    return spark.read.option("mergeSchema", "true").parquet(*files)


def _schema_of(manifest: dict):
    from pyspark.sql.types import StructType

    return StructType.fromJson(manifest["schema"])


def table_versions(path: str) -> list[dict]:
    """Audit view of the table's history from manifests alone — no data
    files are touched: (version, mode, n_files, rows)."""
    latest = latest_version(path)
    if latest is None:
        return []
    out = []
    for v in range(latest + 1):
        m = _read_manifest(path, v)
        out.append(
            {
                "version": v,
                "mode": m["mode"],
                "n_files": len(m["files"]),
                "rows": m["rows"],
            }
        )
    return out


def rollback(path: str, version: int) -> int:
    """Commit a NEW version whose snapshot equals ``version`` — O(1),
    no data movement, and the rolled-back-over versions stay readable
    for audit (history moves only forward)."""
    target = _read_manifest(path, version)
    prev = latest_version(path)
    new_version = prev + 1
    manifest = {
        "version": new_version,
        "mode": f"rollback->{version}",
        "files": target["files"],
        "rows": target["rows"],
        "schema": target["schema"],
    }
    _commit(path, new_version, manifest)
    return new_version


def committed_source_batches(path: str) -> set[int]:
    """Source batch ids already committed to this table (scan of the
    retained manifests — O(versions), metadata only)."""
    latest = latest_version(path)
    if latest is None:
        return set()
    out = set()
    for v in range(latest + 1):
        mp = _manifest_path(path, v)
        if not os.path.exists(mp):  # vacuumed below retention
            continue
        b = _read_manifest(path, v).get("source_batch_id")
        if b is not None:
            out.add(b)
    return out


def stream_versioned_sink(stream: DataFrame, path: str, *, checkpoint: str | None = None) -> None:
    """Exactly-once streaming append into a versioned table: each
    micro-batch commits as ONE table version carrying its source batch
    id in the manifest, and a replayed batch (at-least-once delivery,
    crash between data write and checkpoint advance) is SKIPPED when
    its id is already committed — the manifest log doubles as the
    idempotence ledger, which is precisely how Delta's streaming sink
    achieves exactly-once (txn appId/version in the log; Armbrust VLDB
    2020 §4.3). Readers get snapshot isolation per micro-batch commit
    instead of observing half-written files."""
    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_source_batches(path):
            return  # replay of a committed batch: exactly-once no-op
        prev = latest_version(path)
        version = 0 if prev is None else prev + 1
        data_dir = os.path.join(path, "data", f"v{version}-{uuid.uuid4().hex[:8]}")
        batch_df.write.mode("error").parquet(data_dir)
        files = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
        prev_files = _read_manifest(path, prev)["files"] if prev is not None else []
        n_prev = _read_manifest(path, prev)["rows"] if prev is not None else 0
        n_new = batch_df.sparkSession.read.parquet(data_dir).count()
        _commit(
            path,
            version,
            {
                "version": version,
                "mode": "stream-append",
                "source_batch_id": batch_id,
                "files": prev_files + files,
                "rows": n_prev + n_new,
                "schema": batch_df.schema.jsonValue(),
            },
        )

    writer = stream.writeStream.foreachBatch(_sink).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()


def optimize_table(
    spark: SparkSession, path: str, *, target_files: int = 1
) -> int:
    """Delta's OPTIMIZE: rewrite the LATEST snapshot into
    ``target_files`` files and commit the compacted layout as a new
    version — content-identical (it is the same frame, re-laid-out),
    readable history untouched, and the small-file problem an
    append-per-batch ingest accumulates is paid down without blocking
    readers (they keep resolving whichever manifest they pinned).
    Reclaim the superseded small files later via :func:`vacuum`.
    Returns the new version number, pinned to the optimized base via
    ``expected_base`` so a concurrent append can't be silently
    clobbered by the rewrite."""
    base = latest_version(path)
    if base is None:
        raise FileNotFoundError(f"no committed version at {path}")
    df = read_version(spark, path, base).coalesce(target_files)
    return versioned_write(df, path, mode="overwrite", expected_base=base)


def vacuum(path: str, *, keep_versions: int = 1) -> list[str]:
    """Reclaim data directories referenced by NO retained manifest:
    drops manifests older than the newest ``keep_versions`` snapshots,
    then deletes data dirs (crashed-write orphans included) that no
    surviving manifest references. Returns the deleted directories.
    Time travel is bounded by retention, exactly as in Delta.

    CONCURRENCY CAVEAT (same as Delta's VACUUM): an IN-FLIGHT write's
    data directory is indistinguishable from a crashed-write orphan
    until its manifest renames, so vacuum racing a writer can delete
    the files the writer is about to commit. Run vacuum from the same
    maintenance schedule that owns writes, or add an age threshold
    (Delta's RETAIN n HOURS) before adopting this at a multi-writer
    deployment. Readers are safe regardless: a reader that resolved a
    retained manifest reads files vacuum never touches — only if its
    snapshot ages OUT of retention mid-query can its files vanish,
    Delta's documented reader-retention contract."""
    import shutil

    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    latest = latest_version(path)
    if latest is None:
        return []
    keep_from = latest - keep_versions + 1
    referenced: set[str] = set()
    for v in range(keep_from, latest + 1):
        for f in _read_manifest(path, v)["files"]:
            referenced.add(os.path.dirname(f))
    for v in range(keep_from):
        mp = _manifest_path(path, v)
        if os.path.exists(mp):
            os.unlink(mp)
    removed = []
    data_root = os.path.join(path, "data")
    for d in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
        full = os.path.join(data_root, d)
        if full not in referenced:
            shutil.rmtree(full)
            removed.append(full)
    return removed
