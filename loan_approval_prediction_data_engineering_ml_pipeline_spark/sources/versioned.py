"""Manifest-based versioned parquet tables: snapshot isolation, time
travel, O(1) rollback, data skipping, and row-level MERGE — the
Delta-Lake commit protocol (Armbrust et al., "Delta Lake:
High-Performance ACID Table Storage over Cloud Object Stores", VLDB
2020) re-expressed at its minimal core, with plain parquet data files
and JSON manifests instead of a transaction log of actions.

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

Read-path scale (the VLDB 2020 §3.3 half): every commit records
PER-FILE statistics — row count and per-column min/max/null-count,
computed in one distributed pass over only the newly written files —
and :func:`read_version` takes a ``where=`` conjunction that prunes the
file list against those ranges BEFORE Spark ever plans the scan. At
100 TB a selective snapshot read opens the few files whose [min, max]
can satisfy the predicate, not the table; the residual filter is still
applied to the surviving files, so skipping is a pure optimization —
results are byte-identical with or without stats (legacy manifests
without stats simply skip nothing).

Write-path scale: commits are O(1) renames and — the Delta §3.1 log
refinement — append/merge/stream/metadata commits write DELTA records
(``base`` + ``add_files``/``add_stats``/``remove_files``), so the bytes
written per commit are O(files touched), never O(table files): a
micro-batch append to a million-file table logs kilobytes. Readers
resolve a snapshot by walking deltas back to the nearest full manifest
or checkpoint sidecar (``vN.checkpoint.json``, published automatically
every :data:`CHECKPOINT_EVERY` delta commits — put-if-absent, so racing
duplicate writers are harmless), which bounds resolution to O(K)
metadata reads. Listing avoidance is the point: readers never glob
``data/`` (object-store LIST is slow and eventually consistent), they
read the file list from the log. Vacuum pins the earliest retained
version with a checkpoint before dropping older records, so retained
chains never dangle below the horizon.
Row-level upserts go through :func:`merge_into` — copy-on-write
of ONLY the files that contain a matched key (Delta MERGE §4.2), so a
point update rewrites kilobytes of a 100 TB table, not the snapshot.

Durability boundary — the :class:`LogStore` layer (VLDB 2020 §3.2):
every log-plane operation (manifest read / atomic publish / list /
delete) and vacuum's reclamation walk goes through a pluggable
:class:`LogStore`, resolved per table-path prefix. The bundled
:class:`LocalLogStore` implements atomic put-if-absent with
``os.link`` (EEXIST on a present destination is atomic on POSIX —
strictly stronger than precheck-then-rename, whose race window lets a
second writer silently overwrite the first). S3-class object stores
have no atomic rename OR link; deploying there means registering a
store whose :meth:`LogStore.write_exclusive` is a conditional put
(``If-None-Match: *``) or an external mutex — the commit protocol
above the store is unchanged, which is exactly Delta's LogStore
contract. The path arithmetic around the table root
(``_rel_file``/``_abs_file``, merge_into's ``input_file_name()``
matching, DV directories, vacuum's reference walk) is SCHEME-AWARE:
plain paths and ``file:`` URIs work out of the box (a ``file:`` root
keeps URI form through the whole data plane — the exact code path an
object-store root takes — with :class:`LocalLogStore` mapping to the
filesystem at its own boundary), and ``s3a://``/``hdfs://`` roots are
accepted once a LogStore is registered for the prefix, with Spark's
configured Hadoop filesystem serving the data plane.
"""

from __future__ import annotations

import json
import os
import posixpath
import re
import shutil
import time
import uuid
import warnings
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(RuntimeError):
    """Another writer committed this version first — re-read latest
    state and retry (optimistic concurrency, first-writer-wins)."""


# ---------------------------------------------------------------------------
# LogStore: the pluggable durability boundary (Delta LogStore, VLDB 2020 §3.2)
# ---------------------------------------------------------------------------

class LogStore:
    """Storage primitives the commit protocol needs, and nothing more.

    Log plane (correctness-critical): :meth:`write_exclusive` MUST be an
    atomic put-if-absent — two concurrent publishes of the same path see
    exactly one winner, the loser raises :class:`FileExistsError`, and a
    reader never observes a partial entry. :meth:`read_text` /
    :meth:`list_dir` must see every previously published entry
    (read-after-write consistency for the log).

    Data plane (vacuum's reclamation walk + the stats pass's listing):
    best-effort filesystem semantics suffice — data files are immutable
    once a manifest references them, so these ops never race a reader.

    Deploying on an object store = implement this class with a
    conditional put (or an external coordination service) and
    :func:`register_log_store` it for the bucket prefix; nothing in the
    protocol changes (Delta's LogStore contract)."""

    # -- log plane --
    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_exclusive(self, path: str, text: str) -> None:
        """Atomically publish ``text`` at ``path`` iff absent; raise
        FileExistsError (never tear, never overwrite) otherwise."""
        raise NotImplementedError

    def list_dir(self, dirpath: str) -> list[str]:
        """Entry names in ``dirpath`` ([] if it does not exist)."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    # -- data plane --
    def list_subdirs(self, dirpath: str) -> list[str]:
        raise NotImplementedError

    def list_files(self, dirpath: str) -> list[str]:
        raise NotImplementedError

    def delete_tree(self, path: str) -> None:
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        raise NotImplementedError

    def size(self, path: str) -> int:
        """Data-file byte size — drives OPTIMIZE's bin-packing (how
        many target files a snapshot should compact into)."""
        raise NotImplementedError


class LocalLogStore(LogStore):
    """POSIX filesystems (local disk, properly-semantic NFS): atomic
    put-if-absent via ``os.link`` — link(2) fails with EEXIST atomically
    when the destination exists, closing the precheck-then-rename race
    where two writers both pass the check and the second rename silently
    clobbers the first commit. Requires hardlink support (true of local
    disk; mount options that strip it need a different store).

    Accepts both plain paths and ``file:`` URIs (the scheme-aware path
    layer keeps a ``file:``-rooted table's paths in URI form end to end
    — the exact arithmetic an object-store root exercises — and this
    store maps them to the local filesystem at its own boundary)."""

    @staticmethod
    def _fs(p: str) -> str:
        if p.startswith("file:"):
            from urllib.parse import unquote, urlparse

            return unquote(urlparse(p).path)
        return p

    def read_text(self, path: str) -> str:
        with open(self._fs(path)) as fh:
            return fh.read()

    def write_exclusive(self, path: str, text: str) -> None:
        path = self._fs(path)
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{os.path.basename(path)}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            fh.write(text)
        try:
            os.link(tmp, path)  # atomic: EEXIST iff path already present
        finally:
            os.unlink(tmp)

    def list_dir(self, dirpath: str) -> list[str]:
        dirpath = self._fs(dirpath)
        return os.listdir(dirpath) if os.path.isdir(dirpath) else []

    def exists(self, path: str) -> bool:
        return os.path.exists(self._fs(path))

    def delete(self, path: str) -> None:
        os.unlink(self._fs(path))

    def list_subdirs(self, dirpath: str) -> list[str]:
        dirpath = self._fs(dirpath)
        return sorted(
            d for d in self.list_dir(dirpath)
            if os.path.isdir(os.path.join(dirpath, d))
        )

    def list_files(self, dirpath: str) -> list[str]:
        dirpath = self._fs(dirpath)
        return sorted(
            f for f in self.list_dir(dirpath)
            if os.path.isfile(os.path.join(dirpath, f))
        )

    def delete_tree(self, path: str) -> None:
        shutil.rmtree(self._fs(path))

    def mtime(self, path: str) -> float:
        return os.path.getmtime(self._fs(path))

    def size(self, path: str) -> int:
        return os.path.getsize(self._fs(path))


_DEFAULT_STORE = LocalLogStore()
_STORES: list[tuple[str, LogStore]] = []  # (prefix, store), longest-prefix wins


def register_log_store(prefix: str, store: LogStore) -> None:
    """Route every table whose path starts with ``prefix`` through
    ``store`` (e.g. an S3 conditional-put store for ``s3a://bucket/``).
    Longest matching prefix wins; unmatched paths use the POSIX store.
    Re-registering a prefix REPLACES its store (idempotent bootstrap
    from multiple entry points, e.g. the streaming source's planner
    process re-establishing registrations by name)."""
    _STORES[:] = [(pfx, s) for pfx, s in _STORES if pfx != prefix]
    _STORES.append((prefix, store))
    _STORES.sort(key=lambda ps: -len(ps[0]))


def unregister_log_store(prefix: str) -> None:
    _STORES[:] = [(p, s) for p, s in _STORES if p != prefix]


def log_store_for(path: str) -> LogStore:
    for prefix, store in _STORES:
        if path.startswith(prefix):
            return store
    return _DEFAULT_STORE


class ConstraintViolation(ValueError):
    """Rows being committed (or already stored, for
    :func:`add_constraint`) fail a table CHECK constraint — the commit
    is refused and the table is unchanged (the written-but-uncommitted
    data directory is an invisible orphan, reclaimed by
    :func:`vacuum`)."""


class VersionVacuumedError(FileNotFoundError):
    """The requested version's manifest was reclaimed by :func:`vacuum`
    — it is below the retention horizon. Subclasses FileNotFoundError
    so callers that treat any missing snapshot uniformly keep working,
    while rollback/time-travel callers get the precise cause."""


# 2+ chars before the colon: real URI schemes (s3a:, hdfs:, file:, …)
# match, single-letter Windows drive prefixes (C:\…) do not.
_URI_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]+:")


def _is_uri(p: str) -> bool:
    return bool(_URI_SCHEME_RE.match(p))


def _canon_uri(p: str) -> str:
    """Canonical URI form used by ALL root/file arithmetic in this
    module: percent-decoded, path-normalized, trailing-slash-free.
    ``file:`` URIs canonicalize to the no-authority single-slash form
    (``file:/x/y`` — ``file:/x``, ``file:///x`` and the percent-encoded
    variants Spark's ``input_file_name()`` emits all collapse to it);
    remote schemes keep ``scheme://authority/path``. String prefix
    equality on canonical forms is then exactly path containment, which
    is what :func:`_rel_file` / vacuum's reference walk rely on."""
    from urllib.parse import unquote, urlparse

    u = urlparse(p)
    pth = posixpath.normpath(unquote(u.path)) if u.path else ""
    if pth in (".", "/"):
        pth = "" if u.scheme != "file" else "/"
    if u.scheme == "file":
        return "file:" + pth
    return f"{u.scheme}://{u.netloc}{pth}".rstrip("/")


def _canon(p: str) -> str:
    """Canonical absolute form: URIs via :func:`_canon_uri`, plain local
    paths via ``os.path.abspath``."""
    return _canon_uri(p) if _is_uri(p) else os.path.abspath(p)


def _join(root: str, *parts: str) -> str:
    """Scheme-aware join of POSIX-relative ``parts`` under ``root``
    (plain local roots keep ``os.path.join`` semantics — including
    staying relative when ``root`` is relative, matching the historical
    on-disk layout of committed test fixtures)."""
    if _is_uri(root):
        return "/".join([_canon_uri(root).rstrip("/"), *parts])
    return os.path.join(root, *parts)


def _check_scheme(path: str) -> str:
    """Scheme dispatch (replaces the r7 local-only rejection): plain
    paths and ``file:`` URIs are served by the bundled POSIX store out
    of the box; any other scheme (``s3a://…``, ``hdfs://…``) is accepted
    iff a :class:`LogStore` with atomic put-if-absent is registered for
    a matching prefix (:func:`register_log_store`) — the data plane then
    delegates to whatever Hadoop filesystem the SparkSession is
    configured with, and every path computation goes through the
    URI-aware helpers (``_canon``/``_join``/``_rel_file``/``_abs_file``/
    ``_norm_file``). An unmatched remote scheme is refused loudly: an
    ``os.path`` fallback would silently mangle it."""
    if _is_uri(path) and not path.startswith("file:"):
        if log_store_for(path) is _DEFAULT_STORE:
            raise ValueError(
                f"versioned table at {path!r}: no LogStore is registered for "
                f"this scheme — object stores need register_log_store() with "
                f"an atomic put-if-absent implementation (conditional put / "
                f"If-None-Match); 'file:' URIs and plain local paths work "
                f"out of the box"
            )
    return path


def _manifest_dir(path: str) -> str:
    _check_scheme(path)
    return _join(path, "_manifests")


def _manifest_path(path: str, version: int) -> str:
    return _join(_manifest_dir(path), f"v{version}.json")


_MANIFEST_NAME_RE = re.compile(r"^v(\d+)\.json$")


def _manifest_versions(path: str) -> list[int]:
    """Versions whose manifest is PRESENT (retained), ascending.
    Checkpoint sidecars (``vN.checkpoint.json``) are not commits and are
    excluded by the exact-name match."""
    out = []
    for name in log_store_for(path).list_dir(_manifest_dir(path)):
        m = _MANIFEST_NAME_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(path: str) -> int | None:
    """Highest committed version, or None for an uninitialized table."""
    versions = _manifest_versions(path)
    return versions[-1] if versions else None


def _read_raw_manifest(path: str, version: int) -> dict:
    """The PHYSICAL commit record — either a full snapshot (has
    ``files``/``stats``) or a delta record (``base``/``add_files``/
    ``add_stats``/``remove_files``). Per-commit attributes (mode, rows,
    txn, constraints, schema, source_batch_id) are always present raw;
    only the file inventory may need :func:`_resolve_files_stats`."""
    try:
        return json.loads(
            log_store_for(path).read_text(_manifest_path(path, version))
        )
    except FileNotFoundError:
        latest = latest_version(path)
        if latest is not None and version < latest:
            raise VersionVacuumedError(
                f"version {version} of {path} is below the vacuum retention "
                f"horizon (earliest retained: v{_manifest_versions(path)[0]})"
            ) from None
        raise


#: write a checkpoint sidecar once a delta chain reaches this many
#: records — bounds snapshot resolution to O(CHECKPOINT_EVERY) metadata
#: reads while keeping the per-commit write O(new files), Delta's
#: log-plus-checkpoint cost model (VLDB 2020 §3.1).
CHECKPOINT_EVERY = 10

#: blind-append OCC rebase budget: each retry means another writer won
#: the manifest race, so this bounds sustained same-instant contention,
#: not throughput (every iteration is O(metadata) unless constraints
#: changed under us).
_APPEND_REBASE_RETRIES = 64

_DELTA_KEYS = ("base", "add_files", "add_stats", "remove_files", "n_files", "dv_set")


def _checkpoint_path(path: str, version: int) -> str:
    return _join(_manifest_dir(path), f"v{version}.checkpoint.json")


def _read_checkpoint(path: str, version: int) -> dict | None:
    try:
        return json.loads(
            log_store_for(path).read_text(_checkpoint_path(path, version))
        )
    except FileNotFoundError:
        return None


def _resolve_files_stats(path: str, version: int) -> tuple[list[str], dict, dict]:
    """(files, stats, dv) of the snapshot at ``version``: walk delta
    records back to the nearest full manifest OR checkpoint sidecar
    (post-state of its version), then apply the deltas forward. ``dv``
    maps data file → deletion-vector directory (merge-on-read row
    masks); a removed file drops its dv entry, a ``dv_set`` key
    replaces entries. Chain length is bounded by
    :data:`CHECKPOINT_EVERY` once checkpoints exist; every walk passes
    through each intermediate version (``base`` is always
    ``version-1``), so one checkpoint covers all higher resolutions."""
    chain: list[dict] = []
    v = version
    raw = _read_raw_manifest(path, v)
    while "files" not in raw:
        cp = _read_checkpoint(path, v)
        if cp is not None:
            files = list(cp["files"])
            stats = dict(cp.get("stats", {}))
            dv = dict(cp.get("dv", {}))
            break
        chain.append(raw)
        v = raw["base"]
        raw = _read_raw_manifest(path, v)
    else:
        files = list(raw["files"])
        stats = dict(raw.get("stats", {}))
        dv = dict(raw.get("dv", {}))
    for d in reversed(chain):
        rm = set(d.get("remove_files", ()))
        if rm:
            files = [f for f in files if f not in rm]
            for f in rm:
                stats.pop(f, None)
                dv.pop(f, None)
        files = files + list(d.get("add_files", ()))
        stats.update(d.get("add_stats", {}))
        dv.update(d.get("dv_set", {}))
    return files, stats, dv


def _read_manifest(path: str, version: int) -> dict:
    """The RESOLVED manifest view at ``version`` — always carries
    ``files``/``stats``/``rows``/``constraints``/``schema`` (and ``txn``
    iff the record has one), whatever the physical record form. This is
    the contract every reader in and outside this module programs
    against; the log-of-deltas representation is invisible above it."""
    raw = _read_raw_manifest(path, version)
    if "files" in raw:
        return raw
    files, stats, dv = _resolve_files_stats(path, version)
    view = {k: v for k, v in raw.items() if k not in _DELTA_KEYS}
    view["files"] = files
    view["stats"] = stats
    if dv:
        view["dv"] = dv
    return view


def _chain_len(path: str, version: int) -> int:
    """Delta records between ``version`` (inclusive) and the nearest
    full manifest or checkpoint at/below it — metadata reads only."""
    n, v = 0, version
    while True:
        raw = _read_raw_manifest(path, v)
        if "files" in raw or _read_checkpoint(path, v) is not None:
            return n
        n += 1
        v = raw["base"]


def _maybe_checkpoint(path: str, version: int, *, force: bool = False) -> None:
    """Post-commit: once ``version`` tops a delta chain of
    :data:`CHECKPOINT_EVERY` records, publish its resolved state as a
    checkpoint sidecar. Best-effort and race-safe: the content is a
    deterministic function of the immutable log, and the put-if-absent
    publish makes concurrent duplicate writers harmless (one wins, the
    rest see FileExistsError on identical content)."""
    raw = _read_raw_manifest(path, version)
    if "files" in raw:
        return  # full manifests ARE checkpoints
    if not force and _chain_len(path, version) < CHECKPOINT_EVERY:
        return
    files, stats, dv = _resolve_files_stats(path, version)
    try:
        log_store_for(path).write_exclusive(
            _checkpoint_path(path, version),
            json.dumps({"files": files, "stats": stats, "dv": dv}, sort_keys=True),
        )
    except FileExistsError:
        pass


def _commit(path: str, version: int, manifest: dict) -> None:
    """The one atomic step: the store's put-if-absent publish. A cheap
    exists() precheck turns the common conflict into a typed error
    before serializing; the publish itself is the authority — two
    racing writers that both pass the precheck still get exactly one
    winner (LocalLogStore: os.link EEXIST; object stores: conditional
    put), the loser a :class:`CommitConflict`.

    Every commit is stamped ``committed_at`` (epoch seconds) here — the
    single choke point all write paths go through — which is what
    timestamp time travel (:func:`version_at_timestamp`, Delta's
    ``TIMESTAMP AS OF``) resolves against; pre-stamp (legacy) manifests
    fall back to the log file's mtime."""
    manifest.setdefault("committed_at", time.time())
    store = log_store_for(path)
    final = _manifest_path(path, version)
    if store.exists(final):
        raise CommitConflict(
            f"version {version} already committed at {path}; reload and retry"
        )
    try:
        store.write_exclusive(
            final, json.dumps(manifest, indent=1, sort_keys=True)
        )
    except FileExistsError as exc:  # lost the publish race post-precheck
        raise CommitConflict(
            f"version {version} already committed at {path}; reload and retry"
        ) from exc


class SchemaMismatch(ValueError):
    """The write's schema is incompatible with the table schema — a new
    column without ``merge_schema=True``, or a changed column type.
    Delta's schema-on-write enforcement: silent widening/corruption is
    refused before any data lands; evolution is an explicit opt-in."""


def _schema_types(schema_json: dict) -> dict[str, str]:
    """name → canonical type signature (nullability and metadata are
    advisory in Spark and deliberately ignored)."""
    return {
        f["name"]: json.dumps(f["type"], sort_keys=True)
        for f in schema_json["fields"]
    }


def _enforced_schema(
    stored: dict | None, incoming: dict, *, merge_schema: bool, context: str
) -> dict:
    """The schema the new manifest should record, under Delta's write
    rules: equal/subset writes keep the TABLE schema (a subset append
    must not shrink the recorded schema out from under readers — missing
    columns read back as NULL via the mergeSchema scan); new columns
    require ``merge_schema=True`` and append to the stored field list;
    a changed column type is always refused (rewrite via
    ``overwrite_schema`` instead)."""
    if stored is None:
        return incoming
    st, inc = _schema_types(stored), _schema_types(incoming)
    changed = sorted(n for n in inc if n in st and inc[n] != st[n])
    if changed:
        raise SchemaMismatch(
            f"{context}: column type changed for {changed} — versioned tables "
            f"refuse silent type evolution; overwrite with overwrite_schema=True "
            f"to rewrite the schema"
        )
    new = [f["name"] for f in incoming["fields"] if f["name"] not in st]
    if new and not merge_schema:
        raise SchemaMismatch(
            f"{context}: new column(s) {new} not in the table schema — pass "
            f"merge_schema=True to evolve (new columns read as NULL in old "
            f"snapshots)"
        )
    if not new:
        return stored
    return {
        **stored,
        "fields": list(stored["fields"])
        + [f for f in incoming["fields"] if f["name"] in set(new)],
    }


def _txn_carry(base: dict) -> dict:
    """Streaming-ledger carry-forward for NON-stream commits: the txn
    key rides along only when the base manifest has one. Materializing
    an empty ``{}`` onto a pre-txn (legacy) table would erase the
    missing-key marker :func:`stream_versioned_sink` uses to trigger its
    one-time ledger seed, and a replayed legacy stream batch would then
    append twice (ADVICE r6)."""
    return {"txn": base["txn"]} if "txn" in base else {}


# ---------------------------------------------------------------------------
# per-file statistics (the VLDB 2020 §3.3 data-skipping substrate)
# ---------------------------------------------------------------------------

def _norm_file(p: str, root: str | None = None) -> str:
    """``input_file_name()`` URIs → the canonical path space of the
    table root, so they compare equal to :func:`_abs_file` output:
    ``file:`` URIs decode to plain local paths — or keep the canonical
    ``file:`` prefix when the ROOT itself is a ``file:`` URI — and
    remote schemes canonicalize as URIs."""
    if not _is_uri(p):
        return p
    if p.startswith("file:"):
        from urllib.parse import unquote, urlparse

        plain = posixpath.normpath(unquote(urlparse(p).path))
        if root is not None and root.startswith("file:"):
            return "file:" + plain
        return plain
    return _canon_uri(p)


def _json_safe(v, toward: str | None = None):
    """min/max values must survive the JSON round-trip with their ORDER
    intact: dates/timestamps serialize to ISO strings (lexicographic ==
    chronological), Decimals to float, numerics/strings/bools as-is.

    Decimals round DIRECTIONALLY (``toward="down"`` for mins, ``"up"``
    for maxes — Delta does the same): float() rounds to nearest, so a
    stored min could land ABOVE the true min (Decimal('0.1') →
    0.1000000000000000055…) and :func:`_file_may_match` would prune a
    file containing matching rows. One ulp of widening keeps the range
    a true superset, so skipping stays a pure optimization."""
    import datetime
    import decimal
    import math

    if isinstance(v, decimal.Decimal):
        f = float(v)
        if math.isfinite(f):
            if toward == "down" and decimal.Decimal(f) > v:
                f = math.nextafter(f, -math.inf)
            elif toward == "up" and decimal.Decimal(f) < v:
                f = math.nextafter(f, math.inf)
        return f
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    return v


def _stats_columns(df: DataFrame) -> list[str]:
    """Columns with a total order worth indexing: numerics, strings,
    dates, timestamps, booleans. Nested/binary/array types carry no
    useful single min/max — they are simply not tracked (reads touching
    them never skip, which is the conservative contract)."""
    from pyspark.sql import types as T

    keep = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType,
        T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType,
        T.BooleanType,
    )
    return [f.name for f in df.schema.fields if isinstance(f.dataType, keep)]


def _violation_col(expr: str) -> Column:
    """SQL CHECK semantics: a row violates only when the expression is
    FALSE — NULL (unknown) passes, exactly as in ANSI CHECK and Delta
    constraints."""
    return ~F.coalesce(F.expr(expr), F.lit(True))


def _collect_file_stats(
    spark: SparkSession,
    data_dir: str,
    constraints: dict[str, str] | None = None,
) -> tuple[list[str], dict[str, dict], int]:
    """One distributed pass over a just-written data directory:
    (sorted file list, {file: {rows, min{col}, max{col}, nulls{col}}},
    total rows). Cost is O(new files' rows) per commit — the same rows
    the commit just wrote — never a rescan of the table. Table CHECK
    constraints are enforced in the SAME pass (extra agg columns, no
    extra scan): any violating row raises :class:`ConstraintViolation`
    before a manifest can reference the data."""
    files = sorted(
        _join(data_dir, f)
        for f in log_store_for(data_dir).list_files(data_dir)
        if f.endswith(".parquet")
    )
    if not files:
        return [], {}, 0
    df = spark.read.parquet(data_dir)
    cols = _stats_columns(df)
    cons = list((constraints or {}).items())
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"__mn__{c}"))
        aggs.append(F.max(c).alias(f"__mx__{c}"))
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nl__{c}"))
    for i, (_, expr) in enumerate(cons):
        aggs.append(
            F.sum(_violation_col(expr).cast("long")).alias(f"__viol__{i}")
        )
    per_file = (
        df.withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(*aggs)
        .collect()
    )
    violations = {
        name: sum(int(r[f"__viol__{i}"] or 0) for r in per_file)
        for i, (name, _) in enumerate(cons)
    }
    broken = {n: v for n, v in violations.items() if v}
    if broken:
        raise ConstraintViolation(
            f"commit refused: CHECK constraint(s) violated by new rows — "
            + ", ".join(
                f"{n!r} ({constraints[n]}): {v} row(s)" for n, v in broken.items()
            )
        )
    stats: dict[str, dict] = {}
    total = 0
    for r in per_file:
        entry = {
            "rows": int(r["__rows"]),
            "min": {c: _json_safe(r[f"__mn__{c}"], toward="down") for c in cols},
            "max": {c: _json_safe(r[f"__mx__{c}"], toward="up") for c in cols},
            "nulls": {c: int(r[f"__nl__{c}"]) for c in cols},
        }
        stats[_norm_file(r["__file"], data_dir)] = entry
        total += entry["rows"]
    return files, stats, total


_SKIP_OPS = ("==", "!=", "<", "<=", ">", ">=")

#: a ``where=`` predicate: conjunction of (column, op, literal) triples.
Where = Sequence[tuple[str, str, object]]


#: sentinel from :func:`_coerced`: no order-preserving alignment exists
#: between the stored stat and the caller's literal — the caller must
#: KEEP the file (pruning on a coerced order that disagrees with the
#: residual Spark filter's cast semantics would drop matching rows).
_KEEP = object()

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _coerced(stored, v):
    """Align the caller's literal with the JSON-stored min/max domain
    (dates/timestamps live as ISO strings in the manifest). Returns
    :data:`_KEEP` whenever the cross-type comparison is not provably
    order-identical to Spark's own cast semantics — conservative by
    contract: skipping must never change results.

    The two subtle pairings (both previously mis-pruned):

    - DateType stats ('YYYY-MM-DD') vs a ``datetime`` literal: only an
      exact-midnight naive timestamp IS its date; coercing
      '1998-08-02 12:00:00' against date strings makes the range bound
      direction-dependent ('>= max' skips a file whose rows match), so
      any non-midnight time keeps the file.
    - TimestampType stats ('YYYY-MM-DD HH:MM:SS') vs a ``date``
      literal: the literal means midnight, and bare 'YYYY-MM-DD' sorts
      BEFORE 'YYYY-MM-DD 00:00:00' — serialize the midnight explicitly
      so '<='/'>' bounds land exactly where Spark's date→timestamp
      cast puts them.
    """
    import datetime
    import decimal

    if isinstance(stored, bool):
        return v if isinstance(v, bool) else _KEEP
    if isinstance(stored, (int, float)):
        if isinstance(v, decimal.Decimal):
            # Spark coerces decimal-vs-double comparisons to double (the
            # literal is rounded, not compared as an exact rational);
            # long-vs-decimal widens to decimal and stays exact. Mirror
            # each so the pruning order IS the residual filter's order.
            return float(v) if isinstance(stored, float) else v
        if isinstance(v, (bool, int, float)):
            return v  # Python's numeric tower compares these exactly
        return _KEEP
    if isinstance(stored, str):
        if isinstance(v, datetime.datetime):
            if v.tzinfo is not None:
                # a tz-aware literal's ordering vs naive stored stats
                # depends on the session timezone; isoformat would embed
                # the offset text and break lexicographic alignment
                return _KEEP
            if _DATE_RE.match(stored):
                if v.tzinfo is None and v.time() == datetime.time():
                    return v.date().isoformat()
                return _KEEP
            return v.isoformat(sep=" ")
        if isinstance(v, datetime.date):
            return v.isoformat() if _DATE_RE.match(stored) else v.isoformat() + " 00:00:00"
        if isinstance(v, str):
            return v
        return _KEEP  # str(v) lexicographic order != Spark's cast semantics
    return v if type(stored) is type(v) else _KEEP


def _file_may_match(fstats: dict | None, where: Where) -> bool:
    """Can ANY row of this file satisfy the conjunction? False only on
    proof from the recorded ranges (unknown columns / missing stats /
    incomparable literals keep the file — skipping must never change
    results, only the files opened)."""
    if not fstats:
        return True  # legacy manifest or statless file: never skip
    mins, maxs = fstats.get("min", {}), fstats.get("max", {})
    for col, op, v in where:
        if op not in _SKIP_OPS:
            raise ValueError(f"unsupported predicate op {op!r} (use one of {_SKIP_OPS})")
        if col not in mins:
            continue  # untracked column: no evidence either way
        mn, mx = mins[col], maxs.get(col)
        if mn is None or mx is None:
            return False  # zero non-null values: no comparison can hold
        v = _coerced(mn, v)
        if v is _KEEP:
            continue  # no sound cross-type order: keep the file
        try:
            if op == "==" and (v < mn or v > mx):
                return False
            if op == "!=" and mn == mx == v:
                return False
            if op == "<" and mn >= v:
                return False
            if op == "<=" and mn > v:
                return False
            if op == ">" and mx <= v:
                return False
            if op == ">=" and mx < v:
                return False
        except TypeError:
            continue  # incomparable literal: keep the file
    return True


def _where_column(where: Where) -> Column:
    conds = []
    for col, op, v in where:
        c, lit = F.col(col), F.lit(v)
        conds.append(
            {"==": c == lit, "!=": c != lit, "<": c < lit,
             "<=": c <= lit, ">": c > lit, ">=": c >= lit}[op]
        )
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _rel_file(path: str, f: str) -> str:
    """Manifests store file paths RELATIVE to the table root (Delta does
    the same in its log) so a table — committed test fixtures included —
    survives relocation of the directory tree. Scheme-aware: a
    ``file:``/``s3a://`` root relativizes its own URIs identically.
    Files outside the root stay absolute (shallow-clone references,
    never produced by this writer's appends, tolerated on read)."""
    root = _canon(path).rstrip("/")
    af = _canon_uri(f) if _is_uri(f) else os.path.abspath(f)
    if af.startswith(root + "/"):
        return af[len(root) + 1 :]
    return f


def _abs_file(path: str, f: str) -> str:
    """Resolve a manifest entry against the table root. Absolute entries
    — plain or URI (shallow clones store the source's canonical form) —
    pass through untouched."""
    return f if _is_uri(f) or os.path.isabs(f) else _join(_canon(path), f)


def _pruned_rel_files(manifest: dict, where: Where | None) -> list[str]:
    """Stats-pruned file list in manifest (table-root-relative) form.
    Deletion vectors only REMOVE rows, so the recorded per-file ranges
    stay true supersets and pruning soundness is unaffected by DVs."""
    files = manifest["files"]
    if where:
        stats = manifest.get("stats", {})
        files = [f for f in files if _file_may_match(stats.get(f), where)]
    return files


def snapshot_files(
    path: str, version: int | None = None, where: Where | None = None
) -> list[str]:
    """The exact file list a (possibly predicate-pruned) snapshot read
    scans — the planning half of :func:`read_version`, exposed so tests
    and external readers (e.g. a DuckDB ``read_parquet`` twin) can
    verify pruning and read the identical bytes. Returned paths are
    resolved against the table root (manifests store them relative).
    NOTE: on a table with deletion vectors the file bytes alone
    over-count — masked rows are subtracted at read time
    (:func:`read_version`); :func:`snapshot_deletes` exposes the masks."""
    if version is None:
        version = latest_version(path)
        if version is None:
            raise FileNotFoundError(f"no committed version at {path}")
    manifest = _read_manifest(path, version)
    return [_abs_file(path, f) for f in _pruned_rel_files(manifest, where)]


def snapshot_deletes(path: str, version: int | None = None) -> dict[str, str]:
    """The snapshot's deletion-vector map: data file → DV directory
    (both resolved to absolute paths). Empty for tables without
    merge-on-read deletes. External readers subtract the (file_name,
    row_index) pairs listed in the DV parquet from the corresponding
    file's rows to reproduce :func:`read_version` exactly."""
    if version is None:
        version = latest_version(path)
        if version is None:
            raise FileNotFoundError(f"no committed version at {path}")
    manifest = _read_manifest(path, version)
    return {
        _abs_file(path, f): _abs_file(path, e["dir"])
        for f, e in manifest.get("dv", {}).items()
    }


#: masks at or below this many rows get an explicit broadcast hint
#: (~100 MB at mask-row width); larger masks leave the join strategy to
#: the planner/AQE — a shuffled hash anti-join with identical semantics.
_DV_BROADCAST_ROWS = 5_000_000


def _hint_small(df: DataFrame, n_rows: int) -> DataFrame:
    return F.broadcast(df) if n_rows <= _DV_BROADCAST_ROWS else df


#: above this many names a literal ``isin(...)`` bloats the plan tree;
#: restrict via a broadcast semi-join on the (tiny) name table instead.
_ISIN_NAME_LIMIT = 512


def _basenames(files: Sequence[str]) -> set[str]:
    """Unique basenames of ``files``. Every row-mask join in this module
    keys on ``_metadata.file_name`` — a BASENAME — so a collision among
    the candidate files (plausible for shallow clones referencing
    external absolute paths) would silently cross-apply masks between
    same-named files. Spark's uuid'd part names make collisions rare but
    nothing enforces them: fail loudly instead of mis-masking."""
    files = list(files)
    names = {os.path.basename(f) for f in files}
    if len(names) != len(files):
        dupes = sorted(
            n
            for n in names
            if sum(1 for f in files if os.path.basename(f) == n) > 1
        )
        raise ValueError(
            "deletion-vector bookkeeping requires unique data-file "
            f"basenames; colliding name(s): {dupes[:5]} — rewrite the "
            "clashing files (optimize_table) before row-level operations"
        )
    return names


def _where_name_in(
    spark: SparkSession, df: DataFrame, col: str, names: set[str]
) -> DataFrame:
    """``df`` restricted to rows whose ``col`` is in ``names`` — a
    literal ``isin`` while the list is small, a broadcast semi-join on a
    one-column name table above :data:`_ISIN_NAME_LIMIT` (same
    semantics, bounded plan size)."""
    ordered = sorted(names)
    if len(ordered) <= _ISIN_NAME_LIMIT:
        return df.where(F.col(col).isin(*ordered))
    return df.join(
        F.broadcast(
            spark.createDataFrame([(n,) for n in ordered], f"{col} string")
        ),
        col,
        "left_semi",
    )


def _masked_snapshot_frame(
    spark: SparkSession,
    path: str,
    rel_files: Sequence[str],
    dv: dict[str, str],
    *,
    file_col: str | None = None,
) -> DataFrame | None:
    """The live rows of ``rel_files`` under deletion-vector map ``dv``:
    clean files scan as one plain branch; DV'd files scan once with
    ``_metadata`` (file_name, row_index) and drop masked rows via ONE
    anti-join against the DV parquet — broadcast-hinted while the
    per-file tallies say the mask fits (kilobytes per masked file),
    planner-chosen above :data:`_DV_BROADCAST_ROWS`. ``file_col`` optionally
    surfaces each row's absolute source file (merge_into's touched-file
    probe). Returns None when ``rel_files`` is empty."""
    rel_files = list(rel_files)
    if not rel_files:
        return None
    dvd = [f for f in rel_files if f in dv]
    clean = [f for f in rel_files if f not in dv]
    frames = []
    if clean:
        frame = spark.read.option("mergeSchema", "true").parquet(
            *[_abs_file(path, f) for f in clean]
        )
        if file_col:
            frame = frame.withColumn(file_col, F.input_file_name())
        frames.append(frame)
    if dvd:
        base = (
            spark.read.option("mergeSchema", "true")
            .parquet(*[_abs_file(path, f) for f in dvd])
            .withColumn("__dv_fn", F.col("_metadata.file_name"))
            .withColumn("__dv_ri", F.col("_metadata.row_index"))
        )
        if file_col:
            base = base.withColumn(file_col, F.input_file_name())
        names = _basenames(dvd)
        masks = spark.read.parquet(
            *sorted({_abs_file(path, dv[f]["dir"]) for f in dvd})
        )
        masks = _where_name_in(spark, masks, "file_name", names)
        masks = masks.select(
            F.col("file_name").alias("__dv_fn"),
            F.col("row_index").alias("__dv_ri"),
        )
        n_masked = sum(dv[f].get("rows", 0) for f in dvd)
        frames.append(
            base.join(
                _hint_small(masks, n_masked), ["__dv_fn", "__dv_ri"], "left_anti"
            ).drop("__dv_fn", "__dv_ri")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def versioned_write(
    df: DataFrame,
    path: str,
    *,
    mode: str = "append",
    expected_base: int | None = None,
    merge_schema: bool = False,
    overwrite_schema: bool = False,
    txn: tuple[str, int] | None = None,
    _commit_extra: dict | None = None,
) -> int:
    """Commit ``df`` as the table's next version and return its number.

    ``mode="append"``: the new snapshot = previous file list + the new
    files (no data rewrite — append is metadata-plus-new-files only).
    ``mode="overwrite"``: the new snapshot = the new files alone; prior
    versions remain readable (nothing is deleted).

    Every commit records per-file min/max/null-count stats for the NEW
    files (one pass over just-written data) and carries forward the
    previous manifest's stats and streaming-txn ledger, so data skipping
    and exactly-once bookkeeping survive arbitrary interleavings of
    batch and streaming commits.

    ``expected_base`` pins the version this write was DERIVED from
    (read-modify-write transactions): if another writer committed since,
    the write fails with :class:`CommitConflict` before any data lands —
    re-read and retry. Without it, a blind append that loses the
    manifest race REBASES automatically (Delta's OCC logical-conflict
    rule: appends commute with any interleaved commit, because a delta
    record referencing only its own new files is valid against any
    head): the already-written data directory is reused, the schema is
    re-enforced against the new head, constraints that changed under us
    re-validate our files (a rescan of only the new data), and the
    delta record re-commits onto the new base — so N concurrent
    appenders all succeed with N contiguous versions. Overwrites never
    rebase (last-writer-wins semantics must stay explicit).

    ``txn=(app_id, txn_version)`` is Delta's idempotent-writes contract
    (``txnAppId``/``txnVersion``) for BATCH writers — the same ledger
    the streaming sinks stamp: if the table's txn map already records
    ``app_id`` at or beyond ``txn_version``, the write is a no-op
    returning the current version (a retried orchestration step —
    Airflow task retry, speculative job re-run — cannot double-append);
    otherwise the commit advances the app's ledger entry atomically
    with the data. A pre-ledger (legacy) table gets the ledger seeded
    from its manifest history first, so materializing the txn map never
    erases the missing-key marker the streaming sink's one-time seed
    relies on (the ADVICE r6 contract).

    Schema-on-write (Delta's enforcement contract): the incoming frame
    must match the table schema — subset writes are fine (missing
    columns read back as NULL), NEW columns need ``merge_schema=True``
    (the union schema is recorded, old snapshots unchanged), and a
    changed column TYPE is refused unless a full rewrite opts in via
    ``mode="overwrite", overwrite_schema=True``. All checks fire BEFORE
    any data lands — a refused write leaves nothing to vacuum.
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
    # append commits need only the previous RECORD's metadata (rows, txn,
    # constraints — all present raw): the file inventory is never
    # materialized, so commit cost is O(new files), not O(table files)
    prev_m = _read_raw_manifest(path, prev) if prev is not None else {}
    if txn is not None:
        txn_app, txn_version = txn
        ledger = dict(prev_m.get("txn", {}))
        if prev is not None and "txn" not in prev_m:
            # materializing the ledger onto a pre-txn table: seed every
            # stream app's high-water mark from history first, or the
            # streaming sink's one-time seed (keyed on the MISSING txn
            # key) would never fire and legacy stream replays would
            # double-append
            ledger.update(_seed_ledger_from_history(path))
        if ledger.get(txn_app, -1) >= txn_version:
            return prev  # already applied: idempotent no-op
        _commit_extra = {**(_commit_extra or {}), "txn": {**ledger, txn_app: txn_version}}
    if prev is not None and not (mode == "overwrite" and overwrite_schema):
        schema_json = _enforced_schema(
            prev_m.get("schema"),
            df.schema.jsonValue(),
            merge_schema=merge_schema,
            context=f"{mode} to {path} (v{version})",
        )
    else:
        schema_json = df.schema.jsonValue()
    data_dir = _join(path, "data", f"v{version}-{uuid.uuid4().hex[:8]}")
    df.write.mode("error").parquet(data_dir)
    files, new_stats, n_new = _collect_file_stats(
        df.sparkSession, data_dir, prev_m.get("constraints")
    )
    files = [_rel_file(path, f) for f in files]
    new_stats = {_rel_file(path, f): s for f, s in new_stats.items()}
    def _append_manifest(v: int, base: int, bm: dict) -> dict:
        # delta record: the log-of-actions form (Delta VLDB 2020 §3.1)
        return {
            "version": v,
            "mode": mode,
            "base": base,
            "add_files": files,
            "add_stats": new_stats,
            "remove_files": [],
            "n_files": bm.get("n_files", len(bm.get("files", ()))) + len(files),
            "rows": bm.get("rows", 0) + n_new,
            **_txn_carry(bm),
            "constraints": bm.get("constraints", {}),
            "schema": schema_json,
            **(_commit_extra or {}),
        }

    if mode == "append" and prev is not None:
        manifest = _append_manifest(version, prev, prev_m)
    else:  # first commit or overwrite: the new file set IS the snapshot
        manifest = {
            "version": version,
            "mode": mode,
            "files": files,
            "rows": n_new,
            "stats": new_stats,
            **_txn_carry(prev_m),
            "constraints": prev_m.get("constraints", {}),
            "schema": schema_json,
            **(_commit_extra or {}),
        }
    blind_append = mode == "append" and expected_base is None
    validated_constraints = prev_m.get("constraints") or {}
    for _ in range(_APPEND_REBASE_RETRIES):
        try:
            _commit(path, version, manifest)
            break
        except CommitConflict:
            if not blind_append:
                raise
            prev = latest_version(path)
            if prev is None:  # raced a table delete: nothing to rebase on
                raise
            prev_m = _read_raw_manifest(path, prev)
            if txn is not None:
                ledger = dict(prev_m.get("txn", {}))
                if "txn" not in prev_m:
                    ledger.update(_seed_ledger_from_history(path))
                if ledger.get(txn_app, -1) >= txn_version:
                    # a concurrent retry of OUR txn won; the data dir
                    # this attempt already wrote is an unreferenced
                    # orphan, reclaimed by vacuum like any crashed write
                    return prev
                # merge the moved head's ledger so other apps' entries
                # committed under us are never clobbered by the rebase
                _commit_extra = {
                    **(_commit_extra or {}),
                    "txn": {**ledger, txn_app: txn_version},
                }
            # the head moved under us: re-enforce schema against it, and
            # re-validate OUR files if its constraints changed (a rescan
            # of only the just-written data, never the table)
            schema_json = _enforced_schema(
                prev_m.get("schema"),
                df.schema.jsonValue(),
                merge_schema=merge_schema,
                context=f"append rebase to {path} (onto v{prev})",
            )
            head_constraints = prev_m.get("constraints") or {}
            if head_constraints != validated_constraints:
                _collect_file_stats(df.sparkSession, data_dir, head_constraints)
                validated_constraints = head_constraints
            version = prev + 1
            manifest = _append_manifest(version, prev, prev_m)
    else:
        raise CommitConflict(
            f"append to {path} lost {_APPEND_REBASE_RETRIES} consecutive "
            "commit races — contention this hot needs batching upstream"
        )
    _maybe_checkpoint(path, version)
    return version


def read_version(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    *,
    timestamp: float | None = None,
    where: Where | None = None,
) -> DataFrame:
    """A pinned snapshot (default: latest committed). The manifest is
    resolved here, once — the returned frame reads a FIXED file list,
    so concurrent commits cannot change what this query sees.

    ``timestamp`` (epoch seconds, mutually exclusive with ``version``)
    is Delta's ``TIMESTAMP AS OF``: the snapshot current at that
    instant, via :func:`version_at_timestamp`.

    ``where=[(col, op, value), ...]`` (conjunction; ops ``== != < <= >
    >=``) prunes the file list against the manifest's per-file min/max
    BEFORE planning — a selective read of a 100 TB table opens only the
    files whose range can satisfy the predicate — and is then applied
    as an ordinary filter on the surviving files, so the result equals
    ``read_version(...).filter(...)`` exactly, stats or no stats."""
    if timestamp is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp, not both")
        version = version_at_timestamp(path, timestamp)
    if version is None:
        version = latest_version(path)
        if version is None:
            raise FileNotFoundError(f"no committed version at {path}")
    manifest = _read_manifest(path, version)
    rel = _pruned_rel_files(manifest, where)
    out = _masked_snapshot_frame(spark, path, rel, manifest.get("dv", {}))
    if out is None:
        out = spark.createDataFrame([], _schema_of(manifest))
    if where:
        out = out.where(_where_column(where))
    return out


def _schema_of(manifest: dict):
    from pyspark.sql.types import StructType

    return StructType.fromJson(manifest["schema"])


def read_changes(
    spark: SparkSession,
    path: str,
    from_version: int | None = None,
    to_version: int | None = None,
    *,
    from_timestamp: float | None = None,
    to_timestamp: float | None = None,
) -> DataFrame:
    """Change data feed between two snapshots (Delta CDF semantics,
    derived purely from the commit log): every row inserted or deleted
    by each commit in ``(from_version, to_version]``, stamped with
    ``_change_type`` (``'insert'`` | ``'delete'``) and
    ``_commit_version``. The derivation is the per-commit FILE-LIST
    diff — files a version adds contribute their rows as inserts, files
    it drops as deletes — so the feed reads ONLY the diffed files, never
    a snapshot: consuming a day of appends from a 100 TB table costs the
    day's files. The defining invariant (tested):

        snapshot(from) ⊎ inserts ∖ deletes == snapshot(to)   (as multisets)

    Copy-on-write rewrites (``merge_into``, ``optimize_table``,
    ``rollback``) show a row carried through a rewritten file as a
    delete+insert of equal content — correct but verbose; Delta tightens
    this by writing dedicated change files during MERGE (CDF §'change
    data' in the Delta docs), a pure optimization this derivation can
    adopt later without changing consumers. Append-only histories (the
    streaming sink's) have no such noise: the feed IS the appended rows,
    which makes ``read_changes(path, cursor)`` +
    ``_change_type='insert'`` the incremental-consumption primitive for
    downstream pipelines. Versions below the vacuum retention horizon
    raise :class:`VersionVacuumedError`.

    Timestamp bounds (Delta CDF's ``startingTimestamp``/
    ``endingTimestamp``; each mutually exclusive with its version
    twin): ``from_timestamp`` resolves to the snapshot current AT that
    instant (changes strictly after it stream), ``to_timestamp`` to the
    last version committed at or before it."""
    if from_timestamp is not None:
        if from_version is not None:
            raise ValueError("pass from_version OR from_timestamp, not both")
        from_version = version_at_timestamp(path, from_timestamp)
    if from_version is None:
        raise ValueError("one of from_version / from_timestamp is required")
    if to_timestamp is not None:
        if to_version is not None:
            raise ValueError("pass to_version OR to_timestamp, not both")
        to_version = version_at_timestamp(path, to_timestamp)
    if to_version is None:
        to_version = latest_version(path)
        if to_version is None:
            raise FileNotFoundError(f"no committed version at {path}")
    if from_version > to_version:
        raise ValueError(
            f"from_version {from_version} > to_version {to_version}"
        )
    frames: list[DataFrame] = []

    def _tag(df: DataFrame, tag: str, v: int) -> DataFrame:
        return df.withColumn("_change_type", F.lit(tag)).withColumn(
            "_commit_version", F.lit(v).cast("long")
        )

    def _mask_rows(dvmap: dict, names: set[str]) -> DataFrame | None:
        """(file_name, row_index) masked pairs of ``names`` under
        ``dvmap``, as join keys (__fn, __ri); None when unmasked."""
        dirs = sorted(
            {
                _abs_file(path, e["dir"])
                for f, e in dvmap.items()
                if os.path.basename(f) in names
            }
        )
        if not dirs:
            return None
        return _where_name_in(
            spark, spark.read.parquet(*dirs), "file_name", names
        ).select(
            F.col("file_name").alias("__fn"), F.col("row_index").alias("__ri")
        )

    m0 = _read_manifest(path, from_version)
    prev_files = set(m0["files"])
    prev_dv = dict(m0.get("dv", {}))
    for v in range(from_version + 1, to_version + 1):
        raw = _read_raw_manifest(path, v)
        if "files" in raw:
            cur_files = set(raw["files"])
            cur_dv = dict(raw.get("dv", {}))
        else:  # delta record: roll state forward — O(commit), not O(table)
            rm = set(raw.get("remove_files", ()))
            cur_files = (prev_files - rm) | set(raw.get("add_files", ()))
            cur_dv = {f: e for f, e in prev_dv.items() if f not in rm}
            cur_dv.update(raw.get("dv_set", {}))
        # file-level churn: a version's LIVE rows, so masks apply
        # (an added file contributes only its unmasked rows; a dropped
        # file's already-deleted rows are not deleted twice)
        for files, dvmap, tag in (
            (sorted(cur_files - prev_files), cur_dv, "insert"),
            (sorted(prev_files - cur_files), prev_dv, "delete"),
        ):
            frame = _masked_snapshot_frame(spark, path, files, dvmap)
            if frame is not None:
                frames.append(_tag(frame, tag, v))
        # row-level churn on carried files: a grown mask is deletes, a
        # shrunk one (rollback across a delete) is resurrections
        carried = [
            f
            for f in cur_files & prev_files
            if prev_dv.get(f) != cur_dv.get(f)
        ]
        if carried:
            names = _basenames(carried)
            oldm = _mask_rows(prev_dv, names)
            newm = _mask_rows(cur_dv, names)
            scan = (
                spark.read.option("mergeSchema", "true")
                .parquet(*[_abs_file(path, f) for f in carried])
                .withColumn("__fn", F.col("_metadata.file_name"))
                .withColumn("__ri", F.col("_metadata.row_index"))
            )
            n_mask = sum(
                m.get(f, {}).get("rows", 0)
                for f in carried
                for m in (prev_dv, cur_dv)
            )
            for grown, within, tag in ((newm, oldm, "delete"), (oldm, newm, "insert")):
                if grown is None:
                    continue
                delta_mask = (
                    grown
                    if within is None
                    else grown.join(within, ["__fn", "__ri"], "left_anti")
                )
                frames.append(
                    _tag(
                        scan.join(
                            _hint_small(delta_mask, n_mask), ["__fn", "__ri"], "left_semi"
                        ).drop("__fn", "__ri"),
                        tag,
                        v,
                    )
                )
        prev_files, prev_dv = cur_files, cur_dv
    if not frames:
        from pyspark.sql.types import LongType, StringType

        schema = _schema_of(_read_manifest(path, to_version))
        schema = schema.add("_change_type", StringType()).add(
            "_commit_version", LongType()
        )
        return spark.createDataFrame([], schema)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def _seed_ledger_from_history(path: str) -> dict[str, int]:
    """Per-app high-water marks from the retained manifest history —
    the one-time ledger seed a writer runs before materializing a
    ``txn`` map onto a pre-ledger table (metadata-only scan)."""
    per: dict[str, int] = {}
    store = log_store_for(path)
    for v in _manifest_versions(path):
        if not store.exists(_manifest_path(path, v)):
            continue  # vacuumed below retention
        m = _read_raw_manifest(path, v)
        b = m.get("source_batch_id")
        a = m.get("app_id")
        if b is not None and a is not None:
            per[a] = max(per.get(a, -1), b)
    return per


def commit_timestamp(path: str, version: int) -> float:
    """Epoch seconds a version was committed: the manifest's
    ``committed_at`` stamp, or (legacy pre-stamp manifests) the log
    file's mtime."""
    m = _read_raw_manifest(path, version)
    if "committed_at" in m:
        return float(m["committed_at"])
    return log_store_for(path).mtime(_manifest_path(path, version))


def version_at_timestamp(path: str, ts: float) -> int:
    """Delta's ``TIMESTAMP AS OF``: the latest RETAINED version whose
    commit time is <= ``ts``. O(retained manifests) metadata reads, no
    data touched. Raises if ``ts`` predates the earliest retained
    commit (vacuum bounds timestamp travel exactly as it bounds
    version travel).

    Raw stamps need not be monotonic across versions: multi-writer
    clock skew, or a relocated legacy table whose pre-stamp manifests
    fall back to mtime, can give a later version an earlier timestamp.
    Delta's monotonic adjustment applies while scanning — each
    version's effective time is ``max(commit_ts, previous effective)``
    — so the version order is always respected and a skewed later
    version is never returned for an instant at which it did not yet
    exist (Delta's ``commitInfo`` in-commit-timestamp rule)."""
    best = None
    eff = None
    for v in _manifest_versions(path):
        raw = commit_timestamp(path, v)
        eff = raw if eff is None else max(raw, eff)
        if eff <= ts:
            best = v
    if best is None:
        raise ValueError(
            f"no retained version at or before timestamp {ts} at {path} "
            "(earliest retained commit is younger — vacuumed history is "
            "not reachable)"
        )
    return best


def table_versions(path: str) -> list[dict]:
    """Audit view of the table's RETAINED history from manifests alone —
    no data files are touched: (version, mode, n_files, rows). Versions
    vacuumed below retention are absent (not an error): the audit view
    of a vacuumed table is the trimmed history, exactly what a reader
    can still time-travel to."""
    out = []
    store = log_store_for(path)
    for v in _manifest_versions(path):
        if not store.exists(_manifest_path(path, v)):
            continue  # vacuum raced us between list and read
        m = _read_raw_manifest(path, v)  # mode/rows/n_files: no resolution
        out.append(
            {
                "version": v,
                "mode": m["mode"],
                "n_files": len(m["files"]) if "files" in m else m["n_files"],
                "rows": m["rows"],
                "committed_at": m.get("committed_at"),
            }
        )
    return out


def rollback(path: str, version: int) -> int:
    """Commit a NEW version whose snapshot equals ``version`` — O(1),
    no data movement, and the rolled-back-over versions stay readable
    for audit (history moves only forward). Rolling back to a version
    below the vacuum retention horizon raises
    :class:`VersionVacuumedError` — its data directories may already be
    reclaimed, so the snapshot is unrecoverable by design (Delta's
    retention contract)."""
    target = _read_manifest(path, version)  # VersionVacuumedError if reclaimed
    prev = latest_version(path)
    prev_m = _read_raw_manifest(path, prev)  # txn/constraints: no resolution
    new_version = prev + 1
    manifest = {
        "version": new_version,
        "mode": f"rollback->{version}",
        "files": target["files"],
        "rows": target["rows"],
        "stats": target.get("stats", {}),
        "dv": target.get("dv", {}),  # masks are part of the restored snapshot
        **_txn_carry(prev_m),  # ledger follows HISTORY, not the target
        # governance follows HISTORY too: restoring old data does not
        # silently drop a constraint added since (rollback data that now
        # violates is still readable — constraints gate WRITES)
        "constraints": prev_m.get("constraints", {}),
        "schema": target["schema"],
    }
    _commit(path, new_version, manifest)
    return new_version


# ---------------------------------------------------------------------------
# row-level MERGE (Delta MERGE §4.2: copy-on-write of touched files)
# ---------------------------------------------------------------------------

def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    on: Sequence[str],
    *,
    when_matched: str = "update",
    insert_unmatched: bool = True,
    merge_schema: bool = False,
    _commit_extra: dict | None = None,
) -> int:
    """Row-level MERGE into a versioned table, committed as one new
    version: rows of ``source`` whose key (``on``) exists in the latest
    snapshot replace the stored rows (``when_matched="update"``) or
    delete them (``"delete"``); unmatched source rows are appended when
    ``insert_unmatched`` (update mode only).

    Copy-on-write: a semi-join against the source keys identifies the
    FILES containing any matched key (``input_file_name`` over the
    snapshot — file list is O(files), collected once); only those files
    are rewritten (their unmatched rows kept + the merged rows), every
    other file is carried into the new manifest untouched and
    byte-identical. A point update of a 100 TB table therefore rewrites
    one file's worth of data, and the key-probe scan itself prunes via
    the per-file stats when the keys are range-clustered. Concurrency:
    the commit pins the snapshot it read (``expected_base`` semantics) —
    a writer that lands in between forces :class:`CommitConflict`, never
    a lost update; concurrent readers keep their pinned snapshots
    (snapshot isolation). Update-mode sources must be key-unique —
    ambiguous multi-row updates raise ValueError (pre-aggregate a
    newest-wins ordering upstream, as ``upsert_parquet_partitioned``
    does for plain directories)."""
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    on = list(on)
    base = latest_version(path)
    if base is None:
        if when_matched == "delete" or not insert_unmatched:
            raise FileNotFoundError(f"no committed version at {path}")
        return versioned_write(
            source, path, mode="append", _commit_extra=_commit_extra
        )
    manifest = _read_manifest(path, base)
    # schema-on-write for the source (Delta MERGE enforcement): missing
    # columns null-fill, new columns need merge_schema=True, type
    # changes are refused — checked before any scan or data write
    merged_schema = _enforced_schema(
        manifest.get("schema"),
        source.schema.jsonValue(),
        merge_schema=merge_schema,
        context=f"merge into {path} (v{base + 1})",
    )
    files = manifest["files"]  # manifest-form (table-root-relative)
    abs_of = {f: _abs_file(path, f) for f in files}
    prev_stats = manifest.get("stats", {})
    dv = manifest.get("dv", {})

    keys = source.select(*on).distinct()
    if when_matched == "update":
        n_src, n_keys = source.count(), keys.count()
        if n_src != n_keys:
            raise ValueError(
                f"update-mode source has {n_src} rows over {n_keys} distinct "
                f"keys {on} — deduplicate (newest-wins) before merging"
            )
    # DV-masked snapshot: deleted rows neither match keys nor survive a
    # rewrite — rewriting a touched file MATERIALIZES its deletions (the
    # remove_files purge drops its dv entry)
    snap = _masked_snapshot_frame(spark, path, files, dv, file_col="__file")
    touched_norm = {
        _norm_file(r["__file"], path)
        for r in snap.join(keys, on, "left_semi")
        .select("__file")
        .distinct()
        .collect()
    }
    # normalize BOTH sides (mixed-scheme shallow clones: a file:-rooted
    # source referenced from a plain-rooted clone still matches)
    touched = [f for f in files if _norm_file(abs_of[f], path) in touched_norm]
    untouched = [f for f in files if _norm_file(abs_of[f], path) not in touched_norm]

    if touched:
        old_rows = _masked_snapshot_frame(spark, path, touched, dv)
        kept = old_rows.join(keys, on, "left_anti")
    else:
        old_rows = kept = None

    if when_matched == "delete":
        new_rows = kept  # None when nothing matched: the merge is a no-op
        if new_rows is None:
            return base
    elif insert_unmatched:
        new_rows = source if kept is None else kept.unionByName(
            source, allowMissingColumns=True
        )
    else:
        matched_src = (
            source.join(old_rows.select(*on).distinct(), on, "left_semi")
            if old_rows is not None
            else source.limit(0)
        )
        if kept is None:  # no keys present and no inserts requested: no-op
            return base
        new_rows = kept.unionByName(matched_src, allowMissingColumns=True)

    version = base + 1
    data_dir = _join(path, "data", f"v{version}-{uuid.uuid4().hex[:8]}")
    new_rows.write.mode("error").parquet(data_dir)
    new_files, new_stats, n_new = _collect_file_stats(
        spark, data_dir, manifest.get("constraints")
    )
    new_files = [_rel_file(path, f) for f in new_files]
    new_stats = {_rel_file(path, f): s for f, s in new_stats.items()}

    untouched_with_stats = [f for f in untouched if f in prev_stats]
    n_untouched = sum(prev_stats[f]["rows"] for f in untouched_with_stats)
    # stats record PHYSICAL rows; subtract the per-file deletion-vector
    # tallies the dv map carries so the manifest row count stays LIVE rows
    n_untouched -= sum(
        dv[f]["rows"] for f in untouched_with_stats if f in dv
    )
    legacy = [f for f in untouched if f not in prev_stats]
    if legacy:  # pre-stats manifests: count once rather than guess
        n_untouched += _masked_snapshot_frame(spark, path, legacy, dv).count()

    if latest_version(path) != base:
        raise CommitConflict(
            f"concurrent commit during merge at {path}: derived from v{base}, "
            f"table moved to v{latest_version(path)} — re-read and retry"
        )
    _commit(
        path,
        version,
        {
            "version": version,
            "mode": f"merge-{when_matched}",
            "base": base,
            "add_files": new_files,
            "add_stats": new_stats,
            "remove_files": touched,
            "n_files": len(untouched) + len(new_files),
            "rows": n_untouched + n_new,
            **_txn_carry(manifest),
            "constraints": manifest.get("constraints", {}),
            "schema": merged_schema,
            # streaming merge sink stamps txn/source_batch_id through here
            **(_commit_extra or {}),
        },
    )
    _maybe_checkpoint(path, version)
    return version


def delete_where(
    spark: SparkSession,
    path: str,
    where: Where,
    *,
    expected_base: int | None = None,
) -> int:
    """Merge-on-read DELETE via deletion vectors (Delta DVs / Iceberg v2
    position deletes): rows matching the ``where`` conjunction are
    MASKED — the commit records, per touched data file, a tiny parquet
    of (file_name, row_index) pairs — and no data file is rewritten. At
    100 TB this is the point-delete / right-to-be-forgotten shape:
    copy-on-write rewrites gigabyte files to drop single rows; a DV
    logs bytes per row and the cost moves to an O(masked rows)
    broadcast anti-join at read time, reclaimed when :func:`optimize_table`
    next rewrites (materializing deletions) or vacuum retires the file.

    Mechanics: stats-pruned candidate files scan ONCE with
    ``_metadata`` (file_name, row_index); already-masked rows are
    subtracted so re-running the same predicate is a no-op commit-free;
    the new DV directory holds the UNION of old+new masks for every
    touched file (one mask lookup per file at read — never a chain);
    ``rows`` in the manifest stays LIVE rows via the per-file tallies
    the dv map carries. Snapshot semantics are unchanged: time travel
    below the delete still sees the rows, rollback across it restores
    them, and stats pruning stays sound (DVs only remove rows, so the
    recorded ranges remain supersets). Returns the new version, or
    ``base`` unchanged when nothing matches."""
    if not where:
        raise ValueError("delete_where requires a non-empty predicate")
    base = latest_version(path)
    if base is None:
        raise FileNotFoundError(f"no committed version at {path}")
    if expected_base is not None and base != expected_base:
        raise CommitConflict(
            f"stale base: expected v{expected_base}, table is at v{base}"
        )
    manifest = _read_manifest(path, base)
    dv = dict(manifest.get("dv", {}))
    cand = _pruned_rel_files(manifest, where)
    if not cand:
        return base
    _basenames(cand)  # fail loudly on a basename collision (mask keying)
    name_of = {os.path.basename(f): f for f in cand}
    scan = (
        spark.read.option("mergeSchema", "true")
        .parquet(*[_abs_file(path, f) for f in cand])
        .withColumn("__fn", F.col("_metadata.file_name"))
        .withColumn("__ri", F.col("_metadata.row_index"))
    )
    matched = scan.where(_where_column(where)).select("__fn", "__ri")
    dvd_names = [os.path.basename(f) for f in cand if f in dv]
    old = None
    if dvd_names:
        old = _where_name_in(
            spark,
            spark.read.parquet(
                *sorted({_abs_file(path, dv[f]["dir"]) for f in cand if f in dv})
            ),
            "file_name",
            set(dvd_names),
        ).select(
            F.col("file_name").alias("__fn"), F.col("row_index").alias("__ri")
        )
        n_old = sum(dv[f].get("rows", 0) for f in cand if f in dv)
        matched = matched.join(
            _hint_small(old, n_old), ["__fn", "__ri"], "left_anti"
        )
    per_file = matched.groupBy("__fn").agg(F.count(F.lit(1)).alias("n")).collect()
    if not per_file:
        return base  # every matching row already masked (or none): no-op
    n_new = sum(r["n"] for r in per_file)
    touched = [name_of[r["__fn"]] for r in per_file]
    version = base + 1
    dv_dir = _join(path, "dv", f"v{version}-{uuid.uuid4().hex[:8]}")
    union = matched
    if old is not None:
        touched_names = {os.path.basename(f) for f in touched}
        carried = _where_name_in(spark, old, "__fn", touched_names)
        union = union.unionByName(carried)
    (
        union.select(
            F.col("__fn").alias("file_name"), F.col("__ri").alias("row_index")
        )
        .coalesce(1)  # masks are kilobytes; one file keeps the read-side cheap
        .write.mode("error")
        .parquet(dv_dir)
    )
    dv_rel = _rel_file(path, dv_dir)
    totals = {f: dv.get(f, {}).get("rows", 0) for f in touched}
    for r in per_file:
        totals[name_of[r["__fn"]]] += r["n"]
    if latest_version(path) != base:
        raise CommitConflict(
            f"concurrent commit during delete at {path}: derived from v{base}, "
            f"table moved to v{latest_version(path)} — re-read and retry"
        )
    _commit(
        path,
        version,
        {
            "version": version,
            "mode": "delete-where",
            "base": base,
            "add_files": [],
            "add_stats": {},
            "remove_files": [],
            "dv_set": {f: {"dir": dv_rel, "rows": totals[f]} for f in touched},
            "n_files": len(manifest["files"]),
            "rows": manifest["rows"] - n_new,
            **_txn_carry(manifest),
            "constraints": manifest.get("constraints", {}),
            "schema": manifest["schema"],
        },
    )
    _maybe_checkpoint(path, version)
    return version


# ---------------------------------------------------------------------------
# streaming sink (exactly-once via the txn ledger in the LATEST manifest)
# ---------------------------------------------------------------------------

def committed_source_batches(path: str, app_id: str | None = None) -> set[int]:
    """Audit view: source batch ids committed to this table (scan of the
    retained manifests — O(versions), metadata only). With ``app_id``,
    only that stream's commits. NOTE: retention-bounded by vacuum — the
    authoritative exactly-once ledger is the ``txn`` map carried in the
    latest manifest, which vacuum never touches."""
    out = set()
    store = log_store_for(path)
    for v in _manifest_versions(path):
        if not store.exists(_manifest_path(path, v)):
            continue  # vacuumed below retention
        m = _read_raw_manifest(path, v)  # per-commit attrs: no resolution
        b = m.get("source_batch_id")
        if b is not None and (app_id is None or m.get("app_id") == app_id):
            out.add(b)
    return out


def stream_versioned_sink(
    stream: DataFrame,
    path: str,
    *,
    app_id: str,
    checkpoint: str | None = None,
    merge_schema: bool = False,
    compact_every: int | None = None,
    compact_target_bytes: int = 128 * 1024 * 1024,
    compact_escalate_after: int = 3,
) -> None:
    """Exactly-once streaming append into a versioned table: each
    micro-batch commits as ONE table version, and idempotence is keyed
    on ``(app_id, batch_id)`` exactly as in Delta's streaming sink
    (txn appId/version in the log — Armbrust VLDB 2020 §4.3): the
    latest manifest carries a ``txn`` map ``{app_id: max committed
    batch_id}`` forward through EVERY commit (batch writes, merges,
    rollbacks included), so a replayed batch — at-least-once delivery,
    crash between data write and checkpoint advance — is skipped by
    reading ONE manifest, not the whole retained history, and the
    ledger survives vacuum (the latest manifest is always retained).

    ``app_id`` names the logical stream. Two different pipelines
    writing the same table MUST use distinct app_ids — otherwise one
    stream's batch ids shadow the other's and its data is silently
    skipped as replays. The flip side is Delta's documented contract:
    restarting a pipeline with a FRESH checkpoint but the SAME app_id
    re-numbers batches from 0, which the ledger will treat as replays —
    a genuinely new incarnation of a stream needs a new app_id (or the
    same checkpoint, which is the normal restart path).

    Readers get snapshot isolation per micro-batch commit instead of
    observing half-written files.

    ``compact_every`` = Delta's auto-compaction: every N committed
    batches the sink runs :func:`optimize_table` with bin-packing at
    ``compact_target_bytes`` over ONLY the files still below that size
    (``small_file_bytes`` — ADVICE r15: files a prior tick already
    compacted to target are never re-read, so each tick costs O(bytes
    appended since the last converged tick), not O(table)) — paying
    down the one-small-file-per-batch debt an append-per-micro-batch
    stream accretes (the first operational wall at 100 TB) inside the
    same pipeline, no external maintenance job. The compaction is
    content-identical, snapshot isolated (pinned readers keep their
    manifest until vacuum), and best-effort — with a health floor
    (ADVICE r16): a lost OCC race with a concurrent writer is expected
    and silently retried next tick; an UNEXPECTED failure (the batch
    itself is already committed) warns and retries, but
    ``compact_escalate_after`` consecutive unexpected failures at the
    same path re-raise as a stream error, so a persistent non-OCC fault
    (corrupt manifest, permissions) can't hide behind an identical
    warning forever."""
    compacted = {"n": 0, "fails": 0}

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        prev = latest_version(path)
        # raw record only: rows/txn/constraints are per-commit attributes,
        # and the delta form below never materializes the file inventory —
        # a micro-batch commit stays O(new files) at any table size
        prev_m = _read_raw_manifest(path, prev) if prev is not None else {}
        txn = dict(prev_m.get("txn", {}))
        if prev is not None and "txn" not in prev_m:
            # pre-txn table (manifest written before the ledger existed —
            # whether its latest version is a stream OR a plain batch
            # commit): seed the ledger from the manifest scan, once. Keyed
            # on the MISSING key, not on source_batch_id being present:
            # a legacy table whose latest version is a batch commit still
            # has committed stream batches below it whose replay must
            # stay a no-op across the upgrade (ADVICE r6).
            txn[app_id] = max(committed_source_batches(path), default=-1)
        if txn.get(app_id, -1) >= batch_id:
            return  # replay of a committed batch: exactly-once no-op
        version = 0 if prev is None else prev + 1
        # schema-on-write, BEFORE any data lands (Delta's sink contract):
        # a drifting upstream schema fails the batch rather than silently
        # widening the table; evolution is the merge_schema opt-in
        schema_json = _enforced_schema(
            prev_m.get("schema") if prev is not None else None,
            batch_df.schema.jsonValue(),
            merge_schema=merge_schema,
            context=f"stream batch {batch_id} ({app_id}) into {path}",
        )
        data_dir = _join(path, "data", f"v{version}-{uuid.uuid4().hex[:8]}")
        batch_df.write.mode("error").parquet(data_dir)
        files, new_stats, n_new = _collect_file_stats(
            batch_df.sparkSession, data_dir, prev_m.get("constraints")
        )
        files = [_rel_file(path, f) for f in files]
        new_stats = {_rel_file(path, f): s for f, s in new_stats.items()}
        if prev is None:
            record = {
                "version": version,
                "mode": "stream-append",
                "source_batch_id": batch_id,
                "app_id": app_id,
                "files": files,
                "rows": n_new,
                "stats": new_stats,
                "txn": {**txn, app_id: batch_id},
                "constraints": {},
                "schema": schema_json,
            }
        else:
            record = {
                "version": version,
                "mode": "stream-append",
                "source_batch_id": batch_id,
                "app_id": app_id,
                "base": prev,
                "add_files": files,
                "add_stats": new_stats,
                "remove_files": [],
                "n_files": prev_m.get("n_files", len(prev_m.get("files", ()))) + len(files),
                "rows": prev_m.get("rows", 0) + n_new,
                "txn": {**txn, app_id: batch_id},
                "constraints": prev_m.get("constraints", {}),
                "schema": schema_json,
            }
        _commit(path, version, record)
        _maybe_checkpoint(path, version)
        if compact_every:
            compacted["n"] += 1
            if compacted["n"] % compact_every == 0:
                try:
                    optimize_table(
                        batch_df.sparkSession,
                        path,
                        target_file_bytes=compact_target_bytes,
                        # small-file-only: never re-read files a prior
                        # tick already compacted to target (ADVICE r15)
                        small_file_bytes=compact_target_bytes,
                    )
                    compacted["fails"] = 0
                except CommitConflict:
                    # EXPECTED under concurrent writers (the OCC race
                    # the lifecycle tests prove): the batch is already
                    # committed, the next cadence tick retries the same
                    # debt — not a health signal, so no warning and no
                    # strike against the escalation counter
                    pass
                except Exception as exc:  # best-effort maintenance:
                    # the BATCH is already committed — a transient
                    # failure must not kill the stream; but a PERSISTENT
                    # non-OCC failure (corrupt manifest, permissions,
                    # misconfiguration) repeating an identical warning
                    # forever is a silent outage (ADVICE r16), so after
                    # N consecutive failed ticks it surfaces as a stream
                    # error
                    compacted["fails"] = compacted.get("fails", 0) + 1
                    if compacted["fails"] >= compact_escalate_after:
                        raise RuntimeError(
                            f"auto-compaction at {path} failed "
                            f"{compacted['fails']} consecutive ticks — "
                            f"escalating (last: {exc!r})"
                        ) from exc
                    warnings.warn(
                        f"auto-compaction tick skipped at {path} "
                        f"({compacted['fails']}/{compact_escalate_after} "
                        f"consecutive failures before escalation): "
                        f"{exc!r}",
                        stacklevel=2,
                    )

    writer = stream.writeStream.foreachBatch(_sink).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()


def stream_versioned_merge_sink(
    stream: DataFrame,
    path: str,
    on: Sequence[str],
    *,
    app_id: str,
    checkpoint: str | None = None,
    merge_schema: bool = False,
) -> None:
    """Exactly-once streaming UPSERT into a versioned table: each
    micro-batch :func:`merge_into`'s the latest snapshot as ONE commit
    (copy-on-write of only the files containing a batch key), stamped
    into the same ``txn`` ledger as :func:`stream_versioned_sink`, so a
    replayed batch — crash between commit and checkpoint advance,
    at-least-once redelivery — is skipped by reading one manifest. This
    is the CDC-apply shape (a keyed change stream maintaining a current
    table) the plain append sink can't express: late updates REPLACE
    rows instead of duplicating them, and readers still get snapshot
    isolation per batch commit.

    Batches must be key-unique (the merge's ambiguity check applies);
    pre-aggregate newest-wins upstream when the source can repeat a key
    within one trigger. A batch whose merge conflicts with a concurrent
    writer fails the trigger and is retried by the stream on restart —
    the ledger keeps the retry exactly-once."""
    on = list(on)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        prev = latest_version(path)
        prev_m = _read_raw_manifest(path, prev) if prev is not None else {}
        txn = dict(prev_m.get("txn", {}))
        if prev is not None and "txn" not in prev_m:
            txn[app_id] = max(committed_source_batches(path), default=-1)
        if txn.get(app_id, -1) >= batch_id:
            return  # replay of a committed batch: exactly-once no-op
        merge_into(
            batch_df.sparkSession,
            path,
            batch_df,
            on,
            when_matched="update",
            insert_unmatched=True,
            merge_schema=merge_schema,
            _commit_extra={
                "mode": "stream-merge",
                "source_batch_id": batch_id,
                "app_id": app_id,
                "txn": {**txn, app_id: batch_id},
            },
        )

    writer = stream.writeStream.foreachBatch(_sink).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()


def add_constraint(
    spark: SparkSession, path: str, name: str, expr: str
) -> int:
    """Delta's ``ALTER TABLE ADD CONSTRAINT``: register a SQL CHECK
    expression the table must satisfy. The EXISTING snapshot is
    validated first (one scan — the same contract Delta pays at add
    time); from then on every commit path (batch write, merge, streaming
    sink) enforces the constraint over its NEW rows inside the stats
    pass it already runs — zero extra scans per commit — and refuses the
    commit with :class:`ConstraintViolation` on any failing row. NULL
    results pass, per ANSI CHECK. The constraint set rides the manifest
    (carried forward like the ``txn`` ledger), so it survives vacuum,
    rollback, and OPTIMIZE. Committed as a manifest-only version (mode
    ``add-constraint:<name>``) — O(1), no data movement."""
    base = latest_version(path)
    if base is None:
        raise FileNotFoundError(f"no committed version at {path}")
    m = _read_manifest(path, base)
    cons = dict(m.get("constraints", {}))
    if name in cons:
        raise ValueError(f"constraint {name!r} already exists: {cons[name]}")
    bad = read_version(spark, path, base).where(_violation_col(expr)).count()
    if bad:
        raise ConstraintViolation(
            f"cannot add CHECK constraint {name!r} ({expr}): {bad} existing "
            f"row(s) violate it"
        )
    cons[name] = expr
    return _commit_metadata_only(path, base, m, f"add-constraint:{name}", cons)


def drop_constraint(path: str, name: str) -> int:
    """``ALTER TABLE DROP CONSTRAINT``: manifest-only commit removing
    the named CHECK constraint (missing name raises KeyError)."""
    base = latest_version(path)
    if base is None:
        raise FileNotFoundError(f"no committed version at {path}")
    m = _read_manifest(path, base)
    cons = dict(m.get("constraints", {}))
    del cons[name]
    return _commit_metadata_only(path, base, m, f"drop-constraint:{name}", cons)


def _commit_metadata_only(
    path: str, base: int, m: dict, mode: str, constraints: dict[str, str]
) -> int:
    """Same snapshot, new governance: an empty delta record (no file
    adds/removes — O(1) bytes whatever the table size) that carries
    rows/txn/schema forward and swaps the constraint set, dropping
    per-commit streaming markers (source_batch_id/app_id) that belong
    to the commit that made them."""
    version = base + 1
    _commit(
        path,
        version,
        {
            "version": version,
            "mode": mode,
            "base": base,
            "add_files": [],
            "add_stats": {},
            "remove_files": [],
            "n_files": len(m["files"]),
            "rows": m["rows"],
            **_txn_carry(m),
            "constraints": constraints,
            "schema": m["schema"],
        },
    )
    _maybe_checkpoint(path, version)
    return version


def _binpack_target(path: str, rel_files: Sequence[str], target_file_bytes: int) -> int:
    """Delta-OPTIMIZE-style bin-packing: how many files a rewrite of
    ``rel_files`` should produce so each lands near ``target_file_bytes``
    (ceil(total/target), floor 1). One HEAD/stat per file — O(files
    being compacted), never a data read."""
    import math

    store = log_store_for(path)
    total = sum(store.size(_abs_file(path, f)) for f in rel_files)
    return max(1, int(math.ceil(total / float(target_file_bytes))))


def optimize_table(
    spark: SparkSession,
    path: str,
    *,
    target_files: int | None = 1,
    target_file_bytes: int | None = None,
    zorder_by: Sequence[str] | None = None,
    where: Where | None = None,
    small_file_bytes: int | None = None,
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
    clobbered by the rewrite.

    ``zorder_by`` = Delta's ``OPTIMIZE ... ZORDER BY (cols)``: lay the
    rewrite out in Morton order over the named columns
    (:func:`~..operators.maintenance.zorder_layout`) so the per-file
    min/max stats this table's commits already record become NARROW on
    every clustered dimension at once — compaction and data-skipping
    effectiveness land in the same single rewrite, which is the whole
    point of pairing OPTIMIZE with stats-pruned ``read_version(where=)``
    at 100 TB (one maintenance pass buys every later selective read).

    ``where`` = Delta's ``OPTIMIZE ... WHERE``: compact ONLY the files
    whose stats ranges can satisfy the predicate (file-granular, like
    Delta — whole files are rewritten, rows are never split out), as a
    delta-record commit removing the subset and adding the compacted
    layout. At 100 TB this is the maintenance shape: pay down the
    small-file debt of yesterday's streaming partition without touching
    the other 10 PB, content-identical and snapshot-isolated. Masked
    (deletion-vector) rows of rewritten files are materialized away.

    ``target_file_bytes`` = Delta's bin-packing knob: instead of a fixed
    file count, size the rewrite from the ACTUAL bytes being compacted
    (``ceil(total/target)``, one stat per file, no data read) — the
    right call for maintenance that runs on tables of unknown size
    (e.g. a streaming sink's auto-compaction cadence). Overrides
    ``target_files`` when set.

    ``small_file_bytes`` = Delta auto-compaction's ``minFileSize``
    (ADVICE r15): compact ONLY the files currently SMALLER than the
    threshold, as a delta-record commit removing that subset — files
    already at/above it are small-file debt already paid and are never
    re-read or rewritten. This is what makes a cadence-driven
    auto-compaction O(small files) per tick instead of O(table): a
    long-lived stream's ticks each touch roughly the bytes written
    since the last tick (plus not-yet-converged prior output), never
    the whole 100 TB snapshot. Composes with ``where`` (size filter
    applies after stats pruning). Fewer than 2 qualifying files is a
    no-op — rewriting one small file buys nothing."""
    base = latest_version(path)
    if base is None:
        raise FileNotFoundError(f"no committed version at {path}")
    if target_files is None and target_file_bytes is None:
        raise ValueError(
            "optimize_table: set target_files or target_file_bytes "
            "(both None leaves the rewrite unsized)"
        )
    if where is None and small_file_bytes is None:
        if target_file_bytes is not None:
            rel_files = _resolve_files_stats(path, base)[0]
            target_files = _binpack_target(path, rel_files, target_file_bytes)
        df = read_version(spark, path, base)
        if zorder_by:
            from ..operators.maintenance import zorder_layout

            df = zorder_layout(df, list(zorder_by), n_files=target_files)
        else:
            df = df.coalesce(target_files)
        return versioned_write(df, path, mode="overwrite", expected_base=base)
    manifest = _read_manifest(path, base)
    subset = (
        _pruned_rel_files(manifest, where)
        if where is not None
        else list(manifest["files"])
    )
    if small_file_bytes is not None:
        store = log_store_for(path)
        subset = [
            f
            for f in subset
            if store.size(_abs_file(path, f)) < small_file_bytes
        ]
        if len(subset) < 2:
            return base  # nothing worth compacting: no-op, no commit
    if target_file_bytes is not None and subset:
        target_files = _binpack_target(path, subset, target_file_bytes)
    if not subset:
        return base  # nothing in range: no-op, no commit
    dv = manifest.get("dv", {})
    df = _masked_snapshot_frame(spark, path, subset, dv)
    if zorder_by:
        from ..operators.maintenance import zorder_layout

        df = zorder_layout(df, list(zorder_by), n_files=target_files)
    else:
        df = df.coalesce(target_files)
    version = base + 1
    data_dir = _join(path, "data", f"v{version}-{uuid.uuid4().hex[:8]}")
    df.write.mode("error").parquet(data_dir)
    new_files, new_stats, _ = _collect_file_stats(
        spark, data_dir, manifest.get("constraints")
    )
    new_files = [_rel_file(path, f) for f in new_files]
    new_stats = {_rel_file(path, f): s for f, s in new_stats.items()}
    if latest_version(path) != base:
        raise CommitConflict(
            f"concurrent commit during optimize at {path}: derived from "
            f"v{base}, table moved to v{latest_version(path)} — retry"
        )
    _commit(
        path,
        version,
        {
            "version": version,
            "mode": "optimize-where" if where is not None else "optimize-small",
            "base": base,
            "add_files": new_files,
            "add_stats": new_stats,
            "remove_files": subset,
            "n_files": len(manifest["files"]) - len(subset) + len(new_files),
            "rows": manifest["rows"],  # content-identical rewrite
            **_txn_carry(manifest),
            "constraints": manifest.get("constraints", {}),
            "schema": manifest["schema"],
        },
    )
    _maybe_checkpoint(path, version)
    return version


def clone_table(src: str, dst: str) -> int:
    """Shallow clone (Delta's ``CLONE``): commit a v0 manifest at
    ``dst`` that references the SOURCE's current data files (and
    deletion-vector masks) by absolute path — zero rows copied, O(files)
    metadata, and the clone then evolves independently: its writes land
    under its own root, its vacuum walks only its own ``data/``/``dv/``
    directories so it can never reclaim source bytes, and its merges
    copy-on-write external files into local ones as they are touched.
    Delta's documented caveat applies verbatim: vacuum on the SOURCE can
    reclaim files a shallow clone still references — clones are for
    short-lived experiments/dev forks; ``optimize_table`` on the clone
    materializes it (the rewrite copies the rows it keeps)."""
    src_latest = latest_version(src)
    if src_latest is None:
        raise FileNotFoundError(f"no committed version at {src}")
    m = _read_manifest(src, src_latest)
    _commit(
        dst,
        0,
        {
            "version": 0,
            "mode": f"clone:{_canon(src)}@v{src_latest}",
            "files": [_abs_file(src, f) for f in m["files"]],
            "rows": m["rows"],
            "stats": {_abs_file(src, f): s for f, s in m.get("stats", {}).items()},
            **(
                {
                    "dv": {
                        _abs_file(src, f): {**e, "dir": _abs_file(src, e["dir"])}
                        for f, e in m["dv"].items()
                    }
                }
                if m.get("dv")
                else {}
            ),
            "constraints": m.get("constraints", {}),
            "schema": m["schema"],
        },
    )
    return 0


def vacuum(
    path: str,
    *,
    keep_versions: int = 1,
    min_age_seconds: float = 0.0,
    dry_run: bool = False,
) -> list[str]:
    """Reclaim data directories referenced by NO retained manifest:
    drops manifests older than the newest ``keep_versions`` snapshots,
    then deletes data dirs (crashed-write orphans included) that no
    surviving manifest references. Returns the deleted directories.
    Time travel is bounded by retention, exactly as in Delta. The
    streaming exactly-once ledger is NOT bounded by retention: it rides
    in the latest manifest (``txn`` map), which vacuum always keeps.

    ``min_age_seconds`` is Delta's RETAIN n HOURS: an unreferenced
    directory younger than the threshold (by mtime) is left alone,
    because an IN-FLIGHT write's data directory is indistinguishable
    from a crashed-write orphan until its manifest renames — a racing
    vacuum would otherwise delete the files the writer is about to
    commit. With the default threshold of 0 the caller asserts
    single-writer scheduling (vacuum runs from the maintenance schedule
    that owns writes); multi-writer deployments should pass a threshold
    comfortably above their longest write. Readers are safe regardless:
    a reader that resolved a retained manifest reads files vacuum never
    touches — only if its snapshot ages OUT of retention mid-query can
    its files vanish, Delta's documented reader-retention contract.

    ``dry_run=True`` (Delta's ``VACUUM ... DRY RUN``): return exactly
    the directories a real run would reclaim under the same retention
    arguments and touch NOTHING — no manifests dropped, no checkpoint
    pinned, no data deleted — so operators can audit the blast radius
    before scheduling the real pass."""
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    store = log_store_for(path)
    versions = _manifest_versions(path)
    if not versions:
        return []
    retained = versions[-keep_versions:]
    referenced: set[str] = set()
    for v in retained:
        m = _read_manifest(path, v)
        for f in m["files"]:
            referenced.add(os.path.dirname(_abs_file(path, f)))
        for e in m.get("dv", {}).values():
            referenced.add(_abs_file(path, e["dir"]))
    # a retained delta chain must not dangle below the horizon: before
    # the lower manifests disappear, pin the EARLIEST retained version
    # with a checkpoint sidecar (every higher resolution walks through
    # it, so one checkpoint covers the whole retained range)
    earliest = retained[0]
    if not dry_run:
        if (
            "files" not in _read_raw_manifest(path, earliest)
            and _read_checkpoint(path, earliest) is None
        ):
            _maybe_checkpoint(path, earliest, force=True)
        for v in versions[:-keep_versions]:
            mp = _manifest_path(path, v)
            if store.exists(mp):
                store.delete(mp)
            cp = _checkpoint_path(path, v)
            if store.exists(cp):  # sidecars of dropped versions go with them
                store.delete(cp)
    removed = []
    now = time.time()
    for sub in ("data", "dv"):  # dv dirs follow the same lifecycle as data
        root = _join(_canon(path), sub)
        for d in store.list_subdirs(root):
            full = _join(root, d)
            if full in referenced:
                continue
            if min_age_seconds > 0 and now - store.mtime(full) < min_age_seconds:
                continue  # possibly an in-flight write: too young to reclaim
            if not dry_run:
                store.delete_tree(full)
            removed.append(full)
    return removed
