"""Structured Streaming SOURCE over versioned tables — the read half of
the lakehouse streaming story (the write half is
``sources.versioned.stream_versioned_sink``). Implemented as a Spark 4
Python Data Source (``pyspark.sql.datasource``), so a versioned table
tails like Kafka:

    register_versioned_source(spark)
    stream = (spark.readStream.format("versioned_table")
              .option("path", table_path).load())

Offsets ARE version numbers — the commit log is the write-ahead log the
source replays, exactly Delta's streaming-source design: ``latestOffset``
is a single manifest-listing call (metadata, no data I/O), a micro-batch
``(start, end]`` plans one :class:`InputPartition` per file ADDED by the
versions in range (the same file-list diff ``read_changes`` uses), and
workers read those parquet files directly via Arrow — batches flow
zero-copy into Spark, no Python row loop. Exactly-once end-to-end:
version ranges are deterministic and the checkpoint stores the version
cursor, so replaying a batch re-reads the identical files; pair with
``stream_versioned_sink`` downstream for idempotent commits.

Change commits (ones that REMOVE files or grow a deletion-vector mask:
merge, overwrite, rollback, OPTIMIZE, DELETE) cannot be expressed as an
append stream. Three modes, matching Delta's streaming source:

- default — fail fast at planning with a clear error;
- ``.option("skip_change_commits", "true")`` — skip them wholesale
  (Delta's ``skipChangeCommits``);
- ``.option("read_change_feed", "true")`` — stream EVERY commit as
  row-level changes (Delta's ``readChangeFeed``): the batch output of
  ``sources.versioned.read_changes``, incrementally. Each micro-batch
  carries the table columns plus ``_change_type``
  (``'insert'``|``'delete'``) and ``_commit_version``; an appended file
  surfaces as inserts, a removed file as deletes, and a deletion-vector
  delta on a carried file as exactly its newly-masked (or, across a
  rollback, resurrected) rows. Workers resolve DV masks from the tiny
  mask parquets directly — planning stays metadata-only.

Scale: planning cost is O(manifests in range) on the driver —
metadata-only; data parallelism is one task per added file, which is
the write granularity of the upstream commit (an append of 10 TB lands
as thousands of files → thousands of tasks). Vacuumed history below the
retention horizon raises ``VersionVacuumedError`` at planning, never a
silent gap.
"""

from __future__ import annotations

import posixpath
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructType

from ..sources import versioned as V


def _local(p: str) -> str:
    """``file:`` URIs → plain local paths for pyarrow (other schemes
    pass through for pyarrow's own filesystem inference)."""
    if p.startswith("file:"):
        from urllib.parse import unquote, urlparse

        return unquote(urlparse(p).path)
    return p


#: scheme -> resolver(uri) -> (pyarrow filesystem, path). Lets a
#: deployment map custom/aliased schemes the workers must read
#: (e.g. a vendor connector scheme, or the in-repo s3mock test double)
#: without touching the source. The registration is captured when the
#: reader is constructed on the driver and travels to workers with it.
_STREAM_FS_RESOLVERS: dict[str, object] = {}


def register_stream_filesystem(scheme: str, resolver) -> None:
    """Route worker-side reads of ``scheme://…`` data-plane paths
    through ``resolver(uri) -> (pyarrow_filesystem, path)``."""
    _STREAM_FS_RESOLVERS[scheme] = resolver


def unregister_stream_filesystem(scheme: str) -> None:
    _STREAM_FS_RESOLVERS.pop(scheme, None)


def _fs_path(p: str):
    """Worker-side (pyarrow filesystem, path) for any scheme the data
    plane may carry. Plain paths and ``file:`` URIs resolve to the
    local filesystem; registered schemes go through their resolver;
    other URI schemes go through ``pyarrow.fs.FileSystem.from_uri``
    (``s3a://`` — Hadoop's S3 connector scheme — is translated to
    pyarrow's ``s3://``). This is what makes the module's remote-root
    claim hold for THIS Python source too: worker reads never call
    ``os.listdir``/raw-path ``read_table`` on a URI (ADVICE r8)."""
    from pyarrow import fs as pafs

    if p.startswith("file:"):
        return pafs.LocalFileSystem(), _local(p)
    if "://" not in p:
        return pafs.LocalFileSystem(), p
    scheme = p.split("://", 1)[0]
    if scheme in _STREAM_FS_RESOLVERS:
        return _STREAM_FS_RESOLVERS[scheme](p)
    uri = p
    if uri.startswith("s3a://"):
        uri = "s3://" + uri[len("s3a://") :]
    return pafs.FileSystem.from_uri(uri)


class _FilePartition(InputPartition):
    """One added parquet file of one commit (absolute path — resolved on
    the driver where the table root is known)."""

    def __init__(self, file: str, commit_version: int):
        self.file = file
        self.commit_version = commit_version


class _ChangePartition(InputPartition):
    """One file's row-level contribution to one commit of the change
    feed. Two selection shapes, resolved worker-side from the DV mask
    parquets (kilobytes):

    - ``subtract_dir`` — emit the file's rows MINUS the masked ones
      (added/removed files under a possibly-masked snapshot);
    - ``select_dir``/``within_dir`` — emit ONLY rows masked in
      ``select_dir`` but not in ``within_dir`` (a DV delta on a carried
      file: grown mask = deletes, shrunk mask across a rollback =
      resurrected inserts).
    """

    def __init__(
        self,
        file: str,
        commit_version: int,
        change_type: str,
        *,
        subtract_dir: str | None = None,
        select_dir: str | None = None,
        within_dir: str | None = None,
    ):
        self.file = file
        self.commit_version = commit_version
        self.change_type = change_type
        self.subtract_dir = subtract_dir
        self.select_dir = select_dir
        self.within_dir = within_dir


class VersionedTableDataSource(DataSource):
    """``format("versioned_table")`` — options:

    - ``path`` (required): the versioned table root
    - ``starting_version`` (default 0): first version INCLUDED in the
      stream (0 = replay the table from its first commit)
    - ``starting_timestamp`` (epoch seconds; mutually exclusive with
      ``starting_version``): Delta's ``startingTimestamp`` — the stream
      begins at the first version committed strictly AFTER the snapshot
      current at that instant (the snapshot itself is presumed consumed
      in batch via ``read_version(timestamp=...)``)
    - ``skip_change_commits`` (default false): skip non-append commits
      instead of failing
    - ``read_change_feed`` (default false): stream every commit as
      row-level changes with ``_change_type``/``_commit_version``
      columns (mutually exclusive with ``skip_change_commits``)
    - ``bootstrap`` (optional, ``pkg.module:function``): idempotent
      registration hook run in EVERY process that touches the table —
      Spark's planner interpreter and read workers are separate Python
      processes, so custom LogStore / scheme-resolver registrations
      must be re-establishable by importable name
    """

    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def _bootstrap(self) -> None:
        """``.option("bootstrap", "pkg.module:function")`` — import and
        call a module-level function before any table access. Spark
        runs Python data source PLANNING in its own interpreter (and
        reads in worker processes), so registrations made in the user's
        driver process — a custom LogStore prefix, a stream filesystem
        resolver — do not exist there; the bootstrap names them by
        importable path so every process can re-establish them. The
        function must be idempotent."""
        spec = self.options.get("bootstrap")
        if spec:
            import importlib

            mod, _, fn = spec.partition(":")
            getattr(importlib.import_module(mod), fn)()

    def _path(self) -> str:
        self._bootstrap()
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "versioned_table source requires .option('path', <table root>)"
            )
        return path

    def _flag(self, key: str) -> bool:
        return str(self.options.get(key, "false")).lower() in ("true", "1", "yes")

    def _check_options(self) -> None:
        if self._flag("read_change_feed") and self._flag("skip_change_commits"):
            raise ValueError(
                "read_change_feed and skip_change_commits are mutually "
                "exclusive: the change feed streams change commits, "
                "skipping discards them"
            )
        if "starting_version" in self.options and "starting_timestamp" in self.options:
            raise ValueError(
                "starting_version and starting_timestamp are mutually "
                "exclusive"
            )

    def _starting_version(self) -> int:
        ts = self.options.get("starting_timestamp")
        if ts is not None:
            # parse OUTSIDE the fallback try: a malformed option (e.g. a
            # '2026-08-15' date string) must error loudly, not silently
            # replay from version 0 (ADVICE r8)
            try:
                ts_val = float(ts)
            except (TypeError, ValueError):
                raise ValueError(
                    f"starting_timestamp must be a unix epoch-seconds "
                    f"number, got {ts!r}"
                ) from None
            # first version AFTER the snapshot current at ts; a ts
            # before the earliest retained commit replays everything
            try:
                return V.version_at_timestamp(self._path(), ts_val) + 1
            except ValueError:
                return 0
        return int(self.options.get("starting_version", "0"))

    def schema(self) -> StructType:
        self._check_options()
        path = self._path()
        latest = V.latest_version(path)
        if latest is None:
            raise FileNotFoundError(f"no committed version at {path}")
        schema = StructType.fromJson(V._read_manifest(path, latest)["schema"])
        if self._flag("read_change_feed"):
            schema = schema.add("_change_type", StringType()).add(
                "_commit_version", LongType()
            )
        return schema

    def streamReader(self, schema: StructType) -> "VersionedStreamReader":
        self._check_options()
        cdf = self._flag("read_change_feed")
        skip = self._flag("skip_change_commits")
        return VersionedStreamReader(
            self._path(),
            schema,
            starting_version=self._starting_version(),
            skip_change_commits=skip,
            read_change_feed=cdf,
        )


class VersionedStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        path: str,
        schema: StructType,
        *,
        starting_version: int,
        skip_change_commits: bool,
        read_change_feed: bool = False,
    ):
        self._table = path
        self._schema = schema
        self._start = starting_version
        self._skip_change = skip_change_commits
        self._cdf = read_change_feed
        # snapshot the scheme resolvers HERE: the reader is pickled to
        # the executors' Python workers, where the driver's module
        # registry does not exist — resolvers must be picklable
        # (module-level functions, not closures)
        self._fs_resolvers = dict(_STREAM_FS_RESOLVERS)

    # -- offsets: the commit log IS the WAL ---------------------------------
    def initialOffset(self) -> dict:
        # exclusive cursor just below the first included version
        return {"version": self._start - 1}

    def latestOffset(self) -> dict:
        latest = V.latest_version(self._table)
        if latest is None:
            raise FileNotFoundError(f"no committed version at {self._table}")
        return {"version": latest}

    # -- planning: file-list diff per version (driver, metadata-only) -------
    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        if self._cdf:
            return self._change_partitions(
                int(start["version"]), int(end["version"])
            )
        lo, hi = int(start["version"]), int(end["version"])
        parts: list[InputPartition] = []
        prev_files = (
            set(V._read_manifest(self._table, lo)["files"]) if lo >= 0 else set()
        )
        for v in range(lo + 1, hi + 1):
            cur = set(V._read_manifest(self._table, v)["files"])
            removed = prev_files - cur
            if removed:
                if not self._skip_change:
                    raise RuntimeError(
                        f"version {v} of {self._table} is a change commit "
                        f"(removes {len(removed)} file(s): merge/overwrite/"
                        f"rollback/OPTIMIZE) and cannot stream as appends — "
                        f"set .option('skip_change_commits','true') to skip "
                        f"it, stream row-level changes with "
                        f".option('read_change_feed','true'), or consume "
                        f"them in batch via read_changes()"
                    )
            else:
                for f in sorted(cur - prev_files):
                    parts.append(
                        _FilePartition(V._abs_file(self._table, f), v)
                    )
            prev_files = cur
        return parts

    def _change_partitions(self, lo: int, hi: int) -> Sequence[InputPartition]:
        """Per-version row-level change planning — the partition-shaped
        twin of ``sources.versioned.read_changes``'s file-list diff
        (same inserts/deletes/DV-delta derivation, same invariant:
        snapshot(lo) ⊎ inserts ∖ deletes == snapshot(hi))."""
        t = self._table

        def dv_dir(entry: dict | None) -> str | None:
            return V._abs_file(t, entry["dir"]) if entry else None

        if lo >= 0:
            m0 = V._read_manifest(t, lo)
            prev_files, prev_dv = set(m0["files"]), dict(m0.get("dv", {}))
        else:
            prev_files, prev_dv = set(), {}
        parts: list[InputPartition] = []
        for v in range(lo + 1, hi + 1):
            m = V._read_manifest(t, v)
            cur_files, cur_dv = set(m["files"]), dict(m.get("dv", {}))
            # file-level churn: a version's LIVE rows, so masks apply
            for files, dvmap, tag in (
                (sorted(cur_files - prev_files), cur_dv, "insert"),
                (sorted(prev_files - cur_files), prev_dv, "delete"),
            ):
                for f in files:
                    parts.append(
                        _ChangePartition(
                            V._abs_file(t, f),
                            v,
                            tag,
                            subtract_dir=dv_dir(dvmap.get(f)),
                        )
                    )
            # row-level churn on carried files: a grown mask is deletes,
            # a shrunk one (rollback across a delete) is resurrections
            for f in cur_files & prev_files:
                old, new = prev_dv.get(f), cur_dv.get(f)
                if old == new:
                    continue
                if new:
                    parts.append(
                        _ChangePartition(
                            V._abs_file(t, f),
                            v,
                            "delete",
                            select_dir=dv_dir(new),
                            within_dir=dv_dir(old),
                        )
                    )
                if old:
                    parts.append(
                        _ChangePartition(
                            V._abs_file(t, f),
                            v,
                            "insert",
                            select_dir=dv_dir(old),
                            within_dir=dv_dir(new),
                        )
                    )
            prev_files, prev_dv = cur_files, cur_dv
        return parts

    # -- execution: Arrow pass-through on the workers ------------------------
    def _resolve(self, p: str):
        scheme = p.split("://", 1)[0] if "://" in p else ""
        if scheme and scheme in self._fs_resolvers:
            return self._fs_resolvers[scheme](p)
        return _fs_path(p)

    def _mask_indices(self, dirpath: str | None, file_name: str) -> set[int]:
        """Row indices of ``file_name`` masked by the DV parquet(s) in
        ``dirpath`` — kilobytes per mask, read worker-side with pyarrow."""
        if dirpath is None:
            return set()
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyarrow.fs import FileSelector

        fs, d = self._resolve(dirpath)
        out: set[int] = set()
        infos = sorted(fs.get_file_info(FileSelector(d)), key=lambda i: i.base_name)
        for info in infos:
            if not info.base_name.endswith(".parquet"):
                continue
            tbl = pq.read_table(info.path, filesystem=fs)
            m = tbl.filter(pc.equal(tbl.column("file_name"), file_name))
            out.update(m.column("row_index").to_pylist())
        return out

    def _aligned(self, tbl, n_extra_fields: int = 0):
        """Project a file's arrow table onto the declared schema (minus
        ``n_extra_fields`` trailing source-added columns), null-filling
        columns the (older) file lacks — schema evolution."""
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        fields = list(to_arrow_schema(self._schema))
        if n_extra_fields:
            fields = fields[:-n_extra_fields]
        arrays = []
        for field in fields:
            if field.name in tbl.column_names:
                col = tbl.column(field.name)
                if col.type != field.type:
                    col = col.cast(field.type)
            else:  # schema evolution: older file lacks the column
                col = pa.nulls(tbl.num_rows, type=field.type)
            arrays.append(col)
        return arrays, fields

    def read(self, partition: InputPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        fs, fp = self._resolve(partition.file)
        tbl = pq.read_table(fp, filesystem=fs)
        if isinstance(partition, _ChangePartition):
            name = posixpath.basename(partition.file)
            if partition.select_dir is not None:
                keep = sorted(
                    self._mask_indices(partition.select_dir, name)
                    - self._mask_indices(partition.within_dir, name)
                )
                tbl = tbl.take(pa.array(keep, type=pa.int64()))
            elif partition.subtract_dir is not None:
                masked = self._mask_indices(partition.subtract_dir, name)
                if masked:
                    keep = [i for i in range(tbl.num_rows) if i not in masked]
                    tbl = tbl.take(pa.array(keep, type=pa.int64()))
            arrays, fields = self._aligned(tbl, n_extra_fields=2)
            n = tbl.num_rows
            arrays.append(pa.array([partition.change_type] * n, type=pa.string()))
            arrays.append(pa.array([partition.commit_version] * n, type=pa.int64()))
            out = pa.table(
                arrays,
                schema=pa.schema(
                    fields
                    + [
                        pa.field("_change_type", pa.string()),
                        pa.field("_commit_version", pa.int64()),
                    ]
                ),
            )
        else:
            arrays, fields = self._aligned(tbl)
            out = pa.table(arrays, schema=pa.schema(fields))
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass  # the checkpoint owns the cursor; nothing table-side to release


def register_versioned_source(spark) -> None:
    """Idempotently register ``format("versioned_table")`` on a session."""
    spark.dataSource.register(VersionedTableDataSource)
