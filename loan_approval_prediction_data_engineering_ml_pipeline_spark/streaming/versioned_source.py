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

Change commits (ones that REMOVE files: merge, overwrite, rollback,
OPTIMIZE) cannot be expressed as an append stream. As in Delta's
streaming source the default is to fail fast with a clear error;
``.option("skip_change_commits", "true")`` skips them wholesale
(Delta's ``skipChangeCommits``) — consumers needing the row-level
delta use ``sources.versioned.read_changes`` in batch instead.

Scale: planning cost is O(manifests in range) on the driver —
metadata-only; data parallelism is one task per added file, which is
the write granularity of the upstream commit (an append of 10 TB lands
as thousands of files → thousands of tasks). Vacuumed history below the
retention horizon raises ``VersionVacuumedError`` at planning, never a
silent gap.
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from ..sources import versioned as V


class _FilePartition(InputPartition):
    """One added parquet file of one commit (absolute path — resolved on
    the driver where the table root is known)."""

    def __init__(self, file: str, commit_version: int):
        self.file = file
        self.commit_version = commit_version


class VersionedTableDataSource(DataSource):
    """``format("versioned_table")`` — options:

    - ``path`` (required): the versioned table root
    - ``starting_version`` (default 0): first version INCLUDED in the
      stream (0 = replay the table from its first commit)
    - ``skip_change_commits`` (default false): skip non-append commits
      instead of failing
    """

    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "versioned_table source requires .option('path', <table root>)"
            )
        return path

    def schema(self) -> StructType:
        path = self._path()
        latest = V.latest_version(path)
        if latest is None:
            raise FileNotFoundError(f"no committed version at {path}")
        return StructType.fromJson(V._read_manifest(path, latest)["schema"])

    def streamReader(self, schema: StructType) -> "VersionedStreamReader":
        return VersionedStreamReader(
            self._path(),
            schema,
            starting_version=int(self.options.get("starting_version", "0")),
            skip_change_commits=str(
                self.options.get("skip_change_commits", "false")
            ).lower()
            in ("true", "1", "yes"),
        )


class VersionedStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        path: str,
        schema: StructType,
        *,
        starting_version: int,
        skip_change_commits: bool,
    ):
        self._table = path
        self._schema = schema
        self._start = starting_version
        self._skip_change = skip_change_commits

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
                        f"it, or consume row-level changes in batch via "
                        f"read_changes()"
                    )
            else:
                for f in sorted(cur - prev_files):
                    parts.append(
                        _FilePartition(V._abs_file(self._table, f), v)
                    )
            prev_files = cur
        return parts

    # -- execution: Arrow pass-through on the workers ------------------------
    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        tbl = pq.read_table(partition.file)
        target = to_arrow_schema(self._schema)
        arrays = []
        for field in target:
            if field.name in tbl.column_names:
                col = tbl.column(field.name)
                if col.type != field.type:
                    col = col.cast(field.type)
            else:  # schema evolution: older file lacks the column
                col = pa.nulls(tbl.num_rows, type=field.type)
            arrays.append(col)
        out = pa.table(arrays, schema=target)
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass  # the checkpoint owns the cursor; nothing table-side to release


def register_versioned_source(spark) -> None:
    """Idempotently register ``format("versioned_table")`` on a session."""
    spark.dataSource.register(VersionedTableDataSource)
