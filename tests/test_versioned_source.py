"""Streaming SOURCE over versioned tables (Spark Python Data Source):
offsets are commit versions, a micro-batch reads exactly the files the
versions in range appended, change commits fail fast (or skip on opt-in),
and the checkpoint cursor makes restarts incremental — stream ≡ batch
on the same commit log."""

from __future__ import annotations

import pytest

from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
    merge_into,
    read_version,
    versioned_write,
)
from loan_approval_prediction_data_engineering_ml_pipeline_spark.streaming.versioned_source import (
    register_versioned_source,
)


def _drain(spark, t, cp, collected, **options):
    """Run the source until all available versions are consumed."""
    register_versioned_source(spark)
    reader = spark.readStream.format("versioned_table").option("path", t)
    for k, v in options.items():
        reader = reader.option(k, v)
    stream = reader.load()

    def sink(batch_df, batch_id):
        collected.extend(tuple(r) for r in batch_df.collect())

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cp)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()


@pytest.mark.slow
def test_stream_source_replays_appends_then_tails(spark, tmp_path):
    t = str(tmp_path / "t")
    for lo in (0, 10):
        versioned_write(
            spark.createDataFrame(
                [(lo + i, f"r{lo + i}") for i in range(3)], ["id", "v"]
            ),
            t,
        )
    cp = str(tmp_path / "cp")
    got: list[tuple] = []
    _drain(spark, t, cp, got)
    assert sorted(got) == sorted(tuple(r) for r in read_version(spark, t).collect())

    # tail: two more commits, SAME checkpoint -> only the new rows
    versioned_write(spark.createDataFrame([(20, "r20")], ["id", "v"]), t)
    versioned_write(spark.createDataFrame([(21, "r21")], ["id", "v"]), t)
    tail: list[tuple] = []
    _drain(spark, t, cp, tail)
    assert sorted(tail) == [(20, "r20"), (21, "r21")]


def test_stream_source_starting_version(spark, tmp_path):
    t = str(tmp_path / "t")
    for i in range(3):
        versioned_write(spark.createDataFrame([(i, f"r{i}")], ["id", "v"]), t)
    got: list[tuple] = []
    _drain(spark, t, str(tmp_path / "cp"), got, starting_version="2")
    assert got == [(2, "r2")]


def test_stream_source_starting_timestamp(spark, tmp_path):
    """Delta's startingTimestamp: the stream begins after the snapshot
    current at the instant; pre-history timestamps replay everything;
    combining both start options is refused."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
        commit_timestamp,
    )

    t = str(tmp_path / "t")
    for i in range(3):
        versioned_write(spark.createDataFrame([(i, f"r{i}")], ["id", "v"]), t)
    got: list[tuple] = []
    _drain(spark, t, str(tmp_path / "cp"), got,
           starting_timestamp=str(commit_timestamp(t, 1)))
    assert got == [(2, "r2")]  # v1's snapshot is presumed consumed in batch
    got2: list[tuple] = []
    _drain(spark, t, str(tmp_path / "cp2"), got2,
           starting_timestamp=str(commit_timestamp(t, 0) - 100.0))
    assert sorted(got2) == [(0, "r0"), (1, "r1"), (2, "r2")]
    with pytest.raises(Exception, match="mutually exclusive"):
        _drain(spark, t, str(tmp_path / "cp3"), [],
               starting_version="0", starting_timestamp="0")


def test_stream_source_change_commit_fails_then_skips(spark, tmp_path):
    t = str(tmp_path / "t")
    versioned_write(
        spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]).coalesce(1), t
    )
    merge_into(spark, t, spark.createDataFrame([(2, "B")], ["id", "v"]), ["id"])
    versioned_write(spark.createDataFrame([(3, "c")], ["id", "v"]), t)

    with pytest.raises(Exception) as exc_info:
        _drain(spark, t, str(tmp_path / "cp1"), [])
    assert "change commit" in str(exc_info.value)

    got: list[tuple] = []
    _drain(spark, t, str(tmp_path / "cp2"), got, skip_change_commits="true")
    # v0's file + v2's file stream; v1 (the merge rewrite) is skipped whole
    assert sorted(got) == [(1, "a"), (2, "b"), (3, "c")]


def test_stream_source_schema_evolution_fills_nulls(spark, tmp_path):
    t = str(tmp_path / "t")
    versioned_write(spark.createDataFrame([(1, "a")], ["id", "v"]), t)
    versioned_write(
        spark.createDataFrame([(2, "b", 9.5)], "id long, v string, score double"),
        t,
        merge_schema=True,
    )
    got: list[tuple] = []
    _drain(spark, t, str(tmp_path / "cp"), got)
    assert sorted(got, key=lambda r: r[0]) == [(1, "a", None), (2, "b", 9.5)]


@pytest.mark.slow
def test_stream_source_change_feed_replays_then_tails(spark, tmp_path):
    """readChangeFeed mode (r8): merge/DV-delete commits stream as
    row-level _change_type rows — the incremental twin of
    read_changes(), checkpoint-cursored like the append mode."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
        delete_where,
        read_changes,
    )

    t = str(tmp_path / "t")
    versioned_write(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "v"]).coalesce(1),
        t,
    )
    merge_into(spark, t, spark.createDataFrame([(2, "B")], ["id", "v"]), ["id"])
    cp = str(tmp_path / "cp")
    got: list[tuple] = []
    _drain(spark, t, cp, got, read_change_feed="true")
    # exactly the batch CDF output over the full range
    batch = [
        tuple(r)
        for r in read_changes(spark, t, 0, 1)
        .select("id", "v", "_change_type", "_commit_version")
        .collect()
    ]
    assert sorted(g for g in got if g[3] == 0) == sorted(
        [(1, "a", "insert", 0), (2, "b", "insert", 0), (3, "c", "insert", 0)]
    )
    assert sorted(g for g in got if g[3] == 1) == sorted(batch)
    # a merge surfaces the rewrite as delete+insert of the touched file
    assert {g[2] for g in got if g[3] == 1} == {"insert", "delete"}

    # tail with the SAME checkpoint: a DV delete commit surfaces exactly
    # its newly-masked rows as deletes — nothing replays
    delete_where(spark, t, [("id", "==", 1)])
    tail: list[tuple] = []
    _drain(spark, t, cp, tail, read_change_feed="true")
    assert tail == [(1, "a", "delete", 2)]

    # and a rollback across the delete resurrects the row as an insert
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
        rollback,
    )

    rollback(t, 1)
    tail2: list[tuple] = []
    _drain(spark, t, cp, tail2, read_change_feed="true")
    assert tail2 == [(1, "a", "insert", 3)]


def test_stream_source_change_feed_excludes_skip_option(spark, tmp_path):
    t = str(tmp_path / "t")
    versioned_write(spark.createDataFrame([(1, "a")], ["id", "v"]), t)
    register_versioned_source(spark)
    with pytest.raises(Exception, match="mutually exclusive"):
        (
            spark.readStream.format("versioned_table")
            .option("path", t)
            .option("read_change_feed", "true")
            .option("skip_change_commits", "true")
            .load()
        )


def test_stream_source_change_feed_over_file_uri_root(spark, tmp_path):
    """Worker-side reads (data files AND DV masks) must resolve through
    a scheme-aware pyarrow filesystem, not os.listdir/raw paths — the
    file:-URI root is the in-repo proxy for an object-store scheme
    (ADVICE r8). CDF over a delete exercises both the mask listing and
    the data-file read on URI paths."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
        delete_where,
    )

    t = "file:" + str(tmp_path / "t")
    versioned_write(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "v"]), t
    )
    delete_where(spark, t, [("id", "==", 2)])
    got: list[tuple] = []
    _drain(
        spark, t, str(tmp_path / "cp"), got, read_change_feed="true"
    )
    ins = sorted(r[:2] for r in got if r[2] == "insert")
    dels = sorted(r[:2] for r in got if r[2] == "delete")
    assert ins == [(1, "a"), (2, "b"), (3, "c")]
    assert dels == [(2, "b")]


def test_stream_source_malformed_starting_timestamp_errors(spark, tmp_path):
    """A malformed starting_timestamp (e.g. a date string) must raise,
    not silently replay from version 0 (ADVICE r8)."""
    t = str(tmp_path / "t")
    versioned_write(spark.createDataFrame([(1, "a")], ["id", "v"]), t)
    with pytest.raises(Exception, match="starting_timestamp"):
        _drain(
            spark,
            t,
            str(tmp_path / "cp"),
            [],
            starting_timestamp="2026-08-15",
        )


def test_stream_source_change_feed_over_object_store_root(spark, tmp_path):
    """The versioned streaming source (CDF mode) over an s3mock://
    object-store root. Spark runs Python data source PLANNING in its
    own interpreter and reads in worker processes, so the custom-scheme
    registrations must travel: the ``bootstrap`` option re-establishes
    the (disk-backed, create-exclusive conditional-PUT) LogStore and
    the scheme resolver by importable name in every process — the
    mechanism a real object-store deployment of this source needs."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.s3mock import (
        register_shared_s3mock,
    )
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
        delete_where,
        unregister_log_store,
    )
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.streaming.versioned_source import (
        unregister_stream_filesystem,
    )

    if spark.conf.get("spark.hadoop.fs.s3mock.impl", None) is None:
        pytest.skip("s3mock Hadoop shim unavailable (no javac)")
    register_shared_s3mock()  # this (test/driver) process
    try:
        t = "s3mock://bucket" + str(tmp_path) + "/table"
        versioned_write(
            spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "v"]), t
        )
        delete_where(spark, t, [("id", "==", 2)])
        got: list[tuple] = []
        _drain(
            spark,
            t,
            str(tmp_path / "cp"),
            got,
            read_change_feed="true",
            bootstrap=(
                "loan_approval_prediction_data_engineering_ml_pipeline_spark"
                ".sources.s3mock:register_shared_s3mock"
            ),
        )
        ins = sorted(r[:2] for r in got if r[2] == "insert")
        dels = sorted(r[:2] for r in got if r[2] == "delete")
        assert ins == [(1, "a"), (2, "b"), (3, "c")]
        assert dels == [(2, "b")]
    finally:
        unregister_stream_filesystem("s3mock")
        unregister_log_store("s3mock://")
