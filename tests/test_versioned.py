"""Versioned-table semantics: snapshot isolation, time travel, rollback,
orphan invisibility, vacuum retention, and commit conflicts."""

from __future__ import annotations

import os

import pytest

from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
    CommitConflict,
    latest_version,
    read_version,
    rollback,
    table_versions,
    vacuum,
    versioned_write,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_time_travel_and_history(spark, tmp_path):
    t = str(tmp_path / "t")
    v0 = versioned_write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), t)
    v1 = versioned_write(spark.createDataFrame([(3, "c")], ["id", "v"]), t)
    assert (v0, v1) == (0, 1)
    assert _rows(read_version(spark, t)) == [(1, "a"), (2, "b"), (3, "c")]
    # time travel: the old snapshot is still exactly the old snapshot
    assert _rows(read_version(spark, t, 0)) == [(1, "a"), (2, "b")]
    hist = table_versions(t)
    assert [(h["version"], h["mode"], h["rows"]) for h in hist] == [
        (0, "append", 2),
        (1, "append", 3),
    ]


def test_overwrite_keeps_history_readable(spark, tmp_path):
    t = str(tmp_path / "t")
    versioned_write(spark.createDataFrame([(1, "a")], ["id", "v"]), t)
    versioned_write(
        spark.createDataFrame([(9, "z")], ["id", "v"]), t, mode="overwrite"
    )
    assert _rows(read_version(spark, t)) == [(9, "z")]
    assert _rows(read_version(spark, t, 0)) == [(1, "a")]


def test_rollback_is_forward_only_and_buildable(spark, tmp_path):
    t = str(tmp_path / "t")
    versioned_write(spark.createDataFrame([(1, "a")], ["id", "v"]), t)
    versioned_write(spark.createDataFrame([(2, "bad")], ["id", "v"]), t)
    v2 = rollback(t, 0)
    assert v2 == 2
    assert _rows(read_version(spark, t)) == [(1, "a")]
    # the bad version is still auditable, history moved forward
    assert _rows(read_version(spark, t, 1)) == [(1, "a"), (2, "bad")]
    assert table_versions(t)[2]["mode"] == "rollback->0"
    # later appends build on the rolled-back state
    versioned_write(spark.createDataFrame([(3, "c")], ["id", "v"]), t)
    assert _rows(read_version(spark, t)) == [(1, "a"), (3, "c")]


def test_snapshot_isolation_against_concurrent_commit(spark, tmp_path):
    t = str(tmp_path / "t")
    versioned_write(spark.createDataFrame([(1, "a")], ["id", "v"]), t)
    pinned = read_version(spark, t)  # manifest resolved HERE
    versioned_write(
        spark.createDataFrame([(2, "b")], ["id", "v"]), t, mode="overwrite"
    )
    # the running reader still sees its snapshot, not the new commit
    assert _rows(pinned) == [(1, "a")]
    assert _rows(read_version(spark, t)) == [(2, "b")]


def test_orphan_data_invisible_and_vacuumed(spark, tmp_path):
    t = str(tmp_path / "t")
    versioned_write(spark.createDataFrame([(1, "a")], ["id", "v"]), t)
    versioned_write(spark.createDataFrame([(2, "b")], ["id", "v"]), t)
    # simulate a crashed write: data files landed, manifest never renamed
    orphan = os.path.join(t, "data", "v99-deadbeef")
    spark.createDataFrame([(666, "ghost")], ["id", "v"]).write.parquet(orphan)
    assert _rows(read_version(spark, t)) == [(1, "a"), (2, "b")]

    removed = vacuum(t, keep_versions=1)
    assert any("v99-deadbeef" in d for d in removed)
    # v0's exclusive data is NOT removed: append-mode v1 references it
    assert _rows(read_version(spark, t)) == [(1, "a"), (2, "b")]
    # but v0's manifest is gone — time travel is retention-bounded
    with pytest.raises(FileNotFoundError):
        read_version(spark, t, 0)
    assert latest_version(t) == 1


def test_vacuum_reclaims_overwritten_data(spark, tmp_path):
    t = str(tmp_path / "t")
    versioned_write(spark.createDataFrame([(1, "a")], ["id", "v"]), t)
    versioned_write(
        spark.createDataFrame([(2, "b")], ["id", "v"]), t, mode="overwrite"
    )
    removed = vacuum(t, keep_versions=1)
    assert len(removed) == 1  # v0's now-unreferenced directory
    assert _rows(read_version(spark, t)) == [(2, "b")]


def test_commit_conflict_surfaces(spark, tmp_path):
    t = str(tmp_path / "t")
    base = versioned_write(spark.createDataFrame([(1, "a")], ["id", "v"]), t)
    # a read-modify-write transaction pins its base; another writer
    # commits first — the stale transaction must fail, not lose updates
    versioned_write(spark.createDataFrame([(5, "e")], ["id", "v"]), t)
    with pytest.raises(CommitConflict):
        versioned_write(
            spark.createDataFrame([(2, "b")], ["id", "v"]), t, expected_base=base
        )
    # retry on fresh state succeeds and sees both commits
    v = versioned_write(
        spark.createDataFrame([(2, "b")], ["id", "v"]), t,
        expected_base=latest_version(t),
    )
    assert v == 2
    assert _rows(read_version(spark, t)) == [(1, "a"), (2, "b"), (5, "e")]

    # blind same-version rename race: the loser of the manifest rename
    # surfaces CommitConflict from the atomic-commit layer itself
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import _commit

    with pytest.raises(CommitConflict):
        _commit(t, 2, {"version": 2, "mode": "append", "files": [], "rows": 0,
                       "schema": {"type": "struct", "fields": []}})


def test_schema_evolution_across_versions(spark, tmp_path):
    t = str(tmp_path / "t")
    versioned_write(spark.createDataFrame([(1, "a")], ["id", "v"]), t)
    versioned_write(
        spark.createDataFrame([(2, "b", 0.5)], ["id", "v", "score"]), t
    )
    got = {r["id"]: r["score"] for r in read_version(spark, t).collect()}
    assert got == {1: None, 2: 0.5}


def test_stream_versioned_sink_exactly_once(spark, tmp_path):
    """Each micro-batch commits as one table version; a full redelivery
    (fresh checkpoint, same feed) is a no-op because the manifest log
    doubles as the idempotence ledger — version count, rows, and
    history are unchanged."""
    import glob
    import os
    import shutil
    import time as _t

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
        stream_versioned_sink,
    )

    src = str(tmp_path / "feed")
    os.makedirs(src)
    now = _t.time()
    for i in range(3):
        staged = os.path.join(src, f"__stage_{i}")
        spark.createDataFrame(
            [(i * 10 + j, f"row{i}-{j}") for j in range(4)], "id long, v string"
        ).coalesce(1).write.mode("overwrite").parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = os.path.join(src, f"feed_{i}.parquet")
        shutil.copyfile(part, dest)
        shutil.rmtree(staged)
        os.utime(dest, (now + i * 10, now + i * 10))

    t = str(tmp_path / "table")

    def run(cp):
        stream = (
            spark.readStream.schema("id long, v string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_versioned_sink(stream, t, checkpoint=str(tmp_path / cp))

    run("cp1")
    assert latest_version(t) == 2  # one version per micro-batch
    assert read_version(spark, t).count() == 12
    # time travel to the mid-stream snapshot
    assert read_version(spark, t, 1).count() == 8

    run("cp2")  # full redelivery: ledger makes every batch a no-op
    assert latest_version(t) == 2
    assert read_version(spark, t).count() == 12
    hist = table_versions(t)
    assert [h["mode"] for h in hist] == ["stream-append"] * 3


def test_optimize_compacts_content_identically(spark, tmp_path):
    """OPTIMIZE commits the latest snapshot re-laid-out into fewer
    files: content identical, file count down, history intact, and a
    concurrent append between resolve and commit is protected by the
    expected_base pin."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
        _read_manifest,
        optimize_table,
    )

    t = str(tmp_path / "t")
    for i in range(4):  # small-file accumulation: 4 append commits
        versioned_write(
            spark.createDataFrame([(i, f"r{i}")], ["id", "v"]).repartition(2), t
        )
    before = _read_manifest(t, 3)
    assert len(before["files"]) >= 8
    v = optimize_table(spark, t, target_files=1)
    assert v == 4
    after = _read_manifest(t, 4)
    assert len(after["files"]) == 1
    assert _rows(read_version(spark, t)) == _rows(read_version(spark, t, 3))
    assert after["rows"] == before["rows"]
    # superseded small files reclaimed only by vacuum, and the compacted
    # table keeps working
    vacuum(t, keep_versions=1)
    assert read_version(spark, t).count() == 4
