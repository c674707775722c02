"""Scheme-aware table roots (r8): the full versioned-table lifecycle
against a ``file:``-scheme URI root — the in-repo proxy for an object
store. The path layer keeps a URI root in URI form through the WHOLE
data plane (manifest dir, data/dv dirs, input_file_name() matching,
vacuum's reference walk), so this suite exercises exactly the branch an
``s3a://`` root takes, with Spark's local Hadoop filesystem serving the
bytes and :class:`LocalLogStore` mapping ``file:`` URIs at its own
boundary. Parity is asserted structurally: manifests written under the
URI root must be byte-compatible (relative file entries, identical
layout) with a plain-rooted twin.
"""

from __future__ import annotations

import json
import os

import pytest

from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
    LocalLogStore,
    clone_table,
    delete_where,
    latest_version,
    log_store_for,
    merge_into,
    optimize_table,
    read_changes,
    read_version,
    register_log_store,
    rollback,
    snapshot_deletes,
    snapshot_files,
    table_versions,
    unregister_log_store,
    vacuum,
    versioned_write,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture
def uri_root(tmp_path):
    """A file:-scheme table root (single-slash canonical form)."""
    return "file:" + str(tmp_path / "table")


def test_lifecycle_append_overwrite_time_travel(spark, uri_root, tmp_path):
    t = uri_root
    v0 = versioned_write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), t)
    v1 = versioned_write(spark.createDataFrame([(3, "c")], ["id", "v"]), t)
    assert (v0, v1) == (0, 1)
    assert _rows(read_version(spark, t)) == [(1, "a"), (2, "b"), (3, "c")]
    assert _rows(read_version(spark, t, 0)) == [(1, "a"), (2, "b")]
    assert [h["version"] for h in table_versions(t)] == [0, 1]
    # manifests store RELATIVE entries — identical layout to a plain root
    mdir = tmp_path / "table" / "_manifests"
    m0 = json.loads((mdir / "v0.json").read_text())
    assert all(f.startswith("data/") for f in m0["files"]), m0["files"]
    # URI and plain spellings of the SAME root interoperate
    assert _rows(read_version(spark, str(tmp_path / "table"))) == _rows(
        read_version(spark, t)
    )
    assert latest_version(str(tmp_path / "table")) == 1


def test_lifecycle_merge_delete_dv_and_cdf(spark, uri_root):
    t = uri_root
    versioned_write(
        spark.createDataFrame([(i, f"v{i}") for i in range(10)], ["id", "v"]), t
    )
    # MERGE: copy-on-write upsert through input_file_name() matching —
    # the URI-normalization path merge_into relies on
    v1 = merge_into(
        spark,
        t,
        spark.createDataFrame([(3, "UPDATED"), (99, "NEW")], ["id", "v"]),
        on=["id"],
    )
    assert v1 == 1
    got = dict(_rows(read_version(spark, t)))
    assert got[3] == "UPDATED" and got[99] == "NEW" and len(got) == 11
    # DV delete: masks keyed on basenames under the URI root
    v2 = delete_where(spark, t, [("id", "<=", 1)])
    assert v2 == 2
    assert sorted(dict(_rows(read_version(spark, t)))) == [2, 3, 4, 5, 6, 7, 8, 9, 99]
    dvs = snapshot_deletes(t)
    assert dvs and all(d.startswith("file:/") for d in dvs.values())
    # CDF across the delete surfaces the masked rows as row-level deletes
    ch = read_changes(spark, t, 1, 2)
    deleted = {r["id"] for r in ch.where("_change_type = 'delete'").collect()}
    assert deleted == {0, 1}
    # time travel below the delete still sees the rows
    assert 0 in dict(_rows(read_version(spark, t, 1)))


def test_lifecycle_optimize_zorder_clone_vacuum(spark, uri_root, tmp_path):
    t = uri_root
    for i in range(3):
        versioned_write(
            spark.createDataFrame([(i * 10 + j, j * 1.0) for j in range(5)], ["x", "y"]),
            t,
        )
    before = _rows(read_version(spark, t))
    v = optimize_table(spark, t, target_files=2, zorder_by=["x", "y"])
    assert v == 3
    assert _rows(read_version(spark, t)) == before  # content-identical
    # stats pruning under the URI root stays sound (subset of the file
    # list; pruning QUALITY is asserted by the plain-root zorder test)
    all_files = snapshot_files(t)
    pruned = snapshot_files(t, where=[("x", "==", 21)])
    assert set(pruned) <= set(all_files)
    assert _rows(read_version(spark, t, where=[("x", "==", 21)])) == [(21, 1.0)]
    assert all(f.startswith("file:/") for f in all_files)
    # shallow clone URI -> plain root: absolute file: refs, then an
    # independent write under the clone's own (plain) root
    c = str(tmp_path / "clone")
    clone_table(t, c)
    assert _rows(read_version(spark, c)) == before
    merge_into(
        spark, c, spark.createDataFrame([(0, 123.0)], ["x", "y"]), on=["x"]
    )
    assert dict(_rows(read_version(spark, c)))[0] == 123.0
    assert dict(_rows(read_version(spark, t)))[0] == 0.0  # source untouched
    # rollback then vacuum: reclamation walks file: URIs
    rollback(t, 3)
    removed = vacuum(t, keep_versions=2)
    assert all(r.startswith("file:/") for r in removed)
    assert _rows(read_version(spark, t)) == before


def test_file_uri_spellings_collapse_to_one_canonical_table(spark, tmp_path):
    """file:/x, file:///x and percent-encoded forms are the same table."""
    base = tmp_path / "dir with space" / "t"
    spellings = [
        "file:" + str(base),
        "file://" + str(base),  # empty-authority double-slash form
        "file://" + str(base).replace(" ", "%20"),
    ]
    versioned_write(spark.createDataFrame([(1,)], ["id"]), spellings[0])
    for s in spellings:
        assert latest_version(s) == 0, s
        assert _rows(read_version(spark, s)) == [(1,)]


def test_log_store_dispatch_and_remote_guard(tmp_path):
    # file: URIs route to the bundled POSIX store with no registration
    assert isinstance(log_store_for("file:/tmp/x"), LocalLogStore)
    # a registered prefix wins for a remote scheme; unregistered raises
    class _Probe(LocalLogStore):
        pass

    probe = _Probe()
    register_log_store("s3a://bucket-a/", probe)
    try:
        assert log_store_for("s3a://bucket-a/tbl") is probe
        with pytest.raises(ValueError, match="no LogStore is registered"):
            latest_version("s3a://bucket-b/tbl")
    finally:
        unregister_log_store("s3a://bucket-a/")


def test_remote_root_arithmetic_is_pure_uri():
    """The arithmetic an s3a root exercises, unit-level: no os.path
    mangling anywhere in root/file mapping."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
        _abs_file,
        _join,
        _norm_file,
        _rel_file,
    )

    root = "s3a://bucket/warehouse/tbl"
    assert _join(root, "_manifests") == "s3a://bucket/warehouse/tbl/_manifests"
    f = _join(root, "data", "v0-ab", "part-0.parquet")
    assert f == "s3a://bucket/warehouse/tbl/data/v0-ab/part-0.parquet"
    rel = _rel_file(root, f)
    assert rel == "data/v0-ab/part-0.parquet"
    assert _abs_file(root, rel) == f
    # input_file_name() output (percent-encoded URI) normalizes back
    assert _norm_file("s3a://bucket/warehouse/tbl/data/v0-ab/part-0.parquet", root) == f
    # trailing-slash root spelling is the same table
    assert _rel_file(root + "/", f) == rel
