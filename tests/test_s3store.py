"""Real S3 LogStore transport (VERDICT r9 #3): the boto3-backed
:class:`S3LogStore` must satisfy the same LogStore semantics contract
the commit protocol was proven against on the in-process mock —
conditional-PUT atomicity, read-after-write, paged flat-key listing
with derived directories, POSIX-parity error contracts — exercised
against moto's S3 implementation (real wire shapes, no network)."""

from __future__ import annotations

import threading

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.s3store import (  # noqa: E402
    S3LogStore,
)

BUCKET = "graft-test"
ROOT = f"s3://{BUCKET}/warehouse/t1"


@pytest.fixture()
def store():
    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket=BUCKET)
        # page_size=2: every multi-entry listing crosses a
        # continuation-token boundary, like the mock's PAGE_SIZE
        yield S3LogStore(client, page_size=2)


def test_write_exclusive_is_conditional_put(store):
    p = f"{ROOT}/_manifests/v0.json"
    store.write_exclusive(p, "first")
    with pytest.raises(FileExistsError):
        store.write_exclusive(p, "second")
    assert store.read_text(p) == "first"


def test_concurrent_publishes_one_winner(store):
    p = f"{ROOT}/_manifests/v1.json"
    winners: list[str] = []
    barrier = threading.Barrier(6)

    def attempt(i: int) -> None:
        barrier.wait()
        try:
            store.write_exclusive(p, f"writer-{i}")
            winners.append(f"writer-{i}")
        except FileExistsError:
            pass

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(6)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert len(winners) == 1
    assert store.read_text(p) == winners[0]


def test_read_missing_raises_file_not_found(store):
    with pytest.raises(FileNotFoundError):
        store.read_text(f"{ROOT}/_manifests/v99.json")


def test_paged_listing_and_derived_directories(store):
    for i in range(5):
        store.write_exclusive(f"{ROOT}/_manifests/v{i}.json", "{}")
    for sub in ("a", "b", "c"):
        store.write_exclusive(f"{ROOT}/data/{sub}/part-0.parquet", "x")
    before = store.pages_served
    assert store.list_files(f"{ROOT}/_manifests") == [
        f"v{i}.json" for i in range(5)
    ]
    assert store.pages_served - before >= 3, "listing must paginate (page=2)"
    assert store.list_subdirs(f"{ROOT}/data") == ["a", "b", "c"]
    assert store.list_dir(f"{ROOT}/data") == ["a", "b", "c"]
    assert store.list_dir(ROOT) == ["_manifests", "data"]
    # empty/missing prefix lists empty, like the POSIX store
    assert store.list_dir(f"{ROOT}/nope") == []


def test_exists_on_keys_and_prefixes(store):
    store.write_exclusive(f"{ROOT}/data/a/f.parquet", "x")
    assert store.exists(f"{ROOT}/data/a/f.parquet")
    assert store.exists(f"{ROOT}/data/a")  # derived directory
    assert not store.exists(f"{ROOT}/data/zzz")


def test_delete_contract_matches_posix_store(store):
    p = f"{ROOT}/_manifests/v0.json"
    store.write_exclusive(p, "{}")
    store.delete(p)
    assert not store.exists(p)
    with pytest.raises(FileNotFoundError):
        store.delete(p)  # unlink(2) parity: deleting a missing key raises


def test_delete_tree_is_recursive_and_paginated(store):
    for i in range(7):
        store.write_exclusive(f"{ROOT}/objects/o1/b={i}/part-0.parquet", "x")
    store.write_exclusive(f"{ROOT}/objects/o2/keep.parquet", "x")
    store.delete_tree(f"{ROOT}/objects/o1")
    assert not store.exists(f"{ROOT}/objects/o1")
    assert store.exists(f"{ROOT}/objects/o2/keep.parquet")


def test_mtime_of_key_and_prefix(store):
    store.write_exclusive(f"{ROOT}/data/a/f1.parquet", "x")
    store.write_exclusive(f"{ROOT}/data/a/f2.parquet", "x")
    t_key = store.mtime(f"{ROOT}/data/a/f1.parquet")
    t_dir = store.mtime(f"{ROOT}/data/a")
    assert t_dir >= t_key > 0
    with pytest.raises(FileNotFoundError):
        store.mtime(f"{ROOT}/data/missing")


def test_index_manifest_protocol_runs_on_s3_transport(store):
    """The BM25 index commit protocol (driver-side JSON manifests) runs
    end-to-end against the real-transport store: registration routes the
    s3:// prefix, versions accumulate, the conflict path surfaces as
    CommitConflict, and vacuum's object-reference walk uses the paged
    listing. (The Spark parquet data plane rides s3a:// in production —
    here the manifest/log plane is the system under test.)"""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import (
        retrieval as R,
    )
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
        CommitConflict,
        register_log_store,
        unregister_log_store,
    )

    idx = f"{ROOT}/bm25"
    register_log_store(idx, store)
    try:
        doc = {
            "n_buckets": 4,
            "n_files": 2,
            "gram": 1,
            "meta": "objects/aaa/meta",
            "postings": {"0": "objects/aaa/postings/bucket=0"},
            "lengths": {"0": "objects/aaa/lengths/lb=0"},
        }
        R._commit_index_manifest(idx, 1, doc)
        assert R.read_index_manifest(idx)["version"] == 1
        with pytest.raises(CommitConflict):
            R._commit_index_manifest(idx, 1, doc)
        R._commit_index_manifest(idx, 2, {**doc, "meta": "objects/bbb/meta"})
        assert R._index_versions(idx) == [1, 2]
        assert R.read_index_manifest(idx)["meta"] == "objects/bbb/meta"
        assert R.read_index_manifest(idx, version=1)["meta"] == "objects/aaa/meta"
    finally:
        unregister_log_store(idx)


class _Failing:
    """Delegating wrapper that makes ONE client method raise a crafted
    ClientError — real botocore error shapes, moto underneath."""

    def __init__(self, inner, method: str, code: str, status: int):
        from botocore.exceptions import ClientError

        self._inner = inner
        self._method = method
        self._err = ClientError(
            {
                "Error": {"Code": code, "Message": code},
                "ResponseMetadata": {"HTTPStatusCode": status},
            },
            method,
        )

    def __getattr__(self, name):
        if name == self._method:
            def boom(**kwargs):
                raise self._err
            return boom
        return getattr(self._inner, name)


def test_write_exclusive_409_conditional_conflict_is_a_conflict(store):
    """ADVICE r11: while a concurrent conditional PUT of the same key is
    in flight, S3 returns 409 ConditionalRequestConflict instead of 412.
    Both mean 'you did not win the slot' — the store must surface
    FileExistsError (-> CommitConflict -> OCC rebase), not crash the
    writer with an unmapped ClientError."""
    racing = S3LogStore(
        _Failing(store._s3, "put_object", "ConditionalRequestConflict", 409),
        page_size=2,
    )
    with pytest.raises(FileExistsError):
        racing.write_exclusive(f"{ROOT}/_manifests/v7.json", "loser")


def test_only_404_maps_to_missing_elsewhere_errors_propagate(store):
    """ADVICE r11: exists()/delete()/mtime() must treat ONLY a
    definitive 404/NoSuchKey as 'missing'. An AccessDenied or throttle
    mapped to not-found would make exists() deny a live manifest and
    delete() mask transport failures as FileNotFoundError."""
    from botocore.exceptions import ClientError

    p = f"{ROOT}/_manifests/v0.json"
    store.write_exclusive(p, "{}")

    denied = S3LogStore(
        _Failing(store._s3, "head_object", "AccessDenied", 403), page_size=2
    )
    with pytest.raises(ClientError):
        denied.exists(p)
    with pytest.raises(ClientError):
        denied.delete(p)
    with pytest.raises(ClientError):
        denied.mtime(p)

    throttled = S3LogStore(
        _Failing(store._s3, "head_object", "SlowDown", 503), page_size=2
    )
    with pytest.raises(ClientError):
        throttled.exists(p)

    # the definitive-404 contract still holds
    assert not store.exists(f"{ROOT}/_manifests/v99.json")
    with pytest.raises(FileNotFoundError):
        store.delete(f"{ROOT}/_manifests/v99.json")
    with pytest.raises(FileNotFoundError):
        store.mtime(f"{ROOT}/nope")
