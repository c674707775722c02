"""Incremental-maintenance operators: partition-incremental rollup
refresh (fingerprint change detection, cold partitions byte-identical)
and SCD2 change-batch merge (incremental application == from-scratch
history reconstruction)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.maintenance import (
    incremental_rollup,
    scd2_merge,
)
from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.loaders import load_table

SF = "/root/testdata/sf0.001"


def _file_state(path: str) -> dict[str, tuple[int, float]]:
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            out[os.path.relpath(p, path)] = (st.st_size, st.st_mtime)
    return out


def _agg(fact):
    return fact.groupBy("dt", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total")
    )


def test_incremental_rollup_touches_only_changed_partitions(spark, tmp_path):
    store = str(tmp_path / "rollup")
    fact = load_table(spark, SF, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    n_days = fact.select("dt").distinct().count()

    # first refresh: everything builds
    assert incremental_rollup(spark, fact, store, "dt", _agg) == n_days
    got = {tuple(r) for r in spark.read.parquet(store).select(F.col("dt").cast("string"), "event_type", "n", "total").collect()}
    want = {tuple(r) for r in _agg(fact).collect()}
    assert got == want

    # second refresh, nothing changed: zero partitions, files untouched
    before = _file_state(store)
    assert incremental_rollup(spark, fact, store, "dt", _agg) == 0
    assert _file_state(store) == before

    # change ONE day: only its partition rewrites, the rest byte-identical
    hot = fact.select("dt").orderBy("dt").first()["dt"]
    extra = fact.where(F.col("dt") == hot).limit(5).withColumn("value", F.col("value") + 100)
    fact2 = fact.unionByName(extra)
    before = _file_state(store)
    assert incremental_rollup(spark, fact2, store, "dt", _agg) == 1
    after = _file_state(store)
    changed_files = {f for f in set(before) | set(after) if before.get(f) != after.get(f)}
    assert changed_files, "hot partition must be rewritten"
    assert all(f"dt={hot}" in f or not f.startswith("dt=") for f in changed_files), changed_files
    got2 = {tuple(r) for r in spark.read.parquet(store).select(F.col("dt").cast("string"), "event_type", "n", "total").collect()}
    assert got2 == {tuple(r) for r in _agg(fact2).collect()}

    # drop a day entirely: its store partition is deleted
    gone = fact2.select("dt").orderBy(F.desc("dt")).first()["dt"]
    fact3 = fact2.where(F.col("dt") != gone)
    assert incremental_rollup(spark, fact3, store, "dt", _agg) == 1
    assert not os.path.exists(os.path.join(store, f"dt={gone}"))
    got3 = {tuple(r) for r in spark.read.parquet(store).select(F.col("dt").cast("string"), "event_type", "n", "total").collect()}
    assert got3 == {tuple(r) for r in _agg(fact3).collect()}


def test_scd2_merge_incremental_equals_history_reconstruction(spark, tmp_path):
    dim = str(tmp_path / "dim")
    batches = [
        # (key, segment, limit, eff)
        [(1, "gold", 100.0, "2024-01-01"), (2, "silver", 50.0, "2024-01-01"),
         (3, "bronze", 10.0, "2024-01-01")],
        # key 1 changes, key 2 identical (no-op), key 4 new
        [(1, "platinum", 200.0, "2024-02-01"), (2, "silver", 50.0, "2024-02-01"),
         (4, "gold", 120.0, "2024-02-01")],
        # key 1 changes again, key 3 changes
        [(1, "gold", 150.0, "2024-03-01"), (3, "silver", 60.0, "2024-03-01")],
    ]
    schema = "cust_id int, segment string, credit_limit double, eff_ts string"
    for b in batches:
        scd2_merge(
            spark, dim, spark.createDataFrame(b, schema),
            ["cust_id"], ["segment", "credit_limit"],
        )
    rows = {
        (r["cust_id"], r["segment"], r["credit_limit"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in spark.read.parquet(dim).collect()
    }
    expected = {
        (1, "gold", 100.0, "2024-01-01", "2024-02-01", False),
        (1, "platinum", 200.0, "2024-02-01", "2024-03-01", False),
        (1, "gold", 150.0, "2024-03-01", None, True),
        (2, "silver", 50.0, "2024-01-01", None, True),   # identical change: no-op
        (3, "bronze", 10.0, "2024-01-01", "2024-03-01", False),
        (3, "silver", 60.0, "2024-03-01", None, True),
        (4, "gold", 120.0, "2024-02-01", None, True),
    }
    assert rows == expected
    # exactly one current row per key, intervals contiguous per key
    cur = spark.read.parquet(dim).where("is_current")
    assert cur.count() == cur.select("cust_id").distinct().count() == 4


def test_scd2_merge_raises_on_corrupt_store_instead_of_overwriting(spark, tmp_path):
    """ADVICE r3: only path-absence means 'empty store'. A store that
    EXISTS but cannot be read (corrupt footer here; transient FS error
    or permissions in production) must raise — silently treating it as
    empty would overwrite the full SCD2 history with the change batch."""
    import pytest

    dim = str(tmp_path / "dim_corrupt")
    os.makedirs(dim)
    with open(os.path.join(dim, "part-00000.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    batch = spark.createDataFrame(
        [(1, "gold", 100.0, "2024-01-01")],
        "cust_id int, segment string, credit_limit double, eff_ts string",
    )
    with pytest.raises(Exception):
        scd2_merge(spark, dim, batch, ["cust_id"], ["segment", "credit_limit"])
    # the corrupt store was not replaced by the change batch
    with open(os.path.join(dim, "part-00000.parquet"), "rb") as f:
        assert f.read() == b"not a parquet file"


def test_incremental_rollup_raises_on_corrupt_manifest(spark, tmp_path):
    """Same contract for the rollup manifest: a refresh must not silently
    degrade to a full first-run rewrite when the manifest read fails."""
    import pytest

    store = str(tmp_path / "store")
    manifest = store + "__manifest"
    fact = (
        load_table(spark, SF, "events")
        .withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
    )
    incremental_rollup(spark, fact, store, "dt", _agg)
    # corrupt the manifest in place
    import glob

    for p in glob.glob(os.path.join(manifest, "*.parquet")):
        with open(p, "wb") as f:
            f.write(b"garbage")
    with pytest.raises(Exception):
        incremental_rollup(spark, fact, store, "dt", _agg)


def test_zorder_write_narrows_rowgroup_stats_on_both_dims(spark, tmp_path):
    """Z-order layout: parquet min/max footers must be narrow on BOTH
    clustered columns at once (a lexicographic sort narrows only its
    leading column; an unclustered write narrows neither), and content
    must be byte-for-byte the same rows."""
    import glob

    import pyarrow.parquet as pq

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.maintenance import (
        zorder_write,
    )

    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    naive = str(tmp_path / "naive")
    zord = str(tmp_path / "zorder")
    ev.repartition(8).write.parquet(naive)
    zorder_write(ev, zord, ["user_id", "value"], n_files=8)

    def mean_widths(path):
        widths = {"user_id": [], "value": []}
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for i in range(row.num_columns):
                    col = row.column(i)
                    name = col.path_in_schema
                    if name in widths and col.statistics is not None:
                        st = col.statistics
                        widths[name].append(float(st.max) - float(st.min))
        return {k: sum(v) / len(v) for k, v in widths.items()}

    nw, zw = mean_widths(naive), mean_widths(zord)
    # shuffled layout: every row group spans ~the full domain of both
    # columns; z-order must shrink the mean span on BOTH simultaneously
    assert zw["user_id"] < 0.6 * nw["user_id"], (zw, nw)
    assert zw["value"] < 0.6 * nw["value"], (zw, nw)

    back = spark.read.parquet(zord)
    assert back.count() == ev.count()

    def content_hash(df):
        # decimal sum: ANSI mode overflow-checks sum(long)
        return df.agg(
            F.sum(F.xxhash64("event_id", "user_id", "value").cast("decimal(20,0)"))
        ).first()[0]

    assert content_hash(back) == content_hash(ev)


def test_interleave_bits_four_columns_stays_in_long_domain(spark):
    """Bit positions pass 31 with 4+ clustered columns: the interleave
    must run in long arithmetic (int shiftleft would hit the sign bit at
    31 and alias mod 32 beyond), and >63-bit requests must raise."""
    import pytest as _pytest

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.maintenance import (
        interleave_bits,
    )

    row = spark.range(1).select(
        interleave_bits([F.lit(255)] * 4).alias("zv"),
        interleave_bits([F.lit(128), F.lit(0), F.lit(0), F.lit(0)]).alias("top"),
    ).first()
    assert row["zv"] == (1 << 32) - 1  # all 32 interleaved bits set, positive
    assert row["top"] == 1 << 28  # bit 7 of col 0 -> position 7*4+0
    with _pytest.raises(ValueError):
        interleave_bits([F.lit(0)] * 8)  # 64 bits > long's 63


def test_incremental_rollup_recovers_when_manifest_is_lost(spark, tmp_path):
    """Crash semantics of the staging+rename manifest commit: the only
    states a crash can leave are 'old manifest' (refresh re-runs) or 'no
    manifest' — and a lost manifest must trigger a clean full rebuild of
    derivable data, never an error."""
    import shutil

    store = str(tmp_path / "store")
    manifest = store + "__manifest"
    fact = load_table(spark, SF, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    n_days = fact.select("dt").distinct().count()
    incremental_rollup(spark, fact, store, "dt", _agg)
    assert not os.path.exists(manifest + "__staging")  # staging cleaned up

    shutil.rmtree(manifest)  # simulate a crash between delete and rename
    # the fact also DROPS a day while the manifest is gone: recovery must
    # delete that orphaned store partition, not leave it stale forever
    gone = fact.select("dt").orderBy(F.desc("dt")).first()["dt"]
    fact2 = fact.where(F.col("dt") != gone)
    assert incremental_rollup(spark, fact2, store, "dt", _agg) == n_days - 1
    assert not os.path.exists(os.path.join(store, f"dt={gone}"))
    got = {
        tuple(r)
        for r in spark.read.parquet(store)
        .select(F.col("dt").cast("string"), "event_type", "n", "total")
        .collect()
    }
    assert got == {tuple(r) for r in _agg(fact2).collect()}
    # and the refresh after recovery is incremental again
    assert incremental_rollup(spark, fact2, store, "dt", _agg) == 0
