"""The versioned-table parity fixture's invariants: the oracle's
directory globs must expand to exactly the manifest file list (the
append-only construction the oracle SQL relies on), and the skip
query's predicate must actually prune files — otherwise the parity row
would silently stop exercising data skipping."""

from __future__ import annotations

import datetime
import glob
import os

from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.lakehouse import (
    _ensure_vtab,
)
from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
    snapshot_files,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_vtab_globs_equal_manifest_lists(spark):
    path = _ensure_vtab(spark, SF)
    for pin, dirs in [(1, ("v0-*", "v1-*")), (2, ("v0-*", "v1-*", "v2-*"))]:
        manifest = sorted(snapshot_files(path, pin))
        globbed = sorted(
            f
            for d in dirs
            for f in glob.glob(os.path.join(path, "data", d, "*.parquet"))
        )
        assert manifest == globbed and manifest


def test_vtab_skip_predicate_prunes_files(spark):
    path = _ensure_vtab(spark, SF)
    where = [("o_orderdate", ">=", datetime.datetime(2000, 1, 1))]
    full = snapshot_files(path)
    pruned = snapshot_files(path, where=where)
    assert set(pruned) < set(full)
    # and pruning is tight enough to matter: the fixture range-partitions
    # by date, so at least half the files must be provably out of range
    assert len(pruned) <= len(full) // 2
