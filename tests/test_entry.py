"""Smoke tests mirroring the driver's t1 check on __spark_entry__."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"r_name", "n_customers", "avg_acctbal"}


def test_queries_oracle_keys_align():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q), "oracle_sql keys must be a subset of queries"
    assert len(q) > 0
