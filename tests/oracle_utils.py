"""Local mimic of the driver's DuckDB-oracle compare: row count + schema
(column names) + order-insensitive value comparison. Used by
tests/test_oracle_parity.py so every registry entry is verified before the
driver ever sees it.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_path(sf_dir: str, table: str) -> str:
    """DuckDB-readable path for a fixture table: driver fixtures are
    single files; Spark-written datasets (the sf1 upsample) are
    directories of part files — glob those."""
    import os

    path = f"{sf_dir}/{table}.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    return path


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{duck_path(sf_dir, t)}'")
    return con.sql(sql).df()


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_canon_value(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def _cells_close(a: str, b: str) -> bool:
    """Exact string equality, else numeric closeness at rel 1e-9.

    Both engines round float aggregates (typically 4-6 dp) before the
    compare, but a sum of ~10^6 doubles carries summation-ORDER error of
    a few ULPs (~1e-14 relative): at sf1 magnitudes (~10^10) two
    correct engines can round a boundary-straddling sum to adjacent 4th
    decimals (observed: pricing_summary sum_charge 27063233425.4471 vs
    .4470). rel 1e-9 absorbs exactly that class — five-plus orders of
    magnitude tighter than any real aggregation defect — while NULL,
    strings, ints, and small floats still compare exactly."""
    if a == b:
        return True
    try:
        fa, fb = float(a), float(b)
    except ValueError:
        return False
    return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)


def assert_matches(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    spark_pdf = spark_df.toPandas()
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count mismatch spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows == o_rows:
        return
    # exact hash-style compare failed: re-check pairwise with the tight
    # numeric tolerance (canon sort keys are the group columns in
    # practice, so ULP drift in an aggregate cell doesn't re-pair rows;
    # if it ever did, the tolerant pass fails too — no false green)
    diffs = [
        (a, b)
        for a, b in zip(s_rows, o_rows)
        if not all(_cells_close(x, y) for x, y in zip(a, b))
    ][:5]
    if diffs:
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
