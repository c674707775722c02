"""Runs every registry query on Spark and its oracle SQL on DuckDB and
compares results the way the driver does — the local pre-flight for
CORRECTNESS_r{N}.json. sf0.001 by default (fast); set
PARITY_SF_DIR=/root/testdata/sf0.01 to match the driver exactly.
"""

from __future__ import annotations

import os

import pytest

from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.registry import QUERIES

from .oracle_utils import assert_matches, duckdb_run

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

ORACLE_QUERIES = [n for n, s in QUERIES.items() if s.oracle is not None]
ROWS_ONLY_QUERIES = [n for n, s in QUERIES.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_DIR)
    odf = duckdb_run(spec.oracle, SF_DIR)
    assert_matches(sdf, odf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0
