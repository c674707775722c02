"""Declared schemas for every table the engine reads.

The reference *declares* schemas on the storage side (MySQL DDL,
MY.ipynb:434-504 cells 10-12) but lets pandas *infer* on the compute side
(pd.read_json / pd.read_sql), which produces dtype drift — e.g.
ApplicantIncome is FLOAT in the DDL but int64 in pandas
(LP.ipynb:591-593). This module is the Spark fix: one explicit
``StructType`` per table, used both to validate parquet reads (guard
against silent drift) and to read schemaless formats (JSON-lines, CSV)
without inference.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _st(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# ---------------------------------------------------------------------------
# TPC-H-ish star schema + extension tables (driver fixtures, TESTDATA.md)
# ---------------------------------------------------------------------------

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": _st(("r_regionkey", T.IntegerType()), ("r_name", T.StringType())),
    "nation": _st(
        ("n_nationkey", T.IntegerType()),
        ("n_name", T.StringType()),
        ("n_regionkey", T.IntegerType()),
    ),
    "customer": _st(
        ("c_custkey", T.LongType()),
        ("c_name", T.StringType()),
        ("c_nationkey", T.IntegerType()),
        ("c_acctbal", T.DoubleType()),
        ("c_mktsegment", T.StringType()),
    ),
    "supplier": _st(
        ("s_suppkey", T.LongType()),
        ("s_name", T.StringType()),
        ("s_nationkey", T.IntegerType()),
        ("s_acctbal", T.DoubleType()),
    ),
    "part": _st(
        ("p_partkey", T.LongType()),
        ("p_name", T.StringType()),
        ("p_brand", T.StringType()),
        ("p_type", T.StringType()),
        ("p_size", T.IntegerType()),
        ("p_retailprice", T.DoubleType()),
    ),
    "orders": _st(
        ("o_orderkey", T.LongType()),
        ("o_custkey", T.LongType()),
        ("o_orderstatus", T.StringType()),
        ("o_totalprice", T.DoubleType()),
        ("o_orderdate", T.TimestampNTZType()),
        ("o_orderpriority", T.StringType()),
    ),
    "lineitem": _st(
        ("l_orderkey", T.LongType()),
        ("l_partkey", T.LongType()),
        ("l_suppkey", T.LongType()),
        ("l_linenumber", T.IntegerType()),
        ("l_quantity", T.DoubleType()),
        ("l_extendedprice", T.DoubleType()),
        ("l_discount", T.DoubleType()),
        ("l_tax", T.DoubleType()),
        ("l_returnflag", T.StringType()),
        ("l_linestatus", T.StringType()),
        ("l_shipdate", T.TimestampNTZType()),
    ),
    "events": _st(
        ("event_id", T.LongType()),
        ("ts", T.TimestampNTZType()),
        ("user_id", T.LongType()),
        ("event_type", T.StringType()),
        ("value", T.DoubleType()),
        ("props", T.StringType()),
    ),
    "documents": _st(
        ("doc_id", T.LongType()),
        ("text", T.StringType()),
        ("lang", T.StringType()),
        ("source", T.StringType()),
        ("n_chars", T.LongType()),
    ),
    "embeddings": _st(
        ("vec_id", T.LongType()),
        ("embedding", T.ArrayType(T.FloatType())),
        ("label", T.IntegerType()),
    ),
}

# ---------------------------------------------------------------------------
# Loan star schema (the reference's own data model, SURVEY.md §1 / FIXTURES.md)
# 1:1 on PK Loan_ID (MY.ipynb:390-391 cell 8); DDL MY.ipynb:434-504.
# ---------------------------------------------------------------------------

LOAN_SCHEMAS: dict[str, T.StructType] = {
    "applicant_info": _st(
        ("Loan_ID", T.StringType()),
        ("Gender", T.StringType()),
        ("Married", T.StringType()),
        ("Dependents", T.StringType()),
        ("Education", T.StringType()),
        ("Self_Employed", T.StringType()),
    ),
    "financial_info": _st(
        ("Loan_ID", T.StringType()),
        ("ApplicantIncome", T.DoubleType()),
        ("CoapplicantIncome", T.DoubleType()),
        ("LoanAmount", T.DoubleType()),
        ("Loan_Amount_Term", T.DoubleType()),
        ("Credit_History", T.DoubleType()),
    ),
    "loan_info": _st(
        ("Loan_ID", T.StringType()),
        ("Property_Area", T.StringType()),
        ("Loan_Status", T.StringType()),
    ),
}

LOAN_NUMERIC_COLS = [
    "ApplicantIncome",
    "CoapplicantIncome",
    "LoanAmount",
    "Loan_Amount_Term",
    "Credit_History",
]
LOAN_CATEGORICAL_COLS = [
    "Gender",
    "Married",
    "Dependents",
    "Education",
    "Self_Employed",
    "Property_Area",
]
LOAN_LABEL_COL = "Loan_Status"
