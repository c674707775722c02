"""Single-row interactive inference — the app.py analog (app.py:42-71).

Same code path as batch scoring: build a 1-row DataFrame, run the saved
PipelineModel, extract prediction + P(approve). The symmetry is the point
of going Spark-native — this exact function scores a billion-row frame
unchanged.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.ml.functions import vector_to_array
from pyspark.sql import SparkSession, functions as F


def score_single_row(spark: SparkSession, model: PipelineModel, row: dict) -> dict:
    """``row`` uses raw UI-shaped values (strings + numbers, Dependents
    may be '3+'), mirroring the Streamlit form dict (app.py:52-65).
    Derived features (Dependents_num, Total_Income) are recomputed here
    exactly as prepare_loan_frame does."""
    from ..functions.cleaning import clean_dependents
    from ..sources.schemas import LOAN_SCHEMAS

    base = {f.name: None for f in LOAN_SCHEMAS["applicant_info"].fields}
    base.update({f.name: None for f in LOAN_SCHEMAS["financial_info"].fields})
    base["Property_Area"] = None
    base.update(row)
    base.pop("Loan_ID", None)

    # UI forms yield Python ints (app.py number_input); Spark's schema
    # verifier accepts only float for DoubleType, so coerce None-safely.
    numeric = (
        "ApplicantIncome", "CoapplicantIncome", "LoanAmount",
        "Loan_Amount_Term", "Credit_History",
    )
    for k in numeric:
        if base.get(k) is not None:
            base[k] = float(base[k])

    df = spark.createDataFrame(
        [tuple(base[k] for k in base)], schema=", ".join(
            f"{k} double" if k in (
                "ApplicantIncome", "CoapplicantIncome", "LoanAmount",
                "Loan_Amount_Term", "Credit_History",
            ) else f"{k} string"
            for k in base
        ),
    )
    df = df.withColumn("Dependents_num", clean_dependents("Dependents").cast("double")).withColumn(
        "Total_Income", F.col("ApplicantIncome") + F.col("CoapplicantIncome")
    )
    out = (
        model.transform(df)
        .select(
            F.col("prediction"),
            vector_to_array(F.col("probability"))[1].alias("p_approve"),
        )
        .collect()[0]
    )
    return {"prediction": int(out["prediction"]), "p_approve": float(out["p_approve"])}
