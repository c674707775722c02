"""Deterministic loan-star fixture generator (FIXTURES.md §A).

Reproduces the reference's data shape exactly: three 1:1 tables on PK
Loan_ID, 614 rows, the reference's null counts (Credit_History 50,
Self_Employed 32, LoanAmount 22, Dependents 15, Loan_Amount_Term 14,
Gender 13, Married 3 — LP.ipynb:625-626 cell 11) and class balance
(Y 422 / N 192 = 0.687296/0.312704 — LP.ipynb:667-669 cell 13), so the
reference's checkable invariants are assertable against our pipeline.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from .schemas import LOAN_SCHEMAS

N_ROWS = 614
N_YES = 422  # 422/614 = 0.687296...

NULL_COUNTS = {
    "Gender": 13,
    "Married": 3,
    "Dependents": 15,
    "Self_Employed": 32,
    "LoanAmount": 22,
    "Loan_Amount_Term": 14,
    "Credit_History": 50,
}


def generate_loan_tables(spark: SparkSession, seed: int = 42) -> dict[str, DataFrame]:
    rng = random.Random(seed)
    ids = [f"LP{i + 1:06d}" for i in range(N_ROWS)]

    def nullify(values: list, col: str) -> list:
        out = list(values)
        for i in rng.sample(range(N_ROWS), NULL_COUNTS.get(col, 0)):
            out[i] = None
        return out

    gender = nullify([rng.choice(["Male", "Male", "Male", "Female"]) for _ in range(N_ROWS)], "Gender")
    married = nullify([rng.choice(["Yes", "Yes", "No"]) for _ in range(N_ROWS)], "Married")
    dependents = nullify(
        [rng.choice(["0", "0", "0", "1", "2", "3+"]) for _ in range(N_ROWS)], "Dependents"
    )
    education = [rng.choice(["Graduate", "Graduate", "Not Graduate"]) for _ in range(N_ROWS)]
    self_emp = nullify([rng.choice(["No", "No", "No", "Yes"]) for _ in range(N_ROWS)], "Self_Employed")

    app_income = [float(rng.randint(150, 20000)) for _ in range(N_ROWS)]
    coapp_income = [0.0 if rng.random() < 0.4 else float(rng.randint(0, 10000)) for _ in range(N_ROWS)]
    loan_amount = nullify([float(rng.randint(9, 700)) for _ in range(N_ROWS)], "LoanAmount")
    term = nullify(
        [float(rng.choice([360, 360, 360, 360, 180, 120, 300, 480, 84])) for _ in range(N_ROWS)],
        "Loan_Amount_Term",
    )
    credit = nullify([1.0 if rng.random() < 0.84 else 0.0 for _ in range(N_ROWS)], "Credit_History")

    area = [rng.choice(["Urban", "Semiurban", "Rural"]) for _ in range(N_ROWS)]

    # Label assignment with learnable signal: like the real loan dataset,
    # Credit_History dominates approval, with income-to-loan ratio and
    # property area as secondary effects plus Gaussian noise. Assigning Y
    # to the top-N_YES scores (not thresholding) preserves the reference's
    # exact 422/192 class balance (LP.ipynb:667-669) while keeping labels
    # a deterministic function of seed — so model-quality numbers are
    # pinnable as a regression band (BASELINE.md) instead of the
    # majority-class collapse a signal-free shuffle forces.
    import math

    def _score(i: int) -> float:
        ch = credit[i]
        ch_part = 0.5 if ch is None else ch
        income = app_income[i] + coapp_income[i]
        la = loan_amount[i] if loan_amount[i] is not None else 350.0
        ratio_part = math.log1p(income / (la + 1.0))
        area_part = {"Urban": 0.15, "Semiurban": 0.3, "Rural": 0.0}[area[i]]
        return 3.0 * ch_part + 0.6 * ratio_part + area_part + rng.gauss(0.0, 0.8)

    scores = [_score(i) for i in range(N_ROWS)]
    yes_idx = set(sorted(range(N_ROWS), key=lambda i: scores[i], reverse=True)[:N_YES])
    status = ["Y" if i in yes_idx else "N" for i in range(N_ROWS)]

    applicant = spark.createDataFrame(
        list(zip(ids, gender, married, dependents, education, self_emp)),
        schema=LOAN_SCHEMAS["applicant_info"],
    )
    financial = spark.createDataFrame(
        list(zip(ids, app_income, coapp_income, loan_amount, term, credit)),
        schema=LOAN_SCHEMAS["financial_info"],
    )
    loan = spark.createDataFrame(
        list(zip(ids, area, status)), schema=LOAN_SCHEMAS["loan_info"]
    )
    return {"applicant_info": applicant, "financial_info": financial, "loan_info": loan}
