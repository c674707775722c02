"""The reference's end-to-end ML dataflow (LP.ipynb cells 7-22),
Spark-native: star join → cleaning → MLlib Pipeline [median-impute →
mode-impute → index → one-hot → assemble → scale → classifier] →
model-selection loop → persisted PipelineModel.

sklearn-parity decisions (SURVEY.md §7.4):
- Imputer(strategy=median, relativeError=0.0): exact medians like
  SimpleImputer (MLlib defaults to approximate).
- StringIndexer(handleInvalid='keep') + OneHotEncoder(dropLast=True):
  the keep-bucket becomes the dropped slot, so unknown categories encode
  as all-zeros — exactly sklearn OneHotEncoder(handle_unknown='ignore',
  drop=None): one slot per training category.
- StandardScaler(withMean=True) is applied to the NUMERIC vector only,
  before concatenation with the one-hot blocks — sklearn's
  ColumnTransformer semantics, and it keeps the one-hot side sparse
  (densifying the full assembled vector is the №1 scale trap at 100 TB).
- Model selection by accuracy/F1, NOT the reference's r2_score bug
  (LP.ipynb:841); divergence documented in tests.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression, RandomForestClassifier
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.feature import (
    Imputer,
    OneHotEncoder,
    StandardScaler,
    StringIndexer,
    VectorAssembler,
)
from pyspark.sql import DataFrame, functions as F

from ..functions.cleaning import clean_dependents, label_encode
from ..sources.schemas import LOAN_CATEGORICAL_COLS, LOAN_LABEL_COL, LOAN_NUMERIC_COLS
from .transformers import StringModeImputer

DERIVED_NUMERIC = ["Total_Income"]


def prepare_loan_frame(
    applicant: DataFrame, financial: DataFrame, loan: DataFrame
) -> DataFrame:
    """LP.ipynb cells 7+14+20 + app.py:50: 3-way star merge on Loan_ID,
    drop the key, '3+' -> 3 cast, Y/N -> 1/0 label, Total_Income."""
    df = applicant.join(financial, "Loan_ID", "inner").join(loan, "Loan_ID", "inner").drop("Loan_ID")
    return (
        df.withColumn("Dependents_num", clean_dependents("Dependents").cast("double"))
        .withColumn("Total_Income", F.col("ApplicantIncome") + F.col("CoapplicantIncome"))
        .withColumn("label", label_encode(LOAN_LABEL_COL, {"Y": 1, "N": 0}).cast("double"))
        .drop(LOAN_LABEL_COL)
    )


def add_engineered_features(df: DataFrame) -> DataFrame:
    """The reference README's described-but-unimplemented features
    (README.md:9,13 — EMI proxy, loan-to-income, log transforms),
    realized as codegen'd column arithmetic. Guards: try-division by
    null/zero terms yields null, which the median imputer then fills."""
    return (
        df.withColumn(
            "EMI_proxy", F.col("LoanAmount") / F.nullif(F.col("Loan_Amount_Term"), F.lit(0.0))
        )
        .withColumn(
            "Loan_to_Income", F.col("LoanAmount") / F.nullif(F.col("Total_Income"), F.lit(0.0))
        )
        .withColumn("Log_Total_Income", F.log1p(F.col("Total_Income")))
        .withColumn("Log_LoanAmount", F.log1p(F.col("LoanAmount")))
    )


ENGINEERED_NUMERIC = ["EMI_proxy", "Loan_to_Income", "Log_Total_Income", "Log_LoanAmount"]


def build_cross_validator(clf=None, *, param_grid=None, n_folds: int = 3, seed: int = 42):
    """README.md:15's k-fold CV + grid search, Spark-native: CrossValidator
    over the full preprocessing+model pipeline (folds re-fit imputers and
    scalers — no test-fold leakage, unlike refitting stages manually).

    ``param_grid``: list of param maps (ParamGridBuilder().build()); the
    built-in default grid only applies to LogisticRegression — any other
    estimator must bring its own grid."""
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    clf = clf if clf is not None else LogisticRegression(
        maxIter=200, labelCol="label", featuresCol="features"
    )
    pipe = build_pipeline(clf)
    if param_grid is not None:
        grid = param_grid
    elif isinstance(clf, LogisticRegression):
        grid = (
            ParamGridBuilder()
            .addGrid(clf.regParam, [0.0, 0.1])
            .addGrid(clf.elasticNetParam, [0.0, 0.5])
            .build()
        )
    else:
        raise ValueError(
            f"no default grid for {type(clf).__name__}; pass param_grid="
            "ParamGridBuilder().addGrid(...).build()"
        )
    evaluator = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    )
    return CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=n_folds,
        seed=seed,
        parallelism=4,
    )


def build_preprocessor(
    numeric_cols: list[str] | None = None,
    categorical_cols: list[str] | None = None,
) -> list:
    """Schema-driven preprocessing stages (the ColumnTransformer analog,
    LP.ipynb:748-763 cell 17)."""
    numeric_cols = numeric_cols or [
        c for c in LOAN_NUMERIC_COLS if c != "Dependents"
    ] + ["Dependents_num"] + DERIVED_NUMERIC
    categorical_cols = categorical_cols or [
        c for c in LOAN_CATEGORICAL_COLS if c != "Dependents"
    ]

    num_imputer = Imputer(
        strategy="median",
        relativeError=0.0,  # exact medians: SimpleImputer parity
        inputCols=numeric_cols,
        outputCols=[f"{c}__imp" for c in numeric_cols],
    )
    cat_imputer = StringModeImputer(inputCols=categorical_cols)
    indexers = [
        StringIndexer(
            inputCol=c, outputCol=f"{c}__idx", handleInvalid="keep", stringOrderType="alphabetAsc"
        )
        for c in categorical_cols
    ]
    # The indexer's keep-bucket (last index) is the only "invalid" route,
    # so the encoder keeps handleInvalid='error' — adding keep here would
    # append a SECOND invalid bucket and break the all-zeros layout.
    onehot = OneHotEncoder(
        inputCols=[f"{c}__idx" for c in categorical_cols],
        outputCols=[f"{c}__oh" for c in categorical_cols],
        dropLast=True,  # drops the keep-bucket -> unknowns = all-zeros (sklearn parity)
    )
    num_assembler = VectorAssembler(
        inputCols=[f"{c}__imp" for c in numeric_cols], outputCol="num_vec"
    )
    scaler = StandardScaler(
        inputCol="num_vec", outputCol="num_scaled", withMean=True, withStd=True
    )
    final_assembler = VectorAssembler(
        inputCols=["num_scaled"] + [f"{c}__oh" for c in categorical_cols],
        outputCol="features",
    )
    return [num_imputer, cat_imputer, *indexers, onehot, num_assembler, scaler, final_assembler]


def candidate_models(seed: int = 42) -> dict[str, object]:
    """LP.ipynb:772-777 cell 18: the two candidate classifiers with the
    reference's hyperparameters mapped to MLlib."""
    return {
        "RandomForestClassifier": RandomForestClassifier(
            numTrees=200, maxDepth=8, minInstancesPerNode=10, seed=seed,
            labelCol="label", featuresCol="features",
        ),
        "LogisticRegression": LogisticRegression(
            maxIter=2000, labelCol="label", featuresCol="features"
        ),
    }


def build_pipeline(clf, numeric_cols=None, categorical_cols=None) -> Pipeline:
    return Pipeline(stages=[*build_preprocessor(numeric_cols, categorical_cols), clf])


def train_and_select(
    train: DataFrame,
    test: DataFrame,
    *,
    metric: str = "accuracy",
    seed: int = 42,
) -> tuple[str, PipelineModel, dict[str, dict[str, float]]]:
    """LP.ipynb:827-848 cell 21 — fit each candidate, score on the test
    split, keep the argmax. Selection metric is accuracy (intended
    capability), not the reference's r2_score bug."""
    from .evaluate import classification_metrics

    results: dict[str, dict[str, float]] = {}
    best_name, best_model, best_score = None, None, float("-inf")
    for name, clf in candidate_models(seed).items():
        model = build_pipeline(clf).fit(train)
        pred = model.transform(test)
        metrics = classification_metrics(pred)
        results[name] = metrics
        if metrics[metric] > best_score:
            best_name, best_model, best_score = name, model, metrics[metric]
    return best_name, best_model, results
