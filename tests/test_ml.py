"""ML-pipeline parity tests (SURVEY.md §5.2.2-4): reference invariants on
the loan fixture, preprocessing semantics, stratified split, model
selection, persistence, single-row scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from loan_approval_prediction_data_engineering_ml_pipeline_spark.ml import (
    StringModeImputer,
    build_pipeline,
    confusion_matrix,
    prepare_loan_frame,
    score_single_row,
    stratified_split,
    train_and_select,
)
from loan_approval_prediction_data_engineering_ml_pipeline_spark.ml.pipeline import candidate_models
from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.relational import (
    duplicate_count,
    null_audit,
    value_counts,
)
from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.loan_fixtures import (
    NULL_COUNTS,
    generate_loan_tables,
)


@pytest.fixture(scope="module")
def loan_tables(spark):
    return generate_loan_tables(spark, seed=42)


@pytest.fixture(scope="module")
def loan_df(spark, loan_tables):
    return prepare_loan_frame(**{
        "applicant": loan_tables["applicant_info"],
        "financial": loan_tables["financial_info"],
        "loan": loan_tables["loan_info"],
    }).cache()


def test_reference_invariants(loan_tables, loan_df):
    # post-join shape: 614 rows (LP.ipynb:552-556 cell 9)
    assert loan_df.count() == 614
    # null audit matches the reference's vector (LP.ipynb:625-626 cell 11)
    audit = {
        r["column_name"]: r["n_nulls"]
        for r in null_audit(
            loan_tables["applicant_info"]
            .join(loan_tables["financial_info"], "Loan_ID")
            .join(loan_tables["loan_info"], "Loan_ID")
        ).collect()
    }
    for col, n in NULL_COUNTS.items():
        assert audit[col] == n, f"{col}: {audit[col]} != {n}"
    # duplicate rows: 0 (LP.ipynb:646-647 cell 12)
    assert duplicate_count(loan_df).collect()[0]["n_duplicates"] == 0
    # class balance Y 0.687296 / N 0.312704 (LP.ipynb:667-669 cell 13)
    props = {r["label"]: r["proportion"] for r in value_counts(loan_df, "label", normalize=True).collect()}
    assert props[1.0] == pytest.approx(0.687296, abs=1e-6)
    assert props[0.0] == pytest.approx(0.312704, abs=1e-6)


def test_dependents_rewrite(loan_df):
    # '3+' -> 3.0 (LP.ipynb:678-681 cell 14); nulls preserved for imputation
    vals = {r["Dependents_num"] for r in loan_df.select("Dependents_num").distinct().collect()}
    assert vals == {0.0, 1.0, 2.0, 3.0, None}


def test_string_mode_imputer_tiebreak_and_fill(spark):
    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), (None,)], ["c"]
    )
    model = StringModeImputer(inputCols=["c"]).fit(df)
    # tie between a(2) and b(2): sklearn picks the smallest -> 'a'
    assert model.modes == {"c": "a"}
    out = model.transform(df)
    assert out.where(F.col("c").isNull()).count() == 0
    assert out.where(F.col("c") == "a").count() == 3


def test_stratified_split_exact_and_deterministic(loan_df):
    tr1, te1 = stratified_split(loan_df, "label", test_size=0.2, seed=42)
    tr2, te2 = stratified_split(loan_df, "label", test_size=0.2, seed=42)
    assert tr1.count() + te1.count() == 614
    # per-class train counts = ceil(0.8 * n_class): 422 -> 338, 192 -> 154
    by_class = {r["label"]: r["count"] for r in tr1.groupBy("label").count().collect()}
    assert by_class == {1.0: 338, 0.0: 154}
    assert tr1.count() == tr2.count() and te1.count() == te2.count()


def test_preprocessing_semantics(spark, loan_df):
    from pyspark.ml import Pipeline
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.ml.pipeline import build_preprocessor

    model = Pipeline(stages=build_preprocessor()).fit(loan_df)
    out = model.transform(loan_df)
    # exact median imputation: LoanAmount median from non-null values
    expected_median = loan_df.approxQuantile("LoanAmount", [0.5], 0.0)[0]
    imputer_model = model.stages[0]
    surrogate = imputer_model.surrogateDF.collect()[0]["LoanAmount"]
    assert surrogate == expected_median
    # no nulls after imputation in any feature input
    assert out.where(F.col("LoanAmount__imp").isNull()).count() == 0
    # scaled numeric block: mean ~0, std ~1 for first element
    from pyspark.ml.functions import vector_to_array
    stats = out.select(
        F.avg(vector_to_array("num_scaled")[0]).alias("m"),
        F.stddev_samp(vector_to_array("num_scaled")[0]).alias("s"),
    ).collect()[0]
    assert abs(stats["m"]) < 1e-9
    assert stats["s"] == pytest.approx(1.0, abs=1e-9)
    # one-hot layout: one slot per seen category (keep-bucket dropped)
    n_gender = loan_df.select("Gender").where(F.col("Gender").isNotNull()).distinct().count()
    oh_size = out.select(F.size(vector_to_array("Gender__oh")).alias("s")).first()["s"]
    assert oh_size == n_gender  # sklearn drop=None layout


def test_unknown_category_encodes_all_zeros(spark, loan_df):
    from pyspark.ml import Pipeline
    from pyspark.ml.functions import vector_to_array
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.ml.pipeline import build_preprocessor

    model = Pipeline(stages=build_preprocessor()).fit(loan_df)
    weird = loan_df.limit(1).withColumn("Property_Area", F.lit("Atlantis"))
    vec = (
        model.transform(weird)
        .select(vector_to_array("Property_Area__oh").alias("v"))
        .first()["v"]
    )
    assert list(vec) == [0.0] * len(vec)  # handle_unknown='ignore' parity


@pytest.mark.slow
def test_train_select_persist_score(spark, loan_df, tmp_path):
    train, test = stratified_split(loan_df, "label", 0.2, seed=42)
    best_name, best_model, results = train_and_select(train, test)
    assert set(results) == {"RandomForestClassifier", "LogisticRegression"}
    # Quality regression band (BASELINE.md "Model quality"): on the
    # signal-bearing fixture (credit-history-dominant labels, exact
    # reference class balance) the r2 measurement was RF acc 0.8607 /
    # F1 0.8513, LR acc 0.8689 / F1 0.8641. Both models must stay well
    # above the 0.687 predict-all-Y majority baseline — a drop to it
    # means the pipeline stopped learning (e.g. features disconnected).
    for name, m in results.items():
        assert m["accuracy"] >= 0.80, f"{name} accuracy {m['accuracy']:.4f} below band"
        assert m["f1"] >= 0.80, f"{name} f1 {m['f1']:.4f} below band"
    assert results[best_name]["accuracy"] <= 0.95, "suspiciously high: label leak?"
    # confusion matrix totals the test split
    cm = confusion_matrix(best_model.transform(test))
    assert sum(r["n"] for r in cm.collect()) == test.count()
    # persistence: the reference MEANT to save the fitted pipeline but
    # pickled a string (LP.ipynb:857-862); we save/load the real model
    path = str(tmp_path / "model")
    best_model.write().overwrite().save(path)
    from pyspark.ml import PipelineModel

    loaded = PipelineModel.load(path)
    row = {
        "Gender": "Male", "Married": "Yes", "Dependents": "3+",
        "Education": "Graduate", "Self_Employed": "No",
        # ints on purpose: a UI form (reference app.py number_input)
        # yields Python ints, which score_single_row must coerce —
        # Spark's verifier accepts only float for DoubleType
        "ApplicantIncome": 5849, "CoapplicantIncome": 1508,
        "LoanAmount": 128, "Loan_Amount_Term": 360,
        "Credit_History": 1, "Property_Area": "Urban",
    }
    out = score_single_row(spark, loaded, row)
    assert out["prediction"] in (0, 1)
    assert 0.0 <= out["p_approve"] <= 1.0
    # loaded model reproduces in-memory predictions
    a = best_model.transform(test).select("prediction").collect()
    b = loaded.transform(test).select("prediction").collect()
    assert a == b


@pytest.mark.slow
def test_engineered_features_and_cv(spark, loan_df):
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.ml.pipeline import (
        ENGINEERED_NUMERIC,
        add_engineered_features,
        build_cross_validator,
        build_preprocessor,
    )

    eng = add_engineered_features(loan_df)
    row = eng.where(
        F.col("LoanAmount").isNotNull() & F.col("Loan_Amount_Term").isNotNull()
    ).first()
    assert row["EMI_proxy"] == pytest.approx(row["LoanAmount"] / row["Loan_Amount_Term"])
    assert row["Log_Total_Income"] == pytest.approx(
        __import__("math").log1p(row["Total_Income"])
    )
    # CV over the full pipeline with the engineered numerics included
    base_numeric = [c for c in
        ["ApplicantIncome", "CoapplicantIncome", "LoanAmount", "Loan_Amount_Term",
         "Credit_History", "Dependents_num", "Total_Income"]] + ENGINEERED_NUMERIC
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml import Pipeline
    clf = LogisticRegression(maxIter=200, labelCol="label", featuresCol="features")
    cv = build_cross_validator(clf, n_folds=3)
    # swap the default preprocessor for one that includes engineered cols
    cv.setEstimator(Pipeline(stages=[*build_preprocessor(numeric_cols=base_numeric), clf]))
    model = cv.fit(eng)
    assert len(model.avgMetrics) == 4  # 2x2 grid
    assert all(0.0 <= m <= 1.0 for m in model.avgMetrics)


def test_cli_scorer_arg_validation():
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.ml.app import main

    with pytest.raises(SystemExit):  # neither --model nor --train-demo
        main(["--row", "{}"])
    with pytest.raises(SystemExit):  # --row is required
        main(["--train-demo"])


def test_cli_scorer_rejects_bad_json_and_both_modes():
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.ml.app import main

    with pytest.raises(SystemExit):  # invalid JSON caught before Spark boots
        main(["--train-demo", "--row", "{not json"])
    with pytest.raises(SystemExit):  # --model and --train-demo are exclusive
        main(["--model", "/x", "--train-demo", "--row", "{}"])
    with pytest.raises(SystemExit):  # row must be an object
        main(["--train-demo", "--row", "[1,2]"])


def test_stratified_split_disjoint_under_repartition(loan_df):
    # membership must be a pure function of (row content, seed): a
    # different partition layout plus independent recomputation of the
    # two lazy frames must never send a row to both splits or to neither
    # (loan frame has 0 duplicate rows, so full-row keys are unique)
    df = loan_df.repartition(13)
    tr, te = stratified_split(df, "label", test_size=0.2, seed=42)
    key = F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in df.columns]
        )
    )
    tr_keys = {r[0] for r in tr.select(key).collect()}
    te_keys = {r[0] for r in te.select(key).collect()}
    all_keys = {r[0] for r in df.select(key).collect()}
    assert tr_keys.isdisjoint(te_keys)
    assert tr_keys | te_keys == all_keys
    # and the same rows are chosen when the input layout differs
    tr_base, _ = stratified_split(loan_df, "label", test_size=0.2, seed=42)
    assert {r[0] for r in tr_base.select(key).collect()} == tr_keys


@pytest.mark.slow
def test_ranking_metrics_auc(spark, loan_df):
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.ml.evaluate import (
        ranking_metrics,
    )
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.ml.pipeline import (
        train_and_select,
    )

    train, test = stratified_split(loan_df, "label", 0.2, seed=42)
    _, best_model, _ = train_and_select(train, test)
    m = ranking_metrics(best_model.transform(test))
    # signal-bearing fixture: both areas must beat a random ranker by a
    # wide margin (measured r2: roc_auc 0.9254, pr_auc 0.9607)
    assert m["roc_auc"] >= 0.80
    assert m["pr_auc"] >= 0.85
    assert m["roc_auc"] <= 1.0 and m["pr_auc"] <= 1.0


def test_feature_importances_named_and_normalized(spark, loan_df):
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.ml.evaluate import (
        feature_importances,
    )
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.ml.pipeline import (
        build_pipeline,
        candidate_models,
    )

    model = build_pipeline(candidate_models()["RandomForestClassifier"]).fit(loan_df)
    scored = model.transform(loan_df)
    pairs = feature_importances(model, scored)
    names = [n for n, _ in pairs]
    assert len(pairs) >= 10  # numerics + one-hot slots
    assert abs(sum(v for _, v in pairs) - 1.0) < 1e-6
    assert all(v >= 0 for _, v in pairs)
    # the fixture's labels are credit-history-dominant by construction:
    # the one-hot/numeric slot for Credit_History must rank top-3
    top3 = " ".join(names[:3])
    assert "Credit_History" in top3, pairs[:5]
    # every name is a real column or a one-hot slot of one
    assert all(n and not n.startswith("f") or "_" in n for n in names)


@pytest.mark.slow
def test_ml_loan_train_eval_seed_pinned(spark):
    """VERDICT r2 #2: the driver's ml_loan_train_eval row is rows-only
    (MLlib training isn't SQL-expressible), so pin it here instead: the
    seed-pinned confusion-matrix cells must be bit-identical across two
    independent end-to-end runs (fixture gen -> split -> fit -> score),
    and the accuracy they encode must sit in the BASELINE.md band."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.pipelines import (
        ml_loan_train_eval,
    )

    runs = [
        sorted(
            ml_loan_train_eval(spark, "/root/testdata/sf0.001").collect(),
            key=lambda r: (r["label"], r["prediction"]),
        )
        for _ in range(2)
    ]
    assert runs[0] == runs[1], f"non-deterministic confusion cells: {runs}"
    cells = {(r["label"], r["prediction"]): r["n"] for r in runs[0]}
    total = sum(cells.values())
    correct = cells.get((0, 0), 0) + cells.get((1, 1), 0)
    acc = correct / total
    assert 0.80 <= acc <= 0.95, f"accuracy {acc:.4f} outside BASELINE band, cells={cells}"
