"""Registry entries that exercise the ML and streaming subsystems through
the driver's correctness gate.

- ``streaming_hourly`` replays the events fixture through a real
  Structured Streaming query and shares the batch twin's ORACLE — the
  stream/batch equivalence proof runs inside the gate itself.
- ``ml_loan_train_eval`` runs the full reference dataflow (fixture
  generation → star join → clean → preprocess → LR fit → confusion
  matrix). MLlib training isn't SQL-expressible → rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import scoped_conf
from .registry import query
from .relational import events_hourly

_STREAM_ORACLE = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4)     AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


@query(
    "streaming_hourly",
    oracle=_STREAM_ORACLE,
    description="Structured Streaming windowed aggregate replayed over the "
    "fixture (availableNow, complete mode) — hash-checked against the SAME "
    "oracle as the batch events_hourly: stream/batch equivalence inside "
    "the correctness gate",
)
def streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import read_events_stream, run_stream_to_table, windowed_counts

    # a vanilla driver session defaults to 200 shuffle partitions. For a
    # STATEFUL stream the shuffle partition count is also the state-store
    # partition count (fixed at first checkpoint), and each partition
    # carries per-batch store maintenance + snapshot I/O — size it to the
    # state (3.6k window×type rows here), not to the CPU count: 8 cuts
    # ~0.5s/replay of pure store overhead vs 32 at this scale. Scoped so
    # the setting never leaks to later queries on the shared session.
    table = f"__stream_hourly_{abs(hash(sf_dir)) % 10**8}"
    with scoped_conf(spark, spark_sql_shuffle_partitions="8"):
        stream = read_events_stream(spark, sf_dir)
        run_stream_to_table(windowed_counts(stream), table, output_mode="complete")
    return spark.table(table).orderBy("hour", "event_type")


@query(
    "transition_stream_replay",
    oracle=None,  # custom stateful operator (applyInPandasWithState);
    # stream≡batch equivalence vs the event_transitions twin is asserted
    # in tests/test_streaming.py, including cross-micro-batch
    # out-of-event-time-order arrivals
    tier="local",
    description="Streaming Markov-transition replay: watermark-buffered "
    "applyInPandasWithState chains each user's events in event-time "
    "order across micro-batches; benched alongside its batch twin "
    "(VERDICT r2 #4)",
)
def transition_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import read_events_stream, run_stream_to_table, transition_stream

    # state partitions sized to the per-user state (~1.5k users), see
    # streaming_hourly; scoped so it never leaks past the replay
    table = f"__stream_transitions_{abs(hash(sf_dir)) % 10**8}"
    with scoped_conf(spark, spark_sql_shuffle_partitions="8"):
        stream = read_events_stream(spark, sf_dir)
        run_stream_to_table(transition_stream(stream), table, output_mode="append")
    return spark.table(table).orderBy("next_ts", "prev_type", "next_type")


@query(
    "ml_loan_train_eval",
    oracle=None,  # MLlib training is not SQL-expressible
    description="The reference's end-to-end ML dataflow in one query: "
    "loan star fixture -> join/clean -> impute/encode/scale -> logistic "
    "regression -> confusion matrix (deterministic, seed 42)",
)
def ml_loan_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.classification import LogisticRegression

    from ..ml.evaluate import confusion_matrix
    from ..ml.pipeline import build_pipeline, prepare_loan_frame
    from ..ml.split import stratified_split
    from ..sources.loan_fixtures import generate_loan_tables

    t = generate_loan_tables(spark, seed=42)
    df = prepare_loan_frame(t["applicant_info"], t["financial_info"], t["loan_info"])
    train, test = stratified_split(df, "label", test_size=0.2, seed=42)
    clf = LogisticRegression(maxIter=500, labelCol="label", featuresCol="features")
    # the eager MLlib fit wants the session default (32 locally); scoped so
    # a caller-tuned session is restored afterwards
    with scoped_conf(spark, spark_sql_shuffle_partitions="32"):
        model = build_pipeline(clf).fit(train)
    return confusion_matrix(model.transform(test)).select(
        F.col("label").cast("int").alias("label"),
        F.col("prediction").cast("int").alias("prediction"),
        F.col("n"),
    )
