"""Registry queries are order-independent: none may leave a session conf
mutated (VERDICT r3 #1 — the shuffle-partitions leak that contaminated
bench rounds 2-5).
"""

from __future__ import annotations

import pytest

from loan_approval_prediction_data_engineering_ml_pipeline_spark.session import scoped_conf

SF_SMOKE = "/root/testdata/sf0.001"

# the three queries that tune spark.sql.shuffle.partitions for their eager
# replay/fit work — exactly the ones that leaked in r3
CONF_TUNING_QUERIES = ["streaming_hourly", "transition_stream_replay", "ml_loan_train_eval"]


def test_scoped_conf_restores_prior_value(spark):
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    with scoped_conf(spark, spark_sql_shuffle_partitions="7"):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prior


def test_scoped_conf_restores_on_exception(spark):
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(RuntimeError):
        with scoped_conf(spark, spark_sql_shuffle_partitions="5"):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == prior


def test_scoped_conf_unsets_previously_unset_key(spark):
    key = "graft.test.scoped-conf-probe"
    with scoped_conf(spark, **{"graft_test_scoped-conf-probe": "x"}):
        assert spark.conf.get(key) == "x"
    with pytest.raises(Exception):
        spark.conf.get(key)


@pytest.mark.parametrize("name", CONF_TUNING_QUERIES)
def test_registry_queries_leave_shuffle_partitions_unchanged(spark, name):
    """Run each conf-tuning query end-to-end (the eager part happens inside
    the query function) and assert the shared-session conf is untouched —
    the registry's order-independence contract (plans/registry.py)."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.registry import QUERIES

    sentinel = "31"  # distinct from both the tuned values (8/32) and defaults
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", sentinel)
    try:
        df = QUERIES[name].fn(spark, SF_SMOKE)
        assert spark.conf.get("spark.sql.shuffle.partitions") == sentinel, (
            f"{name} leaked spark.sql.shuffle.partitions into the session"
        )
        assert df.count() >= 0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
