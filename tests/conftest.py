from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.session import get_spark

    s = get_spark(app_name="tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"),
                  driver_memory="8g")
    yield s
    s.stop()
