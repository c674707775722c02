"""Capture .explain("formatted") for headline queries into plans/<round>/.

Usage: python scripts/capture_plans.py <suffix> [name ...]

Writes plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<suffix>.txt (default round
r18) for each named query (default: every bench HEADLINE query). Building
a DataFrame triggers any _ensure_* fixture construction, and a few
operators are deliberately EAGER at DataFrame-build time (ADVICE r17:
dsir_select/dsir_select_flagged materialize their feature passes and
top-k collect when the frame is constructed; queries that localCheckpoint
a shared relation likewise execute those passes) — so capturing plans
runs real jobs for those queries and their captured plan shows the
post-materialization lineage (LogicalRDD leaves). explain itself never
executes the RETURNED plan.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.registry import (  # noqa: E402
    QUERIES,
)
from loan_approval_prediction_data_engineering_ml_pipeline_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [n for n in HEADLINE if n in QUERIES]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r18")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    for name in names:
        try:
            df = QUERIES[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # keep going: one bad plan must not stop the sweep
            text = f"ERROR building plan: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(text)
        print(f"wrote {name}_{suffix}.txt ({len(text)} chars)")


if __name__ == "__main__":
    main()
