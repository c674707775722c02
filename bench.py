"""Per-round benchmark harness (driver contract).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized via the noop sink — full computation, zero
driver-side collection — so the measured time is plan execution, not
result transfer. One untimed warm-up of the flagship query absorbs
JVM/codegen startup.

Each query runs $SPARK_GRAFT_BENCH_ITERS times (default 3) and reports
the per-query MEDIAN — single warm-JVM runs showed ±10-19% run-to-run
noise on sub-second queries (VERDICT r1), which medians suppress.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.registry import QUERIES  # noqa: E402
from loan_approval_prediction_data_engineering_ml_pipeline_spark.session import get_spark  # noqa: E402

# Headline set: the queries whose shape dominates at 100 TB — wide-agg
# scan, deep star join, window/sessionization, and (as they land) the
# dedup / similarity / text-analysis extensions.
HEADLINE = [
    "star_join_agg",
    "pricing_summary",
    "derived_arithmetic",
    "multi_star_join",
    "window_rank",
    "left_join_histogram",
    "events_hourly",
    "sessionization",
    "asof_join",
    "range_join_bucketed",
    "rollup_revenue",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_near",
    "text_quality",
    "tfidf_top_terms",
    "ann_cosine_topk",
    "window_suite",
    "price_histogram",
    "near_dup_components",
    # r2 additions: chunking/packing (local tier) + merged driver-tier queries
    "doc_chunking",
    "sequence_packing",
    "decontaminate",
    "repetition_stats",
    "doc_profile",
    "lang_token_profile",
    "grouped_stats",
    "semi_anti_join",
    # r2 additions: event-sequence analytics + corpus mixture signals
    "funnel_conversion",
    "cohort_retention",
    "scd2_intervals",
    "rolling_active_users",
    "vocab_overlap",
    "ann_ivf",  # persisted-index probe (build amortized at first run)
    "bigram_lm_outliers",
    # r3 additions (VERDICT r2 #4/#5): the streaming engine itself —
    # full availableNow replays, wall time dominated by the state-store
    # path — plus the approx-percentile twin of grouped_stats
    "streaming_hourly",
    "transition_stream_replay",
    "grouped_stats_approx",
    "ann_pq",  # PQ shortlist + exact rerank (build amortized at first run)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark(app_name="bench")

    names = [n for n in HEADLINE if n in QUERIES]
    # untimed warm-up: JVM classloading + codegen compile, plus the
    # Python UDF worker pool (reused daemons on a real cluster — the
    # first applyInPandas otherwise pays ~1s/worker fork-and-connect)
    QUERIES[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as F  # local import: bench-only

    (
        spark.range(256)
        .withColumn("g", F.col("id") % 32)
        .groupBy("g")
        .applyInPandas(lambda p: p, "g long, id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "5")))
    samples: dict[str, list[float]] = {n: [] for n in names}
    # interleave rounds (run the whole suite iters times) so one query's
    # JVM-warming effect doesn't systematically favor its own later reps;
    # 5 rounds (up from 3) because a single GC/compilation stall window
    # late in the 38-query suite can cover 2 of 3 reps of one query and
    # poison its median (observed ~2x spikes on dedup_minhash_lsh)
    for _ in range(iters):
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
        # settle the JVM between rounds so one round's garbage doesn't
        # stall the next round's first queries
        spark._jvm.System.gc()

    timings = {n: round(statistics.median(s), 4) for n, s in samples.items()}

    # one extra instrumented replay per streaming query: peak state-store
    # rows + micro-batch count (wall time is already in the timed rows)
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.streaming.events import (  # noqa: E402
        read_events_stream,
        run_stream_to_table,
        transition_stream,
        windowed_counts,
    )

    streaming_state = {}
    for name, build, mode in [
        ("streaming_hourly", windowed_counts, "complete"),
        ("transition_stream_replay", transition_stream, "append"),
    ]:
        streaming_state[name] = run_stream_to_table(
            build(read_events_stream(spark, sf_dir)), f"__state_probe_{name}", output_mode=mode
        )

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "iters": iters,
                "streaming_state": streaming_state,
            }
        )
    )


if __name__ == "__main__":
    main()
