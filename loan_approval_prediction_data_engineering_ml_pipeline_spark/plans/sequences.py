"""Event-sequence analytics named queries: funnel conversion, cohort
retention, Markov transitions, user journeys, and SCD2 interval
derivation over the ``events`` table.

The reference has no event-sequence surface; these are the
product-analytics operators a user of a full engine runs on the same
clickstream the streaming module ingests (SURVEY.md §2.8 extension
surface). Every query here is a composition of windows + aggregations
over ONE hash partitioning on ``user_id`` — the design point at 100 TB
is "shuffle the fact table once per query, never join it to itself
pairwise". Each has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import Window as W

from ..sources.loaders import load_table
from .registry import query

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_SQL = "%Y-%m-%d %H:%M:%S.%f"


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@query(
    "funnel_conversion",
    oracle="""
    WITH s1 AS (
        SELECT *, min(CASE WHEN event_type = 'signup' THEN ts END)
                      OVER (PARTITION BY user_id) AS t_signup
        FROM events
    ), s2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t_signup THEN ts END)
                      OVER (PARTITION BY user_id) AS t_click
        FROM s1
    ), s3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t_click THEN ts END)
                      OVER (PARTITION BY user_id) AS t_purchase
        FROM s2
    )
    SELECT CAST(count(DISTINCT CASE WHEN t_signup IS NOT NULL THEN user_id END) AS BIGINT) AS n_signup,
           CAST(count(DISTINCT CASE WHEN t_click IS NOT NULL THEN user_id END) AS BIGINT) AS n_click,
           CAST(count(DISTINCT CASE WHEN t_purchase IS NOT NULL THEN user_id END) AS BIGINT) AS n_purchase,
           round(count(DISTINCT CASE WHEN t_click IS NOT NULL THEN user_id END)
                 / nullif(count(DISTINCT CASE WHEN t_signup IS NOT NULL THEN user_id END), 0.0), 6) AS click_rate,
           round(count(DISTINCT CASE WHEN t_purchase IS NOT NULL THEN user_id END)
                 / nullif(count(DISTINCT CASE WHEN t_signup IS NOT NULL THEN user_id END), 0.0), 6) AS purchase_rate
    FROM s3
    """,
    description="Ordered 3-step funnel (signup -> first click after "
    "signup -> first purchase after that click) as three chained "
    "min-over-user windows — ONE shuffle on user_id, no self-joins; "
    "the classic per-step-subquery formulation would scan the fact "
    "table three times",
    tier="local",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = W.partitionBy("user_id")
    ts = F.col("ts")
    staged = (
        ev.withColumn(
            "t_signup",
            F.min(F.when(F.col("event_type") == "signup", ts)).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (ts >= F.col("t_signup")), ts
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (ts >= F.col("t_click")), ts
                )
            ).over(w),
        )
    )
    n_signup = F.count_distinct(
        F.when(F.col("t_signup").isNotNull(), F.col("user_id"))
    )
    n_click = F.count_distinct(F.when(F.col("t_click").isNotNull(), F.col("user_id")))
    n_purchase = F.count_distinct(
        F.when(F.col("t_purchase").isNotNull(), F.col("user_id"))
    )
    return staged.agg(
        n_signup.alias("n_signup"),
        n_click.alias("n_click"),
        n_purchase.alias("n_purchase"),
        F.round(n_click / F.nullif(n_signup.cast("double"), F.lit(0.0)), 6).alias(
            "click_rate"
        ),
        F.round(n_purchase / F.nullif(n_signup.cast("double"), F.lit(0.0)), 6).alias(
            "purchase_rate"
        ),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, ts,
               CAST(date_trunc('week', min(ts) OVER (PARTITION BY user_id)) AS DATE) AS cohort_d
        FROM events
    )
    SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort_week,
           CAST((CAST(date_trunc('week', ts) AS DATE) - cohort_d) / 7 AS BIGINT) AS weeks_since,
           CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
    FROM firsts
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    description="Weekly cohort retention matrix: users cohorted by the "
    "ISO week of their first event, distinct-active counted per "
    "(cohort, weeks-since) — first-seen via min-over-user window (one "
    "user_id shuffle) instead of a groupBy+self-join back to the fact",
    tier="local",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("user_id", "ts")
    cohort_d = F.date_trunc("week", F.min("ts").over(W.partitionBy("user_id"))).cast(
        "date"
    )
    week_d = F.date_trunc("week", F.col("ts")).cast("date")
    return (
        ev.withColumn("cohort_d", cohort_d)
        .withColumn(
            "weeks_since",
            (F.datediff(week_d, F.col("cohort_d")) / 7).cast("long"),
        )
        .groupBy(
            F.date_format("cohort_d", "yyyy-MM-dd").alias("cohort_week"),
            "weeks_since",
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "weeks_since")
    )


@query(
    "event_transitions",
    oracle="""
    WITH lagged AS (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) / sum(count(*)) OVER (PARTITION BY prev_type), 6) AS p
    FROM lagged
    WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    description="First-order Markov transition matrix of event types "
    "per user (lag window + grouped count + row-normalized "
    "probability) — the sequence-model feature a clickstream pipeline "
    "feeds; one user_id shuffle, one (prev,next) shuffle of 25 keys",
    tier="local",
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    lagged = ev.withColumn(
        "prev_type",
        F.lag("event_type").over(
            W.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    )
    counts = (
        lagged.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.withColumn(
            "p",
            F.round(
                F.col("n") / F.sum("n").over(W.partitionBy("prev_type")), 6
            ),
        )
        .orderBy("prev_type", "next_type")
    )


@query(
    "user_journey",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ), journeys AS (
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS journey
        FROM ranked WHERE rn <= 5 GROUP BY user_id
    )
    SELECT journey, CAST(count(*) AS BIGINT) AS n_users
    FROM journeys
    GROUP BY journey
    HAVING count(*) > 1
    ORDER BY n_users DESC, journey
    """,
    description="Common user journeys: each user's first 5 event types "
    "joined '>'-separated, then frequency-ranked (shared prefixes "
    "surface onboarding paths). row_number + struct-sorted collect_list "
    "keeps ordering deterministic on (ts, event_id) ties; one user_id "
    "shuffle + one journey-string shuffle",
    tier="local",
)
def user_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    ranked = ev.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("user_id").orderBy("ts", "event_id")),
    ).where(F.col("rn") <= 5)
    journeys = ranked.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("journey")
    )
    return (
        journeys.groupBy("journey")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .where(F.col("n_users") > 1)
        .orderBy(F.desc("n_users"), "journey")
    )


@query(
    "scd2_intervals",
    oracle=f"""
    WITH changes AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ), starts AS (
        SELECT user_id, event_type AS state, ts AS effective_from, event_id
        FROM changes
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, state,
           strftime(effective_from, '{_TS_FMT_SQL}') AS effective_from,
           strftime(lead(effective_from)
                        OVER (PARTITION BY user_id ORDER BY effective_from, event_id),
                    '{_TS_FMT_SQL}') AS effective_to,
           CAST(lead(effective_from)
                    OVER (PARTITION BY user_id ORDER BY effective_from, event_id) IS NULL
                AS BOOLEAN) AS is_current
    FROM starts
    ORDER BY user_id, effective_from, state
    """,
    description="SCD Type-2 interval derivation: collapse each user's "
    "event-type run-lengths into validity intervals "
    "[effective_from, effective_to) with an is_current flag — the "
    "dimension-history shape a warehouse MERGE maintains, derived here "
    "from the raw change log with lag+filter+lead over one user_id "
    "shuffle (no pairwise self-join)",
    tier="local",
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    worder = W.partitionBy("user_id").orderBy("ts", "event_id")
    starts = (
        ev.withColumn("prev_type", F.lag("event_type").over(worder))
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("effective_from"),
            "event_id",
        )
    )
    # tie-break on event_id: two change points can share a timestamp,
    # and an un-tie-broken lead() would be nondeterministic there
    wseq = W.partitionBy("user_id").orderBy("effective_from", "event_id")
    to_ts = F.lead("effective_from").over(wseq)
    return starts.select(
        "user_id",
        "state",
        F.date_format("effective_from", _TS_FMT).alias("effective_from"),
        F.date_format(to_ts, _TS_FMT).alias("effective_to"),
        to_ts.isNull().alias("is_current"),
    ).orderBy("user_id", "effective_from", "state")


@query(
    "rolling_active_users",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (SELECT DISTINCT day FROM du),
    wau AS (
        SELECT d.day, count(DISTINCT du.user_id) AS active_7d
        FROM days d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day
    ), dau AS (
        SELECT day, count(*) AS active_1d FROM du GROUP BY day
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(dau.active_1d AS BIGINT) AS active_1d,
           CAST(wau.active_7d AS BIGINT) AS active_7d
    FROM days d JOIN dau USING (day) JOIN wau USING (day)
    ORDER BY day
    """,
    description="Rolling 7-day active users per day (DAU + trailing WAU). "
    "Sliding distinct-count windows don't compose with window frames, so "
    "the scale formulation is contribute-explode: distinct (day,user) "
    "pairs each fan out to the <=7 as-of days they keep active, then one "
    "distinct-count per day — O(7x) map-side fanout of an already-"
    "deduplicated pair set, never a range self-join of the fact table. "
    "The DuckDB oracle uses the equivalent range join",
    tier="local",
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("active_1d"))
    contrib = du.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("day"),
        "user_id",
    )
    wau = (
        # semi-join drops the phantom trailing days past the data's end
        contrib.join(F.broadcast(days), "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("active_7d"))
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "active_1d",
            "active_7d",
        )
        .orderBy("day")
    )


@query(
    "stratified_sample",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    )
    SELECT lang, doc_id, n_chars
    FROM ranked WHERE rn <= 10
    ORDER BY lang, doc_id
    """,
    description="Deterministic stratified sampling: exactly N docs per "
    "language, chosen by ranking on md5(doc_id) — membership is a pure "
    "function of the row (stable under retries, AQE re-plans, and "
    "repartitioning, unlike rand()-based sampleBy). One shuffle on the "
    "strata key; at scale swap row_number for a per-stratum hash "
    "threshold when N is a rate rather than a count",
    tier="local",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    )
    return (
        docs.select("lang", "doc_id", "n_chars")
        .withColumn("rn", rn)
        .where(F.col("rn") <= 10)
        .drop("rn")
        .orderBy("lang", "doc_id")
    )


@query(
    "latest_per_key",
    oracle=f"""
    SELECT user_id, event_id, event_type,
           strftime(ts, '{_TS_FMT_SQL}') AS ts, value
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
    description="Latest-row-per-key (CDC compaction / the read side of "
    "REPLACE INTO): row_number over (key, recency) keeps exactly one "
    "row per user with a deterministic (ts, event_id) tie-break. One "
    "shuffle on the key; at 100 TB this is the standard "
    "changelog-to-snapshot materialization, and the same window runs "
    "incrementally inside upsert_parquet_partitioned",
    tier="local",
)
def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    )
    return (
        ev.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", _TS_FMT).alias("ts"),
            "value",
        )
        .orderBy("user_id")
    )


@query(
    "full_outer_reconciliation",
    oracle="""
    WITH w1 AS (
        SELECT user_id, round(sum(value), 4) AS spend_w1
        FROM events
        WHERE event_type = 'purchase' AND CAST(ts AS DATE) < DATE '2024-01-15'
        GROUP BY user_id
    ), w2 AS (
        SELECT user_id, round(sum(value), 4) AS spend_w2
        FROM events
        WHERE event_type = 'purchase' AND CAST(ts AS DATE) >= DATE '2024-01-15'
        GROUP BY user_id
    )
    SELECT coalesce(w1.user_id, w2.user_id) AS user_id,
           spend_w1, spend_w2,
           CASE WHEN w1.user_id IS NULL THEN 'only_late'
                WHEN w2.user_id IS NULL THEN 'only_early'
                ELSE 'both' END AS presence,
           round(coalesce(spend_w2, 0.0) - coalesce(spend_w1, 0.0), 4) AS delta
    FROM w1 FULL OUTER JOIN w2 ON w1.user_id = w2.user_id
    ORDER BY user_id
    """,
    description="Full-outer reconciliation: per-user purchase spend in "
    "two halves of the month, joined full-outer so users present in "
    "only one period surface explicitly (the ledger-diff / snapshot-"
    "compare shape). Both sides pre-aggregate before the join, so the "
    "full-outer shuffle carries one row per (user, period) — never raw "
    "events",
    tier="local",
)
def full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).where(F.col("event_type") == "purchase")
    cut = F.lit("2024-01-15").cast("date")
    w1 = (
        ev.where(F.to_date("ts") < cut)
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("spend_w1"))
    )
    w2 = (
        ev.where(F.to_date("ts") >= cut)
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("spend_w2"))
    )
    a, b = w1.alias("a"), w2.alias("b")
    return (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"), "full_outer")
        .select(
            F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
            "spend_w1",
            "spend_w2",
            F.when(F.col("a.user_id").isNull(), "only_late")
            .when(F.col("b.user_id").isNull(), "only_early")
            .otherwise("both")
            .alias("presence"),
            F.round(
                F.coalesce(F.col("spend_w2"), F.lit(0.0))
                - F.coalesce(F.col("spend_w1"), F.lit(0.0)),
                4,
            ).alias("delta"),
        )
        .orderBy("user_id")
    )
