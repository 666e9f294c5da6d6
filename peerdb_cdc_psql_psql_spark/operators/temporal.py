"""Temporal operators Spark lacks as primitives (SURVEY.md §custom-
operator guidance (a): compose from existing DataFrame ops when
semantics allow): as-of lookup, gap-based sessionization, session
windows. All run over `events` keyed by user_id.

Scale: every operator here is one window pass partitioned by the
entity key — state bounded per key, one hash shuffle on user_id, no
self-join materialization (the naive as-of SELF JOIN is O(n²) per key;
the running-window form is O(n log n) sort per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "asof_last_signup",
    oracle="""
SELECT event_id, user_id, event_type,
       MAX(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS last_signup_us,
       epoch_us(ts) - MAX(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS us_since_signup
FROM events
WHERE user_id < 50
""",
    tags=("asof", "temporal", "window"),
)
def asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join composed as a running conditional max: for every
    event, the timestamp of the user's latest 'signup' at-or-before it
    (backward as-of, inclusive). The naive formulation is a range
    self-join; this form is a single ordered window per key — the
    standard Spark re-expression of as-of semantics when the lookup
    side fits in the same stream."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_signup = F.max(
        F.when(F.col("event_type") == "signup", F.unix_micros(F.col("ts")))
    ).over(w)
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        last_signup.alias("last_signup_us"),
        (F.unix_micros(F.col("ts")) - last_signup).alias("us_since_signup"),
    )


_GAP_MIN = 30  # session gap threshold (minutes)


@register(
    "sessionization",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > {_GAP_MIN} * 60 * 1000000 OR
              LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id < 50
),
sessions AS (
  SELECT user_id, event_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM gaps
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_seq
""",
    tags=("session", "temporal", "window"),
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity closes a
    session): lag → new-session flag → running sum = session sequence
    number, then per-session event counts. Two ordered window passes
    per key, both in the same sort order (one shuffle + one sort)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros(F.col("ts"))).over(order)
    new_session = F.when(
        prev_us.isNull()
        | (F.unix_micros(F.col("ts")) - prev_us > _GAP_MIN * 60 * 1_000_000),
        1,
    ).otherwise(0)
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(new_session).over(running).cast("bigint").alias("session_seq"),
    )
    return with_seq.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "session_window_native",
    oracle=None,  # Spark-native session_window; equivalence to the
    # manual gap-based sessionization is asserted in tests
    tags=("session", "temporal", "approx"),
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in session_window (dynamic-gap session aggregation,
    usable unchanged under withWatermark on streams). Kept alongside
    the manual form: native is the idiomatic API; manual is the
    engine-portable oracle."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return (
        ev.groupBy("user_id", F.session_window("ts", f"{_GAP_MIN} minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


_INCIDENT_US = 10 * 60 * 1_000_000  # incident window length: 10 minutes


@register(
    "range_join_incident_windows",
    oracle=f"""
WITH iv AS (
  SELECT event_id AS incident_id, user_id, epoch_us(ts) AS start_us
  FROM events WHERE event_type = 'error'
)
SELECT iv.incident_id, iv.user_id, e.event_id, e.event_type,
       epoch_us(e.ts) - iv.start_us AS us_after_start
FROM iv JOIN events e
  ON e.user_id = iv.user_id
 AND epoch_us(e.ts) >= iv.start_us
 AND epoch_us(e.ts) < iv.start_us + {_INCIDENT_US}
""",
    tags=("range-join", "temporal", "join"),
)
def range_join_incident_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join, bucketed: every 'error' event
    opens a 10-minute incident window; all of that user's events whose
    ts falls in [start, start+10min) attach to the incident.

    The naive plan for `a.ts BETWEEN b.start AND b.end` is a
    BroadcastNestedLoopJoin (O(n·m), non-starter at 100 TB). Binning
    re-expresses it as an EQUI join: both sides are assigned
    window-width time buckets — an interval of exactly one bucket
    width spans at most 2 buckets, so the interval side explodes to
    ≤2 rows — then join on (user_id, bucket) and re-apply the exact
    containment predicate. Shuffle is a plain hash partition on
    (user_id, bucket); each point lands in exactly one bucket so no
    pair can duplicate. Plan shape pinned by
    tests/test_plans.py::test_range_join_is_equi_join."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    ).withColumn("bucket", F.expr(f"ts_us div {_INCIDENT_US}"))
    iv = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("user_id"),
            F.unix_micros(F.col("ts")).alias("start_us"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.expr(f"start_us div {_INCIDENT_US}"),
                        F.expr(f"(start_us + {_INCIDENT_US} - 1) div {_INCIDENT_US}"),
                    )
                )
            ),
        )
    )
    return (
        iv.join(pts, ["user_id", "bucket"])
        .filter(
            (F.col("ts_us") >= F.col("start_us"))
            & (F.col("ts_us") < F.col("start_us") + _INCIDENT_US)
        )
        .select(
            "incident_id",
            "user_id",
            "event_id",
            "event_type",
            (F.col("ts_us") - F.col("start_us")).alias("us_after_start"),
        )
    )
