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


@register(
    "session_window_bounds",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id)
              >= {_GAP_MIN} * 60 * 1000000 OR
              LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id < 50
),
sessions AS (
  SELECT user_id, us,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM gaps
)
SELECT user_id,
       MIN(us) AS session_start_us,
       MAX(us) + {_GAP_MIN} * 60 * 1000000 AS session_end_us,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_seq
""",
    tags=("session", "temporal", "window"),
)
def session_window_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE ``F.session_window`` operator under a hard oracle
    row (VERDICT r3 next-round #7): session bounds + event counts,
    emitted as epoch-micros integers so the driver hash is
    timezone-proof (memory: oracle-parity-discipline).

    Boundary semantics matter here: Spark's session window spans
    ``[event_ts, event_ts + gap)`` — an event landing EXACTLY gap
    after its predecessor starts a NEW session (strict ``<`` merge),
    so the manual oracle flags ``diff >= gap`` as a session break
    (``sessionization`` uses ``> gap``, the closed-interval
    convention; both are valid sessionizations, but only ``>=``
    matches the native operator).

    Scale: identical to the manual form — one shuffle on user_id, one
    ordered pass; the native operator additionally works unchanged
    under ``withWatermark`` on a stream."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return (
        ev.groupBy("user_id", F.session_window("ts", f"{_GAP_MIN} minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
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


_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WINDOW_HOURS = 24


@register(
    "funnel_analysis",
    oracle=f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[1]}'
    AND e.ts >= v.t1 AND e.ts <= v.t1 + INTERVAL {_FUNNEL_WINDOW_HOURS} HOURS
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[2]}'
    AND e.ts >= c.t2 AND e.ts <= c.t2 + INTERVAL {_FUNNEL_WINDOW_HOURS} HOURS
  GROUP BY e.user_id
),
n1 AS (SELECT COUNT(*) AS n FROM v)
SELECT 1 AS step_no, '{_FUNNEL_STEPS[0]}' AS step, (SELECT COUNT(*) FROM v) AS n_users,
       CAST(10000 AS BIGINT) AS conv_bp
UNION ALL
SELECT 2, '{_FUNNEL_STEPS[1]}', (SELECT COUNT(*) FROM c),
       CAST(FLOOR((SELECT COUNT(*) FROM c) * 10000.0 / n) AS BIGINT) FROM n1
UNION ALL
SELECT 3, '{_FUNNEL_STEPS[2]}', (SELECT COUNT(*) FROM p),
       CAST(FLOOR((SELECT COUNT(*) FROM p) * 10000.0 / n) AS BIGINT) FROM n1
""",
    tags=("temporal", "funnel", "A9"),
)
def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict sequential funnel (view -> click -> purchase, each step
    within 24 h of the previous step's qualifying time): per user the
    earliest qualifying timestamp per stage, then per-stage user
    counts and conversion in floored basis points of stage 1 — the
    product-analytics conversion report.

    Scale: each stage is an event_type-pushed scan (PushedFilters
    prunes at the parquet reader), aggregated to one row per
    SURVIVING user before the next stage's join — so joins shrink
    monotonically down the funnel and shuffle keys are user_id longs.
    No self-join over raw events, no window over the full log; the
    three stage counts are single-row aggs crossed into the 3-row
    report. Conversion is integer bp — engine-exact."""
    ev = load(spark, sf_dir, "events")
    win = F.expr(f"INTERVAL {_FUNNEL_WINDOW_HOURS} HOURS")
    v = (
        ev.filter(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == _FUNNEL_STEPS[1])
        .join(v, "user_id")
        .filter((F.col("ts") >= F.col("t1")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == _FUNNEL_STEPS[2])
        .join(c, "user_id")
        .filter((F.col("ts") >= F.col("t2")) & (F.col("ts") <= F.col("t2") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = v.agg(F.count(F.lit(1)).alias("n1"))

    def stage(no: int, name: str, df: DataFrame) -> DataFrame:
        return (
            df.agg(F.count(F.lit(1)).alias("n_users"))
            .crossJoin(n1)
            .select(
                F.lit(no).alias("step_no"),
                F.lit(name).alias("step"),
                "n_users",
                F.floor(F.col("n_users") * 10000.0 / F.col("n1"))
                .cast("bigint")
                .alias("conv_bp"),
            )
        )

    return (
        stage(1, _FUNNEL_STEPS[0], v)
        .unionByName(stage(2, _FUNNEL_STEPS[1], c))
        .unionByName(stage(3, _FUNNEL_STEPS[2], p))
    )


@register(
    "scd2_user_history",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         LAG(event_type) OVER w AS prev_type
  FROM events WHERE user_id < 50
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, event_id, event_type, ts_us FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
),
v AS (
  SELECT user_id, event_type, ts_us AS valid_from_us,
         LEAD(ts_us) OVER w2 AS valid_to_us,
         CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version
  FROM changes
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id, event_type, valid_from_us, valid_to_us, version,
       CASE WHEN valid_to_us IS NULL THEN 'current' ELSE 'expired' END AS status
FROM v
""",
    tags=("temporal", "scd2", "cdc"),
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change stream:
    collapse each user's event stream to its event_type TRANSITIONS and
    emit versioned validity intervals (valid_from/valid_to in epoch
    micros, open interval = current row) — the history-table twin of
    the CDC mirror's last-write-wins merge (streaming/cdc.py keeps the
    latest state; this keeps every state with its lifetime, the shape
    an auditing consumer of the reference's `_synced_at`/soft-delete
    columns materializes).

    Plan: one shuffle on user_id feeds BOTH ordered windows (lag for
    change detection, lead/row_number for interval closing — same
    partitioning, so Catalyst reuses the Exchange); consecutive
    duplicates drop BEFORE the interval window, so the second pass
    runs on the (much smaller) transition set. No joins, no
    self-reference: history derives in one lineage from the raw
    stream.

    Scale: per-key window state is O(1); key-skew is the only hazard
    and user-keyed event streams shard evenly. At 100 TB the same two
    windows run per partition-local sorted run after the single hash
    shuffle."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = ordered.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    v = changes.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w2).alias("valid_to_us"),
        F.row_number().over(w2).cast("bigint").alias("version"),
    )
    return v.select(
        "user_id",
        "event_type",
        "valid_from_us",
        "valid_to_us",
        "version",
        F.when(F.col("valid_to_us").isNull(), "current")
        .otherwise("expired")
        .alias("status"),
    )


@register(
    "time_weighted_avg",
    oracle="""
WITH seq AS (
  SELECT event_type, user_id,
         CAST(value AS DECIMAL(12,4)) AS v,
         (LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts)) // 1000000 AS dt_s
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_intervals,
       CAST(SUM(dt_s) AS BIGINT) AS total_dur_s,
       CAST(SUM(v * dt_s) AS DOUBLE) / CAST(SUM(dt_s) AS DOUBLE)
         AS twa_value
FROM seq
WHERE dt_s IS NOT NULL AND dt_s > 0
GROUP BY event_type
""",
    tags=("temporal", "window", "A8"),
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type: each reading is
    weighted by how long it stood (the interval until the same user's
    next event) — the duty-cycle semantics a plain AVG gets wrong when
    sampling is irregular (a gauge read once during a 10-hour plateau
    must count 10 hours, not one sample).

    Determinism: weights are whole seconds (exact integer floor-div of
    epoch micros — micro-weights would push the weighted decimal sum
    past double's 2^53 exact range and the final cast would drift a
    ulp between engines); values round once to DECIMAL(12,4); both
    sums therefore convert to double EXACTLY and the final ratio is
    one IEEE division of identical operands. The duration sum CASTs
    to BIGINT per the L50 HUGEINT discipline.

    Scale: one shuffle on user_id for the lead window (per-row state
    O(1)), then a map-side-combined rollup to |event_types| rows —
    the same two-stage shape as the hourly rollups."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.col("value").cast("decimal(12,4)").alias("v"),
        F.expr(
            "(lead(unix_micros(ts)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) "
            "- unix_micros(ts)) div 1000000"
        ).alias("dt_s"),
    ).filter(F.col("dt_s").isNotNull() & (F.col("dt_s") > 0))
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt_s").cast("bigint").alias("total_dur_s"),
        (F.sum(F.col("v") * F.col("dt_s")).cast("double")
         / F.sum("dt_s").cast("double")).alias("twa_value"),
    )


# Query pattern for sliding-window similarity search: a spike ramp
# (rise 1→8, fall back). Integer constants so every moment sum below
# is exact; see pattern_match_corr.
_PATTERN = (1, 2, 4, 8, 4, 2)


@register(
    "pattern_match_corr",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
lagged AS (
  SELECT event_type, hr,
         {", ".join(f"LAG(n, {k}) OVER (PARTITION BY event_type ORDER BY hr) AS x{k}"
                     for k in range(5, -1, -1))}
  FROM hourly
),
scored AS (
  SELECT event_type, hr,
         ({len(_PATTERN)} * ({" + ".join(f"x{k} * {p}" for k, p in zip(range(5, -1, -1), _PATTERN))})
           - ({" + ".join(f"x{k}" for k in range(6))}) * {sum(_PATTERN)}) AS num,
         ({len(_PATTERN)} * ({" + ".join(f"x{k} * x{k}" for k in range(6))})
           - ({" + ".join(f"x{k}" for k in range(6))}) * ({" + ".join(f"x{k}" for k in range(6))})) AS varx,
         {len(_PATTERN) * sum(p * p for p in _PATTERN) - sum(_PATTERN) ** 2} AS vary
  FROM lagged WHERE x5 IS NOT NULL
)
SELECT event_type, hr,
       CAST(FLOOR(CAST(num AS DOUBLE)
                  / sqrt(CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE)) * 10000)
            AS BIGINT) AS corr_bp
FROM scored
WHERE varx > 0
  AND CAST(num AS DOUBLE) / sqrt(CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE)) >= 0.80
""",
    tags=("W6", "A8", "timeseries", "similarity"),
)
def pattern_match_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window time-series pattern search (the distributed
    subsequence-similarity shape — cf. "Time Series Similarity Search
    for Streaming Data in Distributed Systems", EDBT'19): find every
    6-hour window of each event type's hourly rate whose Pearson
    correlation with a fixed spike-ramp query pattern is ≥ 0.80 —
    "show me everything that looks like this incident".

    Scale: the series is built by ONE hourly rollup (map-side
    combined), and each window materializes as 6 LAG columns over the
    per-type partition — no self-join, no array collection, no UDF;
    the window state is O(pattern length) per row. Determinism:
    counts are integers, so every moment sum (Σx, Σx², Σxy) in the
    closed-form Pearson numerator/variance is EXACT; the only float
    ops are one multiply, one sqrt, one divide — all IEEE
    correctly-rounded, so both engines emit bit-identical corr_bp at
    any partitioning. At 100 TB: per-type partitions bound the window
    sort; a 10⁶-key version would hash-partition by series key the
    same way."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    )
    hourly = ev.groupBy("event_type", "hr").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("hr")
    L = len(_PATTERN)
    lagged = hourly.select(
        "event_type",
        "hr",
        *[F.lag("n", k).over(w).alias(f"x{k}") for k in range(L - 1, -1, -1)],
    ).filter(F.col(f"x{L-1}").isNotNull())
    xs = [F.col(f"x{k}") for k in range(L - 1, -1, -1)]  # oldest → newest
    sum_x = sum(xs[1:], xs[0])
    sum_xx = sum((x * x for x in xs[1:]), xs[0] * xs[0])
    sum_xy = sum(
        (x * F.lit(p) for x, p in zip(xs[1:], _PATTERN[1:])),
        xs[0] * F.lit(_PATTERN[0]),
    )
    num = F.lit(L) * sum_xy - sum_x * F.lit(sum(_PATTERN))
    varx = F.lit(L) * sum_xx - sum_x * sum_x
    vary = L * sum(p * p for p in _PATTERN) - sum(_PATTERN) ** 2
    corr = num.cast("double") / F.sqrt(varx.cast("double") * F.lit(float(vary)))
    return (
        lagged.select("event_type", "hr", corr.alias("corr"), varx.alias("varx"))
        .filter((F.col("varx") > 0) & (F.col("corr") >= 0.80))
        .select(
            "event_type",
            "hr",
            F.floor(F.col("corr") * 10000).cast("bigint").alias("corr_bp"),
        )
    )


@register(
    "inter_arrival_stats",
    oracle="""
WITH seq AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
),
ranked AS (
  SELECT event_type, gap_us,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap_us) AS rk,
         COUNT(*)    OVER (PARTITION BY event_type) AS cnt
  FROM seq WHERE gap_us IS NOT NULL
)
SELECT event_type,
       CAST(MIN(cnt) AS BIGINT) AS n_gaps,
       CAST(FLOOR(CAST(SUM(gap_us) AS BIGINT) * 1.0 / MIN(cnt)) AS BIGINT)
         AS avg_gap_us,
       MIN(CASE WHEN rk * 2  >= cnt      THEN gap_us END) AS p50_gap_us,
       MIN(CASE WHEN rk * 20 >= cnt * 19 THEN gap_us END) AS p95_gap_us
FROM ranked GROUP BY event_type
""",
    tags=("temporal", "window", "percentile"),
)
def inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival-time statistics: for every user the gap
    to their previous event (any type, attributed to the later
    event's type), rolled up to count / mean / exact p50 / exact p95
    in integer microseconds — the arrival-process profile that sizes
    streaming watermarks (C10) and session gaps (the 30-min
    sessionization threshold is exactly a tail quantile of this
    distribution).

    Determinism: gaps are integer microsecond differences over a
    (ts, event_id)-ordered per-user window (fully tie-broken);
    percentiles use the exact integer-rank frontier (rk·2 ≥ cnt,
    rk·20 ≥ 19·cnt — the length_percentile_filter discipline, no
    float interpolation to drift between engines), and the mean is
    floor of one IEEE division of exact integers.

    Scale: two narrow shuffles — one hash partition on user_id for
    the lag window (per-key state: one row), one on event_type for
    the rank window. Both operate on (type, gap) pairs, never payload
    columns; a hot event type bounds the second sort at its own
    partition."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    wu = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = ev.select(
        "event_type",
        (F.col("ts_us") - F.lag("ts_us").over(wu)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    wr = Window.partitionBy("event_type").orderBy("gap_us")
    wc = Window.partitionBy("event_type")
    ranked = gaps.select(
        "event_type",
        "gap_us",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    return ranked.groupBy("event_type").agg(
        F.min("cnt").cast("bigint").alias("n_gaps"),
        F.floor(F.sum("gap_us").cast("bigint") * 1.0 / F.min("cnt"))
        .cast("bigint")
        .alias("avg_gap_us"),
        F.min(F.when(F.col("rk") * 2 >= F.col("cnt"), F.col("gap_us"))).alias(
            "p50_gap_us"
        ),
        F.min(
            F.when(F.col("rk") * 20 >= F.col("cnt") * 19, F.col("gap_us"))
        ).alias("p95_gap_us"),
    )


@register(
    "asof_next_purchase",
    oracle="""
SELECT event_id, user_id, event_type,
       MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         AS next_purchase_us,
       MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         - epoch_us(ts) AS us_to_purchase
FROM events
WHERE user_id < 50
""",
    tags=("asof", "temporal", "window"),
)
def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every event, the timestamp of the
    user's NEXT 'purchase' at-or-after it, and the microseconds until
    it — the time-to-conversion metric, mirror image of
    `asof_last_signup` (backward as-of). Same single-window
    re-expression: a running conditional MIN over the FOLLOWING frame
    replaces the naive forward range self-join.

    Determinism: integer microsecond arithmetic over a fully
    tie-broken (ts, event_id) order; events with no later purchase
    yield NULL on both engines.

    Scale: one hash shuffle on user_id, per-key state bounded by the
    frame scan — identical cost profile to the backward form; at
    100 TB both directions run in the SAME window pass if requested
    together (shared partitioning and sort)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nxt = F.min(
        F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
    ).over(w)
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        nxt.alias("next_purchase_us"),
        (nxt - F.unix_micros("ts")).alias("us_to_purchase"),
    )


@register(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type,
         event_type AS to_type
  FROM events
),
t AS (SELECT from_type, to_type FROM seq WHERE from_type IS NOT NULL),
tot AS (SELECT from_type, COUNT(*) AS n_from FROM t GROUP BY from_type)
SELECT t.from_type, t.to_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) * 10000 // MIN(tot.n_from) AS BIGINT) AS p_bp
FROM t JOIN tot ON t.from_type = tot.from_type
GROUP BY t.from_type, t.to_type
""",
    tags=("temporal", "markov", "W5"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the per-user event
    sequence: counts and truncating-bp probabilities of each
    (from_type → to_type) step — the behavioral model behind
    next-action prediction and anomalous-flow detection, and the
    unordered complement of `funnel_analysis` (which pins ONE
    expected sequence; this estimates ALL observed ones).

    Determinism: transitions come from a fully tie-broken (ts,
    event_id) per-user lag; probabilities are truncating integer
    divisions of exact counts.

    Scale: one user-keyed lag window shuffling (user, type) pairs,
    then a |types|²-bounded matrix aggregate with map-side combine;
    the row-marginal join back is |types| rows broadcast."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    tot = t.groupBy("from_type").agg(F.count(F.lit(1)).alias("n_from"))
    return (
        t.join(F.broadcast(tot), "from_type")
        .groupBy("from_type", "to_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr("CAST(count(1) * 10000 div min(n_from) AS BIGINT)").alias(
                "p_bp"
            ),
        )
    )
