"""Event-time windowing (SURVEY.md §2.9 C10 + idiomatic-Spark
extension): tumbling/sliding window aggregates over `events.ts`.

The reference's only event-time notions are the 10 s sync interval and
the NEAR_SYNC lag band (monitoring.ps1:599-601); the Spark-native
generalization is `window()` aggregation, and on streams the same
expression runs under `withWatermark` (streaming/windows.py) — batch
and stream share the plan, which is the point of Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "tumbling_window_counts",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       COUNT(*) AS n_events,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
""",
    tags=("C10", "window", "streaming-equivalent"),
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (the 10 s sync-interval
    accounting generalized): same `window()` expression a stream runs
    under withWatermark. Window assignment is a pure projection — the
    only shuffle is the grouped agg on (window), partial-combined
    map-side."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "n_errors", "total_value")
    )


@register(
    "sliding_window_rate",
    oracle="""
WITH buckets AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS b, COUNT(*) AS n
  FROM events GROUP BY 1
),
slid AS (
  SELECT b AS window_start, n
       + CASE WHEN LEAD(b, 1) OVER (ORDER BY b) = b + INTERVAL '30 minutes'
              THEN LEAD(n, 1) OVER (ORDER BY b) ELSE 0 END AS n_events_1h
  FROM buckets
)
SELECT window_start, n_events_1h FROM slid
""",
    tags=("C10", "window"),
)
def sliding_window_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window every 30 min. Expressed as 30-min buckets
    + a LEAD self-combination rather than Spark's window(slide) —
    deliberately: window(slide=30min) emits one row per *event* per
    overlapping window (2× the rows through the shuffle); bucketing
    then combining adjacent buckets shuffles each event once. Same
    result, half the shuffle — the scale-aware formulation.

    The LEAD combine is gated on bucket adjacency: on sparse data the
    next row may be a non-adjacent bucket (an empty 30-min gap), and
    unconditionally adding it would count events outside the 1-hour
    window. Both sides of the parity gate carry the same guard."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    buckets = ev.groupBy(F.window("ts", "30 minutes").alias("w")).agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.col("w.start").alias("window_start"), "n")
    w = W.orderBy("window_start")
    lead_n = F.lead("n", 1).over(w)
    adjacent = F.lead("window_start", 1).over(w) == F.col("window_start") + F.expr(
        "INTERVAL 30 MINUTES"
    )
    return buckets.select(
        "window_start",
        (F.col("n") + F.when(adjacent, lead_n).otherwise(F.lit(0))).alias(
            "n_events_1h"
        ),
    )


@register(
    "approx_distinct_users",
    oracle=None,  # HLL sketch — engine-specific estimate; exact twin below
    tags=("A3", "approx"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — the 100 TB form of A3
    (COUNT(DISTINCT) shuffles every key; the sketch shuffles ~1.5 KB
    per partition). Estimate is engine-specific → rows-only check; the
    exact twin (distinct_users_exact) carries the value oracle, and
    tests assert the estimate is within 5% of it."""
    ev = load(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "distinct_users_exact",
    oracle="""
SELECT COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events FROM events
""",
    tags=("A3",),
)
def distinct_users_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) twin of approx_distinct_users."""
    ev = load(spark, sf_dir, "events")
    return ev.agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "hypertable_rollup",
    oracle="""
WITH hourly AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us,
         epoch_us(date_trunc('day', ts)) AS day_us,
         event_type,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(38,6))) AS sum_dec
  FROM events
  GROUP BY 1, 2, 3
)
SELECT 'hour' AS grain, bucket_us, event_type, n_events,
       CAST(sum_dec AS DOUBLE) AS sum_value
FROM hourly
UNION ALL
SELECT 'day' AS grain, day_us AS bucket_us, event_type,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(sum_dec) AS DOUBLE) AS sum_value
FROM hourly
GROUP BY day_us, event_type
""",
    tags=("rollup", "hypertable", "window", "A10"),
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical time rollup (continuous-aggregate
    pattern): hourly buckets aggregated from raw events, daily buckets
    derived FROM the hourly aggregate — never from raw — exactly how a
    100 TB deployment maintains multi-granularity rollups (persist the
    hourly layer; coarser grains re-aggregate ~24× fewer rows).

    Both grains are emitted with a `grain` discriminator. Sums stay in
    DECIMAL(38,6) through BOTH levels (exact, associative — so
    hour→day re-aggregation is bit-identical to a day-from-raw pass)
    and only cast to double at the edge. The two union branches share
    the hourly subplan; Spark's ReuseExchange serves the daily branch
    from the hourly shuffle rather than re-scanning."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("bucket_us"),
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("sum_dec"),
    )
    hour_level = hourly.select(
        F.lit("hour").alias("grain"),
        "bucket_us",
        "event_type",
        "n_events",
        F.col("sum_dec").cast("double").alias("sum_value"),
    )
    day_level = (
        hourly.groupBy("day_us", "event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_dec").alias("sum_dec2"),
        )
        .select(
            F.lit("day").alias("grain"),
            F.col("day_us").alias("bucket_us"),
            "event_type",
            "n_events",
            F.col("sum_dec2").cast("double").alias("sum_value"),
        )
    )
    return hour_level.unionByName(day_level)


_WEEK_US = 7 * 24 * 3600 * 1_000_000
_RETENTION_MAX_WEEK = 4


@register(
    "cohort_retention",
    oracle=f"""
WITH first_signup AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
cohort_sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size
  FROM first_signup GROUP BY cohort_week
),
activity AS (
  SELECT DISTINCT f.cohort_week, e.user_id,
         (epoch_us(date_trunc('week', e.ts)) - epoch_us(f.cohort_week))
           // {_WEEK_US} AS week_offset
  FROM events e JOIN first_signup f USING (user_id)
  WHERE e.ts >= f.cohort_week
),
ret AS (
  SELECT cohort_week, week_offset, COUNT(*) AS n_active
  FROM activity WHERE week_offset BETWEEN 0 AND {_RETENTION_MAX_WEEK}
  GROUP BY cohort_week, week_offset
)
SELECT epoch_us(r.cohort_week) AS cohort_week_us, r.week_offset, r.n_active,
       c.cohort_size,
       CAST(FLOOR(r.n_active * 10000.0 / c.cohort_size) AS BIGINT) AS retention_bp
FROM ret r JOIN cohort_sizes c USING (cohort_week)
""",
    tags=("temporal", "cohort", "A9"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users cohorted by the week of
    their first 'signup', then per (cohort, week-offset 0..4) the
    distinct users active that week and retention in floored basis
    points of cohort size — the product-analytics companion to
    `funnel_analysis`.

    Week buckets truncate in the catalog-pinned UTC session, and every
    output temporal value is integer micros (`unix_micros`), so the
    matrix is engine- and timezone-exact; offsets divide exactly
    because UTC week starts differ by whole weeks.

    Scale: first-signup is one pushed-filter scan aggregated to a row
    per signup user; the activity join shuffles on user_id longs with
    the (DISTINCT cohort, user, offset) projection collapsing each
    user's events to <= 5 rows BEFORE the retention agg; cohort
    sizes broadcast into the final tiny matrix join."""
    ev = load(spark, sf_dir, "events")
    first = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    activity = (
        ev.join(first, "user_id")
        .filter(F.col("ts") >= F.col("cohort_week"))
        .select(
            "cohort_week",
            "user_id",
            F.expr(
                f"(unix_micros(date_trunc('week', ts))"
                f" - unix_micros(cohort_week)) div {_WEEK_US}"
            ).alias("week_offset"),
        )
        .filter(F.col("week_offset").between(0, _RETENTION_MAX_WEEK))
        .distinct()
    )
    ret = activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    return (
        ret.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.unix_micros(F.col("cohort_week")).alias("cohort_week_us"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.floor(F.col("n_active") * 10000.0 / F.col("cohort_size"))
            .cast("bigint")
            .alias("retention_bp"),
        )
    )


@register(
    "dau_wau_stickiness",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
days AS (SELECT DISTINCT day FROM ud),
dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
wau AS (
  SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
  FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
  GROUP BY d.day
)
SELECT dau.day, dau.dau, wau.wau,
       CAST(FLOOR(dau.dau * 10000.0 / wau.wau) AS BIGINT) AS stickiness_bp
FROM dau JOIN wau USING (day)
""",
    tags=("A3", "temporal", "engagement"),
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness (DAU÷WAU in floored bp)
    per observed day — the engagement report behind "daily to weekly
    active" product metrics.

    Scale: events collapse to distinct (user, day) pairs first (the
    only corpus-sized agg, map-side combined). WAU then avoids a
    range join: each pair EXPLODES into the <=7 future days it makes
    active (bounded fan-out), is filtered to observed days, and
    reduces via exact COUNT(DISTINCT) per day — distinct state bounded
    by |users active that week|. The MAU variant is the same plan with
    a 30-day sequence; the fan-out grows linearly and stays
    shuffle-key-bounded. Day buckets truncate in the catalog-pinned
    UTC session."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), 6), F.expr("INTERVAL 1 DAY")
            )
        ).alias("day"),
    )
    wau = (
        contrib.join(days, "day")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.floor(F.col("dau") * 10000.0 / F.col("wau"))
            .cast("bigint")
            .alias("stickiness_bp"),
        )
    )


_HOUR_US = 3_600_000_000


@register(
    "gap_fill_hourly",
    oracle=f"""
WITH ev AS (
  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us, value
  FROM events
),
hourly AS (
  SELECT event_type, hour_us, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(38,6))) AS v
  FROM ev GROUP BY 1, 2
),
bounds AS (SELECT MIN(hour_us) AS mn, MAX(hour_us) AS mx FROM ev),
grid AS (
  SELECT t.event_type, gs.hour_us
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT UNNEST(generate_series(mn, mx, {_HOUR_US})) AS hour_us
              FROM bounds) gs
),
j AS (
  SELECT g.event_type, g.hour_us, h.n, h.v
  FROM grid g LEFT JOIN hourly h USING (event_type, hour_us)
)
SELECT event_type, hour_us,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
       (n IS NOT NULL) AS observed,
       CAST(last_value(v IGNORE NULLS) OVER w AS DOUBLE) AS carried_value,
       CAST((hour_us - last_value(CASE WHEN n IS NOT NULL THEN hour_us END
                                  IGNORE NULLS) OVER w)
            // {_HOUR_US} AS BIGINT) AS hours_since_data
FROM j
WINDOW w AS (PARTITION BY event_type ORDER BY hour_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    tags=("timeseries", "gap-fill", "window"),
)
def gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series with gap filling (the time-series
    completion step every downstream rate/trend/anomaly consumer
    assumes): one row per (event_type, hour) over the corpus's full
    hour range — including the hours with NO events, which a plain
    groupBy silently drops and which turn trailing averages and charts
    into lies. Missing hours carry the last observed hourly value
    forward (ffill) and report their staleness in whole hours.

    Scale: the only corpus-sized stage is the hourly rollup (map-side
    combined). The dense grid is |event_types| × |hours| — generated
    by ``sequence``+``explode`` from a 1-row broadcast bounds
    aggregate, never by scanning. The ffill is one ignoreNulls window
    over the grid (bounded rows, one narrow shuffle on event_type).
    Hours are epoch-micro BIGINTs end to end (the L50 type-parity
    discipline; also what makes the grid `sequence` exact)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
        F.col("value").cast("decimal(38,6)").alias("val"),
    )
    hourly = ev.groupBy("event_type", "hour_us").agg(
        F.count(F.lit(1)).alias("n"), F.sum("val").alias("v")
    )
    bounds = ev.agg(F.min("hour_us").alias("mn"), F.max("hour_us").alias("mx"))
    grid = (
        ev.select("event_type")
        .distinct()
        .join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"), F.lit(_HOUR_US))
            ).alias("hour_us"),
        )
    )
    j = grid.join(hourly, ["event_type", "hour_us"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_data = F.last(
        F.when(F.col("n").isNotNull(), F.col("hour_us")), ignorenulls=True
    ).over(w)
    return j.select(
        "event_type",
        "hour_us",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        F.col("n").isNotNull().alias("observed"),
        F.last("v", ignorenulls=True).over(w).cast("double").alias("carried_value"),
        ((F.col("hour_us") - last_data) / F.lit(_HOUR_US))
        .cast("bigint")
        .alias("hours_since_data"),
    )


@register(
    "cumulative_unique_users",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(date_trunc('hour', ts)) AS bucket_ts
  FROM events GROUP BY user_id
),
per_bucket AS (
  SELECT bucket_ts, COUNT(*) AS new_users FROM firsts GROUP BY bucket_ts
)
SELECT bucket_ts,
       CAST(new_users AS BIGINT) AS new_users,
       CAST(SUM(new_users) OVER (ORDER BY bucket_ts ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cumulative_users
FROM per_bucket
""",
    tags=("A3", "W6", "C10", "growth"),
)
def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly new users and the running total of distinct users ever
    seen — the growth-accounting curve. A naive formulation
    (COUNT(DISTINCT user) OVER an expanding time frame) re-scans every
    user for every bucket; this is the first-seen decomposition: a
    user contributes exactly once, in their first active hour.

    Scale: per-user MIN(hour) is one map-side-combined aggregate keyed
    by user (the only fact-sized shuffle); its hourly rollup is
    |hours| rows, so the running-sum window — the only unpartitioned
    window — operates on a calendar-bounded input (tens of thousands
    of rows for YEARS of data, at any event volume), never on events.
    The running SUM is cast BIGINT on both engines (DuckDB window-SUM
    HUGEINT discipline)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("hour", "ts").alias("bucket_ts")
    )
    firsts = ev.groupBy("user_id").agg(F.min("bucket_ts").alias("bucket_ts"))
    daily = firsts.groupBy("bucket_ts").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("bucket_ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "bucket_ts",
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


@register(
    "channel_crossover",
    oracle="""
WITH daily AS (
  SELECT epoch_us(date_trunc('day', ts)) AS day_us,
         COUNT(*) FILTER (WHERE event_type = 'view') AS day_views,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS day_purchases
  FROM events
  WHERE event_type IN ('view', 'purchase')
  GROUP BY date_trunc('day', ts)
)
SELECT day_us, day_views, day_purchases,
       CAST(SUM(day_views) OVER cum AS BIGINT) AS cum_views,
       CAST(SUM(day_purchases) OVER cum AS BIGINT) AS cum_purchases,
       CAST(FLOOR(SUM(day_purchases) OVER cum * 10000.0
                  / GREATEST(SUM(day_views) OVER cum, 1)) AS BIGINT)
         AS cum_conv_bp,
       CASE WHEN SUM(day_purchases) OVER cum >= SUM(day_views) OVER cum
            THEN 'purchase_ahead' ELSE 'view_ahead' END AS leader
FROM daily
WINDOW cum AS (ORDER BY day_us ROWS UNBOUNDED PRECEDING)
ORDER BY day_us
""",
    tags=("W5", "event_time", "analytics"),
)
def channel_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-channel cumulative comparison (the TPC-DS Q51 shape: web
    vs store running totals compared day by day). The textbook form
    computes each channel's running series separately and FULL OUTER
    JOINs them on day; here both channels collapse to conditional
    counts in ONE events pass, so the join disappears entirely —
    each daily row carries both series and the running totals come
    from a single window specification.

    Determinism: counts are integers, the cumulative conversion rate
    is floor of an exact-integer IEEE division, and the leader flag
    is an integer comparison. Window SUMs are cast BIGINT on both
    engines (DuckDB HUGEINT discipline).

    Scale: the events-sized stage is the filtered daily rollup
    (map-side combined, two channels only). The one unpartitioned
    running-sum window operates on the calendar-bounded daily table —
    |days| rows regardless of event volume — the same discipline as
    `cumulative_unique_users`."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    daily = ev.groupBy(
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us")
    ).agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("day_views"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "day_purchases"
        ),
    )
    cum = Window.orderBy("day_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_views = F.sum("day_views").over(cum).cast("bigint")
    cum_purch = F.sum("day_purchases").over(cum).cast("bigint")
    return daily.select(
        "day_us",
        "day_views",
        "day_purchases",
        cum_views.alias("cum_views"),
        cum_purch.alias("cum_purchases"),
        F.floor(cum_purch * 10000.0 / F.greatest(cum_views, F.lit(1)))
        .cast("bigint")
        .alias("cum_conv_bp"),
        F.when(cum_purch >= cum_views, "purchase_ahead")
        .otherwise("view_ahead")
        .alias("leader"),
    ).orderBy("day_us")


@register(
    "monthly_revenue_growth",
    oracle="""
WITH monthly AS (
  SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
),
w AS (
  SELECT month_us, rev_cents,
         LAG(rev_cents) OVER (ORDER BY month_us) AS prev_cents
  FROM monthly
)
SELECT month_us, rev_cents, prev_cents,
       CASE WHEN prev_cents IS NULL THEN NULL
            ELSE ((rev_cents - prev_cents) * 10000) // prev_cents END
         AS growth_bp
FROM w
""",
    tags=("A6", "event_time", "growth"),
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: calendar-month revenue in
    exact integer cents with the MoM delta in truncating-integer
    basis points — the KPI report shape (calendar grain + growth
    rate) the hourly/daily rollups don't cover.

    Determinism: revenue accumulates as integer cents via
    FLOOR(price·100) — floor, not cast (engines disagree on
    double→BIGINT cast rounding; floor of the same IEEE double is
    identical everywhere); growth is one truncating integer division (Spark `div` ==
    DuckDB `//`), NULL for the first month on both engines.

    Scale: the orders-sized stage is the map-side-combined monthly
    rollup; the lag window runs over |months| rows — the
    calendar-bounded-window discipline (cumulative_unique_users)."""
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.unix_micros(F.date_trunc("month", F.col("o_orderdate"))).alias(
            "month_us"
        )
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    w = Window.orderBy("month_us")
    out = monthly.select(
        "month_us",
        "rev_cents",
        F.lag("rev_cents").over(w).alias("prev_cents"),
    )
    return out.select(
        "month_us",
        "rev_cents",
        "prev_cents",
        F.when(
            F.col("prev_cents").isNotNull(),
            F.expr("((rev_cents - prev_cents) * 10000) div prev_cents"),
        ).alias("growth_bp"),
    )
