"""Sorts / limits / top-k / window operators (SURVEY.md §2.6: W1-W7).

Determinism: the reference's Sort-Object/Select-First idioms rely on
stable PowerShell ordering; every query here adds a unique tie-breaker
so Spark and the oracle agree row-for-row.

Scale: top-k uses TakeOrderedAndProject (per-partition heap, k rows to
the driver — never a full sort); windows partition by a key so state
is bounded per group. The only global-ordering window (ntile over
batches) runs on an already-aggregated input of |batches| rows, which
is tiny by construction at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

# "Batch" granularity for per-batch analyses: 100 events per batch,
# mirroring the reference's INSERT-BATCH-k log grouping
# (monitoring.ps1:1073 parses 'INSERT-BATCH-(\d+)').
_BATCH = 100


def _batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch resource aggregation (monitoring.ps1:1071-1115 shape):
    batch id ← event_id div 100; per-batch avg value + row count."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("batch", F.expr(f"event_id div {_BATCH}"))
        .groupBy("batch")
        .agg(
            (
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
                / F.count("value")
            ).alias("avg_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_BATCHES_SQL = f"""
SELECT event_id // {_BATCH} AS batch,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) AS avg_value,
       COUNT(*) AS n_events
FROM events GROUP BY event_id // {_BATCH}
"""


@register(
    "top1_by_measure",
    oracle="""
SELECT event_id, event_type, value FROM events
ORDER BY value DESC, event_id LIMIT 1
""",
    tags=("W2", "W3"),
)
def top1_by_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 by measure (peak-CPU batch, monitoring.ps1:1121-1122
    `Sort-Object AvgCPU -Descending | Select-Object -First 1`).
    Physical plan: TakeOrderedAndProject — no global sort."""
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(1)
    )


@register(
    "first_last_n",
    oracle=f"""
WITH batches AS ({_BATCHES_SQL}),
ranked AS (
  SELECT batch, avg_value, n_events,
         ROW_NUMBER() OVER (ORDER BY batch) AS rn_asc,
         ROW_NUMBER() OVER (ORDER BY batch DESC) AS rn_desc
  FROM batches
)
SELECT batch, avg_value, n_events,
       CASE WHEN rn_asc <= 5 THEN 'FIRST' ELSE 'LAST' END AS slice
FROM ranked WHERE rn_asc <= 5 OR rn_desc <= 5
""",
    tags=("W4",),
)
def first_last_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-5 + last-5 batch slice with middle elision
    (monitoring.ps1:278-282). Two row_number windows over the tiny
    per-batch aggregate (|batches| rows), not over raw events."""
    b = _batches(spark, sf_dir)
    w_asc = Window.orderBy("batch")
    w_desc = Window.orderBy(F.desc("batch"))
    ranked = b.withColumn("rn_asc", F.row_number().over(w_asc)).withColumn(
        "rn_desc", F.row_number().over(w_desc)
    )
    return ranked.filter((F.col("rn_asc") <= 5) | (F.col("rn_desc") <= 5)).select(
        "batch",
        "avg_value",
        "n_events",
        F.when(F.col("rn_asc") <= 5, "FIRST").otherwise("LAST").alias("slice"),
    )


@register(
    "ntile_trend",
    oracle=f"""
WITH batches AS ({_BATCHES_SQL}),
terciles AS (
  SELECT avg_value, NTILE(3) OVER (ORDER BY batch) AS tercile FROM batches
),
per_tercile AS (
  SELECT tercile,
         CAST(SUM(CAST(avg_value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS tercile_avg
  FROM terciles GROUP BY tercile
)
SELECT
  MAX(CASE WHEN tercile = 1 THEN tercile_avg END) AS early_avg,
  MAX(CASE WHEN tercile = 3 THEN tercile_avg END) AS late_avg,
  ROUND(ABS(MAX(CASE WHEN tercile = 3 THEN tercile_avg END)
          - MAX(CASE WHEN tercile = 1 THEN tercile_avg END)), 4) AS trend_delta
FROM per_tercile
""",
    tags=("W5",),
)
def ntile_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tercile trend analysis (monitoring.ps1:1133-1142: avg CPU of
    first ⅓ of batches vs last ⅓, report |delta|) — the reference's one
    genuine window-function use case, via ntile(3)."""
    b = _batches(spark, sf_dir)
    terc = b.withColumn("tercile", F.ntile(3).over(Window.orderBy("batch")))
    per = terc.groupBy("tercile").agg(
        (
            F.sum(F.col("avg_value").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("tercile_avg")
    )
    early = F.max(F.when(F.col("tercile") == 1, F.col("tercile_avg")))
    late = F.max(F.when(F.col("tercile") == 3, F.col("tercile_avg")))
    return per.agg(
        early.alias("early_avg"),
        late.alias("late_avg"),
        F.round(F.abs(late - early), 4).alias("trend_delta"),
    )


@register(
    "every_nth_sample",
    oracle=f"""
WITH batches AS ({_BATCHES_SQL})
SELECT batch, avg_value, n_events FROM batches WHERE batch % 5 = 0
""",
    tags=("W7",),
)
def every_nth_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-Nth progress sampling (report every 5th batch,
    insert.ps1:319-325)."""
    return _batches(spark, sf_dir).filter(F.col("batch") % 5 == 0)


@register(
    "first_match_scan",
    oracle="""
SELECT event_id, props FROM events
WHERE regexp_matches(props, '"k": 42}')
ORDER BY event_id LIMIT 1
""",
    tags=("W6", "P5"),
)
def first_match_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First line matching a marker (monitoring.ps1:309-314,
    insert.ps1:150 `Select-Object -First 1`): filter → order by
    position → limit 1."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("props").rlike(r'"k": 42\}'))
        .select("event_id", "props")
        .orderBy("event_id")
        .limit(1)
    )


@register(
    "topk_per_group",
    oracle="""
SELECT event_type, event_id, value FROM (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 3
""",
    tags=("W3", "window"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — the distributed generalization of the
    reference's top-1 (monitoring.ps1:1121). row_number window
    partitioned by group: state bounded per key, Spark inserts a
    WindowGroupLimit (rank-limit pushdown) so each partition keeps
    only k rows pre-shuffle."""
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        load(spark, sf_dir, "events")
        .select("event_type", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .select("event_type", "event_id", "value")
    )


@register(
    "running_total_batches",
    oracle=f"""
WITH batches AS ({_BATCHES_SQL})
SELECT batch, n_events,
       CAST(SUM(n_events) OVER (ORDER BY batch
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_events
FROM batches
""",
    tags=("window", "frame-spec"),
)
def running_total_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative running total with an explicit frame spec
    (rowsBetween unboundedPreceding/currentRow) — the frame-window
    form the reference's batch-progress accounting (insert.ps1:319-325)
    generalizes to. Runs over the tiny per-batch aggregate, so the
    unpartitioned window is bounded by |batches|, not |events|."""
    b = _batches(spark, sf_dir)
    w = (
        Window.orderBy("batch")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return b.select(
        "batch",
        "n_events",
        F.sum("n_events").over(w).cast("bigint").alias("cumulative_events"),
    )


@register(
    "window_suite",
    oracle=f"""
WITH batches AS ({_BATCHES_SQL}),
ranked AS (
  SELECT batch, avg_value, n_events,
         ROW_NUMBER() OVER (ORDER BY batch) AS rn_asc,
         ROW_NUMBER() OVER (ORDER BY batch DESC) AS rn_desc,
         NTILE(3) OVER (ORDER BY batch) AS tercile,
         ROW_NUMBER() OVER (ORDER BY avg_value DESC, batch) AS peak_rank,
         CAST(SUM(n_events) OVER (ORDER BY batch
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cumulative_events,
         MIN(CASE WHEN avg_value > 55.0 THEN batch END) OVER () AS first_hot_batch,
         CAST(SUM(n_events) OVER () AS DOUBLE) / COUNT(*) OVER ()
           AS avg_events_per_batch
  FROM batches
)
SELECT batch, n_events, avg_value,
       CASE WHEN rn_asc <= 5 THEN 'FIRST'
            WHEN rn_desc <= 5 THEN 'LAST' ELSE 'MID' END AS slice,
       tercile,
       batch % 5 = 0 AS is_fifth,
       cumulative_events,
       peak_rank = 1 AS is_peak,
       first_hot_batch,
       avg_events_per_batch
FROM ranked
""",
    tags=("W2", "W4", "W5", "W6", "W7", "A8", "window", "frame-spec"),
)
def window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-operator suite over the per-batch aggregate — one row in
    the driver gate pins every §2.6 window family at once:

    - W4 first-N/last-N slice (monitoring.ps1:278-282) via asc/desc
      row_number → FIRST/LAST/MID,
    - W5 tercile assignment (monitoring.ps1:1133-1142) via ntile(3),
    - W7 every-Nth sampling flag (insert.ps1:319-325),
    - frame-spec running total (rowsBetween unboundedPreceding..current),
    - W2 peak-by-measure flag (monitoring.ps1:1121-1122 top-1) via
      rank()==1 on (avg_value desc, batch),
    - W6 first-match scan (monitoring.ps1:309-314 `-First 1`) as
      MIN(batch) over the match predicate,
    - A8 second-level AVG (avg events per batch over per-batch aggs,
      monitoring.ps1:1116-1119) from an integer SUM()/COUNT() window —
      integer sums are order-independent, so the double division is
      bit-equal on both engines.

    Scale: every window runs over the |batches| aggregate (event_id
    div 100), never over raw events — the unpartitioned windows are
    bounded by batch count, and the input aggregation is a partial
    (map-side) hash agg. The single-family forms remain registered
    below the driver window."""
    b = _batches(spark, sf_dir)
    w_asc = Window.orderBy("batch")
    w_desc = Window.orderBy(F.desc("batch"))
    w_peak = Window.orderBy(F.desc("avg_value"), F.asc("batch"))
    w_cum = Window.orderBy("batch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    ranked = b.select(
        "batch",
        "n_events",
        "avg_value",
        F.row_number().over(w_asc).alias("rn_asc"),
        F.row_number().over(w_desc).alias("rn_desc"),
        F.ntile(3).over(w_asc).alias("tercile"),
        F.row_number().over(w_peak).alias("peak_rank"),
        F.sum("n_events").over(w_cum).cast("bigint").alias("cumulative_events"),
        F.min(F.when(F.col("avg_value") > 55.0, F.col("batch")))
        .over(w_all)
        .alias("first_hot_batch"),
        (
            F.sum("n_events").over(w_all).cast("double")
            / F.count(F.lit(1)).over(w_all)
        ).alias("avg_events_per_batch"),
    )
    return ranked.select(
        "batch",
        "n_events",
        "avg_value",
        F.when(F.col("rn_asc") <= 5, "FIRST")
        .when(F.col("rn_desc") <= 5, "LAST")
        .otherwise("MID")
        .alias("slice"),
        "tercile",
        (F.col("batch") % 5 == 0).alias("is_fifth"),
        "cumulative_events",
        (F.col("peak_rank") == 1).alias("is_peak"),
        "first_hot_batch",
        "avg_events_per_batch",
    )


@register(
    "range_frame_smoothing",
    oracle="""
WITH base AS (
  SELECT user_id, epoch_us(ts) AS ts_us, CAST(FLOOR(value * 10000) AS BIGINT) AS v_bp
  FROM events WHERE user_id < 40
)
SELECT user_id, ts_us,
       CAST(SUM(v_bp) OVER tw AS BIGINT) AS sum_bp_1h,
       CAST(COUNT(*) OVER tw AS BIGINT) AS n_1h,
       CAST(FLOOR(CAST(SUM(v_bp) OVER tw AS BIGINT) * 1.0
                  / COUNT(*) OVER tw) AS BIGINT) AS avg_bp_1h
FROM base
WINDOW tw AS (PARTITION BY user_id ORDER BY ts_us
              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
    tags=("W5", "window", "range_frame"),
)
def range_frame_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: for every event, the sum/count/
    mean of the user's readings over the TRAILING HOUR — by event-time
    span, not row count (a rows-frame is wrong whenever arrival rate
    varies: 10 PRECEDING is an hour for one user and a month for
    another). This is the genuinely distinct frame type the §2.6 pack
    didn't yet pin: RANGE BETWEEN <interval> PRECEDING, Spark's
    `Window.rangeBetween` over an epoch-micros ordering column.

    Determinism: readings are fixed-point v_bp integers
    (FLOOR(value·10⁴) — floor, not cast: DuckDB ROUNDS double→BIGINT
    casts where Spark truncates, and floor of the same IEEE double is
    identical everywhere), so window sums are exact; the mean is
    floor of one IEEE division of exact integers. Frames are value-based, hence independent of
    tie order between equal timestamps (ties share a frame by RANGE
    semantics — no row_number tiebreak needed, unlike rows frames).

    Scale: one hash shuffle on user_id; per-row frame state is
    bounded by the hour's arrival count. The user_id < 40 cut keeps
    the oracle row set reviewable — the plan shape is cut-free."""
    base = load(spark, sf_dir, "events").filter(F.col("user_id") < 40).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 10000).cast("bigint").alias("v_bp"),
    )
    tw = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    s = F.sum("v_bp").over(tw).cast("bigint")
    n = F.count(F.lit(1)).over(tw).cast("bigint")
    return base.select(
        "user_id",
        "ts_us",
        s.alias("sum_bp_1h"),
        n.alias("n_1h"),
        F.floor(s * 1.0 / n).cast("bigint").alias("avg_bp_1h"),
    )
