"""Monitoring-parity pack (SURVEY.md §3.2 / §7 M4): the reference's
10-pass monitoring.ps1 analyses as typed DataFrame programs. The
PowerShell versions parse psql/docker text output line-by-line in
interpreted loops; here every pass is one declarative plan.

Log-line analytics run over synthesized log text built from the
events fixture (format_string → the exact line shapes insert.ps1:
175-176 writes), then parsed back with regexp_extract — exercising
the full S9→F1→A7 chain (read text → regex extract → grouped agg)
with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

# The synthesized log line: "[INSERT-BATCH-<k>] container=<type> cpu=<v>%"
# (shape of insert.ps1:175-176 log lines + docker-stats blocks consumed
# at monitoring.ps1:1068-1115). Built lazily — column exprs need an
# active SparkContext.
def _line_spark() -> F.Column:
    return F.format_string(
        "[INSERT-BATCH-%d] container=%s cpu=%.4f%%",
        F.expr("event_id div 100"),
        F.col("event_type"),
        F.col("value"),
    )


_LINE_SQL = "printf('[INSERT-BATCH-%d] container=%s cpu=%.4f%%', event_id // 100, event_type, value)"


@register(
    "log_batch_resource_agg",
    oracle=f"""
WITH lines AS (SELECT {_LINE_SQL} AS line FROM events),
parsed AS (
  SELECT CAST(regexp_extract(line, 'INSERT-BATCH-(\\d+)', 1) AS BIGINT) AS batch,
         regexp_extract(line, 'container=(\\w+)', 1) AS container,
         CAST(regexp_extract(line, 'cpu=([0-9.]+)%', 1) AS DOUBLE) AS cpu
  FROM lines
  WHERE regexp_matches(line, 'INSERT-BATCH-\\d+')
)
SELECT batch,
       COUNT(*) AS n_containers,
       CAST(SUM(CAST(cpu AS DECIMAL(38,6))) AS DOUBLE) AS total_cpu,
       CAST(SUM(CAST(cpu AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_cpu
FROM parsed
GROUP BY batch
""",
    tags=("S9", "F1", "A7", "A8"),
)
def log_batch_resource_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's biggest client-side dataflow (monitoring.ps1:
    1071-1115): per INSERT-BATCH-k, parse container stats lines, sum
    CPU, count containers, average — 45 lines of interpreted loop
    there; one grouped aggregation here. The regex extraction stays
    JVM-side (codegen), the agg partial-combines map-side."""
    ev = load(spark, sf_dir, "events")
    lines = ev.select(_line_spark().alias("line")).filter(
        F.col("line").rlike(r"INSERT-BATCH-\d+")
    )
    parsed = lines.select(
        F.regexp_extract("line", r"INSERT-BATCH-(\d+)", 1).cast("bigint").alias("batch"),
        F.regexp_extract("line", r"container=(\w+)", 1).alias("container"),
        F.regexp_extract("line", r"cpu=([0-9.]+)%", 1).cast("double").alias("cpu"),
    )
    total = F.sum(F.col("cpu").cast("decimal(38,6)")).cast("double")
    return parsed.groupBy("batch").agg(
        F.count(F.lit(1)).alias("n_containers"),
        total.alias("total_cpu"),
        (total / F.count(F.lit(1))).alias("avg_cpu"),
    )


@register(
    "fleet_summary",
    oracle=f"""
WITH lines AS (SELECT {_LINE_SQL} AS line FROM events),
parsed AS (
  SELECT CAST(regexp_extract(line, 'INSERT-BATCH-(\\d+)', 1) AS BIGINT) AS batch,
         CAST(regexp_extract(line, 'cpu=([0-9.]+)%', 1) AS DOUBLE) AS cpu
  FROM lines
),
per_batch AS (
  SELECT batch, CAST(SUM(CAST(cpu AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_cpu
  FROM parsed GROUP BY batch
)
SELECT COUNT(*) AS n_batches,
       ROUND(CAST(SUM(CAST(avg_cpu AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 4) AS fleet_avg_cpu,
       ROUND(MAX(avg_cpu), 4) AS peak_avg_cpu,
       ROUND(MIN(avg_cpu), 4) AS low_avg_cpu
FROM per_batch
""",
    tags=("A8", "W3"),
)
def fleet_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleet-wide second-level aggregation (monitoring.ps1:1121-1124:
    avg across batch averages + peak/lowest batch) — agg over agg, both
    levels through the exact-decimal route."""
    per_batch = log_batch_resource_agg(spark, sf_dir).select("batch", "avg_cpu")
    s = F.sum(F.col("avg_cpu").cast("decimal(38,6)")).cast("double")
    return per_batch.agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.round(s / F.count(F.lit(1)), 4).alias("fleet_avg_cpu"),
        F.round(F.max("avg_cpu"), 4).alias("peak_avg_cpu"),
        F.round(F.min("avg_cpu"), 4).alias("low_avg_cpu"),
    )


@register(
    "table_stats_rollup",
    oracle="""
SELECT COALESCE(source, 'TOTAL') AS source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(SUM(n_chars) / 1024.0, 2) AS total_kib
FROM documents
GROUP BY ROLLUP (source)
""",
    tags=("A4", "A5", "F18"),
)
def table_stats_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-database table stats + TOTAL row (monitoring.ps1:492-555:
    count+size per table, grand totals at :544-552) — rollup over the
    documents sources with byte sizes, replacing pg_total_relation_size
    with column-length accounting."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.rollup("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(F.sum("n_chars") / 1024.0, 2).alias("total_kib"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("TOTAL")).alias("source"),
            "n_docs",
            "total_chars",
            "total_kib",
        )
    )


@register(
    "health_probe",
    oracle="""
SELECT 1 AS probe_ok,
       (SELECT COUNT(*) FROM events) > 0 AS has_events,
       (SELECT COUNT(DISTINCT event_type) FROM events) AS n_event_types
""",
    tags=("F6", "A11"),
)
def health_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT 1 / version() health probes + existence checks
    (insert.ps1:63-87, monitoring.ps1:825-831,969-1018)."""
    ev = load(spark, sf_dir, "events")
    agg = ev.agg(
        (F.count(F.lit(1)) > 0).alias("has_events"),
        F.count_distinct("event_type").alias("n_event_types"),
    )
    return agg.select(F.lit(1).alias("probe_ok"), "has_events", "n_event_types")


@register(
    "infra_health_bands",
    oracle="""
WITH comp AS (
  SELECT event_type AS container,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_cpu
  FROM events GROUP BY event_type
),
flags AS (SELECT container, avg_cpu < 50.0 AS healthy FROM comp)
SELECT COUNT(*) AS n_containers,
       COUNT(*) FILTER (WHERE healthy) AS n_healthy,
       ROUND(100.0 * COUNT(*) FILTER (WHERE healthy) / COUNT(*), 1) AS health_pct,
       CASE WHEN 100.0 * COUNT(*) FILTER (WHERE healthy) / COUNT(*) >= 80 THEN 'GREEN'
            WHEN 100.0 * COUNT(*) FILTER (WHERE healthy) / COUNT(*) >= 50 THEN 'YELLOW'
            ELSE 'RED' END AS health_band
FROM flags
""",
    tags=("F6", "A11", "monitoring"),
)
def infra_health_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Infra health banding — the reference's container-health pass 6
    (monitoring.ps1:704-814: count healthy containers, band the fleet
    ≥80% GREEN / ≥50% YELLOW / else RED at :807-808) over the synthetic
    fleet: each event_type is a 'container', healthy = avg load below
    threshold. Two-level agg, both partial-combined; one summary row
    crosses the final shuffle."""
    ev = load(spark, sf_dir, "events")
    comp = ev.groupBy(F.col("event_type").alias("container")).agg(
        (F.sum(F.col("value").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_cpu"
        )
    )
    flags = comp.select((F.col("avg_cpu") < 50.0).alias("healthy"))
    healthy = F.count(F.when(F.col("healthy"), 1))
    pct = 100.0 * healthy / F.count(F.lit(1))
    return flags.agg(
        F.count(F.lit(1)).alias("n_containers"),
        healthy.alias("n_healthy"),
        F.round(pct, 1).alias("health_pct"),
        F.when(pct >= 80, "GREEN")
        .when(pct >= 50, "YELLOW")
        .otherwise("RED")
        .alias("health_band"),
    )


def container_health_report(spark: SparkSession, meta_dir: str) -> DataFrame:
    """The same ≥80%/≥50% banding computed over the LIVE `_meta`
    progress table (streaming/metrics.py listener) — per mirror query,
    a batch is healthy when it processed within the sync-interval
    budget; the fleet band is what the reference's pass-6 console
    banner shows (monitoring.ps1:807-814)."""
    from ..streaming.metrics import progress_report

    budget_ms = 10_000  # the reference's 10 s sync interval
    rep = progress_report(spark, meta_dir)
    per_q = rep.groupBy("query_name").agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.count(F.when(F.col("batch_duration_ms") <= budget_ms, 1)).alias(
            "n_healthy"
        ),
    )
    pct = 100.0 * F.col("n_healthy") / F.col("n_batches")
    return per_q.select(
        "query_name",
        "n_batches",
        "n_healthy",
        F.round(pct, 1).alias("health_pct"),
        F.when(pct >= 80, "GREEN")
        .when(pct >= 50, "YELLOW")
        .otherwise("RED")
        .alias("health_band"),
    )


def monitoring_report(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The full monitoring run (monitoring.ps1:1172-1257 main: 10
    sequential passes) as one driver returning typed result tables.

    The reference re-issues identical COUNT(*) queries across passes
    (monitoring.ps1:578,675,844 — three times, no caching); here the
    shared scan-heavy inputs are computed once and reused via cache
    (SURVEY.md §3.2 'compute once, reuse'), then released."""
    from ..registry import REGISTRY

    passes = {
        "system_phases": "log_batch_resource_agg",     # pass 1
        "server_health": "health_probe",               # pass 2
        "table_stats": "table_stats_rollup",           # pass 3
        "flow_lag": "reconciliation_lag",              # pass 4
        "cdc_operations": "cdc_changes_per_batch",     # pass 5
        "container_health": "infra_health_bands",      # pass 6
        "performance_summary": "ratio_percentage",     # pass 7
        "database_metrics": "count_per_table",         # pass 8
        "flow_health": "cdc_sync_report",              # pass 9
        "trend_analysis": "ntile_trend",               # pass 10
    }
    from ..catalog import load

    ev = load(spark, sf_dir, "events").cache()
    try:
        ev.count()  # materialize once; passes 1,5,6,7,9,10 reuse it
        return {name: REGISTRY[q].fn(spark, sf_dir) for name, q in passes.items()}
    finally:
        # results that still need ev hold lineage; unpersist is lazy
        ev.unpersist()


_ANOM_TRAIL = 24  # trailing window, hours
_ANOM_MIN_TRAIL = 12  # hours of history before scoring
_ANOM_BP = 5000  # |deviation| >= 50% of trailing mean


@register(
    "event_rate_anomaly",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
w AS (
  SELECT event_type, hour_us, n,
         SUM(n) OVER tw AS trail_sum,
         COUNT(*) OVER tw AS trail_n
  FROM hourly
  WINDOW tw AS (PARTITION BY event_type ORDER BY hour_us
                ROWS BETWEEN {_ANOM_TRAIL} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour_us, n, CAST(trail_sum AS BIGINT) AS trail_sum, trail_n,
       CAST(FLOOR(n * 10000.0 * trail_n / trail_sum) AS BIGINT) - 10000 AS dev_bp,
       CASE WHEN CAST(FLOOR(n * 10000.0 * trail_n / trail_sum) AS BIGINT) - 10000
                 >= {_ANOM_BP} THEN 'spike'
            WHEN CAST(FLOOR(n * 10000.0 * trail_n / trail_sum) AS BIGINT) - 10000
                 <= -{_ANOM_BP} THEN 'drop'
            ELSE 'normal' END AS band
FROM w WHERE trail_n >= {_ANOM_MIN_TRAIL}
""",
    tags=("A8", "monitoring", "anomaly"),
)
def event_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window event-rate anomaly detection: hourly counts per
    event type scored against the mean of the previous 24 hours
    (current hour excluded), deviation in floored basis points, banded
    spike / drop / normal after a 12-hour warm-up — the rate-change
    alarm of an ops monitoring stack (the reference's health-banding
    idea applied along the time axis).

    Determinism: the score is floor of an integer-ratio expression
    (n·10000·trail_n / trail_sum) — IEEE division of exact integers is
    correctly rounded, so every engine produces the identical double
    and the identical floor. No float accumulation: the trailing sums
    are integer window sums.

    Scale: the corpus-sized stage is the hourly rollup (map-side
    combined partial counts); the sliding window runs over the rollup
    — |event_types| x |hours| rows, one narrow shuffle on event_type,
    per-row state bounded by the 24-row frame."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tw = (
        Window.partitionBy("event_type")
        .orderBy("hour_us")
        .rowsBetween(-_ANOM_TRAIL, -1)
    )
    w = hourly.select(
        "event_type",
        "hour_us",
        "n",
        F.sum("n").over(tw).alias("trail_sum"),
        F.count(F.lit(1)).over(tw).alias("trail_n"),
    ).filter(F.col("trail_n") >= _ANOM_MIN_TRAIL)
    dev = (
        F.floor(F.col("n") * 10000.0 * F.col("trail_n") / F.col("trail_sum"))
        .cast("bigint")
        - 10000
    )
    return w.select(
        "event_type",
        "hour_us",
        "n",
        "trail_sum",
        "trail_n",
        dev.alias("dev_bp"),
        F.when(dev >= _ANOM_BP, "spike")
        .when(dev <= -_ANOM_BP, "drop")
        .otherwise("normal")
        .alias("band"),
    )


@register(
    "change_point_detect",
    oracle="""
WITH hourly AS (
  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
base AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS s, COUNT(*) AS c
  FROM hourly GROUP BY 1
),
dev AS (
  SELECT h.event_type, h.hour_us, h.n, h.n * b.c - b.s AS d, b.s AS s
  FROM hourly h JOIN base b USING (event_type)
),
m AS (
  SELECT event_type, hour_us, n, s,
         CAST(SUM(d) OVER (PARTITION BY event_type ORDER BY hour_us
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_dev
  FROM dev
),
ph AS (
  SELECT event_type, hour_us, n, s, cum_dev,
         cum_dev - MIN(cum_dev) OVER (PARTITION BY event_type ORDER BY hour_us
                                      ROWS UNBOUNDED PRECEDING) AS ph_stat
  FROM m
)
SELECT event_type, hour_us, n AS n_events, cum_dev, ph_stat,
       CAST(FLOOR(ph_stat * 10000.0 / s) AS BIGINT) AS severity_bp,
       (ph_stat * 2 > s) AS alarm
FROM ph
""",
    tags=("timeseries", "changepoint", "window"),
)
def change_point_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley change-point detection over hourly event rates:
    per type, the cumulative deviation from the per-type mean rate and
    the PH statistic (cumulative deviation minus its running minimum —
    the classic sequential drift detector). The statistic rises only
    under sustained upward drift, unlike event_rate_anomaly's
    trailing-window test which scores isolated spikes; an alarm fires
    when the accumulated drift exceeds half the type's total volume.

    Determinism: everything is integer arithmetic — the deviation is
    cross-multiplied (n·hours − total, never a float mean), so cum
    sums, running mins, and the alarm cut are engine-exact. Window
    sums are CAST to BIGINT (DuckDB window SUM promotes to INT128 —
    the L50 type-parity discipline).

    Scale: the corpus-sized stage is the hourly rollup (map-side
    combined); both windows and the baseline join run over the
    |types| × |hours| rollup with one narrow shuffle on event_type —
    the baseline is a broadcast-sized aggregate of the rollup itself,
    not a second corpus scan."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
    ).agg(F.count(F.lit(1)).alias("n"))
    base = hourly.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("s"), F.count(F.lit(1)).alias("c")
    )
    dev = hourly.join(F.broadcast(base), "event_type").select(
        "event_type", "hour_us", "n", "s",
        (F.col("n") * F.col("c") - F.col("s")).alias("d"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = dev.select(
        "event_type", "hour_us", "n", "s",
        F.sum("d").over(w).cast("bigint").alias("cum_dev"),
    )
    ph = m.select(
        "event_type", "hour_us", "n", "s", "cum_dev",
        (F.col("cum_dev") - F.min("cum_dev").over(w)).alias("ph_stat"),
    )
    return ph.select(
        "event_type", "hour_us",
        F.col("n").alias("n_events"),
        "cum_dev", "ph_stat",
        F.floor(F.col("ph_stat") * 10000.0 / F.col("s"))
        .cast("bigint")
        .alias("severity_bp"),
        (F.col("ph_stat") * 2 > F.col("s")).alias("alarm"),
    )


_MAD_K_BP = 30000  # |n - median| >= 3 x MAD  (in basis points of MAD)


@register(
    "robust_outlier_mad",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
med AS (
  SELECT event_type, quantile_cont(n, 0.5) AS med
  FROM hourly GROUP BY event_type
),
mad AS (
  SELECT h.event_type, quantile_cont(ABS(h.n - m.med), 0.5) AS mad
  FROM hourly h JOIN med m USING (event_type)
  GROUP BY h.event_type
)
SELECT h.event_type, h.hour_us, h.n, m.med, d.mad,
       CAST(FLOOR(ABS(h.n - m.med) * 10000.0 / GREATEST(d.mad, 0.5)) AS BIGINT)
         AS robust_bp,
       CASE WHEN ABS(h.n - m.med) * 10000.0 / GREATEST(d.mad, 0.5) >= {_MAD_K_BP}
            THEN 'outlier' ELSE 'normal' END AS band
FROM hourly h
JOIN med m USING (event_type)
JOIN mad d ON d.event_type = h.event_type
""",
    tags=("A8", "monitoring", "anomaly"),
)
def robust_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier detection over hourly event rates:
    per event type, score every hour by its absolute deviation from
    the type's median hourly count, in units of the median absolute
    deviation (the robust z-score). Complements `event_rate_anomaly`
    (trailing-mean spike test — local, order-sensitive) and
    `change_point_detect` (sustained drift) with a distribution-level
    detector a single extreme hour cannot contaminate: both the
    center (median) and the spread (MAD) have a 50% breakdown point,
    where mean/stddev break at one corrupted hour.

    Determinism: both engines compute the interpolated 0.5-quantile of
    integers (Spark `percentile`, DuckDB `quantile_cont`) — results
    are exact binary fractions (halves, then quarters for the MAD of
    half-offsets), so every derived comparison is bit-stable. The
    score divides by GREATEST(mad, 0.5) — the conventional zero-MAD
    guard for discrete data — and IEEE division of exact values is
    correctly rounded.

    Scale: the corpus-sized stage is the hourly rollup (map-side
    combined). Medians run over |types| x |hours| rows; the two
    per-type aggregates and the final score join all reuse the same
    tiny rollup, and the |types|-row med/mad tables broadcast."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
    ).agg(F.count(F.lit(1)).alias("n"))
    med = hourly.groupBy("event_type").agg(
        F.percentile("n", F.lit(0.5)).alias("med")
    )
    with_med = hourly.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("n") - F.col("med")), F.lit(0.5)).alias("mad")
    )
    scored = with_med.join(F.broadcast(mad), "event_type")
    dev = F.abs(F.col("n") - F.col("med")) * 10000.0 / F.greatest(
        F.col("mad"), F.lit(0.5)
    )
    return scored.select(
        "event_type",
        "hour_us",
        "n",
        "med",
        "mad",
        F.floor(dev).cast("bigint").alias("robust_bp"),
        F.when(dev >= _MAD_K_BP, "outlier").otherwise("normal").alias("band"),
    )


_SEASONAL_BP = 25000  # |actual - baseline| >= 2.5x baseline-units


@register(
    "seasonal_baseline_deviation",
    oracle="""
WITH hourly AS (
  SELECT event_type,
         epoch_us(date_trunc('hour', ts)) AS hour_us,
         CAST(hour(ts AT TIME ZONE 'UTC') AS BIGINT) AS hod,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
),
base AS (
  SELECT event_type, hod, quantile_cont(n, 0.5) AS baseline
  FROM hourly GROUP BY event_type, hod
)
SELECT h.event_type, h.hour_us, h.hod, h.n, b.baseline,
       CAST(FLOOR((h.n - b.baseline) * 10000.0 / GREATEST(b.baseline, 0.5))
            AS BIGINT) AS dev_bp,
       CASE WHEN ABS(h.n - b.baseline) * 10000.0 / GREATEST(b.baseline, 0.5)
                 >= 25000
            THEN 'anomalous' ELSE 'normal' END AS band
FROM hourly h JOIN base b
  ON h.event_type = b.event_type AND h.hod = b.hod
""",
    tags=("A8", "monitoring", "anomaly", "seasonal"),
)
def seasonal_baseline_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (hour-of-day) baseline anomaly detection: each hour's
    event count scored against the MEDIAN count for that type at that
    time of day across the whole history — a 3 AM spike that would
    hide under a 24 h trailing mean (event_rate_anomaly) or a global
    median (robust_outlier_mad) shows immediately against its own
    diurnal baseline. The three detectors compose into the standard
    ops triad: trend-local, distribution-global, and seasonal.

    Determinism: hour-of-day is extracted UTC-pinned (`hour(ts AT
    TIME ZONE 'UTC')` / session-independent `date_format` in Spark);
    the baseline is the exact interpolated 0.5-quantile of integers
    (binary halves — bit-stable), and the score is floor of one IEEE
    division with the discrete-data GREATEST(baseline, 0.5) guard.

    Scale: one map-side-combined hourly rollup over events; baselines
    aggregate |types|·24 groups and broadcast back onto the rollup."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
        F.date_format(F.to_utc_timestamp(F.col("ts"), "UTC"), "H")
        .cast("bigint")
        .alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"))
    base = hourly.groupBy("event_type", "hod").agg(
        F.percentile("n", F.lit(0.5)).alias("baseline")
    )
    scored = hourly.join(F.broadcast(base), ["event_type", "hod"])
    guard = F.greatest(F.col("baseline"), F.lit(0.5))
    dev = (F.col("n") - F.col("baseline")) * 10000.0 / guard
    return scored.select(
        "event_type",
        "hour_us",
        "hod",
        "n",
        "baseline",
        F.floor(dev).cast("bigint").alias("dev_bp"),
        F.when(F.abs(F.col("n") - F.col("baseline")) * 10000.0 / guard
               >= _SEASONAL_BP, "anomalous")
        .otherwise("normal")
        .alias("band"),
    )


@register(
    "trend_slope_by_type",
    oracle="""
WITH hourly AS (
  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, n,
         (hour_us - MIN(hour_us) OVER (PARTITION BY event_type))
           // 3600000000 AS x
  FROM hourly
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(n) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * n) AS BIGINT) AS sxy
  FROM idx GROUP BY event_type
)
SELECT event_type,
       cnt AS n_hours,
       ((cnt * sxy - sx * sy) * 10000)
            // NULLIF(cnt * sxx - sx * sx, 0) AS slope_bp_per_hour,
       CASE WHEN (cnt * sxy - sx * sy) > 0 THEN 'rising'
            WHEN (cnt * sxy - sx * sy) < 0 THEN 'falling'
            ELSE 'flat' END AS trend
FROM m
""",
    tags=("W5", "monitoring", "trend"),
)
def trend_slope_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend slope of the hourly event rate per type —
    the proper regression generalizing the reference's first-third vs
    last-third tercile comparison (monitoring.ps1:1133-1142, W5): one
    number per type, events/hour of drift per hour, with a
    rising/falling/flat call from the sign of the covariance.

    Determinism: x is the integer hour index from each type's first
    hour, y the integer count, so every moment is an exact integer
    sum; the slope is one INTEGER floor-division of exact integers —
    no regr_slope() float accumulation (whose result depends on input
    order), no IEEE step at all.

    Scale: the hourly rollup is the only events-sized stage
    (map-side combined); moments fold in a second tiny aggregate over
    |types|×|hours| rows sharing the rollup's exchange.

    A type with a single hourly bucket has zero x-variance: the
    NULLIF guard yields a NULL slope on both engines instead of a
    DuckDB division-by-zero error (ADVICE r4)."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
    ).agg(F.count(F.lit(1)).alias("n"))
    idx = hourly.select(
        "event_type",
        "n",
        F.expr(
            "(hour_us - min(hour_us) OVER (PARTITION BY event_type)) div 3600000000"
        ).alias("x"),
    )
    m = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("n").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("n")).cast("bigint").alias("sxy"),
    )
    cov = F.col("cnt") * F.col("sxy") - F.col("sx") * F.col("sy")
    var = F.col("cnt") * F.col("sxx") - F.col("sx") * F.col("sx")
    return m.select(
        "event_type",
        F.col("cnt").alias("n_hours"),
        F.expr(
            "((cnt*sxy - sx*sy) * 10000) div nullif(cnt*sxx - sx*sx, 0)"
        ).alias("slope_bp_per_hour"),
        F.when(cov > 0, "rising")
        .when(cov < 0, "falling")
        .otherwise("flat")
        .alias("trend"),
    )
