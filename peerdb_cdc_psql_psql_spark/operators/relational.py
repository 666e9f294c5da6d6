"""Batch relational operators (SURVEY.md §2.1/§2.3–§2.5).

Each function is a pure DataFrame program over the fixture tables; the
adjacent oracle string is the ANSI-SQL equivalent DuckDB runs on the
same parquet. Conventions for oracle parity:

- Every computed column is aliased identically on both sides.
- Floating-point SUMs go through ``decimal(38,6)`` (exact, order-
  independent) and are cast back to double — a plain double sum is
  combine-order-dependent and would hash-mismatch between engines.
- Ratios/averages divide *exact* numerators so both engines perform
  one identical IEEE division.
- Every top-k orders by a unique tie-breaker.

Scale notes are per-function. All plans are scan→(partial agg)→shuffle
→final agg shapes that Catalyst/AQE handle at 100 TB; none collect to
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

# ---------------------------------------------------------------------------
# M1 flagship: source↔target reconciliation / lag report
# ---------------------------------------------------------------------------

# (table, primary-key expression) pairs monitored by the report.
_RECON_TABLES = [
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("events", "event_id"),
]
# Deterministic simulated replication gap: rows whose PK % 211 == 0 are
# "not yet synced" to the target. 211 is prime → ~0.47% of rows lag.
_GAP_MOD = 211


@register(
    "reconciliation_lag",
    oracle="""
WITH counts AS (
  SELECT 'customer' AS table_name, COUNT(*) AS src_rows,
         COUNT(*) FILTER (WHERE c_custkey % 211 <> 0) AS tgt_rows FROM customer
  UNION ALL
  SELECT 'supplier', COUNT(*), COUNT(*) FILTER (WHERE s_suppkey % 211 <> 0) FROM supplier
  UNION ALL
  SELECT 'part', COUNT(*), COUNT(*) FILTER (WHERE p_partkey % 211 <> 0) FROM part
  UNION ALL
  SELECT 'orders', COUNT(*), COUNT(*) FILTER (WHERE o_orderkey % 211 <> 0) FROM orders
  UNION ALL
  SELECT 'events', COUNT(*), COUNT(*) FILTER (WHERE event_id % 211 <> 0) FROM events
)
SELECT table_name, src_rows, tgt_rows,
       src_rows - tgt_rows AS lag_rows,
       CASE WHEN src_rows - tgt_rows = 0 THEN 'SYNCED'
            WHEN ABS(src_rows - tgt_rows) <= 5 THEN 'NEAR_SYNC'
            ELSE 'LAG' END AS sync_status,
       ROUND(100.0 * tgt_rows / src_rows, 1) AS efficiency_pct
FROM counts
""",
    tags=("J2", "F16", "A9", "flagship"),
)
def reconciliation_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table source↔target lag report with SYNCED/NEAR_SYNC/LAG
    bands and replication-efficiency % — the reference's signature
    computation (monitoring.ps1:576-627: per-table count join :578-586,
    lag :594, bands :596-606, efficiency :621-627).

    Scale: one columnar scan per table computing both counts in a
    single pass (conditional count), partial-agg'd map-side; the union
    of five 1-row aggregates is driver-negligible at any SF.
    """
    parts = []
    for table, pk in _RECON_TABLES:
        df = load(spark, sf_dir, table)
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("src_rows"),
                F.count(F.when(F.col(pk) % _GAP_MOD != 0, 1)).alias("tgt_rows"),
            ).select(F.lit(table).alias("table_name"), "src_rows", "tgt_rows")
        )
    counts = parts[0]
    for p in parts[1:]:
        counts = counts.unionByName(p)
    lag = F.col("src_rows") - F.col("tgt_rows")
    return counts.select(
        "table_name",
        "src_rows",
        "tgt_rows",
        lag.alias("lag_rows"),
        F.when(lag == 0, "SYNCED")
        .when(F.abs(lag) <= 5, "NEAR_SYNC")
        .otherwise("LAG")
        .alias("sync_status"),
        F.round(100.0 * F.col("tgt_rows") / F.col("src_rows"), 1).alias(
            "efficiency_pct"
        ),
    )


# ---------------------------------------------------------------------------
# Scans / projections / filters (S1, P1-P6)
# ---------------------------------------------------------------------------


@register(
    "scan_projection",
    oracle="SELECT c_custkey FROM customer",
    tags=("S1", "P1"),
)
def scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan, single-column projection (`SELECT id FROM customers`,
    insert.ps1:96). Column pruning reaches the parquet reader: the scan
    reads exactly one column (ReadSchema shows only c_custkey)."""
    return load(spark, sf_dir, "customer").select("c_custkey")


@register(
    "filter_equality",
    oracle="""
SELECT p_partkey, p_name, p_retailprice FROM part
WHERE p_brand = 'Brand#7'
""",
    tags=("P2",),
)
def filter_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate (`WHERE name='max_connections'`,
    monitoring.ps1:887). Pushed to the parquet scan (PushedFilters:
    EqualTo) → row-group min/max skipping at scale."""
    part = load(spark, sf_dir, "part")
    return part.filter(F.col("p_brand") == "Brand#7").select(
        "p_partkey", "p_name", "p_retailprice"
    )


@register(
    "filter_like",
    oracle="""
SELECT p_partkey, p_name, p_type FROM part
WHERE p_name LIKE '%widget%' AND p_type = 'PROMO'
""",
    tags=("P3",),
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern + conjunctive equality (`table_name LIKE '%flow%'
    AND table_schema='public'`, monitoring.ps1:966). StringContains
    pushes down; the conjunction prunes row groups on p_type."""
    part = load(spark, sf_dir, "part")
    return part.filter(
        F.col("p_name").like("%widget%") & (F.col("p_type") == "PROMO")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "filter_regex",
    oracle=r"""
SELECT event_id, event_type, props FROM events
WHERE regexp_matches(props, '"k": \d{2}}')
""",
    tags=("P4", "P5", "F1"),
)
def filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-match row filter (keep lines matching a pattern;
    insert.ps1:99, monitoring.ps1:257,1073). rlike evaluates inside
    whole-stage codegen — no Python UDF."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("props").rlike(r'"k": \d{2}\}')).select(
        "event_id", "event_type", "props"
    )


@register(
    "next_key_allocation",
    oracle="""
SELECT COALESCE(MAX(o_orderkey), 0) + 1 AS next_id,
       COALESCE(MAX(event_id), 0) + 1 AS next_event_id
FROM orders, events
""",
    tags=("P6", "A2"),
)
def next_key_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX(id)+1 next-key allocation with null→default guard
    (insert.ps1:147-158: null MAX → 1 at :151-154). MAX is a partial
    agg — one number per partition reaches the shuffle."""
    orders = load(spark, sf_dir, "orders").agg(
        (F.coalesce(F.max("o_orderkey"), F.lit(0)) + 1).alias("next_id")
    )
    events = load(spark, sf_dir, "events").agg(
        (F.coalesce(F.max("event_id"), F.lit(0)) + 1).alias("next_event_id")
    )
    return orders.crossJoin(events)


# ---------------------------------------------------------------------------
# Aggregations (A1-A11)
# ---------------------------------------------------------------------------


@register(
    "count_per_table",
    oracle="""
SELECT 'customer' AS table_name, COUNT(*) AS n_rows FROM customer
UNION ALL SELECT 'orders', COUNT(*) FROM orders
UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
UNION ALL SELECT 'part', COUNT(*) FROM part
UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
UNION ALL SELECT 'nation', COUNT(*) FROM nation
UNION ALL SELECT 'region', COUNT(*) FROM region
""",
    tags=("A1",),
)
def count_per_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) per table (monitoring.ps1:578,586,675; insert.ps1:163).
    Parquet count(*) is metadata-only (row-group counts) — no data read."""
    out = None
    for t in ("customer", "orders", "lineitem", "part", "supplier", "nation", "region"):
        one = (
            load(spark, sf_dir, t)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(F.lit(t).alias("table_name"), "n_rows")
        )
        out = one if out is None else out.unionByName(one)
    return out


@register(
    "distinct_topn",
    oracle="""
SELECT DISTINCT o_custkey FROM orders ORDER BY o_custkey LIMIT 10
""",
    tags=("A3", "U1", "W1"),
)
def distinct_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT DISTINCT purchaser FROM orders LIMIT 10`
    (insert.ps1:106,133) — made deterministic with ORDER BY (the
    reference relies on Postgres scan order). Plan: partial distinct →
    shuffle → TakeOrderedAndProject; only 10 rows reach the driver."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .orderBy("o_custkey")
        .limit(10)
    )


@register(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("A1", "A6", "bench"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: the canonical scan→filter→
    grouped-aggregate exercising SUM/AVG/COUNT (reference aggregates
    A1/A6: insert.ps1:321-323, monitoring.ps1:1071-1115).

    Scale: 6 aggregates over ~4 B rows at 100 TB — all partial-agg'd
    map-side into 6 cells × |groups| (6 groups), so the shuffle is
    bytes, not rows. Exactness unchanged (r13): sums run as the hi/lo
    long-micros split (functions/helpers.micros_hilo_sums) — the
    identical 6-dp quantization and exact integer total the old
    ``SUM(decimal(38,6))`` produced, but on the codegen fast hash-map
    path, which excludes >18-digit decimal buffers (measured: the
    grouped decimal form paid ~5-7× per row; this form ~1.6× faster
    end-to-end on the full scan). Overflow bound ~10 PB per group,
    documented on the helper.
    """
    from ..functions.helpers import micros_hilo_sums, micros_total, unscaled_micros

    li = load(spark, sf_dir, "lineitem")
    pre = li.filter(
        F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        unscaled_micros(F.col("l_quantity")).alias("mq"),
        unscaled_micros(F.col("l_extendedprice")).alias("mp"),
        unscaled_micros(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("md"),
        unscaled_micros(F.col("l_discount")).alias("mdisc"),
    )
    g = pre.groupBy("l_returnflag", "l_linestatus").agg(
        *micros_hilo_sums("mq"),
        *micros_hilo_sums("mp"),
        *micros_hilo_sums("md"),
        *micros_hilo_sums("mdisc"),
        F.count(F.lit(1)).alias("n"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        micros_total("mq").cast("double").alias("sum_qty"),
        micros_total("mp").cast("double").alias("sum_base_price"),
        micros_total("md").cast("double").alias("sum_disc_price"),
        (micros_total("mq").cast("double") / F.col("n")).alias("avg_qty"),
        (micros_total("mdisc").cast("double") / F.col("n")).alias("avg_disc"),
        F.col("n").alias("count_order"),
    )


@register(
    "group_avg_min_max",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) AS avg_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY event_type
""",
    tags=("A6",),
)
def group_avg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG/MIN/MAX over batch latencies (insert.ps1:321-323,361-363 —
    Measure-Object -Average/-Maximum/-Minimum), as a grouped agg over
    events.value. MIN/MAX on doubles are order-independent; AVG goes
    through the exact-decimal-sum route."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
            / F.count("value")
        ).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "ratio_percentage",
    oracle="""
SELECT ROUND(100.0 * COUNT(*) FILTER (WHERE event_type = 'error') / COUNT(*), 2) AS error_pct,
       ROUND(100.0 * COUNT(*) FILTER (WHERE event_type <> 'error') / COUNT(*), 2) AS success_pct,
       COUNT(*) AS total_ops
FROM events
""",
    tags=("A9",),
)
def ratio_percentage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Success-rate / efficiency percentages (insert.ps1:350-352,
    monitoring.ps1:621,851): conditional counts in one scan, one
    identical IEEE division per ratio on both engines."""
    ev = load(spark, sf_dir, "events")
    total = F.count(F.lit(1))
    errors = F.count(F.when(F.col("event_type") == "error", 1))
    return ev.agg(
        F.round(100.0 * errors / total, 2).alias("error_pct"),
        F.round(100.0 * (total - errors) / total, 2).alias("success_pct"),
        total.alias("total_ops"),
    )


@register(
    "throughput_rate",
    oracle="""
SELECT COUNT(*) AS n_ops,
       ROUND(COUNT(*) * 1000000.0 / (MAX(epoch_us(ts)) - MIN(epoch_us(ts))), 4) AS ops_per_sec
FROM events
""",
    tags=("A10",),
)
def throughput_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throughput = ops ÷ wall-clock (insert.ps1:355-357). Duration is
    computed in exact integer microseconds (unix_micros / epoch_us) so
    both engines divide identical numbers."""
    ev = load(spark, sf_dir, "events")
    span = F.max(F.unix_micros(F.col("ts"))) - F.min(F.unix_micros(F.col("ts")))
    n = F.count(F.lit(1))
    return ev.agg(
        n.alias("n_ops"),
        F.round(n * 1000000.0 / span, 4).alias("ops_per_sec"),
    )


@register(
    "threshold_classify",
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
       CASE WHEN COUNT(*) >= 200 THEN 'HIGH'
            WHEN COUNT(*) >= 50 THEN 'NORMAL'
            ELSE 'LOW' END AS volume_band,
       CASE WHEN COUNT(*) > 0 THEN 1 ELSE 0 END AS has_activity
FROM events
GROUP BY event_type
""",
    tags=("A11", "F16"),
)
def threshold_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence/threshold classification (`slots > 0`, `senders >= 2`,
    health bands — monitoring.ps1:969-1018,807-808) as CASE bands over
    grouped counts."""
    ev = load(spark, sf_dir, "events")
    n = F.count(F.lit(1))
    return ev.groupBy("event_type").agg(
        n.alias("n_events"),
        F.when(n >= 200, "HIGH")
        .when(n >= 50, "NORMAL")
        .otherwise("LOW")
        .alias("volume_band"),
        F.when(n > 0, 1).otherwise(0).alias("has_activity"),
    )


@register(
    "latency_percentiles",
    oracle="""
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.95) AS p95,
       quantile_cont(value, 0.99) AS p99,
       COUNT(*) AS n
FROM events
GROUP BY event_type
""",
    tags=("A6", "percentile"),
)
def latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p95/p99 latency percentiles per operation type — the
    richer form of the reference's avg/min/max batch-latency metrics
    (insert.ps1:321-323,361-363). Spark's exact `percentile` and
    DuckDB's quantile_cont share linear interpolation → bit-identical.
    At 100 TB swap to approx_percentile (t-digest sketch, mergeable
    map-side) — exact percentile shuffles every value per group."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.95).alias("p95"),
        F.percentile("value", 0.99).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "grouped_string_agg",
    oracle="""
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
       COUNT(*) AS n_nations
FROM nation
GROUP BY n_regionkey
""",
    tags=("F5", "A1", "string-agg"),
)
def grouped_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (the reference builds comma lists
    for report rows by hand, monitoring.ps1:23-29): collect → sort →
    join guarantees deterministic order across partitionings, matching
    string_agg(... ORDER BY)."""
    nation = load(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations_csv"),
        F.count(F.lit(1)).alias("n_nations"),
    )


@register(
    "approx_latency_percentiles",
    oracle=None,  # t-digest sketch — engine-specific estimate; the
    # exact twin (latency_percentiles) carries the value oracle and
    # tests/test_llm_pack.py gates this one against it
    tags=("A6", "percentile", "approx"),
)
def approx_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile twin of latency_percentiles — the 100 TB
    form: the sketch is mergeable map-side (partial aggregation), so
    only fixed-size digests cross the shuffle instead of every value
    per group."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50"),
        F.percentile_approx("value", 0.95, 10000).alias("p95"),
        F.percentile_approx("value", 0.99, 10000).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "filter_patterns",
    oracle=r"""
SELECT 'part' AS src, p_partkey AS row_id, p_name AS matched, 'like' AS pattern_kind
FROM part WHERE p_name LIKE '%widget%' AND p_type = 'PROMO'
UNION ALL
SELECT 'events', event_id, props, 'regex'
FROM events WHERE regexp_matches(props, '"k": \d{2}}')
""",
    tags=("P3", "P4", "P5", "F17"),
)
def filter_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-predicate suite: LIKE + conjunctive equality over part
    (`table_name LIKE '%flow%' AND table_schema='public'`,
    monitoring.ps1:966) and a regex row filter over events
    (insert.ps1:99, monitoring.ps1:257,1073), unioned under one tagged
    schema so the driver gate pins both predicate families in one row.
    StringContains pushes down on the LIKE side; rlike stays inside
    whole-stage codegen — no Python UDF on either branch. The
    single-family forms (`filter_like`, `filter_regex`) remain
    registered below the driver window."""
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%") & (F.col("p_type") == "PROMO"))
        .select(
            F.lit("part").alias("src"),
            F.col("p_partkey").alias("row_id"),
            F.col("p_name").alias("matched"),
            F.lit("like").alias("pattern_kind"),
        )
    )
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("props").rlike(r'"k": \d{2}\}'))
        .select(
            F.lit("events").alias("src"),
            F.col("event_id").alias("row_id"),
            F.col("props").alias("matched"),
            F.lit("regex").alias("pattern_kind"),
        )
    )
    return part.unionByName(ev)


@register(
    "grouping_sets_stats",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
         AS gid,
       COUNT(*) AS n_orders,
       SUM(o_totalprice) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority), ())
""",
    tags=("A5", "grouping_sets"),
)
def grouping_sets_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with a grouping_id disambiguator: per-status,
    per-priority, per-(status, priority), and grand-total order counts
    and exact-decimal revenue in ONE pass — the generalization of the
    reference's per-table + TOTAL rollup layout (A5,
    monitoring.ps1:544-552) to arbitrary set lists. Completes the
    multi-grouping family next to `rollup_totals` and
    `cube_order_stats`: sets are EXPLICIT here, so the engine computes
    exactly the four groupings a report needs, not the 2^k a cube
    implies.

    Determinism: COALESCE('ALL') labels the aggregated-out dimension;
    gid (the grouping_id bit vector) distinguishes a real 'ALL'-valued
    key from the aggregate row — both engines compute it identically
    per ANSI semantics. Revenue sums in DECIMAL, never float.

    Scale: Spark plans grouping sets as one Expand (4× row
    multiplication) + one hash aggregate with map-side combine — the
    multiplied rows collapse to |groups| per partition before the
    single shuffle. For high-cardinality set lists the two-phase
    `salted_distinct_agg` shape takes over; four sets over two
    low-cardinality dims is exactly the Expand sweet spot."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [
                [F.col("o_orderstatus")],
                [F.col("o_orderpriority")],
                [F.col("o_orderstatus"), F.col("o_orderpriority")],
                [],
            ],
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
        )
        .agg(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            (
                F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")
            )
            .cast("bigint")
            .alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
        )
        .select("status", "priority", "gid", "n_orders", "total_price")
    )
