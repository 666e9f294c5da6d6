"""Data-profiling operators: pivoted layouts, histogram binning,
per-column quality profiles — the dataset-auditing surface a
training-data pipeline runs before ingestion (and the engine-native
form of the reference's fixed-width report tables,
monitoring.ps1:23-29,507-552).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_event_counts",
    oracle="""
SELECT event_id // 200 AS block,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events
GROUP BY event_id // 200
""",
    tags=("pivot", "A7"),
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot layout (rows=blocks, columns=event types) — the
    report-table shape the reference renders by hand. Pivot values are
    EXPLICIT (no value-discovery scan), which is also the scale rule:
    an unbounded pivot on a high-cardinality column is a driver OOM."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("block", F.expr("event_id div 200"))
        .groupBy("block")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


@register(
    "value_histogram",
    oracle="""
-- DuckDB 1.0 has no width_bucket; this is its exact definition for
-- bounds [0,100) with 10 buckets (width = 10.0, exactly representable)
SELECT CASE WHEN value < 0.0 THEN 0
            WHEN value >= 100.0 THEN 11
            ELSE CAST(FLOOR(value / 10.0) + 1 AS INT) END AS bucket,
       COUNT(*) AS n_values,
       ROUND(MIN(value), 4) AS bucket_min,
       ROUND(MAX(value), 4) AS bucket_max
FROM events
GROUP BY 1
""",
    tags=("histogram", "profiling"),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of the value column (10 buckets over
    [0,100)) via width_bucket — one pass, partial-agg'd; the profiling
    primitive behind skew detection and bound checks."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.width_bucket(F.col("value"), F.lit(0.0), F.lit(100.0), F.lit(10))
        .cast("int")
        .alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_values"),
        F.round(F.min("value"), 4).alias("bucket_min"),
        F.round(F.max("value"), 4).alias("bucket_max"),
    )


@register(
    "column_profile",
    oracle="""
SELECT 'o_custkey' AS column_name,
       COUNT(o_custkey) AS n_non_null,
       COUNT(*) - COUNT(o_custkey) AS n_null,
       COUNT(DISTINCT o_custkey) AS n_distinct,
       CAST(MIN(o_custkey) AS DOUBLE) AS min_value,
       CAST(MAX(o_custkey) AS DOUBLE) AS max_value
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(o_totalprice), COUNT(*) - COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice), MIN(o_totalprice), MAX(o_totalprice)
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(o_orderstatus), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus), NULL, NULL
FROM orders
""",
    tags=("profiling",),
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile (null/distinct/min/max) — the
    audit a pipeline runs on every new drop. Spark computes all three
    column profiles in ONE scan (the union of aggregates collapses;
    compare the reference re-scanning per metric)."""
    orders = load(spark, sf_dir, "orders")
    total = F.count(F.lit(1))

    def profile(col: str, numeric: bool):
        return orders.agg(
            F.count(col).alias("n_non_null"),
            (total - F.count(col)).alias("n_null"),
            F.count_distinct(F.col(col)).alias("n_distinct"),
            (F.min(col).cast("double") if numeric else F.lit(None).cast("double")).alias(
                "min_value"
            ),
            (F.max(col).cast("double") if numeric else F.lit(None).cast("double")).alias(
                "max_value"
            ),
        ).select(F.lit(col).alias("column_name"), "*")

    out = profile("o_custkey", True)
    for c, num in [("o_totalprice", True), ("o_orderstatus", False)]:
        out = out.unionByName(profile(c, num))
    return out


@register(
    "unpivot_event_matrix",
    oracle="""
WITH wide AS (
  SELECT event_id // 200 AS block,
         COUNT(*) FILTER (WHERE event_type = 'click') AS click,
         COUNT(*) FILTER (WHERE event_type = 'error') AS error,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
         COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
         COUNT(*) FILTER (WHERE event_type = 'view') AS view
  FROM events
  GROUP BY event_id // 200
)
SELECT block, 'click' AS event_type, click AS n_events FROM wide
UNION ALL SELECT block, 'error', error FROM wide
UNION ALL SELECT block, 'purchase', purchase FROM wide
UNION ALL SELECT block, 'signup', signup FROM wide
UNION ALL SELECT block, 'view', view FROM wide
""",
    tags=("unpivot", "reshape"),
)
def unpivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the wide block×type count matrix back to long
    (block, event_type, n_events) — the inverse reshape of
    pivot_event_counts, densified (zero cells present). Unpivot is a
    per-row explode, no shuffle beyond the wide aggregate's own; the
    long form is the join-able/aggregate-able shape downstream
    pipelines want."""
    wide = pivot_event_counts(spark, sf_dir)
    return wide.unpivot("block", _EVENT_TYPES, "event_type", "n_events")


_SKEW_TOPN = 20


@register(
    "key_skew_profile",
    oracle=f"""
WITH freq AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_keys FROM freq),
ranked AS (
  SELECT user_id, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rnk
  FROM freq
)
SELECT r.rnk, r.user_id, r.n AS n_rows,
       CAST(FLOOR(r.n * 10000.0 / t.total) AS BIGINT) AS share_bp,
       CAST(FLOOR(r.n * 1.0 * t.n_keys * 100 / t.total) AS BIGINT) AS x_avg_pct
FROM ranked r CROSS JOIN tot t
WHERE r.rnk <= {_SKEW_TOPN}
""",
    tags=("profiling", "skew"),
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostic: the top-{_SKEW_TOPN} heaviest keys
    with their row share (floored basis points) and their size relative
    to the average key (percent) — the report an operator reads BEFORE
    choosing salting / AQE skew-join thresholds for a shuffle on this
    key. A key at many times the average is the one that melts a
    1000-executor join.

    Scale shape: per-key counts partial-aggregate map-side; the top-N
    is orderBy+limit → TakeOrderedAndProject (per-partition heaps, one
    tiny final merge — never a single-task global rank over the whole
    keyspace); the rank is then a window over the N survivors only;
    the totals are a 1-row broadcast."""
    events = load(spark, sf_dir, "events")
    freq = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = freq.agg(
        F.sum("n").cast("bigint").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    top = freq.orderBy(F.desc("n"), F.asc("user_id")).limit(_SKEW_TOPN)
    w = Window.orderBy(F.desc("n"), F.asc("user_id"))  # over N rows only
    ranked = top.select("user_id", "n", F.row_number().over(w).alias("rnk"))
    return ranked.crossJoin(F.broadcast(tot)).select(
        "rnk",
        "user_id",
        F.col("n").alias("n_rows"),
        F.floor(F.col("n") * 10000.0 / F.col("total")).cast("bigint").alias("share_bp"),
        F.floor(F.col("n") * 1.0 * F.col("n_keys") * 100 / F.col("total"))
        .cast("bigint")
        .alias("x_avg_pct"),
    )


@register(
    "rfm_segments",
    oracle="""
WITH ref AS (SELECT MAX(o_orderdate) AS ref_date FROM orders),
rfm AS (
  SELECT o_custkey AS c_custkey,
         date_diff('day', MAX(o_orderdate), (SELECT ref_date FROM ref))
           AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, recency_days, frequency, monetary,
       CASE WHEN recency_days <= 90 THEN 'R1'
            WHEN recency_days <= 365 THEN 'R2' ELSE 'R3' END ||
       CASE WHEN frequency >= 15 THEN 'F1'
            WHEN frequency >= 8 THEN 'F2' ELSE 'F3' END ||
       CASE WHEN monetary >= 3000000 THEN 'M1'
            WHEN monetary >= 1500000 THEN 'M2' ELSE 'M3' END AS segment
FROM rfm
""",
    tags=("A6", "A9", "profiling", "rfm"),
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer the classic
    recency/frequency/monetary triple — days since last order relative
    to the corpus max date, order count, exact decimal revenue sum —
    banded into a 27-cell segment code (R1F1M1 = best). The staple
    customer-value report of commerce analytics.

    Scale: one orders scan aggregated per customer (map-side combine;
    o_custkey hash shuffle), the 1-row reference date broadcast-crossed
    in, then pure banding expressions. Decimal sums keep monetary
    exact and order-independent; recency is integer days in the
    catalog-pinned UTC session. No customer-table join needed — the
    orders log carries the key."""
    orders = load(spark, sf_dir, "orders")
    ref = orders.agg(F.max("o_orderdate").alias("ref_date"))
    rfm = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "c_custkey",
            F.datediff(F.col("ref_date"), F.col("last_order")).cast("bigint").alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    seg = F.concat(
        F.when(F.col("recency_days") <= 90, "R1")
        .when(F.col("recency_days") <= 365, "R2")
        .otherwise("R3"),
        F.when(F.col("frequency") >= 15, "F1")
        .when(F.col("frequency") >= 8, "F2")
        .otherwise("F3"),
        F.when(F.col("monetary") >= 3000000, "M1")
        .when(F.col("monetary") >= 1500000, "M2")
        .otherwise("M3"),
    )
    return rfm.select(
        "c_custkey", "recency_days", "frequency", "monetary", seg.alias("segment")
    )


@register(
    "revenue_concentration",
    oracle="""
WITH cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS revenue
  FROM orders GROUP BY o_custkey
),
tot AS (SELECT CAST(SUM(revenue) AS DOUBLE) AS total FROM cust),
deciled AS (
  SELECT o_custkey, revenue,
         NTILE(10) OVER (ORDER BY revenue DESC, o_custkey) AS decile
  FROM cust
)
SELECT decile, COUNT(*) AS n_customers,
       CAST(SUM(revenue) AS DOUBLE) AS decile_revenue,
       CAST(FLOOR(CAST(SUM(revenue) AS DOUBLE) * 10000.0 / total) AS BIGINT)
         AS share_bp
FROM deciled, tot
GROUP BY decile, total
""",
    tags=("A9", "profiling", "concentration"),
)
def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration by customer decile (the Lorenz-curve /
    80-20 report): customers ranked by exact-decimal lifetime revenue,
    cut into NTILE(10) buckets with a deterministic custkey tie-break,
    each decile's revenue share in floored basis points of the total.

    Determinism: revenue stays DECIMAL through every sum (order-
    independent); the share ratio divides the exactly-derived doubles
    once — IEEE-correctly-rounded, engine-identical.

    Scale: the raw orders scan collapses to one row per customer
    (map-side combine) BEFORE any window; the global decile rank runs
    over that |customers| rollup — at web scale that rank becomes a
    repartitionByRange sort (same contract), which is why the rank
    input must stay the aggregate, never raw orders."""
    orders = load(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("revenue")
    )
    tot = cust.agg(F.sum("revenue").cast("double").alias("total"))
    deciled = cust.select(
        "o_custkey",
        "revenue",
        F.ntile(10)
        .over(Window.orderBy(F.desc("revenue"), F.asc("o_custkey")))
        .alias("decile"),
    )
    return (
        deciled.crossJoin(F.broadcast(tot))
        .groupBy("decile", "total")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("revenue").cast("double").alias("decile_revenue"),
        )
        .select(
            "decile",
            "n_customers",
            "decile_revenue",
            F.floor(F.col("decile_revenue") * 10000.0 / F.col("total"))
            .cast("bigint")
            .alias("share_bp"),
        )
    )


_MIG_SPLIT = "1998-07-01"


@register(
    "segment_migration",
    oracle=f"""
WITH h AS (
  SELECT o_custkey, o_orderdate < TIMESTAMP '{_MIG_SPLIT}' AS h1,
         CAST(o_totalprice AS DECIMAL(38,6)) AS p
  FROM orders
),
agg AS (
  SELECT o_custkey,
         COUNT(*) FILTER (WHERE h1) AS f1,
         CAST(COALESCE(SUM(p) FILTER (WHERE h1), 0) AS DOUBLE) AS m1,
         COUNT(*) FILTER (WHERE NOT h1) AS f2,
         CAST(COALESCE(SUM(p) FILTER (WHERE NOT h1), 0) AS DOUBLE) AS m2
  FROM h GROUP BY o_custkey
),
banded AS (
  SELECT o_custkey,
    CASE WHEN f1 = 0 THEN 'NONE'
         WHEN m1 >= 1500000 AND f1 >= 5 THEN 'HIGH'
         WHEN m1 >= 750000 THEN 'MID' ELSE 'LOW' END AS band_h1,
    CASE WHEN f2 = 0 THEN 'NONE'
         WHEN m2 >= 1500000 AND f2 >= 5 THEN 'HIGH'
         WHEN m2 >= 750000 THEN 'MID' ELSE 'LOW' END AS band_h2
  FROM agg
)
SELECT band_h1, band_h2, COUNT(*) AS n_customers
FROM banded GROUP BY band_h1, band_h2
""",
    tags=("A9", "A11", "profiling", "migration"),
)
def segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segment transition matrix: value band (HIGH/MID/LOW/
    NONE on exact-decimal revenue + order count) in the first half of
    the time range vs the second, counted per (from, to) cell — the
    churn/upgrade flow report behind retention planning.

    Scale: deliberately NOT a self-join of two period aggregates — one
    orders scan with period-conditional aggregation per customer (both
    halves partial-agg in the same map pass), then banding expressions
    and a tiny 16-cell matrix agg. Half the shuffle volume of the
    join form and no skew surface beyond the per-customer rollup."""
    orders = load(spark, sf_dir, "orders")
    h1 = F.col("o_orderdate") < F.lit(_MIG_SPLIT).cast("timestamp")
    p = F.col("o_totalprice").cast("decimal(38,6)")
    agg = orders.groupBy("o_custkey").agg(
        F.count(F.when(h1, 1)).alias("f1"),
        F.coalesce(F.sum(F.when(h1, p)), F.lit(0).cast("decimal(38,6)"))
        .cast("double")
        .alias("m1"),
        F.count(F.when(~h1, 1)).alias("f2"),
        F.coalesce(F.sum(F.when(~h1, p)), F.lit(0).cast("decimal(38,6)"))
        .cast("double")
        .alias("m2"),
    )

    def band(f, m):
        return (
            F.when(F.col(f) == 0, "NONE")
            .when((F.col(m) >= 1500000) & (F.col(f) >= 5), "HIGH")
            .when(F.col(m) >= 750000, "MID")
            .otherwise("LOW")
        )

    return (
        agg.select(
            band("f1", "m1").alias("band_h1"), band("f2", "m2").alias("band_h2")
        )
        .groupBy("band_h1", "band_h2")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "order_line_status_audit",
    oracle="""
WITH per AS (
  SELECT l_orderkey, COUNT(*) AS n_lines,
         COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_f
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderstatus,
       CASE WHEN p.n_f = p.n_lines THEN 'ALL_F'
            WHEN p.n_f = 0 THEN 'ALL_O' ELSE 'MIXED' END AS line_state,
       COUNT(*) AS n_orders
FROM orders o JOIN per p ON o.o_orderkey = p.l_orderkey
GROUP BY o.o_orderstatus,
         CASE WHEN p.n_f = p.n_lines THEN 'ALL_F'
              WHEN p.n_f = 0 THEN 'ALL_O' ELSE 'MIXED' END
""",
    tags=("J2", "A11", "audit"),
)
def order_line_status_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-child status consistency audit: each order's status
    crossed with the rollup of its lines' statuses (all-finished /
    all-open / mixed) — the referential-consistency report a CDC
    operator runs after a sync to prove parent and child tables landed
    coherently (the cross-table generalization of the per-table
    count reconciliation in `reconciliation_lag`).

    Scale: lineitem collapses to one row per order (map-side combine)
    BEFORE joining orders — the join is |orders| x |orders|, not
    |orders| x |lineitems|; the final matrix agg is |statuses| x 3
    cells. Pure counts: engine-exact."""
    orders = load(spark, sf_dir, "orders")
    per = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count(F.when(F.col("l_linestatus") == "F", 1)).alias("n_f"),
        )
    )
    line_state = (
        F.when(F.col("n_f") == F.col("n_lines"), "ALL_F")
        .when(F.col("n_f") == 0, "ALL_O")
        .otherwise("MIXED")
    )
    return (
        orders.join(per, orders["o_orderkey"] == per["l_orderkey"])
        .groupBy("o_orderstatus", line_state.alias("line_state"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_HIST_BIN_WIDTH = 50.0  # fixed-width value bins


@register(
    "histogram_cdf",
    oracle=f"""
WITH binned AS (
  SELECT CAST(FLOOR(value / {_HIST_BIN_WIDTH}) AS BIGINT) AS bin, COUNT(*) AS n
  FROM events GROUP BY 1
),
tot AS (SELECT SUM(n) AS total FROM binned)
SELECT bin,
       CAST(bin * {_HIST_BIN_WIDTH} AS DOUBLE) AS bin_lo,
       n,
       CAST(SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_n,
       CAST(FLOOR(CAST(SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) * 10000.0 / (SELECT total FROM tot))
            AS BIGINT) AS cum_bp
FROM binned
""",
    tags=("A6", "profiling", "histogram"),
)
def histogram_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-width histogram with cumulative shares — the
    100 TB path to percentiles. An exact global percentile needs a
    full sort; `approx_latency_percentiles` trades accuracy for one
    pass; this keeps EXACT integer counts in fixed bins (mergeable
    across partitions, executors, days) and reads any quantile off the
    cumulative curve with bin-width resolution. The pattern behind
    every production latency dashboard (HdrHistogram et al.) expressed
    as a pure groupBy.

    Determinism: bin = floor(value / width) — IEEE division + floor
    are exact on both engines; counts and cumulative sums are integer
    (window SUM cast to BIGINT — DuckDB promotes to HUGEINT, the r3
    gate lesson); cum share in floored bp of an exact integer ratio.

    Scale: the corpus-sized stage is a map-side-combined groupBy on
    ~|range/width| integer bins; the cumulative window runs over the
    tiny binned frame. Merging two corpora = summing their bin
    tables."""
    ev = load(spark, sf_dir, "events")
    binned = ev.groupBy(
        F.floor(F.col("value") / _HIST_BIN_WIDTH).cast("bigint").alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))
    total = binned.agg(F.sum("n").alias("total"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    return (
        binned.crossJoin(F.broadcast(total))
        .select(
            "bin",
            (F.col("bin") * _HIST_BIN_WIDTH).alias("bin_lo"),
            "n",
            F.sum("n").over(w).cast("bigint").alias("cum_n"),
            F.floor(
                F.sum("n").over(w).cast("bigint") * 10000.0 / F.col("total")
            )
            .cast("bigint")
            .alias("cum_bp"),
        )
    )


@register(
    "salted_distinct_agg",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
""",
    tags=("A3", "profiling", "skew"),
)
def salted_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-users + totals per event type, written as the
    explicit TWO-PHASE salted aggregation for heavily skewed group
    keys (the |event_type| ≪ |rows| regime key_skew_profile warns
    about).

    A single ``groupBy(event_type).agg(countDistinct(user_id))``
    funnels every row of a hot key through one reducer. Phase 1 here
    groups by (event_type, user_id) — the high-cardinality natural
    salt — so the hot key's rows spread across ALL partitions and
    partial-aggregate map-side; phase 2 reduces the already-tiny
    per-(type,user) rows to |event_type| finals. Row counts and exact
    decimal value sums fold through phase 1 (algebraic aggregates
    compose), so the input is scanned and shuffled once, pre-reduced.
    At 100 TB this is the difference between a straggler task pinned
    at 100% and 1000 balanced reducers."""
    events = load(spark, sf_dir, "events").select(
        "event_type", "user_id", F.col("value").cast("decimal(38,6)").alias("val")
    )
    phase1 = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("val").alias("val_sum"),
    )
    return phase1.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_rows").alias("n_events"),
        F.sum("val_sum").cast("double").alias("total_value"),
    )


@register(
    "frequent_items_sketch",
    oracle=None,  # Karp/Misra-Gries one-pass sketch — layout-dependent
    tags=("A3", "approx", "sketch"),
    eager_build=False,
)
def frequent_items_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass heavy-hitter sketch (`DataFrame.stat.freqItems`, the
    Karp-Shenker-Papadimitriou / Misra-Gries counter algorithm): every
    event_type occurring in more than 10% of events is GUARANTEED to
    appear (possibly with false positives — the sketch trades
    precision for a single pass with O(1/support) space). The sketch
    sibling of approx_count_distinct / approx_percentile: the exact
    twin is `key_skew_profile`, and the pytest gate asserts the
    superset guarantee against exact counts.

    Scale: one narrow pass, per-partition counter maps merged at the
    driver — no shuffle at all, which is the point at 100 TB: exact
    heavy hitters need a full groupBy; the sketch answers 'which keys
    COULD be hot' first, so the exact pass (or a salting decision)
    runs only when needed. Candidate list is returned exploded with
    a deterministic sort for stable display."""
    ev = load(spark, sf_dir, "events")
    items = ev.select("event_type").stat.freqItems(["event_type"], support=0.1)
    return items.select(
        F.explode(F.sort_array(F.col("event_type_freqItems"))).alias(
            "candidate_heavy_type"
        )
    )


@register(
    "equi_depth_histogram",
    oracle="""
WITH ranked AS (
  SELECT value,
         NTILE(10) OVER (ORDER BY value, event_id) AS bucket
  FROM events
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS lo,
       MAX(value) AS hi
FROM ranked GROUP BY bucket
""",
    tags=("A5", "profiling", "percentile"),
)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (10 buckets of equal row count with their
    value boundaries) — the histogram form an optimizer's statistics
    collector and a skew diagnostic actually want: fixed-width bins
    (`histogram_cdf`) starve in the tail and overflow at the mode,
    equi-depth puts the resolution where the data is. Bucket
    boundaries double as exact decile cut points.

    Determinism: NTILE over a fully tie-broken order (value,
    event_id) assigns identical bucket membership on any engine;
    outputs are counts and exact min/max per bucket.

    Scale: the NTILE is the one global-ordering window — at 100 TB
    the same report comes from the mergeable fixed-width bin table
    (histogram_cdf) refined per-bucket, or approx_percentile cut
    points + one bucketed aggregation; the equi-depth SHAPE (10 rows,
    count + boundaries) is unchanged, which is what downstream
    consumers contract on."""
    ev = load(spark, sf_dir, "events").select("value", "event_id")
    w = Window.orderBy("value", "event_id")
    ranked = ev.select("value", F.ntile(10).over(w).alias("bucket"))
    return ranked.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


@register(
    "numeric_corr_matrix",
    oracle="""
WITH c AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(l_extendedprice * 100 AS HUGEINT) AS p,
         CAST(l_discount * 100 AS BIGINT) AS d
  FROM lineitem
),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(q) AS HUGEINT) AS sq, CAST(SUM(p) AS HUGEINT) AS sp,
         CAST(SUM(d) AS HUGEINT) AS sd,
         CAST(SUM(q*q) AS HUGEINT) AS sqq, CAST(SUM(p*p) AS HUGEINT) AS spp,
         CAST(SUM(d*d) AS HUGEINT) AS sdd,
         CAST(SUM(q*p) AS HUGEINT) AS sqp, CAST(SUM(q*d) AS HUGEINT) AS sqd,
         CAST(SUM(p*d) AS HUGEINT) AS spd
  FROM c
)
SELECT pair, CAST(FLOOR(corr * 10000) AS BIGINT) AS corr_bp FROM (
  SELECT 'quantity~price' AS pair,
         (n*sqp - sq*sp) / (sqrt(CAST(n*sqq - sq*sq AS DOUBLE))
                            * sqrt(CAST(n*spp - sp*sp AS DOUBLE))) AS corr
  FROM m
  UNION ALL
  SELECT 'quantity~discount',
         (n*sqd - sq*sd) / (sqrt(CAST(n*sqq - sq*sq AS DOUBLE))
                            * sqrt(CAST(n*sdd - sd*sd AS DOUBLE)))
  FROM m
  UNION ALL
  SELECT 'price~discount',
         (n*spd - sp*sd) / (sqrt(CAST(n*spp - sp*sp AS DOUBLE))
                            * sqrt(CAST(n*sdd - sd*sd AS DOUBLE)))
  FROM m
)
""",
    tags=("A6", "profiling", "corr"),
)
def numeric_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem numeric
    columns (quantity, extended price, discount) from ONE scan: all
    nine moment sums accumulate in a single aggregate, then each
    pair's correlation is closed-form from the moments — the
    column-profiling step that finds redundant/derived columns before
    feature selection, and the multi-column generalization of
    `pattern_match_corr`'s moment trick.

    Determinism: values are integer-exact (quantity as BIGINT, price
    and discount in fixed-point cents); moment sums are exact DECIMAL
    — the only floating arithmetic is the final (n·sxy − sx·sy) /
    (√·√) on exactly-represented operands, every step correctly
    rounded, reported as floored bp.

    Scale: one map-side-combined scan producing a 1-row moment
    vector; the matrix is |cols|² driver-side arithmetic on that row.
    Adding a column adds moments, never a pass."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("q"),
        (F.col("l_extendedprice") * 100).cast("decimal(38,0)").alias("p"),
        (F.col("l_discount") * 100).cast("bigint").alias("d"),
    )
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").cast("decimal(38,0)").alias("sq"),
        F.sum("p").cast("decimal(38,0)").alias("sp"),
        F.sum("d").cast("decimal(38,0)").alias("sd"),
        F.sum(F.col("q") * F.col("q")).cast("decimal(38,0)").alias("sqq"),
        F.sum(F.col("p") * F.col("p")).cast("decimal(38,0)").alias("spp"),
        F.sum(F.col("d") * F.col("d")).cast("decimal(38,0)").alias("sdd"),
        F.sum(F.col("q") * F.col("p")).cast("decimal(38,0)").alias("sqp"),
        F.sum(F.col("q") * F.col("d")).cast("decimal(38,0)").alias("sqd"),
        F.sum(F.col("p") * F.col("d")).cast("decimal(38,0)").alias("spd"),
    )

    def corr(sxy, sx, sy, sxx, syy):
        num = (F.col("n") * F.col(sxy) - F.col(sx) * F.col(sy)).cast("double")
        den = F.sqrt(
            (F.col("n") * F.col(sxx) - F.col(sx) * F.col(sx)).cast("double")
        ) * F.sqrt(
            (F.col("n") * F.col(syy) - F.col(sy) * F.col(sy)).cast("double")
        )
        return num / den

    rows = [
        m.select(
            F.lit("quantity~price").alias("pair"),
            F.floor(corr("sqp", "sq", "sp", "sqq", "spp") * 10000)
            .cast("bigint")
            .alias("corr_bp"),
        ),
        m.select(
            F.lit("quantity~discount").alias("pair"),
            F.floor(corr("sqd", "sq", "sd", "sqq", "sdd") * 10000)
            .cast("bigint")
            .alias("corr_bp"),
        ),
        m.select(
            F.lit("price~discount").alias("pair"),
            F.floor(corr("spd", "sp", "sd", "spp", "sdd") * 10000)
            .cast("bigint")
            .alias("corr_bp"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# ---------------------------------------------------------------------------
# Storage-layout introspection (the 100 TB scan-health audit)
# ---------------------------------------------------------------------------


@register(
    "parquet_layout_report",
    oracle=r"""
SELECT regexp_extract(file_name, '([a-z]+)\.parquet$', 1) AS tbl,
       CAST(row_group_id AS BIGINT) AS row_group_id,
       CAST(any_value(row_group_num_rows) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_cols,
       CAST(sum(total_compressed_size) AS BIGINT) AS compressed_bytes,
       CAST(sum(total_uncompressed_size) AS BIGINT) AS uncompressed_bytes,
       CAST(sum(total_compressed_size) * 10000
            // sum(total_uncompressed_size) AS BIGINT) AS compression_bp
FROM parquet_metadata('/root/testdata/sf0.01/*.parquet')
GROUP BY file_name, row_group_id
""",
    tags=("F19", "profiling", "storage"),
)
def parquet_layout_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet footer audit (storage pack): per row group, the thrift
    metadata a scan planner actually sees — row counts, column-chunk
    count, exact compressed/uncompressed byte totals, compression
    ratio in basis points. At 100 TB row-group sizing IS the scan
    lever (too-small groups → footer/seek overhead and tiny tasks;
    too-large → no intra-file parallelism and memory-heavy reads), so
    the audit runs footer reads DISTRIBUTED: one task per file over
    mapInPandas, reading ONLY footers (never data pages) with
    pyarrow. The DuckDB oracle reads the same footers through its own
    independent parquet implementation (`parquet_metadata()`), so the
    two engines must agree on every thrift byte count. Oracle path is
    pinned to the correctness-gate scale (sf0.01) — the only scale
    the oracle contract evaluates; the Spark side follows sf_dir."""
    from collections.abc import Iterator

    from pyspark.sql import types as T

    from ..catalog import FIXTURE_TABLES

    schema = T.StructType(
        [
            T.StructField("tbl", T.StringType()),
            T.StructField("row_group_id", T.LongType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("n_cols", T.LongType()),
            T.StructField("compressed_bytes", T.LongType()),
            T.StructField("uncompressed_bytes", T.LongType()),
            T.StructField("compression_bp", T.LongType()),
        ]
    )

    files = spark.createDataFrame(
        [(t, f"{sf_dir}/{t}.parquet") for t in FIXTURE_TABLES],
        ["tbl", "path"],
    ).repartition(len(FIXTURE_TABLES))

    def footers(it: Iterator) -> Iterator:
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in it:
            rows = []
            for tbl, path in zip(pdf["tbl"], pdf["path"]):
                md = pq.ParquetFile(path).metadata
                for gi in range(md.num_row_groups):
                    rg = md.row_group(gi)
                    comp = sum(
                        rg.column(ci).total_compressed_size
                        for ci in range(rg.num_columns)
                    )
                    unc = sum(
                        rg.column(ci).total_uncompressed_size
                        for ci in range(rg.num_columns)
                    )
                    rows.append(
                        (
                            tbl, gi, rg.num_rows, rg.num_columns,
                            comp, unc, comp * 10000 // unc,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return files.mapInPandas(footers, schema=schema)
