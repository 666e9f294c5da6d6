"""Set operations / dedup (SURVEY.md §2.7: U1-U4) + the A5 rollup.

Scale: exact dedup shapes are hash-partition-by-key (`row_number`
window or groupBy) — the shuffle is on the dedup key, AQE handles
skew. EXCEPT ALL is a shuffled anti-multiset; both inputs here are
pre-filtered projections so only the compared columns move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "dedup_first_seen",
    oracle="""
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
) WHERE rn = 1
""",
    tags=("U2",),
)
def dedup_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-by-first-seen (monitoring.ps1:353,392-393 skips duplicate
    container rows, first-wins). The reference keeps the first row it
    streams past; distributed equivalent pins "first" with an explicit
    order (event_id) — dropDuplicates alone would be nondeterministic."""
    w = Window.partitionBy("user_id").orderBy("event_id")
    return (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


@register(
    "union_entities",
    oracle="""
SELECT 'customer' AS entity_kind, c_custkey AS entity_id, c_name AS entity_name FROM customer
UNION ALL
SELECT 'supplier', s_suppkey, s_name FROM supplier
""",
    tags=("U3",),
)
def union_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of heterogeneous lists under one schema
    (monitoring.ps1:64-69 unions timestamped + legacy log file lists).
    unionByName: position-independent, schema-checked."""
    cust = load(spark, sf_dir, "customer").select(
        F.lit("customer").alias("entity_kind"),
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("entity_name"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("entity_kind"),
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("entity_name"),
    )
    return cust.unionByName(supp)


@register(
    "except_all_diff",
    oracle="""
SELECT o_custkey FROM orders
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderkey % 97 <> 0
""",
    tags=("U4",),
)
def except_all_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level difference (monitoring.ps1:594,691 computes sync diff
    as count subtraction; the set-level integrity check is
    src EXCEPT ALL tgt — SURVEY.md §2.7 U4). Multiset semantics keep
    per-key multiplicity, matching count-based lag exactly."""
    orders = load(spark, sf_dir, "orders")
    src = orders.select("o_custkey")
    tgt = orders.filter(F.col("o_orderkey") % 97 != 0).select("o_custkey")
    return src.exceptAll(tgt)


@register(
    "intersect_keys",
    oracle="""
SELECT c_custkey AS active_custkey FROM customer
INTERSECT
SELECT o_custkey FROM orders
""",
    tags=("U1", "U4"),
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (distinct customers that actually ordered) —
    completes the set-op surface next to union/except."""
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("active_custkey")
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("active_custkey")
    )
    return cust.intersect(orders)


@register(
    "rollup_totals",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("A5",),
)
def rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group + subtotal + grand-total in one pass — the reference
    renders per-table rows then a TOTAL row by hand
    (monitoring.ps1:507-552, accumulators :530-531, totals :544-552);
    ROLLUP is the engine-native form. Spark expands rollup into
    partial aggs per grouping set — still one scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)"))
        .cast("double")
        .alias("total_qty"),
    )


@register(
    "cube_order_stats",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("A5", "cube"),
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in one scan —
    the full generalization of the reference's per-group + TOTAL
    report layout (monitoring.ps1:507-552). Spark expands grouping
    sets map-side; still a single shuffle."""
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "setops_suite",
    oracle="""
SELECT 'union_customer' AS set_op, c_custkey AS k, c_name AS s FROM customer
UNION ALL
SELECT 'union_supplier', s_suppkey, s_name FROM supplier
UNION ALL
SELECT 'except_all', o_custkey, NULL FROM (
  SELECT o_custkey FROM orders
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE o_orderkey % 97 <> 0
)
UNION ALL
SELECT 'intersect', k, NULL FROM (
  SELECT c_custkey AS k FROM customer
  INTERSECT
  SELECT o_custkey FROM orders
)
UNION ALL
SELECT 'first_seen', user_id, event_type FROM (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
) WHERE rn = 1
""",
    tags=("U1", "U2", "U3", "U4"),
)
def setops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation suite under one tagged schema (set_op, k, s) so
    the driver gate pins every §2.7 family in one row:

    - U3 union of heterogeneous lists (monitoring.ps1:64-69),
    - U4 multiset difference via exceptAll (the set-level form of the
      count-subtraction sync diff, monitoring.ps1:594,691) and
      intersection (distinct customers that ordered),
    - U2 dedup-by-first-seen (monitoring.ps1:353,392-393 first-wins)
      pinned with an explicit (user_id, event_id) order — plain
      dropDuplicates would be nondeterministic under parallelism.

    Scale: each branch shuffles only its compared columns (projected
    before the set op); exceptAll/intersect hash-partition on the key,
    and the union is a zero-shuffle concatenation of branch plans.
    Single-family forms remain registered below the driver window."""
    cust = load(spark, sf_dir, "customer").select(
        F.lit("union_customer").alias("set_op"),
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("s"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.lit("union_supplier").alias("set_op"),
        F.col("s_suppkey").alias("k"),
        F.col("s_name").alias("s"),
    )
    orders = load(spark, sf_dir, "orders")
    diff = (
        orders.select("o_custkey")
        .exceptAll(
            orders.filter(F.col("o_orderkey") % 97 != 0).select("o_custkey")
        )
        .select(
            F.lit("except_all").alias("set_op"),
            F.col("o_custkey").alias("k"),
            F.lit(None).cast("string").alias("s"),
        )
    )
    inter = (
        load(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("k"))
        .intersect(orders.select(F.col("o_custkey").alias("k")))
        .select(
            F.lit("intersect").alias("set_op"),
            "k",
            F.lit(None).cast("string").alias("s"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    first_seen = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            F.lit("first_seen").alias("set_op"),
            F.col("user_id").alias("k"),
            F.col("event_type").alias("s"),
        )
    )
    return cust.unionByName(supp).unionByName(diff).unionByName(inter).unionByName(
        first_seen
    )
