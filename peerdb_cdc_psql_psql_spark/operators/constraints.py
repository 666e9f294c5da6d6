"""Declarative data-quality constraint checking (the D5 "verify"
surface generalized — the reference validates replicated row counts
and key continuity after every batch, `monitoring.ps1:576-627` and
`insert.ps1` verify steps; production pipelines run the same idea as a
constraint pack, Deequ/dbt-test style).

One registered query evaluates the whole constraint suite — key
uniqueness, referential integrity, non-null keys, derived-column
consistency — and emits one row per check with its violation count
and PASS/FAIL status.

Scale design: every check is either a single map-side-combined
aggregate over one scan (uniqueness = count - distinct count on the
key; null/consistency checks = conditional counts) or a LEFT ANTI
equi-join on the key for referential integrity (shuffles 8-byte keys
only — at 100 TB these are the same shuffles the real joins pay, and
AQE handles the skew). The per-check 1-row aggregates union into one
plan; nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "data_quality_report",
    oracle="""
SELECT 1 AS check_no, 'orders_pk_unique' AS check_name,
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 2, 'events_pk_unique',
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
FROM events
UNION ALL
SELECT 3, 'orders_custkey_fk',
       CAST(COUNT(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 4, 'lineitem_orderkey_fk',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 5, 'lineitem_partkey_fk',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 6, 'orders_custkey_not_null',
       CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
FROM orders
UNION ALL
SELECT 7, 'documents_nchars_consistent',
       CAST(COUNT(*) FILTER (WHERE n_chars <> length(text)) AS BIGINT)
FROM documents
UNION ALL
SELECT 8, 'lineitem_qty_positive',
       CAST(COUNT(*) FILTER (WHERE l_quantity <= 0) AS BIGINT)
FROM lineitem
""",
    tags=("D5", "constraints", "audit"),
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-pack verification in one plan: primary-key
    uniqueness (orders, events), referential integrity
    (orders→customer, lineitem→orders, lineitem→part — LEFT ANTI
    joins), null-key and domain checks, and the derived-column
    consistency the fixtures guarantee (n_chars = length(text)).
    Returns (check_no, check_name, n_violations) per check — the
    verify step (`insert.ps1` batch verification / D5) run as a
    single declarative report. Status is derivable (0 = PASS) and
    deliberately not a separate column: violation COUNTS are what an
    operator alarms on.

    Scale: uniqueness/null/domain checks are one map-side-combined
    agg per table scan; FK checks shuffle only the key columns into
    anti-joins (broadcast when the parent side is small). The eight
    1-row aggregates union — Spark runs the independent branches
    concurrently."""

    def one(no: int, name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(no).alias("check_no"),
            F.lit(name).alias("check_name"),
            F.col("v").cast("bigint").alias("n_violations"),
        )

    orders = load(spark, sf_dir, "orders")
    events = load(spark, sf_dir, "events")
    lineitem = load(spark, sf_dir, "lineitem")
    customer = load(spark, sf_dir, "customer")
    part = load(spark, sf_dir, "part")
    documents = load(spark, sf_dir, "documents")

    checks = [
        one(
            1,
            "orders_pk_unique",
            orders.agg(
                (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("v")
            ),
        ),
        one(
            2,
            "events_pk_unique",
            events.agg(
                (F.count(F.lit(1)) - F.count_distinct("event_id")).alias("v")
            ),
        ),
        one(
            3,
            "orders_custkey_fk",
            orders.join(
                customer.select(F.col("c_custkey").alias("o_custkey")),
                "o_custkey",
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("v")),
        ),
        one(
            4,
            "lineitem_orderkey_fk",
            lineitem.join(
                orders.select(F.col("o_orderkey").alias("l_orderkey")),
                "l_orderkey",
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("v")),
        ),
        one(
            5,
            "lineitem_partkey_fk",
            lineitem.join(
                part.select(F.col("p_partkey").alias("l_partkey")),
                "l_partkey",
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("v")),
        ),
        one(
            6,
            "orders_custkey_not_null",
            orders.agg(F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("v")),
        ),
        one(
            7,
            "documents_nchars_consistent",
            documents.agg(
                F.count(F.when(F.col("n_chars") != F.length("text"), 1)).alias("v")
            ),
        ),
        one(
            8,
            "lineitem_qty_positive",
            lineitem.agg(F.count(F.when(F.col("l_quantity") <= 0, 1)).alias("v")),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
