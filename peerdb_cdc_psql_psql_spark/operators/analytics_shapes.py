"""Classic warehouse analytics shapes, round 2 (TPC-H Q3/Q5/Q6/Q9/
Q10/Q12/Q14/Q15/Q16/Q17/Q19/Q20 adapted to the fixture star schema).

Together with joins.py (Q1-lookalike pricing_summary, Q2, Q4, Q7, Q8,
Q11, Q13, Q18, Q21, Q22) this completes coverage of all 22 canonical
TPC-H query SHAPES — each re-expressed against the fixture columns
(the fixtures carry no partsupp / l_shipmode / l_commitdate /
p_container, so those queries are adapted: Q9's supply cost becomes a
retail-price cost proxy, Q12's ship mode becomes a ship-delay band,
Q16/Q20's availqty becomes shipped-quantity evidence from lineitem).

Why these matter for THIS engine: the reference's users run exactly
these report styles over replicated OLTP tables (SURVEY.md §1.2 —
reconciliation, backlog, priority and revenue reports over
orders/lineitem-shaped CDC targets); each function's docstring names
the scale-critical plan property, and tests/test_plans.py pins it.

Engine-parity discipline (see joins.py): decimal-exact money sums,
floored-bp ratios, IEEE double only for final display columns or
single divisions, BIGINT casts wherever DuckDB would otherwise
promote to HUGEINT, and deterministic tiebreaks on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

_DEC = "decimal(38,6)"


def _rev(col_price="l_extendedprice", col_disc="l_discount"):
    return (F.col(col_price) * (1 - F.col(col_disc))).cast(_DEC)


@register(
    "shipping_priority_topn",
    oracle="""
WITH r AS (
  SELECT l.l_orderkey,
         SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS rev,
         o.o_orderdate, o.o_orderpriority
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-06-01'
    AND l.l_shipdate  > TIMESTAMP '1998-06-01'
  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
)
SELECT l_orderkey, CAST(rev AS DOUBLE) AS revenue, o_orderdate, o_orderpriority
FROM r
ORDER BY rev DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
""",
    tags=("J2", "W3", "A6", "topn"),
)
def shipping_priority_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-order backlog by revenue (the TPC-H-Q3 shipping-
    priority shape): the ten highest-revenue orders from one market
    segment that were PLACED before the cutoff but still have lines
    shipping after it — the "what should we expedite" report, the
    analytics twin of the reference's pending-replication backlog view
    (monitoring.ps1:576-627 lag rows).

    Scale: all three predicates are pre-join scan filters (segment on
    customer, date cuts on orders/lineitem — PushedFilters), so the
    two fact shuffles carry only backlog candidates. The top-10 is a
    TakeOrderedAndProject (per-partition heap + driver merge of 10-row
    heads), never a global sort. Revenue sorts on the exact DECIMAL
    with (date, orderkey) tiebreaks — the LIMIT frontier cannot flip
    on float summation order or partition layout."""
    cutoff = "1998-06-01"
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", _rev().alias("rev"))
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"], "left_semi")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev").alias("rev"))
        .orderBy(F.desc("rev"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.col("rev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@register(
    "regional_local_revenue",
    oracle="""
SELECT n.n_name,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
            AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
    tags=("J2", "A6", "star", "local"),
)
def regional_local_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume per nation (the TPC-H-Q5 shape): revenue
    in one region and year restricted to DOMESTIC trade — lines whose
    supplier sits in the customer's own nation. The defining feature
    is the non-key equality s_nationkey = c_nationkey riding on the
    supplier join.

    Scale: region⋈nation collapses to a broadcast list of ASIA nation
    keys that prunes customers BEFORE the fact joins; the year cut is
    a pushed scan filter on orders. The domestic constraint is an
    extra integer equality evaluated inside the supplier hash join —
    no second shuffle, no post-join filter pass over the full fact.
    Output is |nations in region| rows from map-side-combined decimal
    partials."""
    asia_nations = F.broadcast(
        load(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(asia_nations, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev().alias("rev")
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            sup,
            (li["l_suppkey"] == sup["s_suppkey"])
            & (sup["s_nationkey"] == cust["c_nationkey"]),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


@register(
    "forecast_revenue_delta",
    oracle="""
SELECT COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))
            AS DOUBLE) AS forgone_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("P2", "A6", "scan"),
)
def forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting-revenue-change (the TPC-H-Q6 shape): the revenue
    that WOULD have been collected had mid-band discounts on
    small-quantity lines been dropped — SUM(extendedprice × discount)
    under a date-range + discount-band + quantity cut. The canonical
    "pure scan-aggregate": no join, no window, one output row.

    Scale: this is the query where pushdown is the whole game — all
    three predicates (two range, one band) must reach the parquet
    reader as PushedFilters so row groups outside the ship-date year
    are never decoded (plan-pinned). What survives flows into a
    map-side-combined single-cell aggregate: zero shuffle rows beyond
    one partial per task. Money goes through DECIMAL(38,6); the
    discount-band compare runs on the stored float64 values
    identically in both engines (no re-rounding)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(_DEC))
        .cast("double")
        .alias("forgone_revenue"),
    )


@register(
    "product_profit_by_nation",
    oracle="""
WITH p AS (
  SELECT n.n_name AS nation,
         EXTRACT(YEAR FROM o.o_orderdate) AS yr,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
           - CAST(pt.p_retailprice * 0.6 * l.l_quantity AS DECIMAL(38,6)) AS amount
  FROM lineitem l
  JOIN part pt     ON l.l_partkey = pt.p_partkey
  JOIN supplier s  ON l.l_suppkey = s.s_suppkey
  JOIN nation n    ON s.s_nationkey = n.n_nationkey
  JOIN orders o    ON l.l_orderkey = o.o_orderkey
  WHERE pt.p_name LIKE 'red %'
)
SELECT nation, yr, COUNT(*) AS n_lines,
       CAST(SUM(amount) AS DOUBLE) AS profit
FROM p GROUP BY nation, yr
""",
    tags=("J2", "A6", "star", "profit"),
)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (the TPC-H-Q9 shape): profit per supplier
    nation and order year over one product family selected by a name
    pattern — revenue minus cost, where the fixture has no partsupp so
    unit cost is proxied as 60% of retail price (adaptation documented
    in the module docstring).

    Scale: the LIKE filter prunes part FIRST; joining the shrunken
    part side into lineitem lets AQE broadcast it (survivors ≈ 1/6 of
    an already dim-sized table), so only order keys of matching lines
    reach the orders shuffle. nation broadcasts onto supplier; the
    supplier side itself is SF-proportional and carries no hint —
    Spark sizes it at runtime (a forced broadcast would OOM at 100 TB). Profit is
    a DIFFERENCE of two decimals, computed per-line then map-side
    partial-summed — never float, so the nation-year cells are exact
    and layout-independent."""
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red %"))
        .select("p_partkey", "p_retailprice")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("bigint").alias("yr")
    )
    sup_nation = (
        load(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    amount = _rev() - (
        F.col("p_retailprice") * F.lit(0.6) * F.col("l_quantity")
    ).cast(_DEC)
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(sup_nation, li["l_suppkey"] == sup_nation["s_suppkey"])
        .select("nation", "yr", amount.alias("amount"))
        .groupBy("nation", "yr")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("amount").cast("double").alias("profit"),
        )
    )


@register(
    "returned_item_report",
    oracle="""
WITH r AS (
  SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
         SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS rev
  FROM customer c
  JOIN orders o   ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
    AND o.o_orderdate <  TIMESTAMP '1997-10-01'
    AND l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
)
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(rev AS DOUBLE) AS lost_revenue
FROM r
ORDER BY rev DESC, c_custkey ASC
LIMIT 20
""",
    tags=("J2", "W3", "A6", "topn"),
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (the TPC-H-Q10 shape): the twenty
    customers who returned the most revenue in one quarter — the
    "who is hurting us" churn report over the return flag the
    reference's CDC pipeline replicates line-by-line.

    Scale: the quarter cut pushes to the orders scan and the
    return-flag cut to the lineitem scan BEFORE their join, so the
    customer-side shuffle carries one quarter of returned lines only.
    nation broadcasts onto the customer dim. Top-20 is a
    TakeOrderedAndProject over the exact decimal with a custkey
    tiebreak — deterministic at any partitioning."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = F.broadcast(
        load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1997-07-01")
            & (F.col("o_orderdate") < "1997-10-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", _rev().alias("rev"))
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum("rev").alias("rev"))
        .orderBy(F.desc("rev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name", "c_acctbal", "n_name",
            F.col("rev").cast("double").alias("lost_revenue"),
        )
    )


@register(
    "late_delivery_priority_mix",
    oracle="""
WITH lines AS (
  SELECT CASE WHEN l.l_shipdate >  o.o_orderdate + INTERVAL 60 DAY THEN 'SLOW'
              WHEN l.l_shipdate >  o.o_orderdate + INTERVAL 21 DAY THEN 'NORMAL'
              ELSE 'FAST' END AS ship_band,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS is_critical
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
)
SELECT ship_band,
       CAST(COALESCE(SUM(is_critical), 0) AS BIGINT) AS critical_lines,
       CAST(COUNT(*) - COALESCE(SUM(is_critical), 0) AS BIGINT) AS normal_lines
FROM lines GROUP BY ship_band
""",
    tags=("J2", "A11", "F16", "case"),
)
def late_delivery_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority mix per delivery-speed band (the TPC-H-Q12 shipping-
    mode shape, adapted: the fixture has no l_shipmode, so lines are
    banded by ship delay — FAST ≤21d, NORMAL ≤60d, SLOW beyond — the
    derived "mode"). Answers Q12's actual question: are critical-
    priority orders riding the slow path?

    Scale: Q12's signature is the CASE-conditional double count inside
    ONE aggregation — both counters partial-agg map-side into ≤3
    cells; no second pass, no pivot shuffle. The year cut pushes to
    the lineitem scan; the band expression is pure codegen on the
    joined row. BIGINT casts keep DuckDB's SUM from drifting to
    HUGEINT (harness type parity)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .select("l_orderkey", "l_shipdate")
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay_days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    band = (
        F.when(delay_days > 60, F.lit("SLOW"))
        .when(delay_days > 21, F.lit("NORMAL"))
        .otherwise(F.lit("FAST"))
    )
    critical = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(band.alias("ship_band"), critical.alias("is_critical"))
        .groupBy("ship_band")
        .agg(
            F.coalesce(F.sum("is_critical"), F.lit(0))
            .cast("bigint")
            .alias("critical_lines"),
            (F.count(F.lit(1)) - F.coalesce(F.sum("is_critical"), F.lit(0)))
            .cast("bigint")
            .alias("normal_lines"),
        )
    )


@register(
    "promo_revenue_share",
    oracle="""
WITH m AS (
  SELECT CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)) AS rev,
         p.p_type
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
    AND l.l_shipdate <  TIMESTAMP '1997-10-01'
)
SELECT COUNT(*) AS n_lines,
       CAST(SUM(rev) AS DOUBLE) AS total_revenue,
       CAST(FLOOR(CAST(COALESCE(SUM(rev) FILTER (WHERE p_type = 'PROMO'), 0)
                       AS DOUBLE) * 10000.0
                  / CAST(SUM(rev) AS DOUBLE)) AS BIGINT) AS promo_share_bp
FROM m
""",
    tags=("J2", "A9", "share"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effect share (the TPC-H-Q14 shape): PROMO-typed
    parts' revenue as floored bp of all revenue shipped in one month —
    the conditional-numerator/common-denominator pattern in a single
    aggregation (no second scan, no join between two aggregates).

    Scale: the one-month cut pushes to the lineitem scan (≈1/60 of the
    fact survives); part contributes only (key, type). Both sums are
    decimal partials combined map-side into ONE cell; the single bp
    division at the end is IEEE-identical in both engines."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-09-01")
            & (F.col("l_shipdate") < "1997-10-01")
        )
        .select("l_partkey", _rev().alias("rev"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    m = li.join(part, li["l_partkey"] == part["p_partkey"])
    total = F.sum("rev")
    promo = F.coalesce(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev"))),
        F.lit(0).cast(_DEC),
    )
    return m.agg(
        F.count(F.lit(1)).alias("n_lines"),
        total.cast("double").alias("total_revenue"),
        F.floor(promo.cast("double") * 10000.0 / total.cast("double"))
        .cast("bigint")
        .alias("promo_share_bp"),
    )


@register(
    "top_supplier_by_revenue",
    oracle="""
WITH s_rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.rev AS DOUBLE) AS total_revenue
FROM s_rev r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.rev = (SELECT MAX(rev) FROM s_rev)
""",
    tags=("J2", "A2", "argmax"),
)
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (the TPC-H-Q15 view-over-max shape): the
    supplier(s) whose quarterly shipped revenue EQUALS the global
    maximum — Q15's correlated "= (SELECT MAX(...))" decorrelated into
    aggregate → 1-row global max → broadcast equality.

    Scale: the per-supplier aggregate is computed ONCE and reused for
    both the max and the final filter (persist-free: Spark reuses the
    exchange; DuckDB materializes the CTE). The global max is a 1-row
    broadcast, never a second shuffle of the aggregate. Equality
    compares exact decimals — ties surface every argmax row instead of
    an arbitrary winner, and the answer cannot flip on float noise."""
    s_rev = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("rev"))
    )
    mx = s_rev.agg(F.max("rev").alias("max_rev"))
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s_rev.join(F.broadcast(mx), F.col("rev") == F.col("max_rev"))
        .join(sup, F.col("l_suppkey") == sup["s_suppkey"])
        .select(
            "s_suppkey", "s_name", F.col("rev").cast("double").alias("total_revenue")
        )
    )


@register(
    "part_supplier_breadth",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT p.p_brand, p.p_type, p.p_size, l.l_suppkey
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand <> 'Brand#4'
    AND p.p_type  <> 'PROMO'
    AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
)
SELECT p_brand, p_type, p_size,
       CAST(COUNT(*) AS BIGINT) AS supplier_cnt
FROM pairs GROUP BY p_brand, p_type, p_size
""",
    tags=("J2", "A3", "U1", "distinct"),
)
def part_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier breadth per part family (the TPC-H-Q16 parts/supplier-
    relationship shape, adapted: no partsupp table, so "can supply" is
    evidenced by having actually shipped the part in lineitem):
    COUNT(DISTINCT supplier) per (brand, type, size) outside an
    excluded brand/type, for a fixed size list.

    Scale: the COUNT(DISTINCT) is the explicit two-phase form — a
    pre-DISTINCT on (brand, type, size, suppkey) spreads the dedup
    across the cluster keyed by the full tuple, then a plain COUNT per
    family (the salted_distinct_agg discipline: no single hot
    reducer, no Expand). The brand/type/size cuts push to the part
    scan and shrink it BEFORE the fact join."""
    part = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#4")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("supplier_cnt"))
    )


@register(
    "small_quantity_order_revenue",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(38,3))) AS sum_qty,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
            AS DOUBLE) AS avg_weekly_revenue
FROM lineitem l
JOIN part p    ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#7'
JOIN avg_qty a ON l.l_partkey = a.l_partkey
WHERE CAST(l.l_quantity AS DECIMAL(38,3)) * 2 * a.cnt < a.sum_qty
""",
    tags=("J2", "A6", "decorrelated"),
)
def small_quantity_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (the TPC-H-Q17 correlated-average
    shape): revenue locked in one brand's lines whose quantity is
    below HALF that part's average line quantity — expressed weekly.

    Scale: the textbook form re-scans lineitem per part (correlated
    AVG subquery); here it is decorrelated into ONE per-part aggregate
    joined back on the part key — the same two-shuffle shape as
    min_cost_supplier (Q2). The below-half-average test is integer-
    exact: qty × 2 × count < sum(qty) over DECIMAL — no float average
    whose rounding could flip rows near the threshold, so Spark and
    DuckDB keep identical frontiers. The single /7 display division
    happens once, in IEEE double, after the exact sum."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(38,3)").alias("qty"),
        F.col("l_extendedprice").cast(_DEC).alias("price"),
    )
    brand_parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#7")
        .select("p_partkey")
    )
    avg_qty = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    target = li.join(
        brand_parts, li["l_partkey"] == brand_parts["p_partkey"], "left_semi"
    )
    return (
        target.join(avg_qty, "l_partkey")
        .filter(F.col("qty") * 2 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum("price").cast("double") / 7.0)
            .cast("double")
            .alias("avg_weekly_revenue"),
        )
    )


@register(
    "bracketed_revenue",
    oracle="""
SELECT COUNT(*) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
            AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1  AND 15
       AND l.l_quantity BETWEEN 1  AND 11)
   OR (p.p_brand = 'Brand#8'  AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    tags=("P2", "J2", "A6", "disjunct"),
)
def bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted-revenue brackets (the TPC-H-Q19 OR-of-ANDs shape):
    revenue from three (brand, size-range, quantity-range) brackets —
    the disjunctive predicate that defeats naive pushdown unless the
    engine splits it per side.

    Scale: the predicate is a conjunct-per-side decomposition — the
    part side pre-filters on the DISJUNCTION of its brand/size
    conjuncts (pushable to the part scan: survivors ≈ 3 brands), the
    lineitem side on the disjunction of quantity ranges (quantity ≤ 30
    covers all brackets), and the exact three-way bracket predicate
    evaluates inside the join. Neither fact ships rows that no bracket
    could accept."""
    part = (
        load(spark, sf_dir, "part")
        .filter(
            ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 15))
            | ((F.col("p_brand") == "Brand#8") & F.col("p_size").between(10, 30))
            | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(20, 50))
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").between(1, 30))
        .select("l_partkey", "l_quantity", _rev().alias("rev"))
    )
    bracket = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#8")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .filter(bracket)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


@register(
    "excess_shipment_suppliers",
    oracle="""
WITH shipped AS (
  SELECT l.l_suppkey, l.l_partkey,
         SUM(CAST(l.l_quantity AS DECIMAL(38,3))) AS qty
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '% bolt'
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING SUM(CAST(l.l_quantity AS DECIMAL(38,3))) > 55
)
SELECT s.s_name, n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_heavy_parts,
       CAST(SUM(qty) AS DOUBLE) AS total_qty
FROM shipped sh
JOIN supplier s ON sh.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
GROUP BY s.s_name, n.n_name
""",
    tags=("J2", "J3", "A2", "having"),
)
def excess_shipment_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-shipment suppliers for one product family (the TPC-H-Q20
    potential-part-promotion shape, adapted: no partsupp.availqty, so
    "holds excess stock" is evidenced by shipping >55 units of a
    family part within the year): per supplier, how many family parts
    they shipped heavily and the total moved.

    Scale: Q20's nested IN-chains decorrelate into one keyed
    aggregate — family parts prune via a semi-joinable part filter
    BEFORE the fact aggregation, the HAVING cut runs on the
    (supplier, part) aggregate before any dim join, and supplier/
    nation attach to the tiny survivor set (nation broadcast). Decimal
    quantity keeps the >55 frontier exact."""
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("% bolt"))
        .select("p_partkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .select(
            "l_suppkey", "l_partkey",
            F.col("l_quantity").cast("decimal(38,3)").alias("qty"),
        )
    )
    shipped = (
        li.join(part, li["l_partkey"] == part["p_partkey"], "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("qty").alias("qty"))
        .filter(F.col("qty") > 55)
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = F.broadcast(
        load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        shipped.join(sup, shipped["l_suppkey"] == sup["s_suppkey"])
        .join(nation, sup["s_nationkey"] == nation["n_nationkey"])
        .groupBy("s_name", "n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_heavy_parts"),
            F.sum("qty").cast("double").alias("total_qty"),
        )
    )


@register(
    "open_order_concurrency",
    oracle="""
WITH spans AS (
  SELECT o_orderpriority,
         CAST(o_orderdate AS DATE) AS d0,
         CAST(o_orderdate AS DATE)
           + CAST(substr(o_orderpriority, 1, 1) AS INTEGER) * 7 AS d1
  FROM orders
),
ev AS (
  SELECT o_orderpriority, d0 AS d, 1 AS delta, 1 AS starts FROM spans
  UNION ALL
  SELECT o_orderpriority, d1 + 1, -1, 0 FROM spans
),
byday AS (
  SELECT o_orderpriority, d, SUM(delta) AS delta, SUM(starts) AS starts
  FROM ev GROUP BY 1, 2
),
run AS (
  SELECT o_orderpriority, d, starts,
         SUM(delta) OVER (PARTITION BY o_orderpriority ORDER BY d)
           AS inflight,
         SUM(starts) OVER (PARTITION BY o_orderpriority) AS n_orders
  FROM byday
)
SELECT o_orderpriority AS priority,
       CAST(inflight AS BIGINT) AS peak_open,
       d AS peak_first_date,
       CAST(n_orders AS BIGINT) AS n_orders
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_orderpriority ORDER BY inflight DESC, d
  ) AS rn FROM run
) WHERE rn = 1
""",
    tags=("window", "interval", "sweep-line"),
)
def open_order_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line max-concurrency — the classic interval question
    ("how many X were open at once?") that naive self-joins answer in
    O(n²). Each order holds an open interval [orderdate, orderdate +
    priority-class-derived fulfillment window]; the sweep unpivots to
    ±1 boundary events, pre-aggregates per (priority, day) — so the
    running-sum window sees DAYS, not rows: bounded state however
    many orders share a date — and one cumulative sum gives the
    in-flight load. Peak + first date it is reached come from a
    row_number over the SAME partitioning (no extra shuffle: the
    day-agg, both windows, and the rank all reuse one hash partition
    by priority). At 100 TB the per-partition row count is bounded by
    the date span (~2.5k days), so the window state stays tiny no
    matter how the fact table grows."""
    spans = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.to_date("o_orderdate").alias("d0"),
        F.date_add(
            F.to_date("o_orderdate"),
            F.substring("o_orderpriority", 1, 1).cast("int") * 7,
        ).alias("d1"),
    )
    ev = spans.select(
        "o_orderpriority", F.col("d0").alias("d"),
        F.lit(1).alias("delta"), F.lit(1).alias("starts"),
    ).unionByName(
        spans.select(
            "o_orderpriority", F.date_add("d1", 1).alias("d"),
            F.lit(-1).alias("delta"), F.lit(0).alias("starts"),
        )
    )
    byday = ev.groupBy("o_orderpriority", "d").agg(
        F.sum("delta").alias("delta"), F.sum("starts").alias("starts")
    )
    from pyspark.sql import Window

    w_run = Window.partitionBy("o_orderpriority").orderBy("d")
    w_all = Window.partitionBy("o_orderpriority")
    run = byday.select(
        "o_orderpriority", "d",
        F.sum("delta").over(w_run).alias("inflight"),
        F.sum("starts").over(w_all).alias("n_orders"),
    )
    w_rank = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("inflight"), F.asc("d")
    )
    return (
        run.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("inflight").cast("bigint").alias("peak_open"),
            F.col("d").alias("peak_first_date"),
            F.col("n_orders").cast("bigint").alias("n_orders"),
        )
    )
