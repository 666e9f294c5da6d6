"""Graph operators: deterministic PageRank over the bipartite
customer↔supplier purchase graph.

The engine's other iterative graph algorithm (`dedup.connected_
components`, Kiveris et al. large-star/small-star) converges by a
data-dependent fixpoint and therefore runs as a driver loop. PageRank
here takes the OTHER idiomatic Spark shape for iteration: a FIXED
number of rounds unrolled into one declarative plan — no driver-side
collect, no lineage checkpointing, and Catalyst's ReuseExchange
deduplicates the repeated edge-subplan across rounds. Fixed-round
unrolling is exactly how production ranking pipelines bound cost; the
round count is a knob, not a convergence test.

Determinism discipline (the repo-wide engine-parity rule): ranks are
integer micro-units. Per-edge contributions use integer division
(rank // out_degree), the damping step is (85·s)//100 + 150000 —
integer sums are exactly associative/commutative, so any partitioning,
layout, or engine produces bit-identical ranks, and the DuckDB oracle
is the same arithmetic unrolled as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

_PR_ROUNDS = 6
_PR_INIT = 1_000_000  # initial rank in micro-units
_PR_TOP = 32


def _pagerank_oracle() -> str:
    """Unrolled integer-PageRank oracle: r0 → r6 as chained CTEs."""
    parts = [
        """
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT u AS src, v AS dst FROM pairs
  UNION ALL
  SELECT v AS src, u AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank_micro FROM deg)"""
    ]
    for i in range(_PR_ROUNDS):
        parts.append(
            f""",
r{i + 1} AS (
  SELECT e.dst AS node,
         150000 + (85 * CAST(SUM(r.rank_micro // d.deg) AS BIGINT)) // 100
           AS rank_micro
  FROM edges e
  JOIN r{i} r ON r.node = e.src
  JOIN deg d ON d.src = e.src
  GROUP BY e.dst
)"""
        )
    parts.append(
        f"""
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       node // 2 AS entity_key,
       rank_micro
FROM r{_PR_ROUNDS}
ORDER BY rank_micro DESC, node ASC
LIMIT {_PR_TOP}"""
    )
    return "".join(parts)


@register(
    "pagerank_bipartite",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative", "J2"),
)
def pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite customer↔supplier purchase graph
    (edges = distinct (customer, supplier) pairs evidenced by a
    lineitem, walked in both directions): which entities sit at the
    center of the trade network. Six damped rounds (d=0.85) unrolled
    into ONE declarative plan — the fixed-round alternative to the
    driver-loop shape `connected_components` uses, with zero
    driver-side iteration state.

    Determinism: integer micro-unit ranks; per-edge contribution is
    rank//deg (integer division), damping is (85·s)//100 + 150000 —
    all-integer arithmetic is exactly order-independent, so the
    result is bit-identical on any engine/partitioning (floating
    PageRank would drift by summation order).

    Scale: the fact-sized stage is the one distinct (cust, supp)
    projection; the persisted per-round relation is the HALF-SIZE
    pair table with both side degrees attached (u, v, deg_u, deg_v) —
    contributions flow both directions over it, so no doubled edge
    union ever materializes. Every round shuffles only (node,
    contribution) pairs — two BIGINTs. The rank and degree tables are
    |customers|+|suppliers| rows and SF-proportional, so no broadcast
    hint is forced (the L82 discipline) — AQE broadcasts them at demo
    scale and falls back to shuffled hash joins at warehouse scale."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        (F.col("o_custkey") * 2).alias("u"),
        (F.col("l_suppkey") * 2 + 1).alias("v"),
    ).distinct()
    # Per-side degrees attached to the HALF-SIZE pair table instead of
    # materializing the doubled (src, dst) union: the two degree
    # tables are |customers| / |suppliers| rows, so AQE broadcasts
    # them at demo scale (no forced hint — L82), and the one persisted
    # relation every round re-reads carries u, v, deg_u, deg_v.
    deg_u = pairs.groupBy("u").agg(F.count(F.lit(1)).alias("deg_u"))
    deg_v = pairs.groupBy("v").agg(F.count(F.lit(1)).alias("deg_v"))
    edged = pairs.join(deg_u, "u").join(deg_v, "v").persist()
    ranks = deg_u.select(
        F.col("u").alias("node"), F.lit(_PR_INIT).cast("bigint").alias("rank_micro")
    ).unionAll(
        deg_v.select(
            F.col("v").alias("node"),
            F.lit(_PR_INIT).cast("bigint").alias("rank_micro"),
        )
    )
    # Both walk directions as a lazy view over the CACHED half-size
    # table (two InMemoryTableScans, nothing doubled on disk/memory).
    # Each round references `ranks` exactly ONCE — referencing it per
    # direction doubles the unrolled plan per round (2^rounds analysis
    # blowup, the Catalyst trap the connected_components docstring
    # pins); the union-then-single-join form keeps plan growth linear.
    edges = edged.select(
        F.col("u").alias("src"), F.col("v").alias("dst"),
        F.col("deg_u").alias("deg"),
    ).unionAll(
        edged.select(
            F.col("v").alias("src"), F.col("u").alias("dst"),
            F.col("deg_v").alias("deg"),
        )
    )
    for _ in range(_PR_ROUNDS):
        contrib = edges.join(ranks, edges.src == ranks.node).select(
            F.col("dst"), F.expr("rank_micro div deg").alias("c")
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(
                (
                    F.lit(150000).cast("bigint")
                    + F.expr("(85 * sum(c)) div 100").cast("bigint")
                ).alias("rank_micro")
            )
            .select(F.col("dst").alias("node"), "rank_micro")
        )
    return (
        ranks.orderBy(F.desc("rank_micro"), F.asc("node"))
        .limit(_PR_TOP)
        .select(
            F.when(F.col("node") % 2 == 0, "customer")
            .otherwise("supplier")
            .alias("kind"),
            F.expr("node div 2").alias("entity_key"),
            "rank_micro",
        )
    )
