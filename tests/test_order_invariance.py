"""Order/partitioning invariance for the integer-exact curation ops.

The pack's portability discipline (floored basis points, integer
micro-units, decimal sums) claims results are identical regardless of
row order or partitioning — the property that makes reruns, retries,
and cluster-layout changes safe at 100 TB. The DuckDB parity suite
checks each op once against one layout; THIS test perturbs the input
layout (shuffled row order, prime partition count) and asserts the
output is bit-identical.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import peerdb_cdc_psql_psql_spark.operators  # noqa: F401
from peerdb_cdc_psql_psql_spark.registry import REGISTRY

INVARIANT_OPS = [
    "doc_perplexity_filter",
    "tfidf_top_terms",
    "corpus_datasheet",
    "exact_substr_spans",
    "source_overlap_matrix",
    "embedding_centroid_drift",
    "train_val_split",
    "stratified_sample",
    "funnel_analysis",
    "cohort_retention",
    "event_rate_anomaly",
    "part_cooccurrence",
    "rfm_segments",
    "min_cost_supplier",
    "revenue_concentration",
    "supplier_scorecard",
    "priority_aging",
    "brand_market_share",
    "segment_migration",
    "order_line_status_audit",
    "dau_wau_stickiness",
    "order_count_distribution",
    "large_volume_customers",
    "waiting_suppliers",
    "idle_customer_balance",
    "important_parts",
    "salted_distinct_agg",
    "gap_fill_hourly",
    "change_point_detect",
    "dedup_embedding_survivors",
    "time_weighted_avg",
    "nation_trade_flows",
    "shipping_priority_topn",
    "regional_local_revenue",
    "forecast_revenue_delta",
    "product_profit_by_nation",
    "returned_item_report",
    "late_delivery_priority_mix",
    "promo_revenue_share",
    "top_supplier_by_revenue",
    "part_supplier_breadth",
    "small_quantity_order_revenue",
    "bracketed_revenue",
    "excess_shipment_suppliers",
    "ngram_novelty_rate",
    "length_percentile_filter",
    "cumulative_unique_users",
    "cdc_time_travel_diff",
    "doc_compressibility",
    "embedding_anisotropy",
    "source_lang_diversity",
    "pattern_match_corr",
]


@pytest.fixture(scope="module")
def perturbed_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("perturbed_sf"))
    for table in (
        "documents", "embeddings", "events", "orders",
        "lineitem", "supplier", "part", "nation", "region", "customer",
    ):
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        (
            df.orderBy(F.xxhash64(*[F.col(c) for c in df.columns[:1]]))
            .repartition(7)
            .write.mode("overwrite")
            .parquet(f"{out}/{table}.parquet")
        )
    return out


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.select(*sorted(df.columns)).collect())


@pytest.mark.parametrize("name", INVARIANT_OPS)
def test_result_invariant_under_layout(spark, sf_dir, perturbed_dir, name):
    base = _rows(REGISTRY[name].fn(spark, sf_dir))
    perturbed = _rows(REGISTRY[name].fn(spark, perturbed_dir))
    assert base == perturbed, f"{name} changed under row-order/partitioning perturbation"
