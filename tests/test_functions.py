"""Tests for the functions helper pack (format_bytes quirk parity,
salted skew join correctness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from peerdb_cdc_psql_psql_spark.functions import format_bytes, salted_join


def test_format_bytes_tiers(spark):
    df = spark.createDataFrame(
        [(512,), (2048,), (3 * 1024**2,), (5 * 1024**3,)], ["b"]
    )
    got = [r[0] for r in df.select(format_bytes(F.col("b"))).collect()]
    assert got == ["512 B", "2.0 KiB", "3.0 MiB", "5.0 GiB"]


def test_salted_join_matches_plain_join(spark):
    """Salting must be a pure physical rewrite: same rows out,
    including under heavy key skew."""
    # 10k rows, 90% on key 1 (the skew case salting exists for)
    big = spark.range(10000).select(
        F.when(F.col("id") % 10 != 0, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 10000, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
    ).union(spark.createDataFrame([(1, 2)], ["k", "dim"]))
    plain = big.join(small, "k").select("k", "payload", "dim")
    salted = salted_join(big, small, "k", salt_buckets=8).select("k", "payload", "dim")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_register_query_views_full_sql_surface(spark):
    """S10: every registry query is reachable as a SQL view; views
    stay lazy (registration is cheap) and compose in plain SQL."""
    from peerdb_cdc_psql_psql_spark.operators.sql_frontend import (
        register_query_views,
    )
    from peerdb_cdc_psql_psql_spark.registry import REGISTRY

    names = register_query_views(spark, "/root/testdata/sf0.001")
    n_eager = sum(1 for q in REGISTRY.values() if q.eager_build)
    assert len(names) == len(REGISTRY) - n_eager
    assert n_eager > 0  # the flagged-eager queries are skipped by default
    assert "q_dedup_clusters" not in names  # iterative loop stays deferred
    # drive two operator outputs and a cross-view join through SQL only
    assert spark.sql("SELECT * FROM q_pricing_summary").count() > 0
    top = spark.sql(
        """
        SELECT s.doc_id, s.shard, t.quality_band
        FROM q_corpus_shuffle s JOIN q_text_suite t USING (doc_id)
        WHERE s.pos <= 3
        """
    )
    assert top.count() > 0
