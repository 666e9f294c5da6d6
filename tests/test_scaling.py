"""Weak-scaling guarantees for the dedup blocking path.

The 100 TB claim for near-dup is "work grows with the data, not with
its square". These tests CONSTRUCT that claim instead of timing it:
replicate the corpus K times with per-replica disjoint vocabularies
(every token suffixed `_rK`, so no shingle collides across replicas)
and assert the candidate-pair stage produces EXACTLY K× the pairs of
one replica — i.e. blocking confines the join fan-out to true
neighborhoods and adding independent data adds independent work.
A quadratic (all-pairs) formulation would grow K²× and fail loudly.

Timing-based scaling tests flake on shared CI hosts; a cardinality
identity is deterministic and pins the same property.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from peerdb_cdc_psql_psql_spark.catalog import load
from peerdb_cdc_psql_psql_spark.operators.dedup import (
    _SHINGLE_N,
    jaccard_pairs,
)

SF = "/root/testdata/sf0.001"
K = 3


def _replica_shingles(spark, k: int):
    """(doc_id, shingle) index over k disjoint-vocabulary corpus
    replicas: replica i suffixes every token with `_ri` and offsets
    doc ids by i × 10**9, so replicas share structure but no grams."""
    docs = load(spark, SF, "documents").select("doc_id", "text")
    reps = None
    for i in range(k):
        toks = F.transform(
            F.split(F.col("text"), " "), lambda t: F.concat(t, F.lit(f"_r{i}"))
        )
        r = docs.select(
            (F.col("doc_id") + i * 10**9).alias("doc_id"),
            F.concat_ws(" ", toks).alias("text"),
        )
        reps = r if reps is None else reps.unionByName(r)
    toks = F.split(F.col("text"), " ").alias("tok")
    with_tok = reps.select("doc_id", toks).filter(F.size("tok") >= _SHINGLE_N)
    from peerdb_cdc_psql_psql_spark.functions.helpers import ngram_expr

    return with_tok.select(
        "doc_id", F.explode(ngram_expr("tok", _SHINGLE_N)).alias("shingle")
    ).distinct()


def test_scale_probe_wall_time_bound(spark, tmp_path):
    """Timed weak-scaling point (VERDICT r4 next-round #6): bench.py's
    scale_probe on a 4× disjoint-vocabulary corpus. The blocked/
    bucketed paths must grow ≤ ~k× in wall time — the bound is set
    at 1.5k (6×), far below the k²=16× an all-pairs regression would
    show, and generous enough that fixed job overhead and CI noise
    (which push the ratio DOWN toward 1) never flake it."""
    import bench

    probe, legcal = bench.scale_probe(
        spark,
        "/root/testdata/sf0.01",
        4,
        str(tmp_path),
        queries=["dedup_ngram_jaccard", "dedup_clusters", "text_suite"],
    )
    bad = {n: v for n, v in probe.items() if v["ratio"] > 6.0}
    assert not bad, f"superlinear wall-time growth at 4x data: {bad}"
    # r12 leg calibration: every measurement carries an adjacent host
    # sample and the calibrated ratio rides beside the raw one
    assert legcal["samples"] == 2 * 3 * 3  # scales x passes x queries
    assert all("ratio_calibrated" in v for v in probe.values())


def test_jaccard_blocking_scales_linearly(spark):
    one = jaccard_pairs(_replica_shingles(spark, 1)).count()
    many = jaccard_pairs(_replica_shingles(spark, K)).count()
    assert one > 0, "fixture corpus must contain near-dup pairs"
    assert many == K * one, (
        f"candidate pairs grew {many / one:.1f}x for {K}x data — "
        "blocking is no longer linear in independent input"
    )


def test_candidate_stage_scales_linearly(spark):
    """The pre-aggregation candidate ROWS (the shuffle volume of the
    pair join — the actual cluster cost) must also grow K×, not K²×."""

    def candidate_rows(sh):
        a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        return a.join(b, "shingle").filter(F.col("doc_a") < F.col("doc_b")).count()

    one = candidate_rows(_replica_shingles(spark, 1))
    many = candidate_rows(_replica_shingles(spark, K))
    assert one > 0
    assert many == K * one, f"{many} != {K} x {one}"


def test_exact_dedup_groups_scale_linearly(spark):
    """Exact dedup keys on a 32-byte digest; K disjoint replicas of a
    corpus with PLANTED duplicates (the fixture corpus has none at the
    full-text level) must yield exactly K× the duplicate groups —
    digest collisions never cross replicas."""
    docs = load(spark, SF, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 5 * 10**8).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(planted)

    def dup_groups(k: int) -> int:
        reps = None
        for i in range(k):
            r = corpus.select(
                (F.col("doc_id") + i * 10**9).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" tail_r{i}")).alias("text"),
            )
            reps = r if reps is None else reps.unionByName(r)
        return (
            reps.groupBy(F.sha2(F.col("text"), 256).alias("h"))
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )

    one = dup_groups(1)
    many = dup_groups(K)
    assert one == 20, "each replica must carry exactly the planted dup groups"
    assert many == K * one


def test_replicated_relational_corpus_scales_graph_linearly(spark, tmp_path):
    """bench.build_replicated_corpus's r6 relational twin: lineitem/
    orders replicated with disjoint key offsets must grow the part
    co-purchase graph EXACTLY linearly (no cross-replica edges) and
    keep the clustering coefficient bit-identical — the precondition
    for the part_triangle_stats / customer_similarity_topk weak-
    scaling probe entries."""
    import bench
    from peerdb_cdc_psql_psql_spark.registry import REGISTRY

    d1 = bench.build_replicated_corpus(
        spark, "/root/testdata/sf0.001", 1, str(tmp_path / "x1")
    )
    d3 = bench.build_replicated_corpus(
        spark, "/root/testdata/sf0.001", 3, str(tmp_path / "x3")
    )
    r1 = REGISTRY["part_triangle_stats"].fn(spark, d1).collect()[0]
    r3 = REGISTRY["part_triangle_stats"].fn(spark, d3).collect()[0]
    for col in ("n_nodes", "n_edges", "n_wedges", "n_triangles"):
        assert r3[col] == 3 * r1[col], (col, r1[col], r3[col])
    assert r3["clustering_bp"] == r1["clustering_bp"]
