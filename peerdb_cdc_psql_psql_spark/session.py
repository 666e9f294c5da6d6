"""SparkSession factory tuned for the engine.

Scale posture (100 TB target, tested on local[N]):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting
  replaces any hand-tuned partition counts.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle and are cluster-location-independent.
- Arrow enabled for the (rare) Pandas-UDF paths — vectorized batch
  transfer instead of row-at-a-time pickling.
- Broadcast threshold left at default (10 MB); dimension tables in the
  star schema (region/nation/supplier/part at any SF we join them) are
  broadcast explicitly with hints where we *know* they are small.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "4"))


def get_spark(
    app_name: str = "peerdb-cdc-psql-psql-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``shuffle_partitions`` defaults to the core count: correct for
    local test scale; on a real cluster AQE coalescing makes the
    initial number mostly irrelevant as long as it is not tiny.
    """
    n = cpus or default_parallelism()
    sp = shuffle_partitions or n
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Start every shuffle WIDE and let AQE coalesce down (r10):
        # with reducer count pinned to the core count, a stage whose
        # working set grows past executor memory tips into hash-agg
        # spill + sort — the r9 customer_similarity_topk probe supra-
        # linearity was exactly this (pair volume measured ×4.0 at 4×
        # corpus, pair-stage wall ×5.3). 8× headroom keeps per-reducer
        # state bounded as data scales while AQE folds small stages
        # back to core-count partitions; measured: probe heavies ~2×
        # faster at 4×, headline suite 13.9 → 12.6 s. The same posture
        # is the correct 1000-executor default — initialPartitionNum
        # scales with the cluster, the coalesce target with the data.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(8 * sp),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE size CACHED plan output too (r13, guide §2.2/§2.4):
        # by default (false) a persist() materializes at the pre-AQE
        # width — under the wide-start default above that is 8×cores
        # partitions — and, because a cache's output partitioning is
        # then frozen, EVERY downstream stage over it runs that many
        # tasks. The iterative operators (BFS rounds, PageRank's 6
        # unrolled rounds, connected-components folds, BPE merge
        # rounds) re-scan their small persisted state dozens of times,
        # so the frozen 256-task width turned each tiny round into a
        # full task wave: measured at sf0.1/local[32], graph_bfs_levels
        # 18-29 s → 10-12 s, pagerank_bipartite 6.5-8.6 → 4.7,
        # dedup_clusters 5-9 → 2.7-3.6, bpe_train −30%, with the
        # non-iterative heavies unchanged. Scale-correct by
        # construction: AQE coalesces cache partitions BY SIZE, so a
        # 4× corpus keeps proportionally more partitions (the probe's
        # weak-scaling story is preserved, not gamed), and explicit
        # repartition(n, cols) pins (part_triangle_stats) are
        # user-specified and never coalesced.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        # Runtime bloom-filter pushdown: for selective joins the build
        # side's keys prune the probe-side SCAN before the shuffle —
        # at 100 TB this is the difference between shuffling the whole
        # fact table and shuffling the matching slice. No effect at
        # local fixture scale (thresholds gate injection), free
        # headroom on a real cluster.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "false")
        # Local-mode heap: the driver JVM IS the whole engine (all 32
        # task threads' shuffle/agg state live here). 4g starved at
        # probe scale — TaskMemoryManager page-allocation failures +
        # GCLocker retry storms turned linear pair streams into 2-4×
        # wall-clock lotteries (r10 measurement: customer_similarity
        # t4 15 s clean vs 30-70 s stalling on byte-identical plans).
        # 16g on the 128 GiB test box removes the stalls; on a real
        # cluster executor memory is sized per node and this knob is
        # driver-only.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    return builder.getOrCreate()
