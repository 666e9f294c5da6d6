"""Bucketed (pre-partitioned) tables: the co-located-join scale lever
(SURVEY.md north-star: "bucketing for co-located joins").

At 100 TB the dominant cost of fact⋈fact joins is the shuffle; writing
both sides bucketed by the join key lets Spark plan a SortMergeJoin
with NO Exchange on either side — the join becomes partition-local.
This is the Spark-native equivalent of the reference's "custom
partitioning key" mirror option (images/cdc_2.png) taken to its
conclusion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sorted_by: str | None = None,
    pre_partitioned: bool = False,
) -> None:
    """Persist a DataFrame as a bucketed managed table (parquet).
    Bucket count should be sized so one bucket ≈ one task's worth of
    data at the target SF; both join sides must use the SAME count for
    shuffle-free joins.

    The repartition below aligns write tasks with buckets: Spark's
    ``repartition(n, col)`` and its bucket-id assignment use the same
    Murmur3 ``pmod(hash(col), n)``, so each task holds exactly one
    bucket and writes exactly one file. Without it, every upstream
    task can hold rows of every bucket and the write fans out to
    (tasks × buckets) small files — a metadata storm that at 100 TB
    (thousands of tasks) makes the table unreadable-fast and at any
    scale pays per-file open/commit overhead. Callers that already
    arranged that exact partitioning (e.g. to let an upstream distinct
    ride the same hash) pass ``pre_partitioned=True`` to skip the
    redundant shuffle."""
    from pyspark.sql import functions as F

    if not pre_partitioned:
        df = df.repartition(n_buckets, F.col(bucket_col))
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
    )
    if sorted_by:
        writer = writer.sortBy(sorted_by)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
