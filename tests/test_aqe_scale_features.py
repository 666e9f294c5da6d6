"""AQE / runtime-filtering posture tests: demonstrate (with thresholds
scaled down to fixture size) that the session configuration this
engine ships (session.py: AQE on, skew-join on) actually engages the
two runtime defenses a 100 TB cluster depends on:

- OptimizeSkewedJoin: a hot join key must be SPLIT into subpartitions
  at runtime (the `skew=true` marker) instead of melting one reducer.
- Runtime bloom-filter injection: a selective dimension filter should
  propagate a `might_contain` probe into the fact scan side, cutting
  shuffle input before the join.

These features only trigger above size thresholds meant for real
clusters; the tests lower the thresholds (never the semantics) so the
behavior is observable at fixture scale, and restore every conf.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_aqe_splits_skewed_join(spark):
    left = spark.range(0, 300_000).select(
        F.when(F.col("id") < 290_000, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("payload_"), F.col("id")).alias("pl"),
    )
    right = spark.range(0, 64).select(
        F.col("id").alias("k"), F.lit("dim").alias("d")
    )
    with _confs(
        spark,
        **{
            "spark__sql__adaptive__skewJoin__skewedPartitionFactor": "2",
            "spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes": "64KB",
            "spark__sql__adaptive__advisoryPartitionSizeInBytes": "32KB",
            "spark__sql__autoBroadcastJoinThreshold": "-1",
            "spark__sql__adaptive__autoBroadcastJoinThreshold": "-1",
            "spark__sql__shuffle__partitions": "8",
        },
    ):
        df = left.join(right, "k")
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, (
        "AQE did not split the hot key — skew join handling is off:\n"
        + plan[:4000]
    )


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """A selective filter on the build side should inject a bloom
    `might_contain` probe into the fact side before its shuffle."""
    fact = spark.range(0, 500_000).select(
        (F.col("id") % 50_000).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") % 977).alias("attr")
    )
    with _confs(
        spark,
        **{
            "spark__sql__optimizer__runtime__bloomFilter__enabled": "true",
            "spark__sql__optimizer__runtime__bloomFilter__creationSideThreshold": "100MB",
            "spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold": "0",
            "spark__sql__autoBroadcastJoinThreshold": "-1",
            "spark__sql__adaptive__autoBroadcastJoinThreshold": "-1",
        },
    ):
        df = fact.join(dim.filter(F.col("attr") == 3), "k")
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan or "bloom_filter_agg" in plan, (
        "no runtime bloom filter was injected:\n" + plan[:4000]
    )
