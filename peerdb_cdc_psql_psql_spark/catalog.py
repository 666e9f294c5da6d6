"""Typed catalog for the engine's tables.

The reference declares every schema up front (DDL-first —
``quickstart_prepare_peers.sh:25-49``); we do the same with explicit
``StructType`` per table and never rely on inference for engine tables
(SURVEY.md §1.2). Two schema families:

- The driver's TPC-H-ish parquet fixtures (FIXTURES.md §B) used for
  operator correctness against the DuckDB oracle.
- The reference CDC demo schema (customers/products/orders,
  ``quickstart_prepare_peers.sh:25-49``) used by the streaming tests.

At 100 TB the fixture keys are already LongType; scans are columnar
parquet with Catalyst pushdown — ``load`` never collects, caches, or
repartitions, so downstream operators decide the partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that are always broadcast-joinable regardless of SF
# (region: 5 rows, nation: 25 rows — fixed-size in TPC-H-style data).
BROADCAST_DIMS = ("region", "nation")

FIXTURE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            # parquet timestamp[ms] (not UTC-adjusted) → NTZ in Spark;
            # queries cast to TIMESTAMP where instant semantics matter
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),  # see o_orderdate
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# --- Reference CDC demo schema (quickstart_prepare_peers.sh:25-49) ---
# INT PKs widened to LongType for the 100 TB posture (SURVEY.md §1.2).
DEMO_SCHEMAS: dict[str, T.StructType] = {
    "customers": T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("first_name", T.StringType()),
            T.StructField("last_name", T.StringType()),
            T.StructField("email", T.StringType()),
        ]
    ),
    "products": T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType()),
            T.StructField("description", T.StringType()),
            T.StructField("weight", T.DecimalType(10, 2)),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("order_date", T.DateType()),
            T.StructField("purchaser", T.LongType()),
            T.StructField("quantity", T.LongType()),
            T.StructField("product_id", T.LongType()),
        ]
    ),
}

DEMO_PRIMARY_KEYS = {"customers": "id", "products": "id", "orders": "id"}


# Sessions already pinned (weak refs — an entry dies with its session,
# so a recycled id can never skip a NEW session's pin). Re-pinning on
# every load cost 3 py4j conf.set round trips ≈ 5.5 ms per call,
# ~4 s per bench run across ~700 loads (r14). Nothing in the engine
# unsets these confs mid-session; a caller that does must use a fresh
# session (or clear this set) before loading again.
import weakref

_PINNED_SESSIONS: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def _pin_session(spark: SparkSession) -> None:
    """Pin runtime-settable confs that correctness depends on — once
    per session object.

    The driver may hand us a session it built itself; timestamp
    comparisons against the DuckDB oracle require a fixed timezone.
    ``nanosAsLong``: the fixture ``events.ts`` column is parquet
    TIMESTAMP(NANOS), which Spark's reader otherwise rejects
    (PARQUET_TYPE_ILLEGAL); we read it as long and convert below.
    """
    if spark in _PINNED_SESSIONS:
        return
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _PINNED_SESSIONS.add(spark)


# Per-process memo of the ARRIVED parquet schema per (sf_dir, table):
# plain ``spark.read.parquet`` re-reads the file footer to infer the
# schema on EVERY load call — measured ~0.08 s per call at sf0.1,
# which multiplied across ~140 small bench queries × 1-4 loads each
# was the single largest slice of the per-query floor (VERDICT r13
# next-round #6). The schema is metadata derived once per process
# from the file itself (NOT a hand-declared schema — the events.ts
# nanos/µs generation drift keeps dispatching on what actually
# arrived), so later loads pass it explicitly and skip the footer
# read. Never caches data; results always compute from the files.
# Staleness bound: a process that overwrites a fixture path with a
# DIFFERENT schema mid-run would read wrong — the fixtures are
# deterministic per directory, and tests write to fresh tmp dirs.
_SCHEMA_MEMO: dict[tuple[str, str], T.StructType] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a typed DataFrame (columnar scan;
    filters/projections placed on top push down into the parquet
    reader via Catalyst)."""
    if name not in FIXTURE_SCHEMAS:
        raise KeyError(f"unknown fixture table: {name}")
    _pin_session(spark)
    path = f"{sf_dir}/{name}.parquet"
    key = (sf_dir, name)
    sch = _SCHEMA_MEMO.get(key)
    if sch is None:
        sch = spark.read.parquet(path).schema  # one footer read
        _SCHEMA_MEMO[key] = sch
    df = spark.read.schema(sch).parquet(path)
    if name == "events":
        df = normalize_events_ts(df)
        df = df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the fixture ``events.ts`` column to TimestampType.

    The driver's fixtures have shipped ``ts`` two ways across rounds:
    TIMESTAMP(NANOS) int64 (read as LongType under the pinned
    ``nanosAsLong`` conf, rounds 1-2) and plain timestamp[us]
    (TIMESTAMP_NTZ, round 3+). Dispatch on the arrived type so every
    downstream operator and oracle sees one type regardless of which
    generation wrote the parquet. Works on batch and streaming
    DataFrames alike (pure projection)."""
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        # ns→µs must be exact integer floor-division (`div`): epoch
        # nanos ~1.7e18 exceeds double's 2^53 exact range, so a float
        # division would round some rows off by ~0.4 µs vs the oracle
        # (DuckDB truncates ns→µs on read).
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # timestamp[us] parquet arrives as TIMESTAMP_NTZ; with the session
    # tz pinned to UTC the cast is value-preserving.
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table. Lazy — nothing is scanned until an
    action runs, so loading all ten costs only footer reads."""
    return {t: load(spark, sf_dir, t) for t in FIXTURE_TABLES}


def assert_schema(df: DataFrame, name: str) -> None:
    """Schema-equality check (SURVEY.md §7 M0): field names and types
    must match the declared catalog schema exactly."""
    expected = [(f.name, f.dataType) for f in FIXTURE_SCHEMAS[name].fields]
    actual = [(f.name, f.dataType) for f in df.schema.fields]
    if expected != actual:
        raise AssertionError(
            f"schema mismatch for {name}:\n expected={expected}\n actual={actual}"
        )
