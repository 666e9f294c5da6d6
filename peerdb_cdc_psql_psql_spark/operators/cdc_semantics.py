"""Batch-expressible CDC merge semantics (SURVEY.md §2.9), oracle-
checked: the ``events`` fixture acts as a change log — key=user_id,
lsn=event_id, op derived from event_type ('signup'→I, 'error'→D,
else U). The merge rule is exactly the mirror's compact-on-read
(row_number over lsn desc per key), so the DuckDB oracle validates the
same semantics the streaming path applies (streaming/cdc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

_OP = """CASE WHEN event_type = 'signup' THEN 'I'
          WHEN event_type = 'error' THEN 'D'
          ELSE 'U' END"""


def _op_col() -> F.Column:
    return (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )


@register(
    "cdc_merged_state",
    oracle=f"""
SELECT user_id, last_value, is_deleted, last_lsn FROM (
  SELECT user_id,
         value AS last_value,
         ({_OP}) = 'D' AS is_deleted,
         event_id AS last_lsn,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
    tags=("C1", "C4", "cdc"),
)
def cdc_merged_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed last-write-wins merge with soft-delete tombstones (C1/C4:
    per-PK latest change by LSN wins; DELETE flags, not removes —
    README.md:231-238 workflow, images/cdc_orders.png target shape).
    One hash shuffle on the key; rank-limit pushdown keeps per-key
    state at 1 row pre-shuffle."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    return (
        ev.select(
            "user_id",
            F.col("value").alias("last_value"),
            (_op_col() == "D").alias("is_deleted"),
            F.col("event_id").alias("last_lsn"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "cdc_sync_report",
    oracle=f"""
WITH merged AS (
  SELECT user_id, ({_OP}) = 'D' AS is_deleted,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
)
SELECT COUNT(DISTINCT user_id) AS src_keys,
       COUNT(*) FILTER (WHERE NOT is_deleted) AS live_keys,
       COUNT(*) FILTER (WHERE is_deleted) AS tombstones,
       ROUND(100.0 * COUNT(*) FILTER (WHERE NOT is_deleted) / COUNT(*), 1) AS live_pct
FROM merged WHERE rn = 1
""",
    tags=("C6", "cdc"),
)
def cdc_sync_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication accounting over merged state: distinct source keys,
    live rows, tombstones, live % (the lag/efficiency computation of
    monitoring.ps1:594-627 applied to a post-delete world — counts
    exclude tombstones, SURVEY.md §7 risk 3)."""
    merged = cdc_merged_state(spark, sf_dir)
    live = F.count(F.when(~F.col("is_deleted"), 1))
    dead = F.count(F.when(F.col("is_deleted"), 1))
    return merged.agg(
        F.count_distinct(F.col("user_id")).alias("src_keys"),
        live.alias("live_keys"),
        dead.alias("tombstones"),
        F.round(100.0 * live / F.count(F.lit(1)), 1).alias("live_pct"),
    )


@register(
    "cdc_changes_per_batch",
    oracle=f"""
SELECT event_id // 100 AS batch_id,
       COUNT(*) AS n_changes,
       COUNT(*) FILTER (WHERE ({_OP}) = 'I') AS n_inserts,
       COUNT(*) FILTER (WHERE ({_OP}) = 'U') AS n_updates,
       COUNT(*) FILTER (WHERE ({_OP}) = 'D') AS n_deletes
FROM events
GROUP BY event_id // 100
""",
    tags=("S2", "C3", "C6", "cdc"),
)
def cdc_changes_per_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-micro-batch change accounting (the StreamingQueryProgress
    numbers the reference reads off PeerDB's UI / insert.ps1:306-311
    timers): batch = lsn div 100 stands in for the 10 s sync window."""
    ev = load(spark, sf_dir, "events")
    op = _op_col()
    return ev.groupBy(F.expr("event_id div 100").alias("batch_id")).agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.count(F.when(op == "I", 1)).alias("n_inserts"),
        F.count(F.when(op == "U", 1)).alias("n_updates"),
        F.count(F.when(op == "D", 1)).alias("n_deletes"),
    )


@register(
    "xmin_incremental",
    oracle="""
SELECT user_id, COUNT(*) AS n_new_events,
       MAX(epoch_us(ts)) AS max_ts_us
FROM events
WHERE ts > TIMESTAMP '2024-01-20 00:00:00'
GROUP BY user_id
""",
    tags=("C8", "cdc"),
)
def xmin_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XMin / watermark-column incremental load (C8: PeerDB's third
    mirror mode, images/cdc.png): read only rows past the last
    watermark — a pushed-down range predicate, so parquet min/max
    statistics skip whole row groups of history at scale."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") > F.lit("2024-01-20 00:00:00").cast("timestamp"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_new_events"),
            F.max(F.unix_micros("ts")).alias("max_ts_us"),
        )
    )


_ASOF_CUT = "2024-01-15 00:00:00"


@register(
    "cdc_time_travel_diff",
    oracle=f"""
WITH snap AS (
  SELECT user_id, value AS v, ({_OP}) = 'D' AS del, event_id AS lsn
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM events WHERE ts <= TIMESTAMP '{_ASOF_CUT}'
  ) WHERE rn = 1
),
cur AS (
  SELECT user_id, value AS v, ({_OP}) = 'D' AS del, event_id AS lsn
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT c.user_id,
       CASE WHEN a.lsn IS NULL THEN 'CREATED'
            WHEN c.del AND NOT a.del THEN 'DELETED'
            ELSE 'UPDATED' END AS kind,
       a.lsn AS asof_lsn, c.lsn AS current_lsn,
       a.v AS asof_value, c.v AS current_value
FROM cur c LEFT JOIN snap a ON c.user_id = a.user_id
WHERE a.lsn IS NULL OR a.lsn <> c.lsn
""",
    tags=("C1", "C4", "C8", "cdc", "timetravel"),
)
def cdc_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time travel over the change log (the PITR audit every
    CDC consumer eventually asks for — "what changed since the
    snapshot we trained/reported on?"): reconstruct the keyed merged
    state AS OF a cutoff timestamp, diff it against the current merged
    state, and classify every drifted key as CREATED (key did not
    exist at the cutoff), DELETED (tombstoned since), or UPDATED.
    The replay needs no stored snapshots — the log IS the state at
    every point in time (streaming/cdc.py compact-on-read invariant).

    Scale: both reconstructions are the standard rank-limit merge (one
    key-hash shuffle each, per-key state collapses to 1 row
    PRE-shuffle via WindowGroupLimit); the as-of side additionally
    pushes the ts cutoff to the scan. The diff join is key-keyed equi
    on two already-hash-partitioned sides — AQE aligns the exchanges.
    Unchanged keys (the overwhelming majority in a short window) drop
    before the output; at 100 TB the result is sized by the DELTA,
    not the keyspace."""
    return time_travel_diff(spark, sf_dir, _ASOF_CUT)


def time_travel_diff(spark: SparkSession, sf_dir: str, cutoff: str) -> DataFrame:
    """Parameterized PITR diff (see ``cdc_time_travel_diff``): the
    as-of cutoff is any timestamp string; the registered query pins
    the fixture midpoint so the oracle stays literal-for-literal."""
    ev = load(spark, sf_dir, "events")

    def merged(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
        return (
            df.select(
                "user_id",
                F.col("value").alias("v"),
                (_op_col() == "D").alias("del"),
                F.col("event_id").alias("lsn"),
                F.row_number().over(w).alias("rn"),
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    asof = merged(ev.filter(F.col("ts") <= cutoff)).select(
        F.col("user_id").alias("a_user"),
        F.col("v").alias("asof_value"),
        F.col("del").alias("a_del"),
        F.col("lsn").alias("asof_lsn"),
    )
    cur = merged(ev)
    kind = (
        F.when(F.col("asof_lsn").isNull(), "CREATED")
        .when(F.col("del") & ~F.col("a_del"), "DELETED")
        .otherwise("UPDATED")
    )
    return (
        cur.join(asof, cur["user_id"] == asof["a_user"], "left")
        .filter(F.col("asof_lsn").isNull() | (F.col("asof_lsn") != F.col("lsn")))
        .select(
            "user_id",
            kind.alias("kind"),
            "asof_lsn",
            F.col("lsn").alias("current_lsn"),
            "asof_value",
            F.col("v").alias("current_value"),
        )
    )


@register(
    "noop_update_detect",
    oracle="""
WITH seq AS (
  SELECT event_type,
         props IS NOT DISTINCT FROM LAG(props)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS same_props,
         LAG(props) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           IS NOT NULL OR props IS NOT NULL AS any_value
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE same_props) AS BIGINT) AS n_noop,
       CAST(FLOOR(COUNT(*) FILTER (WHERE same_props) * 10000.0 / COUNT(*))
            AS BIGINT) AS noop_bp
FROM seq GROUP BY event_type
""",
    tags=("C1", "cdc", "null_safe"),
)
def noop_update_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-op change detection with NULL-SAFE equality: per user, an
    event whose payload IS NOT DISTINCT FROM the previous one (both
    NULL counts as equal — plain `=` returns NULL there and silently
    drops the case) is a no-op — the CDC filter that keeps ghost
    updates out of the merge and the WAL. Pins the one comparison
    semantic (`<=>` / IS NOT DISTINCT FROM) the relational pack
    hadn't: every other predicate family treats NULL as unknown.

    Scale: one lag window per user partition over (type, payload)
    columns; the rollup rides the same shuffle's output. At 100 TB
    the same expression runs inside the foreachBatch merge as a
    pre-filter (events dropped before they shuffle)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.col("props").eqNullSafe(F.lag("props").over(w)).alias("same_props"),
    )
    noop = F.count(F.when(F.col("same_props"), 1))
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        noop.cast("bigint").alias("n_noop"),
        F.floor(noop * 10000.0 / F.count(F.lit(1)))
        .cast("bigint")
        .alias("noop_bp"),
    )
