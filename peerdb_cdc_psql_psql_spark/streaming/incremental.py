"""Non-CDC mirror modes (SURVEY.md §2.9 C8 — the two other mirror-type
cards on images/cdc.png):

- **XMin sync**: incremental batch load by a monotonically increasing
  watermark column (Postgres xmin stand-in) — read only rows past the
  last high-water mark, append, advance the mark.
- **Query Replication**: periodic full SELECT re-materialization for
  tables without a usable PK or watermark.

Durability design (the reference's slot-resume invariant,
monitoring.ps1:976-988, played here by a manifest file):

- Each sync round writes to its own ``rounds/<round-id>`` dir, then
  COMMITS by atomically rewriting ``_sync_state.json`` — the manifest
  naming the high-water mark and the committed round dirs. Readers
  resolve the manifest, so an uncommitted round is invisible.
- Exactly-once effect without a transaction log: the source is
  evaluated exactly once (the write job); row count and the new
  watermark are derived from the files just written, so the mark can
  never advance past rows that didn't land. A crash before commit
  leaves an orphan round dir that the next round — deterministically
  named from the committed count — clobbers with overwrite.
- All state I/O goes through the Hadoop FileSystem API (fs.py), so a
  ``hdfs:``/``s3a:`` target keeps its resume token across process
  death — a driver-local JSON file would not.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fs

_STATE_FILE = "_sync_state.json"


def read_sync_state(spark: SparkSession, target_dir: str) -> dict:
    """Resolve sync state, falling back to the previous on-disk layout
    (`_watermark.json` + bare `data/` dir) when no manifest exists —
    a target written by the earlier engine version keeps its watermark
    (no full re-sync) and its data stays readable; `legacy_data` in
    the state carries the old dir into the manifest on first commit
    (mirrors cdc._resolve_base_dir's legacy-`base` fallback)."""
    raw = fs.read_text(spark, f"{target_dir}/{_STATE_FILE}")
    if raw is None:
        has_legacy = fs.exists(spark, f"{target_dir}/data")
        wm = None
        legacy_raw = fs.read_text(spark, f"{target_dir}/_watermark.json")
        if legacy_raw:
            try:
                parsed = json.loads(legacy_raw)
                # valid-JSON non-object (e.g. bare number) degrades to
                # no-watermark, same as unparseable content
                wm = parsed.get("high_water_mark") if isinstance(parsed, dict) else None
            except (ValueError, TypeError):
                wm = None
        return {"high_water_mark": wm, "committed": [], "legacy_data": has_legacy}
    try:
        state = json.loads(raw)
        return {
            "high_water_mark": state.get("high_water_mark"),
            "committed": list(state.get("committed", [])),
            "legacy_data": bool(state.get("legacy_data", False)),
        }
    except (ValueError, TypeError):
        return {"high_water_mark": None, "committed": [], "legacy_data": False}


def read_watermark(spark: SparkSession, target_dir: str) -> int | None:
    return read_sync_state(spark, target_dir)["high_water_mark"]


def _commit_state(spark: SparkSession, target_dir: str, state: dict) -> None:
    fs.write_text_atomic(spark, f"{target_dir}/{_STATE_FILE}", json.dumps(state))


def xmin_sync(
    spark: SparkSession,
    source: DataFrame,
    target_dir: str,
    watermark_col: str,
) -> int:
    """One XMin-mode sync round: land rows with watermark_col past the
    stored mark into a new round dir, then commit the manifest.
    Returns rows synced.

    Scale: the `>` predicate pushes into the parquet scan (row-group
    min/max skip), so each round reads only the tail — the whole point
    of xmin mode on a 100 TB table. The watermark column must be
    monotone (xmin/serial/ingest-ts)."""
    state = read_sync_state(spark, target_dir)
    mark = state["high_water_mark"]
    fresh = source if mark is None else source.filter(F.col(watermark_col) > mark)
    round_id = f"round-{len(state['committed']) + 1:06d}"
    round_dir = f"{target_dir}/rounds/{round_id}"
    # Single evaluation of the source; overwrite clobbers an orphan
    # left by a crashed earlier attempt at this same round id.
    fresh.write.mode("overwrite").parquet(round_dir)
    written = spark.read.parquet(round_dir)
    row = written.agg(
        F.count(F.lit(1)).alias("n"), F.max(watermark_col).alias("mx")
    ).collect()[0]
    n = row["n"]
    if n:
        _commit_state(
            spark,
            target_dir,
            {
                "high_water_mark": int(row["mx"]),
                "committed": [*state["committed"], round_id],
                "legacy_data": state.get("legacy_data", False),
            },
        )
    else:
        fs.delete(spark, round_dir, recursive=True)
    return n


def query_replication_sync(
    spark: SparkSession, source: DataFrame, target_dir: str
) -> int:
    """One Query-Replication round: full re-materialization (for
    PK-less tables — the reference's fallback mirror mode). The new
    round REPLACES the committed set in one atomic manifest write, so
    readers flip from the old materialization to the new one with no
    half-visible state; superseded round dirs are deleted after."""
    state = read_sync_state(spark, target_dir)
    round_id = f"full-{len(state['committed']) + 1:06d}"
    round_dir = f"{target_dir}/rounds/{round_id}"
    source.write.mode("overwrite").parquet(round_dir)
    n = spark.read.parquet(round_dir).count()
    old = state["committed"]
    _commit_state(
        spark, target_dir, {"high_water_mark": None, "committed": [round_id]}
    )
    for r in old:
        if r != round_id:
            fs.delete(spark, f"{target_dir}/rounds/{r}", recursive=True)
    if state.get("legacy_data"):  # full replace supersedes the legacy dir too
        fs.delete(spark, f"{target_dir}/data", recursive=True)
    return n


def hourly_rollup_refresh(
    spark: SparkSession,
    source: DataFrame,
    rollup_dir: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> int:
    """Continuous-aggregate maintenance (the hypertable REFRESH step
    behind operators/event_time.py::hypertable_rollup): keep an
    on-disk hourly rollup current by recomputing ONLY the hour buckets
    touched since the stored watermark, never the whole history.
    Returns the number of refreshed buckets.

    At 100 TB this is the difference between a rollup that costs
    O(new data) per refresh and one that re-aggregates years of
    history: the fresh-row scan pushes `ts > watermark` into parquet
    row-group skipping, the recompute filters to touched hours with a
    range predicate (pushes down) + exact bucket membership, and the
    write uses dynamic partition overwrite so untouched bucket
    partitions are never rewritten.

    Idempotent by construction — refreshing a bucket recomputes it
    from raw, so a crash between the partition write and the watermark
    commit just re-refreshes the same buckets next round (same
    result). Exact decimal sums make the refreshed buckets
    bit-identical to a from-scratch rollup."""
    state = read_sync_state(spark, rollup_dir)
    mark = state["high_water_mark"]
    ts_us = F.unix_micros(F.col(ts_col))
    hour_us = F.unix_micros(F.date_trunc("hour", F.col(ts_col)))
    fresh = source if mark is None else source.filter(ts_us > mark)
    stats = fresh.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(ts_us).alias("mx"),
        F.collect_set(hour_us).alias("hours"),
    ).collect()[0]
    if not stats["n"]:
        return 0
    hours = sorted(stats["hours"])
    touched = source.filter(
        (ts_us >= hours[0]) & hour_us.isin(hours)  # range pushes down
    )
    agg = touched.groupBy(
        hour_us.alias("bucket_us"), F.col(key_col).alias("key")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col).cast("decimal(38,6)")).alias("sum_value"),
    )
    (
        agg.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket_us")
        .parquet(f"{rollup_dir}/data")
    )
    _commit_state(
        spark,
        rollup_dir,
        {"high_water_mark": int(stats["mx"]), "committed": state["committed"]},
    )
    return len(hours)


def read_hourly_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    return spark.read.parquet(f"{rollup_dir}/data")


def read_incremental_target(spark: SparkSession, target_dir: str) -> DataFrame:
    """Manifest-resolved view of the synced target: exactly the
    committed round dirs, nothing half-written."""
    state = read_sync_state(spark, target_dir)
    paths = [f"{target_dir}/rounds/{r}" for r in state["committed"]]
    if state.get("legacy_data"):  # previous engine version's layout
        paths.insert(0, f"{target_dir}/data")
    if not paths:
        raise FileNotFoundError(f"no committed sync rounds under {target_dir}")
    return spark.read.option("mergeSchema", "true").parquet(*paths)
