"""Non-CDC mirror modes (SURVEY.md §2.9 C8 — the two other mirror-type
cards on images/cdc.png):

- **XMin sync**: incremental batch load by a monotonically increasing
  watermark column (Postgres xmin stand-in) — read only rows past the
  last high-water mark, append/merge, advance the mark.
- **Query Replication**: periodic full SELECT re-materialization for
  tables without a usable PK or watermark.

Both are thin batch jobs around the same target layout the CDC mirror
writes, so `read_target`-style consumers see one format. Watermark
state is a tiny JSON file next to the target (the durable resume token
— Temporal's role in the reference, SURVEY.md §3.3).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _state_path(target_dir: str) -> str:
    return os.path.join(target_dir, "_watermark.json")


def read_watermark(target_dir: str) -> int | None:
    try:
        with open(_state_path(target_dir)) as f:
            return json.load(f)["high_water_mark"]
    except (OSError, KeyError, ValueError):
        return None


def write_watermark(target_dir: str, value: int) -> None:
    os.makedirs(target_dir, exist_ok=True)
    with open(_state_path(target_dir), "w") as f:
        json.dump({"high_water_mark": value}, f)


def xmin_sync(
    spark: SparkSession,
    source: DataFrame,
    target_dir: str,
    watermark_col: str,
) -> int:
    """One XMin-mode sync round: append rows with watermark_col past
    the stored mark, then advance it. Returns rows synced.

    Scale: the `>` predicate pushes into the parquet scan (row-group
    min/max skip), so each round reads only the tail — the whole point
    of xmin mode on a 100 TB table. The watermark column must be
    monotone (xmin/serial/ingest-ts)."""
    mark = read_watermark(target_dir)
    fresh = source if mark is None else source.filter(F.col(watermark_col) > mark)
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(os.path.join(target_dir, "data"))
        new_mark = fresh.agg(F.max(watermark_col)).collect()[0][0]
        write_watermark(target_dir, int(new_mark))
    return n


def query_replication_sync(
    spark: SparkSession, source: DataFrame, target_dir: str
) -> int:
    """One Query-Replication round: full overwrite re-materialization
    (for PK-less tables — the reference's fallback mirror mode).
    Overwrite is atomic per Spark's commit protocol (staging dir +
    rename), so readers never see a half-written target."""
    n = source.count()
    source.write.mode("overwrite").parquet(os.path.join(target_dir, "data"))
    return n


def read_incremental_target(spark: SparkSession, target_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(target_dir, "data"))
