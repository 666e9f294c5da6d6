"""Streaming metrics surface (SURVEY.md §4 custom-work item 2): a
StreamingQueryListener that lands one row per micro-batch in a
`_meta/progress` JSONL dir — replacing the reference's hand timers
(insert.ps1:306-311) and docker-stats text parsing
(monitoring.ps1:1068-1156) with a queryable table.

The listener runs on the driver and appends tiny JSON lines (no Spark
job per event — a metrics write must never compete with the work it
measures); `progress_report` reads them back as a typed DataFrame for
the monitoring pack.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("query_name", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("batch_duration_ms", T.LongType()),
    ]
)


class ProgressListener(StreamingQueryListener):
    """Appends per-micro-batch progress to `<meta_dir>/progress.jsonl`."""

    def __init__(self, meta_dir: str):
        self.meta_dir = meta_dir
        os.makedirs(meta_dir, exist_ok=True)
        self._path = os.path.join(meta_dir, "progress.jsonl")

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        row = {
            "query_name": p.name or "",
            "batch_id": p.batchId,
            "timestamp": p.timestamp,
            "num_input_rows": p.numInputRows,
            "batch_duration_ms": (p.durationMs or {}).get("triggerExecution", -1),
        }
        with open(self._path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach_progress_listener(spark: SparkSession, meta_dir: str) -> ProgressListener:
    listener = ProgressListener(meta_dir)
    spark.streams.addListener(listener)
    return listener


def detach_progress_listener(spark: SparkSession, listener: ProgressListener) -> None:
    spark.streams.removeListener(listener)


def progress_report(spark: SparkSession, meta_dir: str) -> DataFrame:
    """The `_meta.progress` table: per-batch rows + derived rates —
    the engine-native replacement for the reference's per-batch
    ops/sec accounting (insert.ps1:355-357, A10).

    The listener file lives on the DRIVER's disk (listener events fire
    there; appending a line must never launch a job), so the report
    parses it driver-side and lifts the rows into a DataFrame —
    `spark.read.json` on that path would make EXECUTORS open a
    driver-local file, which breaks on any multi-node cluster. One row
    per micro-batch: metadata scale, safe to parse on the driver."""
    rows = []
    path = os.path.join(meta_dir, "progress.jsonl")
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            # A live listener may be mid-append: a torn/partial last
            # line is expected under concurrent reads — skip it rather
            # than failing the whole report.
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            rows.append(
                (
                    r.get("query_name", ""),
                    r.get("batch_id"),
                    r.get("timestamp", ""),
                    r.get("num_input_rows"),
                    r.get("batch_duration_ms"),
                )
            )
    df = spark.createDataFrame(rows, PROGRESS_SCHEMA)
    return df.withColumn(
        "rows_per_sec",
        F.when(
            F.col("batch_duration_ms") > 0,
            F.round(F.col("num_input_rows") * 1000.0 / F.col("batch_duration_ms"), 2),
        ),
    )
