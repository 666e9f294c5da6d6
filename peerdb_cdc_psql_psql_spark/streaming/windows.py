"""Streaming event-time aggregation with watermarks (SURVEY.md §2.9
C10): the idiomatic `withWatermark + window` form of the engine's
interval accounting, plus a stateful running counter via
``applyInPandasWithState`` for semantics windows can't express.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_change_counts(
    stream: DataFrame, window: str = "10 seconds", watermark: str = "30 seconds"
) -> DataFrame:
    """Per-sync-interval change counts over the CDC event stream
    (C3/C6/C10): event-time tumbling windows with late-data tolerance.
    The 30 s watermark is the reference's NEAR_SYNC allowance
    (monitoring.ps1:599-601) expressed as event-time slack: changes
    later than that are dropped from the closed window instead of
    blocking state forever (bounded state at 100 TB)."""
    return (
        stream.withWatermark("commit_ts", watermark)
        .groupBy(F.window("commit_ts", window).alias("w"), F.col("table"))
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.count(F.when(F.col("op") == "I", 1)).alias("n_inserts"),
            F.count(F.when(F.col("op") == "U", 1)).alias("n_updates"),
            F.count(F.when(F.col("op") == "D", 1)).alias("n_deletes"),
        )
        .select(F.col("w.start").alias("window_start"), "table",
                "n_changes", "n_inserts", "n_updates", "n_deletes")
    )


_STATE_SCHEMA = T.StructType([T.StructField("total", T.LongType())])
_COUNTER_OUT = T.StructType(
    [
        T.StructField("table", T.StringType()),
        T.StructField("running_total", T.LongType()),
        T.StructField("batch_rows", T.LongType()),
    ]
)


def running_change_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator (the SURVEY.md §2.9 'custom stateful
    streaming' slot): a per-table running change counter maintained in
    ``applyInPandasWithState`` — cumulative totals can't be expressed
    as a window aggregate. State is one long per key: bounded, keyed,
    executor-resident."""

    def update(
        key: tuple, pdfs: Iterator[Any], state: GroupState
    ) -> Iterator[Any]:
        import pandas as pd

        n = 0
        for pdf in pdfs:
            n += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += n
        state.update((total,))
        yield pd.DataFrame(
            {"table": [key[0]], "running_total": [total], "batch_rows": [n]}
        )

    return (
        stream.groupBy("table")
        .applyInPandasWithState(
            update,
            outputStructType=_COUNTER_OUT,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_event_stream(stream: DataFrame, watermark: str = "30 seconds") -> DataFrame:
    """Streaming exactly-once event dedup (U1/U2 on streams): drop
    re-delivered change events by lsn within the watermark horizon —
    the idempotence guard an at-least-once transport (Kafka, retried
    file lists) needs in front of the merge.

    Uses ``dropDuplicatesWithinWatermark``: plain ``dropDuplicates``
    only evicts dedup state when the event-time column is part of the
    dedup key, so keying on lsn alone would grow the seen-lsn set
    unboundedly. The WithinWatermark variant expires each key once the
    watermark passes its first-seen event time — state is genuinely
    O(events per watermark horizon), not O(stream)."""
    return stream.withWatermark("commit_ts", watermark).dropDuplicatesWithinWatermark(
        ["lsn"]
    )


def stream_interval_join(
    stream: DataFrame, window: str = "10 minutes", watermark: str = "30 seconds"
) -> DataFrame:
    """Watermarked stream-stream interval join (early-churn detection):
    every insert opens a [commit_ts, commit_ts + window) horizon on its
    (table, key); later updates/deletes to the same key inside that
    horizon join to the opening insert. The streaming twin of the batch
    range join (operators/temporal.py range_join_incident_windows).

    Scale posture: Spark keeps join state only until the watermark
    passes open_ts + window — state is O(inserts per window+watermark),
    not O(stream). Equality on (table, key) makes it a keyed
    stream-stream join (hash-partitioned both sides); the time bound is
    the state-eviction contract, not a nested-loop predicate.
    """
    opens = (
        stream.filter(F.col("op") == "I")
        .select(
            F.col("table").alias("o_table"),
            F.col("key").alias("o_key"),
            F.col("commit_ts").alias("open_ts"),
            F.col("lsn").alias("open_lsn"),
        )
        .withWatermark("open_ts", watermark)
    )
    changes = stream.filter(F.col("op") != "I").withWatermark("commit_ts", watermark)
    joined = changes.join(
        opens,
        F.expr(
            f"table = o_table AND key = o_key AND "
            f"commit_ts >= open_ts AND commit_ts < open_ts + INTERVAL {window}"
        ),
    )
    return joined.select(
        "table",
        "key",
        "open_lsn",
        F.col("lsn").alias("change_lsn"),
        "op",
        (F.unix_micros(F.col("commit_ts")) - F.unix_micros(F.col("open_ts"))).alias(
            "us_after_insert"
        ),
    )


def enrich_stream(
    stream: DataFrame, dim: DataFrame, stream_key: str, dim_key: str
) -> DataFrame:
    """Stream-static dimension enrichment (the CDC-enrichment pattern:
    land every change already joined to its dimension attributes, so
    downstream consumers never re-join — e.g. orders changes annotated
    with customer segment before they reach the lakehouse).

    Semantics: LEFT join — a change whose key has no dimension row
    still lands (dim columns null) rather than silently dropping; CDC
    pipelines must never lose changes to reference-data lag.

    Scale posture: a stream-static equi join needs NO streaming state
    at all — Spark re-plans the static side per micro-batch, so a
    broadcast-sized dim ships to executors once per batch and the
    stream side never shuffles. The static side is also re-READ per
    batch, which is the feature: a slowly-changing dim picks up its
    updates on the next micro-batch without a restart. For a dim too
    big to broadcast, the same call degrades to a shuffled join per
    batch — correct, just with the stream side hashed on the key."""
    dcols = [c for c in dim.columns if c != dim_key]
    return stream.join(
        F.broadcast(dim), stream[stream_key] == dim[dim_key], "left"
    ).select(stream["*"], *[dim[c] for c in dcols])


def session_window_stream(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "30 seconds"
) -> DataFrame:
    """Streaming session windows over the change stream: per (table,
    key), bursts of changes separated by >= `gap` of event-time
    silence collapse into one session row (start/end/change count) —
    the change-burst profile that distinguishes a hot-row storm from
    steady drip updates, computed INSIDE the stream rather than by a
    batch job later.

    Scale posture: `session_window` is Spark's native dynamic-gap
    state machine — state per open session, merged on overlap, closed
    and EMITTED once the watermark passes session end + gap, so state
    is O(open sessions), never O(events). Output mode must be
    'append' (a session is final only after watermark closure), which
    the availableNow drain in tests exercises end-to-end."""
    return (
        stream.withWatermark("commit_ts", watermark)
        .groupBy(
            F.session_window(F.col("commit_ts"), gap).alias("sw"),
            "table",
            "key",
        )
        .agg(F.count(F.lit(1)).alias("n_changes"))
        .select(
            "table",
            "key",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "n_changes",
        )
    )
