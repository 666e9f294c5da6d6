"""Tests for streaming windowed aggregation + stateful counter +
incremental mirror modes (C8/C10) + source/DDL surfaces."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from peerdb_cdc_psql_psql_spark.sources import (
    append_rows,
    parse_stats_lines,
    read_log_dir,
    verify_insert,
    write_log_lines,
)
from peerdb_cdc_psql_psql_spark.sources.ddl import (
    foreign_key_violations,
    primary_key_violations,
)
from peerdb_cdc_psql_psql_spark.streaming import workload
from peerdb_cdc_psql_psql_spark.streaming.cdc import CDC_EVENT_SCHEMA
from peerdb_cdc_psql_psql_spark.streaming.incremental import (
    query_replication_sync,
    read_incremental_target,
    read_watermark,
    xmin_sync,
)
from peerdb_cdc_psql_psql_spark.streaming.windows import (
    running_change_totals,
    windowed_change_counts,
)


def _event_stream(spark, event_dir):
    return spark.readStream.schema(CDC_EVENT_SCHEMA).parquet(event_dir)


def _drain(q):
    # stop-on-timeout (r12): if a host hiccup pushes the availableNow
    # drain past the timeout, stop the query BEFORE asserting so the
    # failure stays contained to this test instead of leaving an
    # active same-named query that poisons every later start
    done = q.awaitTermination(timeout=240)
    if q.isActive:
        q.stop()
        q.awaitTermination(timeout=60)
    assert done and not q.isActive


def test_windowed_change_counts_with_watermark(spark, tmp_path):
    """C10: watermarked tumbling windows over the change stream match
    the batch computation of the same expression."""
    rng = random.Random(5)
    events = workload.generate_order_events(
        rng, 1, 1, 300, [1, 2, 3], [1, 2, 3], update_fraction=0.2,
        delete_fraction=0.1,
    )
    event_dir = str(tmp_path / "wal")
    workload.append_events(spark, events, event_dir)

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        windowed_change_counts(_event_stream(spark, event_dir), window="60 seconds")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)

    got = spark.read.parquet(out_dir)
    batch = (
        workload.events_df(spark, events)
        .groupBy(F.window("commit_ts", "60 seconds").alias("w"), "table")
        .agg(F.count(F.lit(1)).alias("n_changes"))
        .select(F.col("w.start").alias("window_start"), "table", "n_changes")
    )
    g = sorted((r["window_start"], r["table"], r["n_changes"]) for r in got.collect())
    b = sorted((r["window_start"], r["table"], r["n_changes"]) for r in batch.collect())
    # append-mode emits only watermark-closed windows: got ⊆ batch,
    # and every emitted window matches the batch truth exactly
    assert set(g) <= set(b)
    assert len(g) >= len(b) - 1  # at most the last open window withheld


def test_running_change_totals_stateful(spark, tmp_path):
    """applyInPandasWithState: running totals accumulate across
    micro-batches and survive via the state store."""
    rng = random.Random(9)
    event_dir = str(tmp_path / "wal")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    for i in range(2):
        batch = workload.generate_order_events(
            rng, 1 + 100 * i, 1 + 100 * i, 100, [1], [1]
        )
        workload.append_events(spark, batch, event_dir)
        q = (
            running_change_totals(_event_stream(spark, event_dir))
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
    rows = spark.read.parquet(out_dir).collect()
    totals = sorted(r["running_total"] for r in rows)
    assert totals[-1] == 200  # cumulative across restarts
    assert all(r["table"] == "orders" for r in rows)


def test_xmin_incremental_sync(spark, tmp_path):
    """C8 XMin mode: only rows past the watermark sync each round."""
    tgt = str(tmp_path / "xmin_tgt")
    src1 = spark.range(1, 101).select(
        F.col("id"), (F.col("id") * 10).alias("payload")
    )
    assert xmin_sync(spark, src1, tgt, "id") == 100
    assert read_watermark(spark, tgt) == 100
    # second round: 20 new rows
    src2 = spark.range(1, 121).select(
        F.col("id"), (F.col("id") * 10).alias("payload")
    )
    assert xmin_sync(spark, src2, tgt, "id") == 20
    assert read_incremental_target(spark, tgt).count() == 120
    # idempotent when nothing new
    assert xmin_sync(spark, src2, tgt, "id") == 0


def test_xmin_crash_recovery_no_duplicates(spark, tmp_path):
    """Durable resume (the reference's slot-persistence invariant):
    a round dir written by a crashed sync — data landed, manifest never
    committed — is invisible to readers, never double-counts, and is
    clobbered by the restart's retry of the same round. The watermark
    survives on disk across 'process death' (fresh state read)."""
    tgt = f"file:{tmp_path}/xmin_tgt"  # Hadoop URI: cluster posture
    src1 = spark.range(1, 51).select(F.col("id"), (F.col("id") * 2).alias("v"))
    assert xmin_sync(spark, src1, tgt, "id") == 50

    # crashed second round: files written, commit never happened
    orphan = f"{tgt}/rounds/round-000002"
    spark.range(1000, 1010).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).write.mode("overwrite").parquet(orphan)
    assert read_incremental_target(spark, tgt).count() == 50  # invisible
    assert read_watermark(spark, tgt) == 50  # mark never advanced

    # restart: retry syncs the real tail; orphan is clobbered, not
    # double-applied — target holds exactly the committed rows
    src2 = spark.range(1, 71).select(F.col("id"), (F.col("id") * 2).alias("v"))
    assert xmin_sync(spark, src2, tgt, "id") == 20
    got = read_incremental_target(spark, tgt)
    assert got.count() == 70
    assert got.select("id").distinct().count() == 70  # no re-applied rows
    assert read_watermark(spark, tgt) == 70


def test_hourly_rollup_incremental_refresh(spark, tmp_path):
    """Continuous-aggregate refresh: after each incremental refresh the
    on-disk rollup equals a from-scratch recompute, only touched hour
    partitions are rewritten, and an untouched historical bucket's
    files are left alone."""
    import datetime as dt

    from pyspark.sql import types as T

    from peerdb_cdc_psql_psql_spark import fs
    from peerdb_cdc_psql_psql_spark.streaming.incremental import (
        hourly_rollup_refresh,
        read_hourly_rollup,
    )

    rollup = f"file:{tmp_path}/rollup"
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])

    def rows(lo, hi):
        return [
            (base + dt.timedelta(minutes=7 * i), ["a", "b"][i % 2], float(i) / 3)
            for i in range(lo, hi)
        ]

    def check(source):
        got = sorted(
            (r["bucket_us"], r["key"], r["n_rows"], str(r["sum_value"]))
            for r in read_hourly_rollup(spark, rollup).collect()
        )
        exp = sorted(
            (r["bucket_us"], r["key"], r["n_rows"], str(r["sum_value"]))
            for r in source.groupBy(
                F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("bucket_us"),
                F.col("event_type").alias("key"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("value").cast("decimal(38,6)")).alias("sum_value"),
            )
            .collect()
        )
        assert got == exp

    src1 = spark.createDataFrame(rows(0, 60), schema)  # hours 0..6
    n1 = hourly_rollup_refresh(spark, src1, rollup)
    assert n1 == 7
    check(src1)

    first_hour_dir = f"{rollup}/data/bucket_us={int(base.timestamp()) * 1_000_000}"
    files_before = set(fs.list_files(spark, first_hour_dir, suffix=".parquet"))
    assert files_before

    # new rows land in hours 7-9 — hour 0 (and all of 0-6) untouched
    src2 = spark.createDataFrame(rows(0, 80), schema)
    n2 = hourly_rollup_refresh(spark, src2, rollup)
    assert n2 == 3  # hours 7, 8, 9 refreshed
    check(src2)
    assert set(fs.list_files(spark, first_hour_dir, suffix=".parquet")) == files_before

    # idempotent when nothing new
    assert hourly_rollup_refresh(spark, src2, rollup) == 0


def test_query_replication_sync(spark, tmp_path):
    """C8 Query Replication: full overwrite re-materialization."""
    tgt = str(tmp_path / "qr_tgt")
    assert query_replication_sync(spark, spark.range(50), tgt) == 50
    assert query_replication_sync(spark, spark.range(30), tgt) == 30
    assert read_incremental_target(spark, tgt).count() == 30


def test_log_source_roundtrip(spark, tmp_path):
    """S9: text log → typed frame via regex parse."""
    lines = [
        "[INSERT-BATCH-1] container=flow cpu=12.5000%",
        "noise line without marker",
        "[INSERT-BATCH-1] container=catalog cpu=3.2500%",
        "[INSERT-BATCH-2] container=flow cpu=20.0000%",
    ]
    d = str(tmp_path / "logs")
    write_log_lines(lines, d)
    parsed = parse_stats_lines(read_log_dir(spark, d))
    rows = sorted(tuple(r) for r in parsed.collect())
    assert rows == [(1, "catalog", 3.25), (1, "flow", 12.5), (2, "flow", 20.0)]


def test_ddl_append_verify_and_integrity(spark, tmp_path):
    """D3-D5 + PK/FK check queries."""
    path = str(tmp_path / "tbl")
    df1 = spark.range(1, 11).select(F.col("id"), (F.col("id") % 3).alias("grp"))
    n = append_rows(df1, path)
    assert n == 10
    assert verify_insert(spark, path, expected_delta=10, before=0)
    df2 = spark.range(11, 16).select(F.col("id"), (F.col("id") % 3).alias("grp"))
    append_rows(df2, path)
    assert verify_insert(spark, path, expected_delta=5, before=10)

    tbl = spark.read.parquet(path)
    assert primary_key_violations(tbl, "id").count() == 0
    parents = spark.range(0, 3).select(F.col("id").alias("grp_id"))
    assert foreign_key_violations(tbl, "grp", parents, "grp_id").count() == 0
    bad_parents = spark.range(0, 2).select(F.col("id").alias("grp_id"))
    assert foreign_key_violations(tbl, "grp", bad_parents, "grp_id").count() > 0


def test_progress_listener_metrics(spark, tmp_path):
    """_meta.progress surface: listener lands one row per micro-batch
    with input-row counts (SURVEY.md §4 metrics item)."""
    import time

    from peerdb_cdc_psql_psql_spark.catalog import DEMO_SCHEMAS
    from peerdb_cdc_psql_psql_spark.streaming.cdc import (
        Mirror,
        TableMapping,
        start_mirror,
    )
    from peerdb_cdc_psql_psql_spark.streaming.metrics import (
        attach_progress_listener,
        detach_progress_listener,
        progress_report,
    )

    rng = random.Random(21)
    event_dir = str(tmp_path / "wal")
    meta = str(tmp_path / "meta")
    workload.append_events(
        spark, workload.generate_order_events(rng, 1, 1, 150, [1], [1]), event_dir
    )
    listener = attach_progress_listener(spark, meta)
    try:
        mirror = Mirror(
            name="metrics-test",
            tables={
                "orders": TableMapping(
                    "orders", "orders_cdc", DEMO_SCHEMAS["orders"], "id"
                )
            },
        )
        q = start_mirror(
            spark, mirror, event_dir, str(tmp_path / "tgt"),
            str(tmp_path / "ckpt"), trigger={"availableNow": True},
        )
        q.awaitTermination(timeout=120)
        # listener events are delivered asynchronously
        for _ in range(20):
            try:
                if progress_report(spark, meta).count() > 0:
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        detach_progress_listener(spark, listener)
    rep = progress_report(spark, meta)
    rows = rep.collect()
    assert rows, "listener produced no progress rows"
    assert sum(r["num_input_rows"] for r in rows) == 150
    assert {r["query_name"] for r in rows} == {"mirror-metrics-test"}


def test_insert_stress_driver(spark, tmp_path):
    """M6: insert.ps1-equivalent stress driver — metrics shape and
    full success at the reference's default 5000/500 scenario scale
    (reduced 10x for test speed)."""
    from peerdb_cdc_psql_psql_spark.streaming.workload import run_insert_stress

    m = run_insert_stress(
        spark, str(tmp_path / "wal"), record_count=500, batch_size=50
    )
    assert m["total_operations"] == 500
    assert m["successful_operations"] == 500
    assert m["success_rate_pct"] == 100.0
    assert m["batches"] == 10
    assert m["ops_per_sec"] > 1.04  # beat the reference's sample run
    assert m["min_batch_ms"] <= m["avg_batch_ms"] <= m["max_batch_ms"]
    # the noise-robust twin brackets inside the per-batch extremes
    assert m["median_ops_per_sec"] > 1.04
    assert (
        50 / m["max_batch_ms"] * 1000
        <= m["median_ops_per_sec"]
        <= 50 / m["min_batch_ms"] * 1000
    )
    # and the log actually contains the events
    n = spark.read.parquet(str(tmp_path / "wal")).count()
    assert n == 500


def test_dedup_event_stream_drops_redelivery(spark, tmp_path):
    """Streaming dedup by lsn: re-delivered events (at-least-once
    transport) are dropped within the watermark horizon."""
    from peerdb_cdc_psql_psql_spark.streaming.windows import dedup_event_stream

    rng = random.Random(31)
    events = workload.generate_order_events(rng, 1, 1, 50, [1], [1])
    event_dir = str(tmp_path / "wal")
    # deliver twice: duplicate files in the log dir
    workload.append_events(spark, events, event_dir)
    workload.append_events(spark, events, event_dir)

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        dedup_event_stream(_event_stream(spark, event_dir))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = spark.read.parquet(out_dir)
    assert got.count() == 50  # 100 delivered, 50 unique lsn survive
    assert got.select("lsn").distinct().count() == 50


def test_batch_stream_parity_windowed_agg(spark, tmp_path):
    """Structured Streaming contract: the SAME window expression over
    the events fixture produces identical results in batch and stream
    (complete mode) — the engine's batch operators are stream-ready."""
    from peerdb_cdc_psql_psql_spark.catalog import load

    sf_dir = "/root/testdata/sf0.001"
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    # stream the same parquet through the same expression (readStream
    # needs a directory — stage the file into one)
    import shutil

    stream_dir = str(tmp_path / "events_stream")
    import os

    os.makedirs(stream_dir, exist_ok=True)
    shutil.copy(f"{sf_dir}/events.parquet", f"{stream_dir}/events.parquet")
    raw = spark.readStream.schema(
        spark.read.parquet(stream_dir).schema
    ).parquet(stream_dir)
    # same ts normalization as load() (nanos-int64 or timestamp[us])
    from peerdb_cdc_psql_psql_spark.catalog import normalize_events_ts

    stream_in = normalize_events_ts(raw)
    out_ckpt = str(tmp_path / "ckpt")
    q = (
        stream_in.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
        .writeStream.format("memory")
        .queryName("bs_parity")
        .outputMode("complete")
        .option("checkpointLocation", out_ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM bs_parity").collect())
    exp = sorted(tuple(r) for r in batch.collect())
    assert got == exp


def test_monitoring_report_all_passes(spark):
    """§3.2: the 10-pass monitoring driver returns a typed table per
    pass, each non-empty."""
    from peerdb_cdc_psql_psql_spark.operators.monitoring import monitoring_report

    report = monitoring_report(spark, "/root/testdata/sf0.001")
    assert len(report) == 10
    for name, df in report.items():
        assert df.count() > 0, name


def test_stream_interval_join_early_churn(spark, tmp_path):
    """Stream-stream interval join: changes within 10 minutes of their
    key's insert join to it; later changes and orphan keys don't."""
    import datetime as dt

    from peerdb_cdc_psql_psql_spark.streaming.windows import stream_interval_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def mins(m):
        return t0 + dt.timedelta(minutes=m)

    events = [
        (1, t0, "I", "orders", 1, '{"id": 1}'),
        (2, mins(5), "U", "orders", 1, '{"id": 1}'),   # within -> joins
        (3, mins(20), "U", "orders", 1, '{"id": 1}'),  # outside window
        (4, mins(1), "I", "orders", 2, '{"id": 2}'),
        (5, mins(9), "D", "orders", 2, None),          # within -> joins
        (6, t0, "U", "orders", 99, '{"id": 99}'),      # no opening insert
    ]
    event_dir = str(tmp_path / "wal")
    workload.append_events(spark, events, event_dir)
    q = (
        stream_interval_join(_event_stream(spark, event_dir))
        .writeStream.format("memory")
        .queryName("churn")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = spark.table("churn").collect()
    assert {(r["open_lsn"], r["change_lsn"]) for r in got} == {(1, 2), (4, 5)}
    by_change = {r["change_lsn"]: r for r in got}
    assert by_change[2]["us_after_insert"] == 5 * 60 * 1_000_000
    assert by_change[5]["op"] == "D"


def test_incremental_dedup_across_batches(spark, tmp_path):
    """Continuous dedup: the fingerprint store rejects texts admitted
    by EARLIER micro-batches; within a batch the min-doc_id keeper
    wins; read_unique stays exactly-once under replay appends."""
    from peerdb_cdc_psql_psql_spark.streaming.dedup_stream import (
        read_unique,
        start_incremental_dedup,
    )

    src = str(tmp_path / "ingest")
    out = str(tmp_path / "dedup")
    ckpt = str(tmp_path / "ckpt")
    cols = ["doc_id", "text", "lang", "source", "n_chars"]

    def write_batch(rows):
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1: doc 3 duplicates doc 1 in-batch -> keeper is doc 1
    write_batch(
        [
            (1, "alpha beta gamma", "en", "s0", 16),
            (2, "delta epsilon zeta", "en", "s0", 18),
            (3, "alpha beta gamma", "en", "s1", 16),
        ]
    )
    q = start_incremental_dedup(spark, src, out, ckpt)
    q.awaitTermination(timeout=120)
    got1 = {r["doc_id"] for r in read_unique(spark, out).collect()}
    assert got1 == {1, 2}

    # batch 2: doc 4 duplicates doc 1 CROSS-batch (store rejects);
    # docs 5, 6 are novel
    write_batch(
        [
            (4, "alpha beta gamma", "en", "s2", 16),
            (5, "eta theta iota", "en", "s2", 14),
            (6, "kappa lambda mu", "en", "s2", 15),
        ]
    )
    q = start_incremental_dedup(spark, src, out, ckpt)
    q.awaitTermination(timeout=120)
    uniq = read_unique(spark, out).select(*cols)
    got2 = {r["doc_id"] for r in uniq.collect()}
    assert got2 == {1, 2, 5, 6}

    # replay-append simulation (crash between output and store write):
    # re-appending an already-admitted row must not change the view
    spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "s0", 16)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("append").parquet(f"{out}/unique")
    got3 = {r["doc_id"] for r in read_unique(spark, out).collect()}
    assert got3 == {1, 2, 5, 6}


def test_fingerprint_store_compaction(spark, tmp_path):
    """Store compaction folds per-batch files into one without losing
    membership: dedup decisions are identical before and after."""
    from peerdb_cdc_psql_psql_spark import fs
    from peerdb_cdc_psql_psql_spark.streaming.dedup_stream import (
        compact_fingerprint_store,
        read_unique,
        start_incremental_dedup,
    )

    src = str(tmp_path / "ingest")
    out = str(tmp_path / "dedup")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    for i in range(3):  # three separate drains -> three store files
        write_batch([(10 * i + 1, f"text number {i}", "en", "s", 12)])
        q = start_incremental_dedup(spark, src, out, str(tmp_path / "ckpt"))
        q.awaitTermination(timeout=120)

    store = f"{out}/fingerprints"
    n_before = len(fs.list_files(spark, store, suffix=".parquet"))
    assert n_before >= 3
    folded = compact_fingerprint_store(spark, out)
    assert folded == n_before
    # deferred GC: folded files keep a grace interval (consolidated
    # file appended beside them), swept by the NEXT compaction
    assert len(fs.list_files(spark, store, suffix=".parquet")) == n_before + 1
    compact_fingerprint_store(spark, out)
    assert len(fs.list_files(spark, store, suffix=".parquet")) == 1

    # a duplicate of batch-0's text must still be rejected post-compaction
    write_batch([(99, "text number 0", "en", "s", 12)])
    q = start_incremental_dedup(spark, src, out, str(tmp_path / "ckpt"))
    q.awaitTermination(timeout=120)
    assert {r["doc_id"] for r in read_unique(spark, out).collect()} == {1, 11, 21}


def test_fingerprint_store_compaction_multifile(spark, tmp_path, monkeypatch):
    """VERDICT r3 #6: compaction is size-targeted, not coalesce(1) —
    with the per-file byte target shrunk below the data size, one
    compaction must emit MULTIPLE files (the 100 TB posture) while
    replay/dedup semantics stay identical."""
    from peerdb_cdc_psql_psql_spark import fs
    from peerdb_cdc_psql_psql_spark.streaming import dedup_stream
    from peerdb_cdc_psql_psql_spark.streaming.dedup_stream import (
        compact_fingerprint_store,
        read_unique,
        start_incremental_dedup,
    )

    src = str(tmp_path / "ingest")
    out = str(tmp_path / "dedup")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    for i in range(3):
        spark.createDataFrame(
            [(10 * i + j, f"text number {10 * i + j}", "en", "s", 12)
             for j in range(5)],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)
        q = start_incremental_dedup(spark, src, out, str(tmp_path / "ckpt"))
        q.awaitTermination(timeout=120)

    store = f"{out}/fingerprints"
    before = fs.list_files(spark, store, suffix=".parquet")
    assert len(before) >= 3
    monkeypatch.setattr(dedup_stream, "_COMPACT_TARGET_BYTES", 1024)
    assert compact_fingerprint_store(spark, out) == len(before)
    compact_fingerprint_store(spark, out)  # sweep the GC manifest
    after = fs.list_files(spark, store, suffix=".parquet")
    assert len(after) > 1, after  # size-targeted: multiple output files

    # membership unchanged: a replayed duplicate is still rejected
    spark.createDataFrame([(99, "text number 0", "en", "s", 12)], schema)\
        .coalesce(1).write.mode("append").parquet(src)
    q = start_incremental_dedup(spark, src, out, str(tmp_path / "ckpt"))
    q.awaitTermination(timeout=120)
    ids = {r["doc_id"] for r in read_unique(spark, out).collect()}
    assert ids == {10 * i + j for i in range(3) for j in range(5)}


def test_xmin_legacy_layout_migration(spark, tmp_path):
    """A target written by the previous engine version (_watermark.json
    + bare data/ dir) keeps its watermark (no re-sync of old rows) and
    its data stays readable; the next sync round migrates it into the
    manifest layout."""
    import json as _json

    tgt = str(tmp_path / "xmin_tgt")
    # fabricate the legacy layout: rows 1..50 synced, watermark 50
    old = spark.range(1, 51).select(F.col("id"), (F.col("id") * 2).alias("v"))
    old.write.parquet(f"{tgt}/data")
    (tmp_path / "xmin_tgt" / "_watermark.json").write_text(
        _json.dumps({"high_water_mark": 50})
    )

    assert read_watermark(spark, tgt) == 50
    got = read_incremental_target(spark, tgt)  # readable pre-migration
    assert got.count() == 50

    source = spark.range(1, 81).select(F.col("id"), (F.col("id") * 2).alias("v"))
    n = xmin_sync(spark, source, tgt, "id")
    assert n == 30  # ONLY the tail past the legacy watermark
    merged = read_incremental_target(spark, tgt)
    assert merged.count() == 80  # legacy data + new round both visible
    assert read_watermark(spark, tgt) == 80


def test_incremental_dedup_quality_gate(spark, tmp_path):
    """quality_min gates ingest with the SAME shared expression as the
    batch quality_score: a junk doc is rejected (and not
    fingerprinted), a good doc is admitted."""
    from peerdb_cdc_psql_psql_spark.streaming.dedup_stream import (
        read_unique,
        start_incremental_dedup,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    good = "the quick brown fox jumps over a lazy dog and runs to the hills " * 2
    junk = "@@!! ## $$%% ^^&&"  # pure punctuation -> low quality
    spark.createDataFrame(
        [(1, good, "en", "s", len(good)), (2, junk, "en", "s", len(junk))], schema
    ).coalesce(1).write.parquet(str(tmp_path / "ingest"))
    q = start_incremental_dedup(
        spark,
        str(tmp_path / "ingest"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        quality_min=0.5,
    )
    q.awaitTermination(timeout=120)
    got = {r["doc_id"] for r in read_unique(spark, str(tmp_path / "out")).collect()}
    assert got == {1}


def test_enrich_stream_static_dim(spark, tmp_path):
    """Stream-static enrichment: every change lands with its dim
    attributes; keys missing from the dim land with nulls (LEFT, never
    dropped); result equals the batch join on the same inputs."""
    import datetime as dt

    from peerdb_cdc_psql_psql_spark.streaming.windows import enrich_stream

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    events = [
        (1, t0, "I", "orders", 1, '{"id": 1}'),
        (2, t0, "U", "orders", 2, '{"id": 2}'),
        (3, t0, "D", "orders", 7, None),  # key 7 not in dim -> null cols
    ]
    event_dir = str(tmp_path / "wal")
    workload.append_events(spark, events, event_dir)
    dim = spark.createDataFrame(
        [(1, "GOLD"), (2, "SILVER"), (3, "BRONZE")], "cust_id int, segment string"
    )
    q = (
        enrich_stream(_event_stream(spark, event_dir), dim, "key", "cust_id")
        .writeStream.format("memory")
        .queryName("enriched")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {r["lsn"]: r for r in spark.table("enriched").collect()}
    assert got[1]["segment"] == "GOLD"
    assert got[2]["segment"] == "SILVER"
    assert got[3]["segment"] is None and got[3]["op"] == "D"
    assert len(got) == 3


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Native streaming session windows (append mode, watermark-closed)
    must equal the same session_window aggregation run as a batch
    query over the identical event log."""
    import datetime as dt

    from peerdb_cdc_psql_psql_spark.streaming.windows import session_window_stream

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(mins):
        return t0 + dt.timedelta(minutes=mins)

    events = [
        # key 1: two bursts separated by > gap (30 min)
        (1, at(0), "I", "orders", 1, '{"id": 1}'),
        (2, at(5), "U", "orders", 1, '{"id": 1}'),
        (3, at(90), "U", "orders", 1, '{"id": 1}'),
        # key 2: one burst
        (4, at(10), "I", "orders", 2, '{"id": 2}'),
        (5, at(12), "U", "orders", 2, '{"id": 2}'),
        # watermark flush: append-mode sessions emit only once the
        # watermark passes session end + gap; a late probe event on
        # another table advances event time past every orders session
        (6, at(240), "I", "probe", 99, None),
    ]
    event_dir = str(tmp_path / "wal")
    workload.append_events(spark, events, event_dir)

    q = (
        session_window_stream(_event_stream(spark, event_dir), gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {
        (r["key"], r["session_start_us"]): r
        for r in spark.table("sessions_stream").collect()
        if r["table"] == "orders"
    }

    batch = (
        spark.read.schema(CDC_EVENT_SCHEMA)
        .parquet(event_dir)
        .filter(F.col("table") == "orders")
        .groupBy(
            F.session_window(F.col("commit_ts"), "30 minutes").alias("sw"),
            "table",
            "key",
        )
        .agg(F.count(F.lit(1)).alias("n_changes"))
        .select(
            "key",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            "n_changes",
        )
    )
    expected = {(r["key"], r["session_start_us"]): r for r in batch.collect()}

    # availableNow + watermark: all sessions close once the log drains
    assert set(got) == set(expected) and len(got) == 3
    for k, row in expected.items():
        assert got[k]["n_changes"] == row["n_changes"], k
    # burst separation: key 1 has two sessions, key 2 one
    assert sum(1 for (key, _) in got if key == 1) == 2
    assert sum(1 for (key, _) in got if key == 2) == 1


def test_max_files_per_trigger_paces_ingest(spark, tmp_path):
    """Ingest pacing (the reference's BatchSize/DelayBetweenBatches
    throttle, insert.ps1:12-13, as a Spark source option): with
    maxFilesPerTrigger=1, an availableNow drain processes the WAL one
    file per micro-batch instead of gulping the backlog — bounding
    per-batch memory no matter how far behind the mirror starts."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    event_dir = str(tmp_path / "wal")
    for k in range(4):  # four separate files
        workload.append_events(
            spark,
            [(k * 10 + 1, t0, "I", "orders", k, '{"id": 1}')],
            event_dir,
        )
    batches = []

    def sink(df, epoch_id):
        batches.append(df.count())

    q = (
        spark.readStream.schema(CDC_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    assert sum(batches) == 4
    assert len(batches) >= 4  # one file per micro-batch, never gulped
    assert all(b <= 1 for b in batches)


def test_read_psql_delimited_with_quarantine(spark, tmp_path):
    """Pipe-delimited psql output parses into typed columns; a
    malformed line is quarantined in _corrupt, never dropped or
    fatal (the monitoring.ps1 '-split |' loop, engine-side)."""
    from peerdb_cdc_psql_psql_spark.sources.logs import read_psql_delimited

    lines = [
        " customers | 150 | 8192 ",
        " orders    | 500 | 16384 ",
        "THIS LINE IS GARBAGE",
        " products  | 90 | 4096 ",
    ]
    p = write_log_lines(lines, str(tmp_path), "tables.psv")
    df = read_psql_delimited(
        spark, p, "table_name string, n_rows int, bytes long"
    ).cache()  # Spark disallows corrupt-column-only queries on raw CSV
    good = df.filter(F.col("_corrupt").isNull())
    bad = df.filter(F.col("_corrupt").isNotNull())
    got = {r["table_name"]: (r["n_rows"], r["bytes"]) for r in good.collect()}
    assert got == {
        "customers": (150, 8192),
        "orders": (500, 16384),
        "products": (90, 4096),
    }
    assert bad.count() == 1
    assert "GARBAGE" in bad.collect()[0]["_corrupt"]


def test_watermark_drops_late_rows_observably(spark, tmp_path):
    """C10 observability: a row arriving for a window the watermark
    already CLOSED AND EMITTED must be dropped (append mode cannot
    re-emit), and the drop must be visible in
    stateOperators.numRowsDroppedByWatermark — the metric an ops
    dashboard alerts on (silent late-data loss is the CDC failure
    mode the lag report cannot see). Rows late relative to the
    watermark but for a STILL-OPEN window are accepted — the first
    three batches pin that too."""
    import datetime as dt
    import time

    t0 = dt.datetime(2024, 1, 1, 13, 0, 0)
    event_dir = str(tmp_path / "wal")
    arrivals = [
        t0,                                      # opens window 13:00
        t0 + dt.timedelta(hours=1),              # wm -> 12:59:30
        t0 + dt.timedelta(hours=1, minutes=30),  # wm -> 13:59:30, emits 13:00
        t0 + dt.timedelta(seconds=30),           # late for EMITTED 13:00
    ]
    for i, ts in enumerate(arrivals):
        workload.append_events(
            spark, [(i + 1, ts, "I", "orders", i + 1, None)], event_dir
        )
        time.sleep(1.1)  # distinct mtimes keep file->batch order stable
    q = (
        windowed_change_counts(
            spark.readStream.schema(CDC_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(event_dir),
            window="60 seconds",
            watermark="30 seconds",
        )
        .writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    dropped = sum(
        s["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for s in p["stateOperators"]
    )
    assert dropped == 1, [p["stateOperators"] for p in q.recentProgress]
    # the emitted 13:00 window holds only the on-time row — the late
    # duplicate neither re-emits the window nor inflates its count
    got = {
        r["window_start"]: r["n_changes"]
        for r in spark.table("late_drop").collect()
    }
    assert got[t0] == 1


def test_neardup_clustering_stream_matches_batch(spark, tmp_path):
    """Continuous near-dup clustering: cross-batch near-duplicates
    merge into one component as batches arrive, and the final
    labeling equals clustering the full corpus in one batch pass."""
    from peerdb_cdc_psql_psql_spark.streaming.neardup_stream import (
        read_labels,
        start_neardup_clustering,
    )

    w = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    docs_by_batch = [
        [(1, w), (6, "kilo lima mike november oscar papa quebec romeo sierra tango")],
        [(2, w), (3, "uni vic whiskey xray yankee zulu one two three four"),
         (4, "uni vic whiskey xray yankee zulu one two three four")],
        [(5, w), (7, "five six seven eight nine ten eleven twelve thirteen axe")],
    ]
    src = str(tmp_path / "ingest")
    root = str(tmp_path / "state")
    import os

    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    for i, batch in enumerate(docs_by_batch):
        rows = [(d, t, "en", "s0", len(t)) for d, t in batch]
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
        q = start_neardup_clustering(
            spark, src, root, str(tmp_path / "ckpt")
        )
        _drain(q)

    got = {r["doc_id"]: r["cluster_id"] for r in read_labels(spark, root).collect()}
    # chain {1,2,5} labeled by min 1; within-batch pair {3,4} by 3;
    # isolates self-labeled
    assert got == {1: 1, 2: 1, 5: 1, 3: 3, 4: 3, 6: 6, 7: 7}, got

    # batch truth over the full corpus: same pair rule, one pass
    from peerdb_cdc_psql_psql_spark.operators.dedup import (
        connected_components,
        jaccard_pairs,
    )
    from pyspark.sql import functions as F2

    all_rows = [
        (d, t, "en", "s0", len(t)) for b in docs_by_batch for d, t in b
    ]
    docs = spark.createDataFrame(all_rows, schema)
    from peerdb_cdc_psql_psql_spark.functions.helpers import ngram_expr

    sh = (
        docs.select("doc_id", F2.split("text", " ").alias("tok"))
        .filter(F2.size("tok") >= 3)
        .select("doc_id", F2.explode(ngram_expr("tok", 3)).alias("shingle"))
        .distinct()
    )
    pairs = jaccard_pairs(sh).select(
        F2.col("doc_a").alias("src"), F2.col("doc_b").alias("dst")
    )
    clustered = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    for d, c in clustered.items():
        assert got[d] == c, (d, c, got)


def test_neardup_short_docs_labeled_and_paced_drain(spark, tmp_path):
    """Every arriving doc gets a label row, including docs shorter
    than the shingle length (ADVICE r4: fresh_nodes must derive from
    the raw batch, not the shingle-filtered sizes). Also pins
    max_files_per_trigger: an availableNow drain over N files with
    maxFilesPerTrigger=1 must produce N label snapshots (the
    incremental admission path runs per micro-batch, not one gulp)."""
    import os

    from peerdb_cdc_psql_psql_spark.streaming.neardup_stream import (
        read_labels,
        start_neardup_clustering,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src = str(tmp_path / "ingest")
    os.makedirs(src, exist_ok=True)
    batches = [
        [(1, "alpha bravo charlie delta echo"), (2, "tiny")],
        [(3, "alpha bravo charlie delta echo"), (4, "so small")],
    ]
    for batch in batches:
        rows = [(d, t, "en", "s0", len(t)) for d, t in batch]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    q = start_neardup_clustering(
        spark,
        src,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        min_docs_per_batch=0,  # pin the strict per-trigger path
    )
    _drain(q)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in read_labels(spark, str(tmp_path / "state")).collect()
    }
    # near-dups {1,3} share a component; sub-shingle docs 2 and 4
    # carry singleton labels instead of silently vanishing
    assert got == {1: 1, 3: 1, 2: 2, 4: 4}, got
    snaps = [
        s
        for s in os.listdir(str(tmp_path / "state" / "labels"))
        if s.startswith("v_")
    ]
    assert len(snaps) == 2, snaps


def test_neardup_state_maintenance(spark, tmp_path):
    """Postings compaction folds per-batch files without changing
    labels produced by later batches; label vacuum keeps the pointer
    target and the newest snapshots only."""
    from peerdb_cdc_psql_psql_spark.streaming.neardup_stream import (
        _labels_pointer,
        _postings_dir,
        compact_postings,
        read_labels,
        start_neardup_clustering,
        vacuum_labels,
    )
    from peerdb_cdc_psql_psql_spark import fs as _fs

    w = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    src, root = str(tmp_path / "in"), str(tmp_path / "st")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    for i, batch in enumerate([[(1, w)], [(2, "k l m n o p q r s t")], [(3, w)]]):
        rows = [(d, t, "en", "s", len(t)) for d, t in batch]
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
        if i == 2:
            # compact before the last batch: the folded store must
            # serve the batch-vs-store join identically
            folded = compact_postings(spark, root)
            assert folded >= 2
        q = start_neardup_clustering(spark, src, root, str(tmp_path / "ck"))
        _drain(q)

    got = {r["doc_id"]: r["cluster_id"] for r in read_labels(spark, root).collect()}
    assert got == {1: 1, 2: 2, 3: 1}, got  # doc 3 matched doc 1 via compacted store

    # second compaction sweeps the pending manifest from the first
    compact_postings(spark, root)
    assert _fs.list_files(spark, _postings_dir(root), suffix=".parquet")

    removed = vacuum_labels(spark, root, keep=1)
    assert removed >= 1
    ptr = _fs.read_text(spark, _labels_pointer(root)).strip()
    assert _fs.exists(spark, f"{root}/labels/{ptr}")
    assert {r["doc_id"] for r in read_labels(spark, root).collect()} == {1, 2, 3}


def test_neardup_label_delta_chain_and_compaction(spark, tmp_path):
    """r8 label store: per-batch label writes are DELTAS (only
    touched clusters), the chain caps at _LABELS_COMPACT_EVERY deltas
    with an automatic base rewrite, read_labels folds base+deltas
    last-wins, and vacuum_labels folds + sweeps dead segments —
    across 10 micro-batches with cross-batch merges."""
    import os

    from peerdb_cdc_psql_psql_spark.streaming.neardup_stream import (
        _LABELS_COMPACT_EVERY,
        _label_chain,
        read_labels,
        start_neardup_clustering,
        vacuum_labels,
    )

    w = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src, root = str(tmp_path / "in"), str(tmp_path / "st")
    os.makedirs(src, exist_ok=True)
    # batch i carries doc 2i (near-dup of doc 0's text) and doc 2i+1
    # (unique text) — every batch merges into the doc-0 component AND
    # adds a singleton
    for i in range(10):
        rows = [
            (2 * i, w, "en", "s", len(w)),
            (2 * i + 1, f"uniq{i} " * 10, "en", "s", 60),
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    q = start_neardup_clustering(
        spark, src, root, str(tmp_path / "ck"), max_files_per_trigger=1,
        min_docs_per_batch=0,  # pin the per-batch delta-chain shape
    )
    _drain(q)

    got = {r["doc_id"]: r["cluster_id"] for r in read_labels(spark, root).collect()}
    want = {2 * i: 0 for i in range(10)} | {2 * i + 1: 2 * i + 1 for i in range(10)}
    assert got == want, got

    chain = _label_chain(spark, root)
    # batch 0 wrote the first base; batches 1..8 deltas; batch 9 found
    # the chain over the cap and rewrote a base
    assert chain[0].endswith("b")
    assert 1 <= len(chain) <= _LABELS_COMPACT_EVERY + 1
    assert chain[-1] == "v_00000009b"
    # deltas are O(touched): a delta segment holds far fewer rows
    # than the corpus labeling
    delta_dirs = [
        d for d in os.listdir(f"{root}/labels") if d.endswith("d")
    ]
    assert delta_dirs
    biggest = max(
        spark.read.parquet(f"{root}/labels/{d}").count() for d in delta_dirs
    )
    assert biggest <= 12, biggest  # doc-0 component (<=10) + 2 batch docs

    removed = vacuum_labels(spark, root, keep=0)
    assert removed >= 1
    got2 = {r["doc_id"]: r["cluster_id"] for r in read_labels(spark, root).collect()}
    assert got2 == want


def test_neardup_auto_coalesce_spools_and_flushes(spark, tmp_path):
    """VERDICT r8 #6: sub-operating-point micro-batches SPOOL (cheap)
    and cluster together — by default. A paced drain of small batches
    must produce the same labeling as strict per-trigger clustering,
    via exactly ONE clustering pass (one label snapshot), with the
    spool empty afterwards."""
    import os

    from peerdb_cdc_psql_psql_spark.streaming.neardup_stream import (
        _spool_pending,
        read_labels,
        start_neardup_clustering,
    )

    w = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src, root = str(tmp_path / "in"), str(tmp_path / "st")
    os.makedirs(src, exist_ok=True)
    batches = [
        [(1, w), (2, "k l m n o p q r s t")],
        [(3, w)],                       # cross-batch near-dup of 1
        [(4, "u v w x y z aa bb cc dd")],
    ]
    for batch in batches:
        rows = [(d, t, "en", "s", len(t)) for d, t in batch]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    q = start_neardup_clustering(
        spark, src, root, str(tmp_path / "ck"), max_files_per_trigger=1
    )
    _drain(q)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in read_labels(spark, root).collect()
    }
    assert got == {1: 1, 3: 1, 2: 2, 4: 4}, got
    # ONE coalesced clustering pass: one label snapshot, empty spool
    snaps = [
        s for s in os.listdir(f"{root}/labels") if s.startswith("v_")
    ]
    assert len(snaps) == 1, snaps
    dirs, total, _ = _spool_pending(spark, root)
    assert dirs == [] and total == 0


def test_neardup_coalesce_flushes_at_threshold_and_age(spark, tmp_path):
    """The spool flushes mid-stream once it reaches min_docs (not only
    at drain end), and a max_wait of zero degenerates to per-trigger
    flushing (the age lever works)."""
    import os

    from peerdb_cdc_psql_psql_spark.streaming.neardup_stream import (
        read_labels,
        start_neardup_clustering,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"

    # threshold flush: 3 batches of 2 docs, min_docs=4 → flush fires
    # inside the drain at batch 2 (snapshot 1) + terminal flush of the
    # remaining batch (snapshot 2)
    src, root = str(tmp_path / "in1"), str(tmp_path / "st1")
    os.makedirs(src, exist_ok=True)
    for i in range(3):
        rows = [
            (10 * i + j, f"w{10*i+j} " * 8, "en", "s", 40) for j in range(2)
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    q = start_neardup_clustering(
        spark, src, root, str(tmp_path / "ck1"),
        max_files_per_trigger=1, min_docs_per_batch=4,
    )
    _drain(q)
    assert read_labels(spark, root).count() == 6
    snaps = [s for s in os.listdir(f"{root}/labels") if s.startswith("v_")]
    assert len(snaps) == 2, snaps

    # age flush: max_wait_sec=0 → every trigger flushes immediately
    src2, root2 = str(tmp_path / "in2"), str(tmp_path / "st2")
    os.makedirs(src2, exist_ok=True)
    for i in range(2):
        rows = [(100 + i, f"x{i} " * 8, "en", "s", 40)]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src2)
    q = start_neardup_clustering(
        spark, src2, root2, str(tmp_path / "ck2"),
        max_files_per_trigger=1, min_docs_per_batch=10**9,
        max_wait_sec=0.0,
    )
    _drain(q)
    assert read_labels(spark, root2).count() == 2
    snaps = [s for s in os.listdir(f"{root2}/labels") if s.startswith("v_")]
    assert len(snaps) == 2, snaps


def test_neardup_coalesce_recovers_crash_leftover_spool(spark, tmp_path):
    """A spool left by a crashed run (flush never happened) must fold
    into the next run's labeling — the spool is durable state, not a
    cache."""
    import os

    from peerdb_cdc_psql_psql_spark.streaming.neardup_stream import (
        _spool_root,
        read_labels,
        start_neardup_clustering,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src, root = str(tmp_path / "in"), str(tmp_path / "st")
    os.makedirs(src, exist_ok=True)
    # simulate the crashed run's spool: batch b0 with doc 1
    spark.createDataFrame(
        [(1, "a b c d e f g h", "en", "s", 15)], schema
    ).coalesce(1).write.parquet(f"{_spool_root(root)}/b0_n1")
    # a fresh run ingests doc 2
    spark.createDataFrame(
        [(2, "p q r s t u v w", "en", "s", 15)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q = start_neardup_clustering(spark, src, root, str(tmp_path / "ck"))
    _drain(q)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in read_labels(spark, root).collect()
    }
    assert got == {1: 1, 2: 2}, got


def test_neardup_spool_age_flush_fires_on_quiet_stream(spark, tmp_path):
    """VERDICT r9 'wrong' #2: a continuous (processingTime) stream
    that goes quiet with spooled docs must still get labels within
    ~max_wait — the age bound is now enforced by a daemon timer, not
    only by the next data batch (which never comes)."""
    import os
    import time

    from peerdb_cdc_psql_psql_spark.streaming.neardup_stream import (
        read_labels,
        start_neardup_clustering,
    )

    src = str(tmp_path / "ingest")
    root = str(tmp_path / "state")
    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    rows = [
        (i, f"unique words for document number {i} alpha beta", "en",
         "s0", 40)
        for i in range(1, 6)
    ]
    spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
    q = start_neardup_clustering(
        spark, src, root, str(tmp_path / "ckpt"),
        trigger={"processingTime": "1 seconds"},
        min_docs_per_batch=50,     # far above the 5 arriving docs
        max_wait_sec=3.0,          # short wait for the test
    )
    try:
        # no further arrivals: only the age-flush daemon can label
        deadline = time.time() + 60
        got: set = set()
        while time.time() < deadline:
            try:
                got = {
                    r["doc_id"]
                    for r in read_labels(spark, root).collect()
                }
            except Exception:  # noqa: BLE001 — store not created yet
                got = set()
            if got == {1, 2, 3, 4, 5}:
                break
            time.sleep(1.0)
        assert got == {1, 2, 3, 4, 5}, got
    finally:
        q.stop()
