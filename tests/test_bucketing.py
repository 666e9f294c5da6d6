"""Bucketed co-located join: correctness + the plan property that
justifies it (no shuffle Exchange on either join side)."""

from __future__ import annotations

from pyspark.sql import functions as F

from peerdb_cdc_psql_psql_spark.plans import plan_string
from peerdb_cdc_psql_psql_spark.sources.bucketing import (
    drop_table,
    read_table,
    write_bucketed,
)


def test_bucketed_join_is_shuffle_free(spark):
    orders = spark.range(0, 20000).select(
        F.col("id").alias("o_id"),
        (F.col("id") % 1000).alias("custkey"),
        (F.col("id") * 3 % 97).alias("amount"),
    )
    cust = spark.range(0, 1000).select(
        F.col("id").alias("custkey"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    try:
        write_bucketed(orders, "b_orders", "custkey", n_buckets=8)
        write_bucketed(cust, "b_cust", "custkey", n_buckets=8)
        bo, bc = read_table(spark, "b_orders"), read_table(spark, "b_cust")
        # disable broadcast so the planner must choose SMJ/shuffled-hash;
        # bucketing then removes the Exchange entirely
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        try:
            j = bo.join(bc, "custkey")
            plan = plan_string(j)
            assert "Exchange" not in plan, plan
            # correctness unchanged vs non-bucketed join
            plain = orders.join(cust, "custkey")
            assert j.count() == plain.count() == 20000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        drop_table(spark, "b_orders")
        drop_table(spark, "b_cust")


def test_shingle_index_materialization(spark):
    """The dedup-stage reuse knob: the shingle inverted index written
    as a bucketed table (a) reproduces dedup_ngram_jaccard exactly and
    (b) plans its shingle self-equi-join with no Exchange on either
    side (co-located buckets) — the pre-bucketed on-disk intermediate
    the 100 TB pipeline keeps between dedup stages."""
    from peerdb_cdc_psql_psql_spark.operators.dedup import (
        dedup_ngram_jaccard,
        jaccard_pairs,
        materialize_shingle_index,
    )

    sf = "/root/testdata/sf0.01"
    try:
        sh = materialize_shingle_index(spark, sf, table="shingle_idx", n_buckets=8)
        got = sorted(tuple(r) for r in jaccard_pairs(sh).collect())
        exp = sorted(tuple(r) for r in dedup_ngram_jaccard(spark, sf).collect())
        assert got == exp and got

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
            b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
            plan = plan_string(a.join(b, "shingle"))
            assert "Exchange" not in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        drop_table(spark, "shingle_idx")


def test_clusters_pair_stage_reuses_bucketed_index(spark):
    """VERDICT r3 #4: dedup_clusters derives its pairs from the shared
    bucketed shingle index — the pair-generation plan must contain no
    Exchange partitioned on `shingle` (the index side is co-located;
    only the doc-keyed pair aggs may shuffle), and a second caller
    must reuse the materialized table instead of re-deriving text."""
    from peerdb_cdc_psql_psql_spark.operators.dedup import (
        _INDEX_MEMO,
        jaccard_pairs,
        shingle_index,
    )

    sf = "/root/testdata/sf0.01"
    sh = shingle_index(spark, sf)
    assert _INDEX_MEMO, "index not memoized"
    # memoized second call: same bucketed table, no rewrite
    assert shingle_index(spark, sf).schema == sh.schema

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_string(jaccard_pairs(sh))
        assert "hashpartitioning(shingle" not in plan, plan
        assert "Exchange" in plan  # doc-keyed pair aggs still shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_zorder_layout_clusters_both_dimensions(spark, tmp_path):
    """Z-ordered files must carry tight min/max footer stats on BOTH
    clustering columns, while a linear sort on one column leaves the
    other column's per-file span at ~full range (unprunable)."""
    import pyarrow.parquet as pq
    import glob as _glob

    from pyspark.sql import functions as F
    from peerdb_cdc_psql_psql_spark.catalog import load
    from peerdb_cdc_psql_psql_spark.sources.layout import write_zordered

    ev = load(spark, "/root/testdata/sf0.01", "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_type", "value"
    )
    zpath, lpath = str(tmp_path / "zord"), str(tmp_path / "linear")
    # 16 files = 4 leading z-bits = 2 bits per dimension: every file
    # should span ~1/4 of EACH dimension's range.
    write_zordered(ev, zpath, "user_id", "ts_us", n_files=16)
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def avg_span(path, col):
        spans = []
        for f in _glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = min(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.max
                for i in range(md.num_row_groups)
            )
            spans.append(hi - lo)
        assert spans
        return sum(spans) / len(spans)

    lin_ts = avg_span(lpath, "ts_us")  # linear layout: ts unclustered
    z_ts = avg_span(zpath, "ts_us")
    z_user = avg_span(zpath, "user_id")
    lin_user = avg_span(lpath, "user_id")

    # z-order: the time dimension must cluster far better than in the
    # user-sorted layout, while user clustering stays useful (not as
    # tight as a pure user sort, but a fraction of the full range).
    assert z_ts < 0.6 * lin_ts, (z_ts, lin_ts)
    assert z_user < 0.6 * 149, (z_user,)  # user_id domain is [0, 149]
    assert lin_user <= z_user  # sanity: pure sort is tightest on its own key


def test_date_partitioned_write_prunes_partitions(spark, tmp_path):
    """A hive-partitioned (p_date=YYYY-MM-DD) layout must turn a day
    predicate into Catalyst PartitionFilters: the executed scan reads
    only the matching day directories (directory-level pruning, zero
    I/O for other days) and the day count is bounded by files_per_day."""
    import glob as _glob

    from pyspark.sql import functions as F
    from peerdb_cdc_psql_psql_spark.catalog import load
    from peerdb_cdc_psql_psql_spark.sources.layout import write_date_partitioned

    ev = load(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "ts", "event_type", "value"
    )
    path = str(tmp_path / "by_date")
    write_date_partitioned(ev, path, ts_col="ts", files_per_day=2)

    day_dirs = sorted(_glob.glob(f"{path}/p_date=*"))
    assert len(day_dirs) > 3  # fixture spans multiple days
    for d in day_dirs:
        files = _glob.glob(f"{d}/*.parquet")
        assert 1 <= len(files) <= 2, (d, files)  # small-files guard

    target_day = day_dirs[0].rsplit("p_date=", 1)[1]
    df = spark.read.parquet(path).filter(F.col("p_date") == target_day)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the day predicate must appear as a PartitionFilter on the scan,
    # not as a post-scan Filter over all partitions
    assert "PartitionFilters" in plan and "p_date" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0], plan

    # row-level truth: pruned read == full read filtered
    full = (
        spark.read.parquet(path)
        .filter(F.col("p_date") == target_day)
        .count()
    )
    by_day = ev.filter(
        F.date_format("ts", "yyyy-MM-dd") == target_day
    ).count()
    assert full == by_day > 0


def test_shingle_index_is_process_owned_and_sweeps_dead_leftovers(spark):
    """r8/r9: the cached index name carries the owning pid AND a
    hostname hash (two concurrent processes can never clear each
    other's LIVE table — the FILE_NOT_EXIST race a shared name had),
    and same-corpus leftovers from dead SAME-HOST owners are swept at
    build time (pid liveness is only authoritative on the owner's own
    host)."""
    import hashlib
    import os
    import socket

    from peerdb_cdc_psql_psql_spark import fs as _fs
    from peerdb_cdc_psql_psql_spark.operators.dedup import shingle_index

    sf = "/root/testdata/sf0.001"
    shingle_index(spark, sf)
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh = wh.rstrip("/")
    hosth = hashlib.md5(socket.gethostname().encode()).hexdigest()[:8]
    mine = [
        d for d in _fs.list_dirs(spark, wh)
        if d.endswith(f"_p{os.getpid()}_h{hosth}")
        and d.startswith("shingle_index_")
    ]
    assert mine, "index table not owned by this process+host"
    h = mine[0].split("_")[2]
    # leftovers from a dead pid (max pid + reuse makes 2**22+1 safely
    # nonexistent on Linux test hosts) must be swept on next build —
    # both the r9 host-tagged form and the r8 host-less legacy form
    # (which this host's older code may have written)
    dead = f"{wh}/shingle_index_{h}_p4194305_h{hosth}"
    dead_legacy = f"{wh}/shingle_index_{h}_p4194305"
    _fs.mkdirs(spark, dead)
    _fs.mkdirs(spark, dead_legacy)
    from peerdb_cdc_psql_psql_spark.operators.dedup import _INDEX_MEMO

    _INDEX_MEMO.clear()
    shingle_index(spark, sf)
    assert not _fs.exists(spark, dead), "dead-owner leftover not swept"
    assert not _fs.exists(spark, dead_legacy), (
        "dead-owner legacy (host-less) leftover not swept"
    )


def test_shingle_index_sweep_is_cross_host_safe(spark, monkeypatch):
    """VERDICT r8 #2: on a warehouse shared across hosts, a pid from
    ANOTHER host cannot be liveness-checked with os.kill — a foreign
    pid unused on this host must NOT read as "owner dead". A fresh
    foreign-host-named dir (dead pid locally) survives the sweep; it
    is reclaimed only past the age lease."""
    import hashlib
    import socket

    from peerdb_cdc_psql_psql_spark import fs as _fs
    from peerdb_cdc_psql_psql_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    dedup.shingle_index(spark, sf)
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh = wh.rstrip("/")
    h = hashlib.md5(sf.encode()).hexdigest()[:8]
    hosth = hashlib.md5(socket.gethostname().encode()).hexdigest()[:8]
    foreign_host = "0" * 8 if hosth != "0" * 8 else "f" * 8
    # pid 4194305 is dead ON THIS HOST — the unsafe r8 design would
    # sweep this live foreign index immediately
    foreign = f"{wh}/shingle_index_{h}_p4194305_h{foreign_host}"
    _fs.mkdirs(spark, foreign)

    dedup._INDEX_MEMO.clear()
    dedup.shingle_index(spark, sf)
    assert _fs.exists(spark, foreign), (
        "live foreign-host index swept — cross-host pid check is unsafe"
    )

    # past the lease the foreign leftover IS reclaimed (mtime is fresh
    # here, so shrink the lease to zero to simulate expiry)
    monkeypatch.setattr(dedup, "_SWEEP_LEASE_MS", -1)
    dedup._INDEX_MEMO.clear()
    dedup.shingle_index(spark, sf)
    assert not _fs.exists(spark, foreign), (
        "lease-expired foreign-host leftover not reclaimed"
    )


def test_basket_edge_index_shared_and_dropped_per_pass(spark):
    """r14: the capped basket edge set is a process-memoized bucketed
    table shared by part_cooccurrence / part_triangle_stats /
    graph_bfs_levels — one derivation per hygiene window, identical
    rows to the direct derivation, and registered in the SAME memo the
    bench drops per pass."""
    from peerdb_cdc_psql_psql_spark.catalog import load
    from peerdb_cdc_psql_psql_spark.operators import dedup
    from peerdb_cdc_psql_psql_spark.operators.joins import (
        basket_edge_index,
        basket_pairs,
    )

    sf = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    for t in list(dedup._INDEX_MEMO):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    dedup._INDEX_MEMO.clear()

    idx = basket_edge_index(spark, sf)
    edge_tables = [t for t in dedup._INDEX_MEMO if t.startswith("basket_edges_")]
    assert len(edge_tables) == 1  # memoized in the bench-dropped memo
    # second consumer reuses the SAME table (no second derivation)
    idx2 = basket_edge_index(spark, sf)
    assert [t for t in dedup._INDEX_MEMO if t.startswith("basket_edges_")] == edge_tables

    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    direct = sorted(map(tuple, basket_pairs(li).collect()))
    shared = sorted(map(tuple, idx.select("part_a", "part_b", "n_orders").collect()))
    assert direct == shared

    # the per-pass hygiene (DROP every memoized table) really removes it
    for t in edge_tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    dedup._INDEX_MEMO.clear()
    assert not spark.catalog.tableExists(edge_tables[0])
