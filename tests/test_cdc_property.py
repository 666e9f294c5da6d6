"""Property-based CDC merge test (hypothesis): for ANY interleaving of
insert/update/delete ops across keys and micro-batch boundaries, the
mirror target equals the LSN-order replay oracle (FIXTURES.md §C pass
criterion). This is the generalization of the 4 fixed scenarios in
test_cdc.py."""

from __future__ import annotations

import datetime as dt
import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from peerdb_cdc_psql_psql_spark.catalog import DEMO_SCHEMAS
from peerdb_cdc_psql_psql_spark.streaming import workload
from peerdb_cdc_psql_psql_spark.streaming.cdc import (
    Mirror,
    TableMapping,
    read_target,
    start_mirror,
)

_BASE = dt.datetime(2024, 1, 1)

# An op sequence: list of (op, key, quantity) with op I/U/D over a
# small key space to force per-key collisions within batches.
_ops = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=99),
    ),
    min_size=1,
    max_size=60,
)
_split = st.integers(min_value=0, max_value=59)


def _to_events(ops):
    events = []
    for lsn, (op, key, qty) in enumerate(ops, start=1):
        after = (
            None
            if op == "D"
            else {
                "id": key,
                "order_date": "2024-01-05",
                "purchaser": 1,
                "quantity": qty,
                "product_id": 1,
            }
        )
        events.append(
            (lsn, _BASE + dt.timedelta(seconds=lsn), op, "orders", key,
             json.dumps(after) if after else None)
        )
    return events


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops, split=_split, compact_between=st.booleans())
def test_merge_matches_lsn_replay_oracle(
    spark, tmp_path_factory, ops, split, compact_between
):
    from peerdb_cdc_psql_psql_spark.streaming.cdc import compact_target

    tmp = tmp_path_factory.mktemp("prop")
    events = _to_events(ops)
    split = min(split, len(events))
    mirror = Mirror(
        name="prop",
        tables={
            "orders": TableMapping("orders", "orders_cdc", DEMO_SCHEMAS["orders"], "id")
        },
    )
    event_dir, tgt, ckpt = str(tmp / "wal"), str(tmp / "tgt"), str(tmp / "ckpt")
    # two micro-batch generations at an arbitrary split point; when
    # hypothesis says so, a compaction runs between them — the merged
    # state must be invariant to WHEN compaction happens
    for i, chunk in enumerate((events[:split], events[split:])):
        if not chunk:
            continue
        workload.append_events(spark, chunk, event_dir)
        q = start_mirror(
            spark, mirror, event_dir, tgt, ckpt, trigger={"availableNow": True}
        )
        q.awaitTermination(timeout=120)
        if compact_between and i == 0:
            compact_target(spark, mirror, "orders", tgt)

    got = read_target(spark, mirror, "orders", tgt)
    df = workload.events_df(spark, events)
    w = Window.partitionBy("key").orderBy(F.desc("lsn"))
    w_fill = (
        Window.partitionBy("key")
        .orderBy(F.asc("lsn"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    parsed = df.withColumn("after", F.from_json("after_json", DEMO_SCHEMAS["orders"]))
    qty_raw = F.col("after.quantity")
    # tombstone winners keep last-known values (visible soft-delete)
    qty = (
        F.when(F.col("op") == "D", F.last(qty_raw, ignorenulls=True).over(w_fill))
        .otherwise(qty_raw)
    )
    exp = (
        parsed.select(
            F.col("key").alias("id"),
            qty.alias("quantity"),
            (F.col("op") == "D").alias("_is_deleted"),
            F.row_number().over(w).alias("rn"),
        )
        .filter("rn = 1")
        .drop("rn")
    )
    cols = ["id", "quantity", "_is_deleted"]
    assert sorted(tuple(r) for r in got.select(*cols).collect()) == sorted(
        tuple(r) for r in exp.select(*cols).collect()
    )
