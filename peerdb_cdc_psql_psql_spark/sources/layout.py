"""Z-order data layout: multi-dimensional clustering for scan pruning.

The reference's only layout lever is the mirror's custom partitioning
key (images/cdc_2.png) — one dimension. At 100 TB, queries filter on
more than one column (user AND time, key AND date), and a layout
sorted on a single column leaves every other column's parquet min/max
stats useless: each file spans the full range, so nothing prunes.

Z-ordering interleaves the bits of two rank-scaled columns into one
clustering key; sorting by it gives every file a tight min/max window
on BOTH dimensions, so predicate pushdown on either column (or both)
skips most files. This is the standard lakehouse technique (Delta
OPTIMIZE ZORDER BY, Iceberg sort orders) expressed with plain Spark:
pure JVM bit arithmetic, `repartitionByRange` + `sortWithinPartitions`
on the z-value — no shuffle beyond the one range partition pass, no
UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, cmin: float, cmax: float, bits: int) -> Column:
    """Min/max-scale a numeric column to integer [0, 2^bits)."""
    top = (1 << bits) - 1
    if cmax == cmin:  # degenerate: constant column
        return F.lit(0).cast("long")
    return F.least(
        F.lit(top).cast("long"),
        ((col.cast("double") - F.lit(float(cmin)))
         * F.lit(top / (cmax - cmin))).cast("long"),
    )


def zorder_value(x: Column, y: Column, bits: int = 12) -> Column:
    """Interleave the low `bits` bits of two non-negative long columns
    (x even positions, y odd) — the Morton/Z curve index. Pure
    shift/and/or expression tree: whole-stage-codegen friendly."""
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 16,
    bits: int = 12,
) -> None:
    """Write `df` as parquet clustered on the Z-curve of (col_x, col_y).

    One extra pass computes global min/max for scaling (an agg, ~free);
    the single range-partition shuffle on the z-value is the same cost
    as any sorted write. File count should target the usual 128 MB-1 GB
    parquet file size at scale."""
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).collect()[0]
    z = zorder_value(
        _scale_to_bits(F.col(col_x), float(lo_x), float(hi_x), bits),
        _scale_to_bits(F.col(col_y), float(lo_y), float(hi_y), bits),
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    files_per_day: int = 1,
) -> None:
    """Write `df` hive-partitioned by calendar day of `ts_col`
    (`.../p_date=YYYY-MM-DD/part-*.parquet`) — the layout that turns a
    time-range predicate into directory-level PARTITION PRUNING
    (Catalyst's `PartitionFilters`, zero I/O for skipped days), where
    z-ordering (above) gives file-level min/max skipping within a
    partition. The mirror's "custom partitioning key" (images/
    cdc_2.png, C9) maps to exactly this on a date-ish key.

    The pre-shuffle on (day, salt) aligns tasks with partitions so
    each day directory receives `files_per_day` files instead of one
    small file per upstream task (the small-files failure mode at
    100 TB: 1000 executors x 365 days of tiny appends)."""
    day = F.date_format(F.col(ts_col), "yyyy-MM-dd")
    salt = (F.rand(seed=7) * files_per_day).cast("int")
    (
        df.withColumn("p_date", day)
        .repartition(F.col("p_date"), salt)
        .write.mode("overwrite")
        .partitionBy("p_date")
        .parquet(path)
    )
