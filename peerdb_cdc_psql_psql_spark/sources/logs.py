"""Text log-file source (SURVEY.md §2.1 S9): the reference reads
stress/resource logs with Get-Content and parses them with regex
loops (monitoring.ps1:251,659,1034,1068); here `spark.read.text` +
regexp_extract produce a typed DataFrame in one declarative plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_log_lines(lines: list[str], log_dir: str, name: str = "run.log") -> str:
    """Test/demo helper: materialize log lines as a file (the role of
    insert.ps1:175-248 writing phase markers + docker stats blocks)."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, name)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def read_log_dir(spark: SparkSession, log_dir: str) -> DataFrame:
    """S9: line-per-row text scan. At scale this is a splittable read
    of a log bucket; schema = (value string) by contract."""
    return spark.read.text(log_dir)


def parse_stats_lines(logs: DataFrame) -> DataFrame:
    """Parse '[INSERT-BATCH-k] container=<name> cpu=<v>%' stats lines
    (monitoring.ps1:1071-1102 shape) into a typed frame; non-matching
    lines are dropped by the rlike guard — the PS version's
    first-match/skip logic (P5/W6)."""
    guarded = logs.filter(F.col("value").rlike(r"INSERT-BATCH-\d+"))
    return guarded.select(
        F.regexp_extract("value", r"INSERT-BATCH-(\d+)", 1).cast("bigint").alias("batch"),
        F.regexp_extract("value", r"container=(\w+)", 1).alias("container"),
        F.regexp_extract("value", r"cpu=([0-9.]+)%", 1).cast("double").alias("cpu"),
    )


def read_psql_delimited(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = "|",
) -> DataFrame:
    """Typed reader for psql-style pipe-delimited output — the batch
    twin of the reference's client-side `-split '|'` + Trim() parsing
    (monitoring.ps1:524,892,906,925), done by the engine's CSV source
    instead of an interpreted loop.

    Semantics pinned for dirty input (the F3 family's failure mode):
    PERMISSIVE mode with a `_corrupt` column — malformed lines land
    quarantined in one string column instead of failing the job or
    silently vanishing (the batch analog of the streaming dead-letter
    queue, Mirror(dead_letter=True)). Whitespace around delimiters is
    trimmed by the source options, matching psql's aligned output.

    Scale: the CSV scan is splittable per file and prunes columns at
    the reader; the corrupt-column check is `df.filter(_corrupt IS
    NOT NULL)` — one predicate, no second pass. (Spark requires the
    parsed result to be cached/saved before querying ONLY the corrupt
    column — QUERY_ONLY_CORRUPT_RECORD_COLUMN.)"""
    return (
        spark.read.schema(schema + ", _corrupt string")
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("ignoreLeadingWhiteSpace", "true")
        .option("ignoreTrailingWhiteSpace", "true")
        .csv(path)
    )
