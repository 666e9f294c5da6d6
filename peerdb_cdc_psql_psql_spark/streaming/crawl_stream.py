"""Continuous web-crawl ingestion: a `.warc.gz` drop directory →
extracted, quality-annotated, documents-shaped parquet.

The streaming front of the web pack (operators/web.py is the batch
twin): crawler output lands as WARC files; Structured Streaming's
`binaryFile` source picks each file up exactly once (checkpointed),
an Arrow-batched parse splits gzip members / records / HTTP bodies
executor-side, and the SAME JVM `html_to_text` expression chain the
batch pipeline uses produces the text — so stream and batch output
are equal by construction, and the equivalence is pinned in
tests/test_crawl_stream.py.

The sink is documents-shaped parquet (`doc_id, text, lang, source,
n_chars`), which makes the stage COMPOSABLE: point
`streaming/dedup_stream.start_incremental_dedup` at the output dir
and the full training-data ingest — crawl → extract → quality →
exactly-once dedup admission — runs as two independently-checkpointed
continuous stages, exactly how a production pipeline splits them
(each stage restartable/rescalable on its own).

100 TB posture: one task per crawl file (CommonCrawl shards are
~1 GB — the natural work unit); parsing touches only that task's
bytes; extraction is a codegen map; the only state is the file-source
log + the downstream dedup store. No shuffle anywhere in this stage.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("http_status", T.LongType()),
        T.StructField("body", T.StringType()),
    ]
)


def parse_warc_files(files: DataFrame) -> DataFrame:
    """(path, content) → one row per HTTP-response record. Works on
    both static and streaming DataFrames (stateless mapInPandas)."""
    from ..functions.warc import decode_body_text, parse_warc

    def batches(it: Iterator) -> Iterator:
        import os

        import pandas as pd

        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    recs = list(parse_warc(bytes(content)))
                except ValueError:
                    # Corrupt/foreign file in the drop dir → zero
                    # records, NOT a task failure: the file source
                    # would otherwise re-read the same file on every
                    # restart and wedge the stream permanently.
                    continue
                for rec in recs:
                    if rec["warc_type"] != "response":
                        continue
                    # a response record whose Content-Type header
                    # didn't parse as application/http has no 'body'
                    # key — fall back to the raw payload instead of
                    # KeyError-ing the task (which the file source
                    # would replay forever, wedging the stream —
                    # ADVICE r6 low)
                    rows.append(
                        (
                            os.path.basename(str(path)),
                            rec.get("target_uri"),
                            rec.get("status"),
                            # charset-aware decode (r8) — identical
                            # chain to the batch twin in operators/web
                            decode_body_text(
                                rec.get("body", rec["payload"]),
                                rec.get("http_headers", {}).get(
                                    "content-type"
                                ),
                            )[0],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _RECORD_SCHEMA.fields]
            )

    return files.select("path", "content").mapInPandas(
        batches, schema=_RECORD_SCHEMA
    )


def extract_documents(records: DataFrame) -> DataFrame:
    """Response records → documents-shaped rows via the batch twin's
    JVM extraction chain (operators/web.html_to_text — shared, so
    stream output ≡ batch output on the same pages)."""
    from ..operators.web import html_to_text

    text = html_to_text(F.col("body"))
    return records.select(
        F.regexp_extract(F.col("uri"), r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        text.alias("text"),
        F.coalesce(
            F.nullif(
                F.regexp_extract(F.col("body"), r"(?is)<title[^>]*>.*?\[(\w+)\]", 1),
                F.lit(""),
            ),
            F.lit("und"),
        ).alias("lang"),
        F.col("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def start_crawl_ingest(
    spark: SparkSession,
    drop_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    max_files_per_trigger: int | None = None,
):
    """Start the crawl-ingest stream over a `.warc.gz` drop directory
    and return the StreamingQuery. ``trigger`` defaults to
    availableNow (drain-and-stop); pass processingTime for a
    long-running ingest. ``max_files_per_trigger`` paces a backlog
    into real micro-batches (the repo-wide honesty lever)."""
    reader = (
        spark.readStream.format("binaryFile")
        # the binaryFile source's fixed schema, stated explicitly —
        # streaming file sources refuse to infer
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.warc.gz")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(drop_dir)
    docs = extract_documents(parse_warc_files(files))
    writer = (
        docs.writeStream.queryName("crawl-ingest")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
