"""Continuous crawl ingestion: stream-vs-batch equivalence and the
chained crawl → extract → incremental-dedup pipeline."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from peerdb_cdc_psql_psql_spark.operators.web import (
    synthesize_crawl_files,
    warc_crawl_pipeline,
)
from peerdb_cdc_psql_psql_spark.streaming.crawl_stream import (
    start_crawl_ingest,
)


def _mini_docs(spark, ids):
    rows = [
        (i, f"alpha beta gamma delta doc{i} " * 8, ["en", "de", "fr"][i % 3],
         f"src{i % 4}", 0)
        for i in ids
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).withColumn("n_chars", F.length("text"))


def _write_fixture(spark, docs, sf_dir, drop_dir, batch_tag):
    """Write a documents parquet (for the batch twin) and the same
    pages as .warc.gz files into the drop dir (for the stream)."""
    import os

    docs.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    os.makedirs(drop_dir, exist_ok=True)
    for r in synthesize_crawl_files(docs).collect():
        with open(
            f"{drop_dir}/crawl-{batch_tag}-{r['crawl_id']:06d}.warc.gz", "wb"
        ) as f:
            f.write(bytes(r["payload"]))


def test_crawl_stream_equals_batch_pipeline(spark, tmp_path):
    """The streamed extract must produce EXACTLY the batch twin's
    text (same md5 per doc_id) — shared extraction chain, different
    execution mode."""
    sf = str(tmp_path / "sf")
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = _mini_docs(spark, range(48))
    _write_fixture(spark, docs, sf, drop, "b1")

    q = start_crawl_ingest(spark, drop, out, ckpt)
    q.awaitTermination(120)

    got = {
        r["doc_id"]: (r["md5"], r["lang"], r["n_chars"])
        for r in spark.read.parquet(out)
        .select("doc_id", F.md5("text").alias("md5"), "lang", "n_chars")
        .collect()
    }
    want = {
        r["doc_id"]: (r["text_md5"], r["text_len"])
        for r in warc_crawl_pipeline(spark, sf).collect()
    }
    assert set(got) == set(want) == set(range(48))
    for d in want:
        assert got[d][0] == want[d][0], f"md5 drift doc {d}"
        assert got[d][2] == want[d][1]
    # lang recovered from the page title
    assert {got[d][1] for d in got} == {"en", "de", "fr"}


def test_crawl_stream_incremental_and_chained_dedup(spark, tmp_path):
    """New drop-dir files are picked up exactly once across restarts,
    and chaining the existing incremental-dedup stream over the
    extract output drops cross-batch duplicate pages."""
    from peerdb_cdc_psql_psql_spark.streaming.dedup_stream import (
        read_unique,
        start_incremental_dedup,
    )

    sf = str(tmp_path / "sf")
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    dd_out = str(tmp_path / "dd_out")
    dd_ckpt = str(tmp_path / "dd_ckpt")

    _write_fixture(spark, _mini_docs(spark, range(32)), sf, drop, "b1")
    start_crawl_ingest(spark, drop, out, ckpt).awaitTermination(120)
    start_incremental_dedup(spark, out, dd_out, dd_ckpt).awaitTermination(120)
    assert {r["doc_id"] for r in read_unique(spark, dd_out).collect()} == set(
        range(32)
    )

    # batch 2: docs 16..47 — 16 docs are EXACT re-crawls (same id ⇒
    # same page ⇒ same text); 16 are new
    _write_fixture(spark, _mini_docs(spark, range(16, 48)), sf, drop, "b2")
    start_crawl_ingest(spark, drop, out, ckpt).awaitTermination(120)
    start_incremental_dedup(spark, out, dd_out, dd_ckpt).awaitTermination(120)

    uniq = [r["doc_id"] for r in read_unique(spark, dd_out).collect()]
    assert sorted(uniq) == list(range(48)), "re-crawled pages must dedup"
    assert len(uniq) == len(set(uniq)) == 48
    # the extract stage itself appended the duplicates (extraction is
    # stateless; DEDUP is the stage that owns admission)
    n_extracted = spark.read.parquet(out).count()
    assert n_extracted == 32 + 32


def test_crawl_stream_survives_corrupt_drop_file(spark, tmp_path):
    """A corrupt/foreign .warc.gz in the drop dir degrades to zero
    records — the stream finishes and emits the VALID files' docs.
    Without the per-file guard the file source would re-read the same
    corrupt file on every restart and wedge the stream permanently."""
    sf = str(tmp_path / "sf")
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = _mini_docs(spark, range(12))
    _write_fixture(spark, docs, sf, drop, "c1")
    with open(f"{drop}/crawl-corrupt-999999.warc.gz", "wb") as f:
        f.write(b"\x1f\x8b not actually gzip \x00\x01\x02")

    q = start_crawl_ingest(spark, drop, out, ckpt)
    q.awaitTermination(120)

    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == sorted(range(12))


def test_crawl_stream_survives_odd_content_type_records(spark, tmp_path):
    """ADVICE r6 low / VERDICT r7 #4: (a) a response record whose
    WARC Content-Type is spelled 'Application/HTTP; msgtype=response'
    (MIME types are case-insensitive) must parse like the lowercase
    form; (b) a response record whose Content-Type is NOT
    application/http at all has no parsed 'body' — the stream must
    fall back to the raw payload instead of KeyError-ing the task
    (which the file source would replay on every restart, wedging the
    stream permanently)."""
    from peerdb_cdc_psql_psql_spark.functions.warc import (
        build_http_response,
        build_warc_record,
        encode_warc_gz,
    )

    sf = str(tmp_path / "sf")
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = _mini_docs(spark, range(12))
    _write_fixture(spark, docs, sf, drop, "w1")

    html = b"<html><title>t [en]</title><body><p>upper case ct</p></body></html>"
    upper_ct = build_warc_record(
        "response",
        build_http_response(html),
        target_uri="http://crawl.test/doc/100",
        content_type="Application/HTTP; msgtype=response",
    )
    plain = build_warc_record(
        "response",
        b"raw plain-text payload with no http envelope",
        target_uri="http://crawl.test/doc/101",
        content_type="text/plain",
    )
    with open(f"{drop}/crawl-odd-999998.warc.gz", "wb") as f:
        f.write(encode_warc_gz([upper_ct, plain]))

    q = start_crawl_ingest(spark, drop, out, ckpt)
    q.awaitTermination(120)

    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == set(range(12)) | {100, 101}
    assert "upper case ct" in rows[100]["text"]
    assert "plain-text payload" in rows[101]["text"]
