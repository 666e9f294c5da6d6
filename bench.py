"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON
line with per-query wall seconds plus a CDC-apply throughput figure
comparable to the reference's insert.ps1 stress test (BASELINE.md:
1.04 records/s throttled demo; effective claim = 500-row batch
replicated within a 10 s sync interval).
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from peerdb_cdc_psql_psql_spark.session import get_spark  # noqa: E402
from peerdb_cdc_psql_psql_spark import operators  # noqa: E402,F401
from peerdb_cdc_psql_psql_spark.registry import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# local[32] shares ONE JVM heap across driver + all 32 task slots.
# 16g is now also the engine default (session.py, r10 — the old 4g
# starved at probe scale: TaskMemoryManager allocation failures +
# GCLocker retry storms); kept here so a stale environment can't
# shrink the bench heap back down.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

# Round-2 additions, timed separately so the headline total stays
# directly comparable across rounds.
EXTRA = [
    "dedup_clusters",            # iterative connected components
    "keyword_search",            # inverted-index tf-idf probe
    "embedding_norm_stats",      # vector-column profiling
    "infra_health_bands",        # pass-6 health banding
    "decontaminate_corpus",      # eval-set n-gram collision scan
    "pii_pseudonymize",          # digest + hierarchy generalization
    "dedup_incremental_ledger",  # cross-batch dedup accounting
    # Round-3 suite queries (driver-gate window consolidation)
    "filter_patterns",           # LIKE + regex predicate families
    "window_suite",              # all §2.6 window families, one pass
    "setops_suite",              # union/except/intersect/first-seen
    "scalar_suite",              # string+date+math codegen projection
    "text_suite",                # token/lang/quality/fingerprint per-doc
    "corpus_shuffle",            # deterministic training-order permutation
    "stratified_sample",         # largest-remainder exact quotas
    "vocab_coverage",            # tokenizer-budget coverage curve
    "bigram_lm_stats",           # corpus bigram conditionals
    "embedding_quantize_stats",  # int8 vector quantization
    "doc_perplexity_filter",     # bigram-LM predictability bands
    "tfidf_top_terms",           # per-doc top-3 TF-IDF terms
    "corpus_datasheet",          # per-source datasheet report
    "exact_substr_spans",        # ExactSubstr-style span accounting
    "embedding_centroid_drift",  # per-label centroid distance matrix
    "source_overlap_matrix",     # cross-source span contamination
    "funnel_analysis",           # sequential conversion funnel
    "cohort_retention",          # weekly retention matrix
    "part_cooccurrence",         # market-basket 2-itemsets
    "rfm_segments",              # customer RFM banding
    "event_rate_anomaly",        # trailing-window rate alarms
    "min_cost_supplier",         # Q2-shape decorrelated min-join
    "revenue_concentration",     # Lorenz decile shares
    "supplier_scorecard",        # vendor SLA banding
    "priority_aging",            # Q4-shape late-order backlog
    "brand_market_share",        # Q8-shape share-within-group
    "segment_migration",         # period band transition matrix
    "order_line_status_audit",   # parent-child coherence matrix
    "dau_wau_stickiness",        # engagement ratio per day
    # Round-4 additions
    "scd2_user_history",         # SCD2 validity intervals from changes
    "data_quality_report",       # declarative constraint pack
    "histogram_cdf",             # mergeable exact-bin percentile path
    "mixture_temperature_sample", # n^0.5 source rebalancing
    "centroid_incremental_update", # O(batch) ANN index maintenance
    "session_window_bounds",     # native session_window oracle twin
    "catalog_tables_report",     # F19 catalog report
    "order_count_distribution",  # Q13-shape outer-join histogram
    "large_volume_customers",    # Q18-shape HAVING-subquery join
    "waiting_suppliers",         # Q21-shape decorrelated EXISTS pair
    "idle_customer_balance",     # Q22-shape anti-join + global scalar
    "important_parts",           # Q11-shape group-vs-global cut
    "salted_distinct_agg",       # two-phase skew-safe distinct
    "gap_fill_hourly",           # dense-grid ffill time series
    "change_point_detect",       # Page-Hinkley drift detector
    "dedup_embedding_survivors", # blocked cosine near-dup survivors
    "time_weighted_avg",         # duty-cycle weighted gauge average
    "nation_trade_flows",        # Q7-shape two-sided dim matrix
    "shipping_priority_topn",    # Q3-shape backlog top-10
    "regional_local_revenue",    # Q5-shape domestic-trade rollup
    "forecast_revenue_delta",    # Q6-shape pure scan-aggregate
    "product_profit_by_nation",  # Q9-shape profit rollup
    "returned_item_report",      # Q10-shape churn top-20
    "late_delivery_priority_mix", # Q12-shape CASE-conditional counts
    "promo_revenue_share",       # Q14-shape conditional share
    "top_supplier_by_revenue",   # Q15-shape argmax-over-aggregate
    "part_supplier_breadth",     # Q16-shape two-phase distinct
    "small_quantity_order_revenue", # Q17-shape decorrelated average
    "bracketed_revenue",         # Q19-shape OR-of-ANDs brackets
    "excess_shipment_suppliers", # Q20-shape semi-join + HAVING chain
    "ngram_novelty_rate",        # per-doc first-seen trigram share
    "length_percentile_filter",  # per-source exact p5-p95 length gate
    "cumulative_unique_users",   # first-seen growth-accounting curve
    "cdc_time_travel_diff",      # PITR as-of vs current delta
    "doc_compressibility",       # Arrow zlib ratio quality signal
    "embedding_anisotropy",      # applyInPandas top-eig collapse probe
    "source_lang_diversity",     # Gini-Simpson mixture monitor
    "pattern_match_corr",        # sliding-window pattern similarity
    "robust_outlier_mad",        # median/MAD robust rate outliers
    "channel_crossover",         # Q51-shape cumulative comparison
    "inter_arrival_stats",       # exact-rank gap percentiles
    "pagerank_bipartite",        # fixed-round integer PageRank
    "bpe_pair_counts",           # vocab-weighted subword merge stats
    "range_frame_smoothing",     # RANGE-interval trailing-hour frame
    "grouping_sets_stats",       # explicit grouping-set Expand+agg
    # fuzzy_record_links (full-block O(Σ|block|²) ER) stays registered
    # and oracle-checked but is no longer in the timed suite — the
    # sorted-neighborhood twin below is the scale path and the bench
    # representative (VERDICT r4 "What's wrong" #3).
    "fuzzy_links_sorted_neighborhood",  # O(block·w) ER scale path
    "dedup_incremental_neardup", # batch-vs-corpus Jaccard admission
    "exact_substr_rewrite",      # duplicated-span removal rewrite
    "epoch_shard_plan",          # multi-epoch loader-order digests
    "seasonal_baseline_deviation",  # hour-of-day median baselines
    "fuzzy_links_multipass",     # two-key sorted-neighborhood union
    "equi_depth_histogram",      # NTILE decile boundaries
    "numeric_corr_matrix",       # one-scan moment correlation matrix
    "trend_slope_by_type",       # integer-moment least-squares trend
    "asof_next_purchase",        # forward as-of conversion latency
    "json_key_profile",          # payload schema discovery
    "customer_similarity_topk",  # basket-Jaccard neighbor search
    "jaccard_threshold_sweep",   # near-dup threshold tuning bands
    "noop_update_detect",        # null-safe ghost-update filter
    "monthly_revenue_growth",    # calendar-grain MoM KPI
    "event_transition_matrix",   # first-order Markov estimation
    "cosine_threshold_sweep",    # embedding-dedup tuning bands
    "embedding_label_confusion", # nearest-centroid purity matrix
    "lexical_diversity",         # per-doc type-token ratio
    "hapax_rate",                # Zipf-tail vocabulary health
    # Round-5 additions
    "multimodal_wav_decode",     # real RIFF/PCM-16 codec round trip
    "multimodal_bmp_decode",     # real 24-bit BMP codec round trip
    "multimodal_resize_stats",   # decode→resize→re-encode→decode chain
    "part_triangle_stats",       # degree-oriented triangle census
    "multimodal_video_frame_sample",  # real AVI demux + frame decode
    "multimodal_audio_frames",   # windowed audio feature extraction
    # Round-6 additions
    "multimodal_png_decode",     # real PNG codec (zlib + 5 filters)
    "multimodal_gif_decode",     # real GIF codec (variable-width LZW)
    "multimodal_jpeg_decode",    # real baseline JPEG codec (DCT+Huffman)
    "multimodal_jpeg_color_decode",  # 4:4:4 color JPEG (YCbCr MCU interleave)
    "multimodal_mjpg_frame_sample",  # Motion-JPEG AVI demux + per-frame JPEG
    "multimodal_mp4_frame_sample",   # MP4/ISO-BMFF sample-table walk + JPEG
    "multimodal_flac_decode",        # FLAC fixed-predictor + Rice round trip
    "multimodal_jpeg_420_decode",    # 4:2:0 subsampled JPEG
    "multimodal_ulaw_decode",    # G.711 mu-law companding
    "multimodal_alaw_decode",    # G.711 A-law companding
    "multimodal_adpcm_decode",   # IMA ADPCM 4-bit differential PCM
    "multimodal_palette_png_decode",  # indexed-color PNG (PLTE)
    "multimodal_interlaced_png_decode",  # Adam7 seven-pass PNG
    "multimodal_progressive_jpeg_decode",  # SOF2 multi-scan JPEG
    "multimodal_png16_decode",   # 16-bit (depth-16) PNG
    "rag_chunking",              # sliding-window chunker + digests
    "bpe_train",                 # full iterative BPE merge loop
    "bpe_tokenize_stats",        # learned-tokenizer apply + budget stats
    "multimodal_tiff_decode",    # TIFF strips: PackBits + EarlyChange-LZW
    "html_text_extract",         # JVM regexp HTML→text chain
    "warc_record_stats",         # WARC writer+parser byte accounting
    "warc_crawl_pipeline",       # crawl files → records → text → gate
    "url_canonical_dedup",       # frontier URL canonicalization + dedup
    "parquet_layout_report",     # distributed footer-only storage audit
    "simhash_md5_pairs",         # oracle-checked SimHash LSH candidates
    "minhash_md5_pairs",         # oracle-checked MinHash-LSH candidates
    "cosine_lsh_md5_pairs",      # oracle-checked hyperplane cosine-LSH
    # Round-8 codec/layout closures
    "multimodal_jpeg_dri_decode",       # DRI/RSTn restart markers
    "multimodal_flac_stereo_decode",    # all four stereo assignments
    "multimodal_gif_anim_decode",       # animated GIF compositing
    "multimodal_tiff_tiled_decode",     # tiled + planar TIFF
    "multimodal_tiff16_decode",         # 16-bit TIFF
    "multimodal_flac_multichannel_decode",  # 3-8 channel FLAC
    "multimodal_adpcm_stereo_decode",   # stereo IMA ADPCM groups
    "multimodal_jpeg_noninterleaved_decode",  # §A.2 multi-scan JPEG
    "multimodal_jpeg_exif_orientation",  # APP1 tag 0x0112 transforms (r9)
    "multimodal_tiff_float_decode",      # SampleFormat-3 + predictor 3 (r9)
    "multimodal_jpeg_cmyk_decode",       # Adobe APP14 CMYK/YCCK (r9)
    "crawl_charset_detect",             # WHATWG charset chain
    "line_dedup_boilerplate",           # CCNet line-level chrome drop
    # Round-10 additions
    "multimodal_tiff_float_tiled_decode",  # tiled/planar float TIFF
    "graph_bfs_levels",                 # recursive-CTE-equivalent BFS
    "open_order_concurrency",           # sweep-line interval peak
    "doc_priority_sample",              # weighted sample w/o replacement
    "hard_negative_mining",             # contrastive-training pair mine
    "token_budget_mixture",             # budgeted mixture fill
    # Round-11 additions
    "multimodal_webp_decode",           # REAL lossless WebP/VP8L
    "multimodal_webp_anim_decode",      # ANIMATED WebP compositing
    "crawl_media_census",               # WARC content-type → codec route
    "length_bucket_padding",            # power-of-2 bucket padding waste
    # Round-13 additions (the LSH trade-off instruments)
    "minhash_estimate_audit",           # signature vs exact error dist
    "minhash_lsh_recall",               # banded-candidate recall
    "minhash_band_occupancy",           # per-band skew/volume histogram
    "simhash_estimate_audit",           # hamming→Jaccard calibration
]

# Headline set: one per capability family (SURVEY.md §7 M6).
HEADLINE = [
    "pricing_summary",          # grouped aggregation over the fact table
    "star_join_revenue",        # broadcast star join
    "multiway_star_lineitem",   # 5-way join
    "reconciliation_lag",       # flagship CDC lag report
    "cdc_merged_state",         # keyed last-write-wins merge semantics
    "log_batch_resource_agg",   # regex log parsing + grouped agg
    "topk_per_group",           # window rank-limit
    "dedup_ngram_jaccard",      # near-dup blocking join
    "dedup_minhash_lsh",        # MinHash-LSH scale path
    "similarity_topk_cosine",   # brute-force ANN baseline
    "quality_score",            # text quality expressions
    "multimodal_decode_stats",  # mapInPandas Arrow path
    "training_data_pipeline",   # composed dedup→near-dup→quality chain
    "range_join_incident_windows",  # bucketed point-in-interval join
    "hypertable_rollup",        # multi-grain time rollup, exchange reuse
]


def bench_cdc_apply(spark, n: int = 20000) -> tuple[float, int]:
    """Mirror-apply throughput: N change events through the streaming
    merge (availableNow drain), returns (seconds, events)."""
    from peerdb_cdc_psql_psql_spark.catalog import DEMO_SCHEMAS
    from peerdb_cdc_psql_psql_spark.streaming import workload
    from peerdb_cdc_psql_psql_spark.streaming.cdc import (
        Mirror,
        TableMapping,
        read_target,
        start_mirror,
    )
    rng = random.Random(42)
    events = workload.generate_order_events(
        rng, start_id=1, start_lsn=1, count=n,
        customer_ids=list(range(1, 101)), product_ids=list(range(1, 101)),
        update_fraction=0.2, delete_fraction=0.05,
    )
    with tempfile.TemporaryDirectory() as tmp:
        workload.append_events(spark, events, f"{tmp}/wal")
        mirror = Mirror(
            name="bench",
            tables={
                "orders": TableMapping(
                    "orders", "orders_cdc", DEMO_SCHEMAS["orders"], "id"
                )
            },
        )
        t0 = time.perf_counter()
        q = start_mirror(
            spark, mirror, f"{tmp}/wal", f"{tmp}/tgt", f"{tmp}/ckpt",
            trigger={"availableNow": True},
        )
        q.awaitTermination(timeout=600)
        read_target(spark, mirror, "orders", f"{tmp}/tgt").count()
        dt = time.perf_counter() - t0
    return dt, len(events)


def bench_cdc_apply_multi(spark, n_tables: int = 3) -> tuple[float, int]:
    """Multi-table mirror-apply throughput: the same drain with the
    change stream striped across orders+customers+products, exercising
    the concurrent per-table merge (one mirror, N delta logs). The
    per-event cost should stay within ~2x the single-table figure —
    the merge jobs overlap instead of serializing."""
    from peerdb_cdc_psql_psql_spark.catalog import DEMO_SCHEMAS
    from peerdb_cdc_psql_psql_spark.streaming import workload
    from peerdb_cdc_psql_psql_spark.streaming.cdc import (
        Mirror,
        TableMapping,
        read_target,
        start_mirror,
    )

    n_per = 20000 // n_tables
    rng = random.Random(7)
    orders = workload.generate_order_events(
        rng, start_id=1, start_lsn=1, count=n_per,
        customer_ids=list(range(1, 101)), product_ids=list(range(1, 101)),
        update_fraction=0.2, delete_fraction=0.05,
    )
    lsn = max(e[0] for e in orders) + 1
    customers = workload.generate_customer_events(
        rng, 1, lsn, n_per, update_fraction=0.2, delete_fraction=0.05
    )
    lsn = max(e[0] for e in customers) + 1
    products = workload.generate_product_events(
        rng, 1, lsn, n_per, update_fraction=0.2, delete_fraction=0.05
    )
    events = orders + customers + products
    with tempfile.TemporaryDirectory() as tmp:
        workload.append_events(spark, events, f"{tmp}/wal")
        mirror = Mirror(
            name="bench-multi",
            tables={
                t: TableMapping(t, f"{t}_cdc", DEMO_SCHEMAS[t], "id")
                for t in ("orders", "customers", "products")
            },
        )
        t0 = time.perf_counter()
        q = start_mirror(
            spark, mirror, f"{tmp}/wal", f"{tmp}/tgt", f"{tmp}/ckpt",
            trigger={"availableNow": True},
        )
        q.awaitTermination(timeout=600)
        for t in ("orders", "customers", "products"):
            read_target(spark, mirror, t, f"{tmp}/tgt").count()
        dt = time.perf_counter() - t0
    return dt, len(events)


def bench_stream_dedup(spark) -> tuple[float, int, int]:
    """Continuous-dedup ingest throughput: the sf documents corpus
    striped into 3 micro-batch files with planted cross-batch
    duplicates (each batch re-sends ~30% of the previous one), drained
    availableNow through the fingerprint-store anti-join. Returns
    (seconds, docs ingested, unique docs admitted)."""
    from pyspark.sql import functions as F

    from peerdb_cdc_psql_psql_spark.streaming.dedup_stream import (
        read_unique,
        start_incremental_dedup,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    total = 0
    with tempfile.TemporaryDirectory() as tmp:
        src, out, ckpt = f"{tmp}/ingest", f"{tmp}/dedup", f"{tmp}/ckpt"
        third = n // 3
        for i in range(3):
            batch = docs.filter(
                (F.col("doc_id") >= i * third)
                & (F.col("doc_id") < (i + 1) * third)
            )
            if i > 0:  # re-send a slice of the previous batch (dupes)
                resend = docs.filter(
                    (F.col("doc_id") >= i * third - third // 3)
                    & (F.col("doc_id") < i * third)
                ).withColumn("doc_id", F.col("doc_id") + 10_000_000 * i)
                batch = batch.unionByName(resend)
            total += batch.count()
            # repartition, not coalesce: the filtered frame often has
            # ONE partition, and coalesce never raises the count — the
            # 4-file-per-batch pacing silently collapsed to one gulp
            batch.repartition(4).write.mode("append").parquet(src)
        t0 = time.perf_counter()
        # 12 source files / 4-per-trigger = 3 real micro-batches (the
        # same pacing honesty fix as the near-dup bench — r5 and
        # earlier gulped the backlog in one batch)
        q = start_incremental_dedup(spark, src, out, ckpt,
                                    max_files_per_trigger=4)
        q.awaitTermination(timeout=600)
        uniq = read_unique(spark, out).count()
        dt = time.perf_counter() - t0
    return dt, total, uniq


def bench_stream_neardup(
    spark, n_docs: int = 1500, min_docs_per_batch: int | None = None
) -> tuple[float, int, int]:
    """Continuous near-dup CLUSTERING throughput: the first `n_docs`
    of the sf corpus striped into 3 micro-batches, drained through the
    postings-admission + Jaccard-edge + label-fold pipeline
    (streaming/neardup_stream.py). Returns (seconds, docs, clusters
    with >1 member in the final labeling).

    ``min_docs_per_batch=None`` measures the engine DEFAULT — as of
    r9 that auto-coalesces sub-operating-point triggers (VERDICT r8
    #6), so the paced metric reflects what default ingest actually
    does. ``min_docs_per_batch=0`` forces strict per-trigger
    clustering — the big_batch workload uses it so 3 REAL 1500-doc
    batches keep exercising the incremental batch-vs-store admission
    path (ADVICE r4) and stay comparable with the r6-r8 records."""
    from pyspark.sql import functions as F

    from peerdb_cdc_psql_psql_spark.streaming.neardup_stream import (
        read_labels,
        start_neardup_clustering,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < n_docs
    )
    with tempfile.TemporaryDirectory() as tmp:
        src, out, ckpt = f"{tmp}/ingest", f"{tmp}/state", f"{tmp}/ckpt"
        third = n_docs // 3
        for i in range(3):
            docs.filter(
                (F.col("doc_id") >= i * third)
                & (F.col("doc_id") < (i + 1) * third)
            ).repartition(4).write.mode("append").parquet(src)
        t0 = time.perf_counter()
        # 12 source files / 4-per-trigger = 3 real micro-batch
        # triggers through the checkpointed admission machinery
        kwargs = {}
        if min_docs_per_batch is not None:
            kwargs["min_docs_per_batch"] = min_docs_per_batch
        q = start_neardup_clustering(
            spark, src, out, ckpt, max_files_per_trigger=4, **kwargs
        )
        q.awaitTermination(timeout=600)
        # r14 (VERDICT r13 #2): the timed window now ends when the
        # stream drains — verification below is bookkeeping, not
        # engine throughput, and keeping it inside the window made
        # harness edits (the r13 two-counts→one-aggregate fold) leak
        # into the docs/s record. This re-bases stream_neardup and
        # stream_neardup_big_batch; r13 record (verify-in-window):
        # 344.1 / 289.7 docs/s. Other stream metrics untouched for
        # comparability.
        dt = time.perf_counter() - t0
        labels = read_labels(spark, out)
        row = (
            labels.groupBy("cluster_id")
            .count()
            .agg(
                F.sum("count").alias("docs"),
                F.sum(
                    F.when(F.col("count") > 1, 1).otherwise(0)
                ).alias("multi"),
            )
            .collect()[0]
        )
        n_labeled, n_clusters = int(row["docs"]), int(row["multi"])
    return dt, n_labeled, n_clusters


def bench_stream_crawl(spark, n_docs: int = 960) -> tuple[float, int, int]:
    """Chained crawl→dedup ingest throughput (VERDICT r6 #3 / r7 #7):
    the first `n_docs` of the sf corpus synthesized into multi-record
    `.warc.gz` drop files (16 docs/file — operators/web's layout),
    drained through BOTH continuous stages back to back exactly as the
    equivalence test composes them (streaming/crawl_stream.py:
    binaryFile → WARC parse → JVM extract → parquet, then
    dedup_stream's fingerprint-store admission over the crawl output).
    Pacing honesty: each stage is paced to ≥3 real micro-batches and
    the progress log is ASSERTED on, so the metric can't silently
    degrade to a one-gulp batch. Returns (seconds, docs ingested,
    unique docs admitted)."""
    from pyspark.sql import functions as F

    from peerdb_cdc_psql_psql_spark.operators.web import (
        synthesize_crawl_files,
    )
    from peerdb_cdc_psql_psql_spark.streaming.crawl_stream import (
        start_crawl_ingest,
    )
    from peerdb_cdc_psql_psql_spark.streaming.dedup_stream import (
        read_unique,
        start_incremental_dedup,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < n_docs
    )
    n = docs.count()
    with tempfile.TemporaryDirectory() as tmp:
        drop = f"{tmp}/drop"
        os.makedirs(drop)
        files = synthesize_crawl_files(docs).collect()
        for r in files:
            with open(f"{drop}/crawl-{r['crawl_id']:06d}.warc.gz", "wb") as f:
                f.write(bytes(r["payload"]))
        per_trigger = max(1, len(files) // 3)
        t0 = time.perf_counter()
        q1 = start_crawl_ingest(
            spark, drop, f"{tmp}/docs", f"{tmp}/ckpt1",
            max_files_per_trigger=per_trigger,
        )
        q1.awaitTermination(timeout=600)
        b1 = sum(1 for p in q1.recentProgress if p["numInputRows"] > 0)
        q2 = start_incremental_dedup(
            spark, f"{tmp}/docs", f"{tmp}/dedup", f"{tmp}/ckpt2",
            max_files_per_trigger=max(
                1, len(os.listdir(f"{tmp}/docs")) // 4
            ),
        )
        q2.awaitTermination(timeout=600)
        b2 = sum(1 for p in q2.recentProgress if p["numInputRows"] > 0)
        uniq = read_unique(spark, f"{tmp}/dedup").count()
        dt = time.perf_counter() - t0
    assert b1 >= 3, f"crawl stage gulped the backlog in {b1} batches"
    assert b2 >= 2, f"dedup stage gulped the backlog in {b2} batches"
    return dt, n, uniq


def build_replicated_corpus(spark, sf_dir: str, k: int, out_dir: str) -> str:
    """Materialize a k× corpus layout under ``out_dir``: documents
    replicated k times with per-replica DISJOINT vocabularies (every
    token suffixed ``_ri``, doc ids offset by i×10⁹ — the same
    construction as tests/test_scaling.py), all other tables
    symlinked. The 1× layout is written through the SAME path (k=1)
    so layout/file-count effects cancel out of the k×/1× ratio."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps = None
    for i in range(k):
        toks = F.transform(
            F.split(F.col("text"), " "), lambda t: F.concat(t, F.lit(f"_r{i}"))
        )
        r = docs.select(
            (F.col("doc_id") + i * 10**9).alias("doc_id"),
            F.concat_ws(" ", toks).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        ).select(*docs.columns)
        reps = r if reps is None else reps.unionByName(r)
    reps.repartition(4 * k).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    # Relational weak-scaling twin (VERDICT r5 #5): lineitem + orders
    # replicated with DISJOINT key spaces (order/part/supp/cust keys
    # offset by i×10⁹) — no cross-replica baskets or co-purchase
    # edges, so the graph/set-similarity probes must scale with k,
    # not k².
    _KEY_OFFSETS = {
        "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
        "orders": ("o_orderkey", "o_custkey"),
    }
    for t, keycols in _KEY_OFFSETS.items():
        base = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        reps = None
        for i in range(k):
            r = base.select(
                *[
                    (F.col(c) + i * 10**9).alias(c) if c in keycols else F.col(c)
                    for c in base.columns
                ]
            )
            reps = r if reps is None else reps.unionByName(r)
        reps.repartition(4 * k).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    # Embeddings replicated with per-replica DETERMINISTIC sign flips
    # (element d of replica i multiplied by ±1 from md5(f"er{i}:{d}"),
    # replica 0 = identity) and vec_ids offset by i×10⁹: within-
    # replica geometry (pairwise dots, norms) is preserved exactly,
    # while cross-replica vectors decorrelate — identical copies would
    # collide into the same LSH buckets with cosine 1.0 and fake a k²
    # candidate blow-up that no real corpus has.
    import hashlib as _hl

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(base.select("embedding").first()[0])
    reps = None
    for i in range(k):
        if i == 0:
            r = base
        else:
            signs = F.array(*[
                F.lit(
                    1.0
                    if int(_hl.md5(f"er{i}:{d}".encode()).hexdigest()[:2], 16) & 1
                    else -1.0
                )
                for d in range(dim)
            ])
            r = base.withColumn(
                "embedding",
                F.zip_with(
                    F.col("embedding").cast("array<double>"), signs,
                    lambda x, s: x * s,
                ).cast("array<float>"),
            )
        r = r.withColumn("vec_id", F.col("vec_id") + i * 10**9)
        reps = r if reps is None else reps.unionByName(r)
    reps.repartition(2 * k).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    for t in (
        "region", "nation", "customer", "supplier", "part", "events",
    ):
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{sf_dir}/{t}.parquet", dst)
    return out_dir


SCALE_PROBE_QUERIES = [
    # the documents-pack flagships whose 100 TB story is "work grows
    # linearly with the corpus": shared bucketed shingle index
    # derivation + blocked candidate join, iterative CC, MinHash-LSH
    # banding, and the composed curation chain.
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_minhash_lsh",
    "training_data_pipeline",
    "text_suite",
    # the two slowest singles — exactly the quadratic-shaped plans the
    # probe exists to watch (VERDICT r5 #5): wedge-join triangle census
    # and inverted-index basket similarity, on the k×-replicated
    # disjoint-key lineitem/orders.
    "part_triangle_stats",
    "customer_similarity_topk",
    # r6 oracle-checked LSH twins — full-corpus document ops whose
    # 100 TB story is band-bucketed (never all-pairs) joins. The fixed
    # 4×12-bit SimHash banding is supra-k BY CONSTRUCTION (bucket
    # occupancy grows with the corpus); simhash_adaptive_bands makes
    # the widen-with-corpus lever part of the plan — the two run side
    # by side so the ratio difference is driver-recorded.
    "simhash_md5_pairs",
    "simhash_adaptive_bands",
    "minhash_md5_pairs",
    # r8: corpus-adaptive cosine-LSH on the sign-flip-replicated
    # embeddings (1× = 2k vectors → 6 planes, 4× = 8k → 8 planes; the
    # ladder holds E[vectors/bucket] flat). Its fixed 4-plane sibling
    # (cosine_lsh_md5_pairs) is deliberately NOT probed: 16 buckets
    # forever means ~k² candidate growth at k=4 — the gate-breaking
    # quadratic the adaptive form exists to replace (the SimHash
    # fixed/adaptive pair above already records that contrast; the
    # cosine fixed form's occupancy at probe scale is ~30× SimHash's).
    "cosine_lsh_adaptive_planes",
]

# Deliberately-fixed record forms (VERDICT r8 #4): kept in the probe
# TABLE so the fixed-vs-adaptive contrast stays driver-recorded every
# round, but excluded from the GATED max — they are supra-k by
# construction (fixed band width ⇒ bucket occupancy grows with the
# corpus) and are explicitly not the production path (their adaptive
# siblings are). One occupancy wobble on a record form must not fail
# the round's gate.
SCALE_PROBE_RECORD_ONLY = {"simhash_md5_pairs"}

# Leg-calibration microbench size: half the session anchor's rows —
# only RATIOS consume leg calibrations, so the absolute scale cancels
# and the smaller bench keeps the 66-leg overhead near a minute.
_LEG_CALIB_ROWS = 5_000_000


def scale_probe(
    spark, sf_dir: str, k: int, workdir: str, queries: list[str] | None = None
) -> tuple[dict, dict]:
    """Timed weak-scaling point (VERDICT r4 next-round #6): run the
    blocked/bucketed doc-pack queries on a 1× and a k× disjoint-
    vocabulary corpus and report per-query wall ratios. Linear paths
    show ratio ≈ k (plus fixed overhead); an accidental all-pairs
    regression would show ≈ k².

    LEG CALIBRATION (r12, VERDICT r11 next-round #1): r11's driver
    recorded part_triangle_stats at ratio 6.69 where two clean
    same-code runs read 1.57-3.13 — the probe's 4× legs land in
    whatever host phase the session happens to be in, and a ~30%
    within-session host drift multiplies straight into the gated
    ratio. Each (pass, scale, query) measurement is now immediately
    preceded by a 1-pass host-speed microbench (same seeded
    hash-agg shape as calibrate()), and every sample is recorded both
    raw and divided by its adjacent calibration. ``ratio_calibrated``
    — the gated form — is the ratio of calibrated medians, so a host
    phase that slows BOTH the query and its adjacent microbench
    cancels out instead of masquerading as super-linear scaling.

    Returns (per-query table, leg-calibration summary)."""
    from peerdb_cdc_psql_psql_spark.operators import dedup as _dedup

    queries = queries or SCALE_PROBE_QUERIES
    out: dict[str, dict] = {}
    dirs = {
        1: build_replicated_corpus(spark, sf_dir, 1, f"{workdir}/x1"),
        k: build_replicated_corpus(spark, sf_dir, k, f"{workdir}/x{k}"),
    }
    samples: dict[int, dict[str, list[float]]] = {1: {}, k: {}}
    cal_samples: dict[int, dict[str, list[float]]] = {1: {}, k: {}}
    legcals: list[float] = []
    retries: list[str] = []
    # output volume per scale (deterministic): lets an output-bound
    # query's wall ratio be read against its RESULT growth — the r11
    # simhash attribution (pairs ×4.14 while wall ×2.08) needed this
    # measured by hand; now it's on every probe record
    out_rows: dict[int, dict[str, int]] = {}
    # Warm the microbench's codegen path before the first measured leg
    # (a standalone probe session otherwise pays whole-stage-codegen
    # compilation entirely on leg 1's calibration — observed as a
    # 5.9 s first sample against a 0.6 s warm floor). Discarded.
    calibrate(spark, rows=_LEG_CALIB_ROWS, passes=1)
    # Median-of-3 per (scale, query) (VERDICT r7 #9): r7 proved the
    # probe swings ~2× on byte-identical code
    # (customer_similarity_topk t4 29.1 → 15.4 s), which made the ≤4
    # ratio gate a coin flip near the boundary. Three passes, the
    # RATIO reads the medians (min still recorded for comparability
    # with r6/r7). Caches/shared index dropped per pass so each pass
    # still pays full work.
    #
    # Scales INTERLEAVE within each pass (r10): the old
    # all-1×-then-all-4× order measured every 4× wall in a session
    # 10+ minutes older than its 1× counterpart — heap fragmentation
    # and JIT-state drift landed entirely on the numerator, a
    # systematic bias AGAINST the k× side of the very ratio being
    # gated (observed: 4× medians 18→22 s across otherwise-identical
    # runs late in a bench session). Interleaving measures both
    # scales of a pass under comparable session age; per-query
    # hygiene (cache clear + GC) is unchanged.
    for _pass in range(3):
        for kk, d in dirs.items():
            for name in queries:
                # Hygiene PER QUERY, not per pass: several probed
                # operators persist() query-scoped intermediates
                # (shingle index, oriented edge tables, baskets) with
                # no caller-side lifecycle, so a per-pass clear lets
                # query N's 4× cache inflate query N+1's measurement —
                # the r6 basket-similarity ratio read 5.5 under a
                # neighbor's leaked cache and 2.3 clean. Each query
                # pays its own full work against a quiet heap.
                spark.catalog.clearCache()
                for t in list(_dedup._INDEX_MEMO):
                    spark.sql(f"DROP TABLE IF EXISTS {t}")
                _dedup._INDEX_MEMO.clear()
                # The probe runs last in a ~30 min session; without an
                # explicit collection the 4× passes measure old-gen GC
                # debt from earlier workloads, not scaling (fresh-
                # session re-measurement of the worst r6 ratio:
                # 5.3 → 2.7).
                spark._jvm.System.gc()
                # adjacent host-speed sample right before the
                # measurement (leg calibration). MIN-of-3 half-size
                # passes: a single 1-pass sample proved steal-fragile,
                # and median-of-3 still let one sustained ~8 s steal
                # read 6.5 s (13× the clean floor) and over-correct the
                # gated ratio — a steal can only INFLATE a fixed-work
                # microbench, so the min estimates the phase's true
                # capability while still tracking genuine slow phases
                # (all three minis slow together). The absolute scale
                # cancels in the ratio, so the leg microbench can be
                # smaller than the session anchor's.
                leg = calibrate(
                    spark, rows=_LEG_CALIB_ROWS, passes=3, agg="min"
                )
                legcals.append(leg)
                t0 = time.perf_counter()
                try:
                    n_rows = len(REGISTRY[name].fn(spark, d).collect())
                except Exception as e:  # noqa: BLE001
                    # Evidence-loss guard at QUERY granularity (r13):
                    # one transient task failure (observed once:
                    # FAILED_READ_FILE on a just-recreated shingle
                    # index table — a stale cached file listing) used
                    # to abort the WHOLE probe and cost the round its
                    # scaling record. Re-run the hygiene and retry
                    # ONCE, on the record; a second failure still
                    # propagates.
                    print(json.dumps({
                        "detail": "probe_query_retry", "query": name,
                        "scale": kk, "err": str(e)[:200],
                    }))
                    retries.append(f"{name}@{kk}x")
                    spark.catalog.clearCache()
                    for t in list(_dedup._INDEX_MEMO):
                        spark.sql(f"DROP TABLE IF EXISTS {t}")
                    _dedup._INDEX_MEMO.clear()
                    t0 = time.perf_counter()
                    n_rows = len(REGISTRY[name].fn(spark, d).collect())
                dt = round(time.perf_counter() - t0, 3)
                samples[kk].setdefault(name, []).append(dt)
                cal_samples[kk].setdefault(name, []).append(
                    dt / leg if leg else dt
                )
                out_rows.setdefault(kk, {})[name] = n_rows
    import statistics as _stats

    for name in queries:
        m1 = round(_stats.median(samples[1][name]), 3)
        mk = round(_stats.median(samples[k][name]), 3)
        c1 = _stats.median(cal_samples[1][name])
        ck = _stats.median(cal_samples[k][name])
        r1 = out_rows.get(1, {}).get(name, 0)
        rk = out_rows.get(k, {}).get(name, 0)
        out[name] = {
            "t1": min(samples[1][name]), f"t{k}": min(samples[k][name]),
            "t1_median": m1, f"t{k}_median": mk,
            "ratio": round(mk / m1, 2),
            # host-drift-cancelled form (the gated one from r12 on)
            "t1_cal_median": round(c1, 3),
            f"t{k}_cal_median": round(ck, 3),
            "ratio_calibrated": round(ck / c1, 2) if c1 else None,
            # output-volume attribution for result-bound queries
            "rows1": r1, f"rows{k}": rk,
            "rows_ratio": round(rk / r1, 2) if r1 else None,
        }
    legcal = {
        "samples": len(legcals),
        "min": round(min(legcals), 3),
        "median": round(_stats.median(legcals), 3),
        "max": round(max(legcals), 3),
        "drift_max_over_min": round(max(legcals) / min(legcals), 2),
        # transparency: which (query, scale) legs needed the one
        # permitted transient-failure retry (empty = clean probe)
        "retried": retries,
    }
    return out, legcal


# Reference host speed for calibration-normalized SECONDS: the r11
# clean-run session-mean calibration (start 0.754, end 0.987 — the
# mean absorbs within-session host drift, which the r11 runs measured
# at up to 30%). headline_normalized_seconds = raw_headline *
# (REF / mean(calib, calib_end)) — "what this run's headline would
# read on the r11 reference host". Dimensionless headline_per_calib
# is also recorded (no anchoring constant).
_CALIB_REF_SECONDS = 0.87


def calibrate(
    spark, rows: int = 10_000_000, passes: int = 3, agg: str = "median"
) -> float:
    """Host-speed calibration (VERDICT r10 next-round #2).

    Fixed-size, seeded, testdata-independent CPU+shuffle microbench:
    10M synthetic rows -> xxhash64 key derivation -> hash aggregate
    over 100k groups -> global sort -> top-100 collect. Median of
    ``passes``. Deliberately uses NO engine code and NO testdata: the
    number measures the HOST (JVM + CPU + shuffle fabric) so engine
    deltas can be separated from host-speed changes across rounds
    (the r10 mid-round host swap made raw wall-clock incomparable —
    README r10 log). ``headline_per_calib`` = headline total divided
    by this figure is the cross-round comparable form.
    """
    from pyspark.sql import functions as F

    samples: list[float] = []
    for _ in range(passes):
        t0 = time.perf_counter()
        (
            spark.range(0, rows, 1, CPUS)
            .select(
                (F.xxhash64("id") % 100_000).alias("k"),
                (F.xxhash64("id", F.lit(1)) % 1_000_000).cast("double").alias("v"),
            )
            .groupBy("k")
            .agg(
                F.count("*").alias("n"),
                F.sum("v").alias("s"),
                F.avg("v").alias("a"),
            )
            .orderBy(F.desc("s"))
            .limit(100)
            .collect()
        )
        samples.append(time.perf_counter() - t0)
    samples.sort()
    if agg == "min":
        return round(samples[0], 3)
    return round(samples[len(samples) // 2], 3)


def main() -> None:
    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM/codegen paths AND the Python/Arrow worker pool
    # outside the timed region (workers are reused afterwards —
    # steady-state is what we measure).
    REGISTRY["count_per_table"].fn(spark, SF_DIR).collect()
    spark.range(0, 1000, 1, CPUS).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # insert.ps1's own benchmark at its default scenario (5000 records,
    # batch 500 — README.md:124-126), unthrottled: directly comparable
    # to BASELINE.md's 1.04 ops/s sample run. Runs FIRST (fresh
    # session, VERDICT r4 #4: the r3→r4 95→1299 ops/s swing was
    # session GC state, not the engine) and again LAST so the
    # session-state offset is itself on record each round.
    from peerdb_cdc_psql_psql_spark.streaming.workload import run_insert_stress

    # Host-speed calibration BEFORE any engine workload (canonical
    # position) and again at end-of-bench; both recorded so a
    # mid-bench host-speed shift is itself visible.
    calib = calibrate(spark)

    with tempfile.TemporaryDirectory() as tmp:
        stress = run_insert_stress(
            spark, f"{tmp}/wal", record_count=5000, batch_size=500
        )

    # Scale probe at SESSION START (r12 final position; VERDICT r11
    # next-round #1 offered "move the probe to session start" as the
    # alternate fix and the first r12 placement — after the suites —
    # proved it necessary: customer_similarity_topk read 8.35 raw /
    # 5.04 calibrated after ~470 suite executions had aged the shared
    # local-mode heap, while the SAME code on a fresh session read
    # 2.17 / 2.56. Local[32] shares ONE heap across all task slots, so
    # late-session GC debt lands on exactly the big-working-set 4×
    # legs the gate watches — a local-mode artifact, not plan scaling
    # (cluster executors have independent, continuously-collected
    # heaps). The probe now measures plan scaling on a quiet heap, and
    # leg calibration still corrects the residual host phase.
    # Evidence-loss guard (the r4 lesson): a failure here must cost
    # only the probe's fields, never the round's metrics line.
    try:
        with tempfile.TemporaryDirectory() as tmp:
            probe, probe_legcal = scale_probe(spark, SF_DIR, 4, tmp)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"detail": "scale_probe_error", "err": str(e)[:300]}))
        probe, probe_legcal = {}, {}

    # ADJACENT calibration legs (r12, extended to the headline suite in
    # r13 — VERDICT r12 wrong #1): a min-of-3 host sample taken
    # immediately before each block feeds an `*_adjacent_normalized`
    # twin (value × leg ÷ anchor = "this figure on the reference
    # host", phase-local). The session-MEAN `*_normalized` twins stay
    # for continuity, but when start/end calib diverge 2×+ the mean
    # misattributes — the adjacent form is the authoritative one.
    adj: dict[str, float] = {}

    def _leg(name: str) -> float:
        # min-of-3 (steal-robust, same estimator as the probe's leg
        # calibration) at FULL anchor size: these legs divide by
        # calib_anchor, so they must be measured in the anchor's
        # units (the probe/A/B legs only feed ratios, where the
        # microbench scale cancels)
        v = calibrate(spark, passes=3, agg="min")
        adj[name] = v
        return v

    # Multiple passes, report per-query min: the host shows transient
    # ~60 s external CPU steals that would otherwise land on one
    # arbitrary query; min-of-N measures the engine, not the noise.
    times: dict[str, float] = {}
    extra_times: dict[str, float] = {}
    from peerdb_cdc_psql_psql_spark.operators import dedup as _dedup

    # Bracket the suites phase (headline + extra interleave in one
    # loop, so the bracket spans both — phase-local host correction is
    # the goal, not per-query correction) with the same min-of-3
    # anchor legs the throughput blocks got in r12. Their mean feeds
    # headline_adjacent_normalized (VERDICT r12 wrong #1: run B's
    # session-mean calib 1.073→2.533 drift overstated the normalized
    # headline ~2×; adjacent legs make the field drift-robust).
    _leg("headline_pre")

    # Headline: min-of-3 (pass 1 is dominated by whole-stage-codegen
    # compilation — observed ~30-40% inflation on repeat probes — and
    # the host shows transient external CPU steals; three passes give
    # min() a genuinely warm, steal-free sample). The extra suite stays
    # at 2 passes: 105 queries × ~1 s makes a third pass cost more than
    # the noise it removes.
    for _pass in range(3):
        # drop persisted intermediates so each pass pays full cost
        # (cache sharing within a pass is legitimate; across passes it
        # would measure cache hits, not work). The shared bucketed
        # shingle index is an on-disk intermediate with the same rule:
        # dropped per pass, so dedup_ngram_jaccard pays derivation+write
        # and dedup_clusters/minhash measure the designed reuse.
        spark.catalog.clearCache()
        for t in list(_dedup._INDEX_MEMO):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        _dedup._INDEX_MEMO.clear()
        for name in HEADLINE:
            fn = REGISTRY[name].fn
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            dt = round(time.perf_counter() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
        if _pass >= 2:
            continue  # extra suite: 2 passes only (see above)
        spark.catalog.clearCache()
        for name in EXTRA:
            fn = REGISTRY[name].fn
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            dt = round(time.perf_counter() - t0, 3)
            extra_times[name] = min(extra_times.get(name, dt), dt)

    # closing bracket of the suites phase (see headline_pre above)
    _leg("headline_post")

    _leg("cdc_apply")
    cdc_sec, cdc_events = min(
        (bench_cdc_apply(spark) for _ in range(2)), key=lambda t: t[0]
    )
    # Interleaved same-boot A/B of the narrow-start merge exemption
    # (VERDICT r11 next-round #6): 3 pairs, alternating arms, each arm
    # with an adjacent 1-pass calibration so the r11 cdc_apply_4x
    # 57k→44.5k swing can be attributed host-vs-engine next time it
    # moves. Detail-line only — the canonical cdc_apply figures above
    # keep their cross-round basis.
    try:
        from peerdb_cdc_psql_psql_spark.streaming import cdc as _cdc_mod

        ab: dict[str, list[float]] = {"exempt_on": [], "exempt_off": []}
        ab_cal: dict[str, list[float]] = {"exempt_on": [], "exempt_off": []}
        try:
            for _ in range(3):
                for arm, flag in (
                    ("exempt_on", True), ("exempt_off", False)
                ):
                    _cdc_mod.NARROW_START_EXEMPTION = flag
                    leg = calibrate(
                        spark, rows=_LEG_CALIB_ROWS, passes=3, agg="min"
                    )
                    s, n = bench_cdc_apply(spark)
                    ab[arm].append(round(n / s, 1))
                    ab_cal[arm].append(round(n / s * leg, 1))
        finally:
            # a mid-A/B failure must not leave the production flag off
            # for the stream benches that follow
            _cdc_mod.NARROW_START_EXEMPTION = True
        import statistics as _st

        print(json.dumps({
            "detail": "cdc_apply_exemption_ab",
            "events_per_sec": {a: v for a, v in ab.items()},
            "median": {a: _st.median(v) for a, v in ab.items()},
            "median_leg_calibrated": {
                a: round(_st.median(v), 1) for a, v in ab_cal.items()
            },
            "note": "3 interleaved pairs on one boot; calibrated = "
            "rate x adjacent host-calib seconds (dimensionless-ish "
            "twin that cancels host phase)",
        }))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"detail": "cdc_ab_error", "err": str(e)[:300]}))
    # CDC weak-scaling point: one 4x-backlog drain — events/s should
    # hold (the merge is O(batch + target) per micro-batch); a
    # superlinear apply path would show throughput collapsing here.
    try:
        _leg("cdc_apply_4x")
        cdc4_sec, cdc4_events = bench_cdc_apply(spark, n=80000)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"detail": "cdc4x_error", "err": str(e)[:300]}))
        cdc4_sec, cdc4_events = float("inf"), 0
    _leg("cdc_apply_multi")
    cdc_multi_sec, cdc_multi_events = min(
        (bench_cdc_apply_multi(spark) for _ in range(2)), key=lambda t: t[0]
    )

    _leg("stream_dedup")
    sd_sec, sd_docs, sd_uniq = min(
        (bench_stream_dedup(spark) for _ in range(2)), key=lambda t: t[0]
    )

    # Per-stage cost breakdown for the near-dup stream (VERDICT r7
    # #8): the ~4.5 s/batch floor is fixed plan-construction +
    # scheduling latency, not per-doc work — this table pins WHERE,
    # so a regression in one stage is visible and the batch-size
    # operating point (amortize the floor with >=4500-doc batches,
    # see start_neardup_clustering's docstring) stays justified.
    from peerdb_cdc_psql_psql_spark.streaming import neardup_stream as _ns

    _ns.PROFILE = []
    _leg("stream_neardup")
    nd_sec, nd_docs, nd_clusters = min(
        (bench_stream_neardup(spark) for _ in range(2)), key=lambda t: t[0]
    )
    nd_stages: dict[str, float] = {}
    for _bid, _stage, _s in _ns.PROFILE:
        nd_stages[_stage] = round(nd_stages.get(_stage, 0.0) + _s, 3)
    _ns.PROFILE = None
    print(json.dumps({
        "detail": "stream_neardup_stage_profile",
        "stage_seconds_over_all_passes": nd_stages,
        "note": "build_plans/read/contract/state_writes — the "
        "scheduler-bound floor; per-doc work is the small remainder "
        "(r13: the three state writes submit concurrently, so the "
        "former write+appends stages are one overlapped stage)",
    }))

    # Chained crawl→dedup metric (VERDICT r7 #7): the composed two-
    # stage ingest existed and was equivalence-tested but had no
    # recorded number, so it could regress invisibly.
    try:
        _leg("stream_crawl")
        cr_sec, cr_docs, cr_uniq = min(
            (bench_stream_crawl(spark) for _ in range(2)), key=lambda t: t[0]
        )
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"detail": "stream_crawl_error", "err": str(e)[:300]}))
        cr_sec, cr_docs, cr_uniq = float("inf"), 0, 0

    # Batch-size amortization point (r6 profile: ~4.5 s/batch is FIXED
    # job/stage/plan latency — pairs pipeline stages, label fold,
    # snapshot write — not per-doc work; 500-doc batches price that
    # at ~110 docs/s). The same paced path at 3× the batch size pins
    # the claim with a recorded number instead of an argument.
    try:
        _leg("stream_neardup_big_batch")
        ndb_sec, ndb_docs, _ = bench_stream_neardup(
            spark, n_docs=4500, min_docs_per_batch=0
        )
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"detail": "neardup_bigbatch_error", "err": str(e)[:300]}))
        ndb_sec, ndb_docs = float("inf"), 0

    # insert stress again at end-of-bench: the first-position figure
    # above is canonical; this one quantifies the session-state offset.
    with tempfile.TemporaryDirectory() as tmp:
        stress_end = run_insert_stress(
            spark, f"{tmp}/wal", record_count=5000, batch_size=500
        )

    calib_end = calibrate(spark)

    total = round(sum(times.values()), 3)
    # Pinned manifest (VERDICT r3 #8): which workloads ran, in what
    # order, with what aggregation — keeps cross-round numbers
    # comparable. Emitted as its OWN line (and the per-query extra
    # suite as another): the driver tail-captures only the last ~2 KB
    # of stdout, and r4's single merged line outgrew that window,
    # leaving the round with parsed=null (VERDICT r4 "What's wrong"
    # #1). Detail lines first, compact metrics line LAST.
    manifest = [
        {"name": "calibration", "rows": 10_000_000, "passes": 3,
         "agg": "median", "order": "first (pre-stress) + last as *_end",
         "shape": "seeded xxhash64 -> 100k-group hash agg -> sort "
         "-> top-100; no engine code, no testdata — measures the "
         "HOST so cross-round engine deltas separate from host "
         "swaps (r10 reboot lesson)"},
        {"name": "insert_stress", "records": 5000, "batch_size": 500,
         "order": "first (fresh session) + repeated last as *_end"},
        {"name": "headline_suite", "queries": HEADLINE, "passes": 3,
         "agg": "min", "timed": "collect wall-clock",
         "bracket_legs": "min-of-3 host anchor legs pre/post the "
         "suites phase (r13) -> headline_adjacent_normalized"},
        {"name": "extra_suite", "queries": EXTRA, "passes": 2, "agg": "min"},
        {"name": "cdc_apply", "events": 20000, "passes": 2, "agg": "min"},
        {"name": "cdc_apply_4x", "events": 80000, "passes": 1},
        {"name": "cdc_apply_multi", "events": 20000, "tables": 3,
         "passes": 2, "agg": "min"},
        {"name": "stream_dedup", "batches": 3, "resend_fraction": 0.33,
         "max_files_per_trigger": 4, "passes": 2, "agg": "min",
         "basis_note": "r6 paces the drain into 3 real micro-batches "
         "(r5 and earlier gulped the backlog in one batch); values are "
         "not directly comparable to BENCH_r05's 4604 docs/s"},
        {"name": "stream_neardup", "batches": 3, "docs": 1500,
         "max_files_per_trigger": 4, "passes": 2, "agg": "min",
         "basis_note": "ENGINE DEFAULT behavior per round: r6-r8 paid "
         "the ~4.5 s fixed floor per micro-batch (103-110 docs/s); as "
         "of r9 sub-operating-point triggers auto-coalesce via the "
         "durable spool (VERDICT r8 #6), so the 3 paced triggers spool "
         "cheap and cluster once — same labeling (equivalence-pinned), "
         "fixed floor paid once. Not comparable to r5's one-gulp 109.6 "
         "(pacing bug, fixed r6)"},
        {"name": "stream_crawl", "docs": 960, "docs_per_file": 16,
         "passes": 2, "agg": "min", "stages": "crawl ingest (>=3 "
         "batches, asserted) then fingerprint dedup (>=2 batches, "
         "asserted), both availableNow, wall = both drains"},
        {"name": "stream_neardup_big_batch", "batches": 3, "docs": 4500,
         "max_files_per_trigger": 4, "passes": 1,
         "min_docs_per_batch": 0,
         "basis_note": "strict per-trigger mode: 3 REAL 1500-doc "
         "clustering batches keep the incremental batch-vs-store "
         "admission path benchmarked (the default-pacing metric above "
         "now auto-coalesces, r9) and stay comparable with r6-r8"},
        {"name": "scale_probe", "k": 4, "queries": SCALE_PROBE_QUERIES,
         "record_only": sorted(SCALE_PROBE_RECORD_ONLY),
         "passes": 3, "scales_interleaved_per_pass": True,
         "order": "MOVED r12: SESSION START (after insert-stress, "
         "before the suites — an aged shared local heap landed its GC "
         "debt on the big-working-set 4x legs); each measurement is "
         "preceded by a median-of-3 host calibration and the GATED "
         "form is ratio_calibrated (r11 #1)",
         "agg": "ratio of medians per (scale, query), raw AND "
         "leg-calibrated; min also recorded (r6/r7 comparability); "
         "gated max excludes record_only fixed-band forms (r8 #4)",
         "corpus": "documents ×k disjoint vocab; lineitem/orders ×k "
         "disjoint keys; embeddings ×k sign-flip decorrelated"},
        {"name": "cdc_apply_exemption_ab", "pairs": 3,
         "arms": ["exempt_on", "exempt_off"],
         "order": "interleaved after canonical cdc_apply (r11 #6)"},
    ]
    print(json.dumps({"detail": "workloads", "workloads": manifest}))
    print(json.dumps({"detail": "extra_queries", "extra_queries": extra_times}))
    print(json.dumps({"detail": "scale_probe", "scale_probe": probe,
                      "leg_calibration": probe_legcal}))
    # Per-query headline timings in the PARSED record (VERDICT r12
    # next-round #1: r12's spill tier moved the map to a detail line
    # the driver's 2000-char tail capture dropped, losing the
    # round-over-round per-query regression signal). Compact form:
    # top-8 by time, 0.01 s rounding — fits the 1900-char budget; the
    # full-precision 15-query map always rides its own detail line.
    print(json.dumps({"detail": "headline_queries", "queries": times}))
    times_compact = {
        k: round(v, 2)
        for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:8]
    }
    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": times_compact,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "extra_suite_seconds": round(sum(extra_times.values()), 3),
        "extra_suite_count": len(extra_times),
        "cdc_apply_events_per_sec": round(cdc_events / cdc_sec, 1),
        "cdc_apply_4x_events_per_sec": round(cdc4_events / cdc4_sec, 1),
        "cdc_apply_multi_tables": 3,
        "cdc_apply_multi_events_per_sec": round(cdc_multi_events / cdc_multi_sec, 1),
        "stream_dedup_docs_per_sec": round(sd_docs / sd_sec, 1),
        "stream_neardup_docs_per_sec": round(nd_docs / nd_sec, 1),
        "stream_neardup_big_batch_docs_per_sec": round(ndb_docs / ndb_sec, 1),
        "stream_crawl_docs_per_sec": round(cr_docs / cr_sec, 1),
        "stream_crawl_unique_docs": cr_uniq,
        "scale_probe_k": 4,
        # gated max = production forms only (record-only fixed-band
        # forms stay in the probe detail table above but can't fail
        # the gate — VERDICT r8 #4). From r12 the GATED form is the
        # leg-CALIBRATED ratio (r11 #1); raw stays for comparability.
        "scale_probe_max_ratio": max(
            (v["ratio"] for q, v in probe.items()
             if q not in SCALE_PROBE_RECORD_ONLY), default=None
        ),
        "scale_probe_max_ratio_calibrated": max(
            (v["ratio_calibrated"] for q, v in probe.items()
             if q not in SCALE_PROBE_RECORD_ONLY
             and v.get("ratio_calibrated") is not None), default=None
        ),
        "scale_probe_max_ratio_all": max(
            (v["ratio"] for v in probe.values()), default=None
        ),
        "insert_stress_ops_per_sec": stress["ops_per_sec"],
        # median per-batch rate: host-noise-robust twin (a transient
        # scheduler steal poisons wall-clock ops/s but not the median
        # batch; divergence between the two flags noise, not engine)
        "insert_stress_median_ops_per_sec": stress["median_ops_per_sec"],
        "insert_stress_success_rate_pct": stress["success_rate_pct"],
        "insert_stress_avg_batch_ms": stress["avg_batch_ms"],
        "insert_stress_end_ops_per_sec": stress_end["ops_per_sec"],
        "insert_stress_end_median_ops_per_sec": stress_end["median_ops_per_sec"],
        "calib_seconds": calib,
        "calib_seconds_end": calib_end,
        # the anchoring constant, PINNED IN THE JSON (VERDICT r11
        # wrong #3: it lived only in prose, so future rounds could
        # silently re-anchor) — the r11 clean-run session-mean calib
        "calib_anchor": _CALIB_REF_SECONDS,
        # dimensionless, host-independent headline: raw total divided
        # by the host calibration — the cross-round comparable figure
        "headline_per_calib": round(total / calib, 3) if calib else None,
        # same signal anchored in SECONDS on the r11 reference host;
        # basis = session-mean calibration (start/end) so within-run
        # host drift doesn't land entirely on one anchor
        "headline_normalized_seconds": (
            round(total * _CALIB_REF_SECONDS / ((calib + calib_end) / 2), 3)
            if calib and calib_end else None
        ),
        # drift-robust twin (VERDICT r12 wrong #1): same anchoring,
        # but the basis is the mean of the two min-of-3 legs that
        # BRACKET the suites phase — a 2.4× intra-session calib drift
        # (run B) no longer lands on the headline figure
        "headline_adjacent_normalized": (
            round(
                total * _CALIB_REF_SECONDS
                / ((adj["headline_pre"] + adj["headline_post"]) / 2),
                3,
            )
            if adj.get("headline_pre") and adj.get("headline_post")
            else None
        ),
        # ordering-basis marker (ADVICE r12 #3): the probe moved to
        # session start at the r12 boundary, changing the heap state
        # the headline suite runs on; pin the basis in the parsed
        # record so cross-round headline deltas aren't attributed to
        # the engine
        "probe_position": "session_start",
        "cpus": CPUS,
    }
    # Calibration-normalized THROUGHPUT twins (VERDICT r11 next-round
    # #3): every rate scaled to the r11 reference host — a slower host
    # (calib mean > anchor) raises the normalized rate. Same
    # session-mean basis as headline_normalized_seconds.
    if calib and calib_end:
        _norm = ((calib + calib_end) / 2) / _CALIB_REF_SECONDS
        for _f in (
            "cdc_apply_events_per_sec",
            "cdc_apply_4x_events_per_sec",
            "cdc_apply_multi_events_per_sec",
            "stream_dedup_docs_per_sec",
            "stream_neardup_docs_per_sec",
            "stream_neardup_big_batch_docs_per_sec",
            "stream_crawl_docs_per_sec",
            "insert_stress_ops_per_sec",
            "insert_stress_median_ops_per_sec",
            "insert_stress_end_ops_per_sec",
            "insert_stress_end_median_ops_per_sec",
        ):
            out[f"{_f}_normalized"] = round(out[_f] * _norm, 1)
    # Adjacent-calibrated twins: phase-local host correction (each
    # block's own pre-measurement calibration instead of the session
    # mean). Insert stress uses the canonical start/end calibrations,
    # which ARE its adjacent samples by construction.
    adj["insert_stress"] = calib
    adj["insert_stress_end"] = calib_end
    for _f, _a in (
        ("cdc_apply_events_per_sec", "cdc_apply"),
        ("cdc_apply_4x_events_per_sec", "cdc_apply_4x"),
        ("cdc_apply_multi_events_per_sec", "cdc_apply_multi"),
        ("stream_dedup_docs_per_sec", "stream_dedup"),
        ("stream_neardup_docs_per_sec", "stream_neardup"),
        ("stream_neardup_big_batch_docs_per_sec", "stream_neardup_big_batch"),
        ("stream_crawl_docs_per_sec", "stream_crawl"),
        ("insert_stress_ops_per_sec", "insert_stress"),
        ("insert_stress_end_ops_per_sec", "insert_stress_end"),
    ):
        if _a in adj and adj[_a]:
            out[f"{_f}_adjacent_normalized"] = round(
                out[_f] * adj[_a] / _CALIB_REF_SECONDS, 1
            )
    print(json.dumps({"detail": "adjacent_calibrations",
                      "legs": {k: round(v, 3) for k, v in adj.items()}}))
    line = json.dumps(out)
    if len(line) >= 1900:
        # the final line must survive a 2000-char tail capture (the
        # driver records tail + last parsed JSON line). Spill order
        # REORDERED r13 (VERDICT r12 next-round #1: the queries map is
        # the per-query regression signal and spills LAST, not first).
        # Tier 1: the throughput ADJACENT twins (their per-block legs
        # already rode the adjacent_calibrations detail; the headline
        # adjacent twin is a r13 record field and stays).
        adjn = {k: v for k, v in out.items()
                if k.endswith("_adjacent_normalized")
                and k != "headline_adjacent_normalized"}
        print(json.dumps({"detail": "adjacent_normalized", **adjn}))
        for k in adjn:
            del out[k]
        line = json.dumps(out)
    if len(line) >= 1900:
        # Tier 2: shrink (not drop) the per-query map to top-5 —
        # cheaper than losing the session-mean twins (r11 #3 fields)
        out["queries"] = dict(list(times_compact.items())[:5])
        line = json.dumps(out)
    if len(line) >= 1900:
        # Tier 3: the session-mean throughput twins
        norm = {k: v for k, v in out.items()
                if k.endswith("_normalized")
                and k not in ("headline_normalized_seconds",
                              "headline_adjacent_normalized")}
        print(json.dumps({"detail": "normalized_throughputs", **norm}))
        for k in norm:
            del out[k]
        line = json.dumps(out)
    if len(line) >= 1900:
        # last resort — the full map already rode its detail line
        out["queries"] = {}
        line = json.dumps(out)
    # Compact calibrated probe table IMMEDIATELY before the final line:
    # the driver tail is 2000 chars, so whatever prints here shares it
    # with the parsed line — the full probe detail (printed earlier)
    # doesn't fit, but the per-query [raw, calibrated] ratios (the
    # VERDICT r11 #1 record: "the r12 BENCH probe table carries
    # calibrated ratios") do.
    if probe:
        # record_only marker (VERDICT r12 next-round #6): without it
        # an auditor reading only the JSON could call simhash_md5_pairs
        # 4.12 a gate breach — it is the fixed-band record form,
        # excluded from the gate BY CONSTRUCTION with its adaptive
        # replacement (simhash_adaptive_bands) beside it. Gated
        # entries print first so a tail truncation cuts record-only
        # rows before gated ones.
        print(json.dumps({
            "detail": "probe_cal",
            "r": {
                q: v["ratio_calibrated"]
                for q, v in sorted(
                    probe.items(),
                    key=lambda kv: kv[0] in SCALE_PROBE_RECORD_ONLY,
                )
            },
            "record_only": sorted(SCALE_PROBE_RECORD_ONLY),
        }))
    print(line)


if __name__ == "__main__":
    main()
