"""Sampling / splitting / chunking pack (north-star training-data
operators beyond the reference): deterministic train-val splits,
weighted corpus mixtures, and context-window chunking over
`documents`. All hash-deterministic — reruns, retries, and different
partitionings produce the SAME split, which is the property a
reproducible data pipeline needs (and what makes these
oracle-checkable, unlike rand()-based sampling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

# Deterministic per-document hash in [0, 1e9+7): the polynomial
# rolling hash from text_analysis (engine-portable, verified there).
_HASH_SQL = """list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, length(text) + 1),
              i -> CAST(ascii(text[i]) AS BIGINT)),
              (h, c) -> (h * 31 + c) % 1000000007)"""


def _doc_hash() -> Column:
    return F.aggregate(
        F.expr(
            "transform(sequence(1, length(text)), i -> cast(ascii(substr(text, i, 1)) as bigint))"
        ),
        F.lit(0).cast("long"),
        lambda h, c: (h * 31 + c) % 1000000007,
    )


@register(
    "train_val_split",
    oracle=f"""
WITH hashed AS (
  SELECT doc_id, lang, n_chars, {_HASH_SQL} AS h FROM documents
)
SELECT lang,
       CASE WHEN h % 10 < 9 THEN 'train' ELSE 'val' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM hashed
GROUP BY lang, CASE WHEN h % 10 < 9 THEN 'train' ELSE 'val' END
""",
    tags=("sampling", "X4"),
)
def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train-val split by content hash: the split
    follows the DOCUMENT (not the row position or partition), so
    re-ingestion, shuffling, or dedup reordering never leaks a doc
    across splits — the reproducibility property rand() sampling
    lacks. Pure expression; no shuffle beyond the final tiny agg."""
    docs = load(spark, sf_dir, "documents")
    h = _doc_hash()
    split = F.when(h % 10 < 9, "train").otherwise("val")
    return docs.select("lang", "n_chars", split.alias("split")).groupBy(
        "lang", "split"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# Per-source mixture weights (percent kept): the corpus-mixing knob of
# a pretraining pipeline (e.g. upsample curated sources).
_MIX_WEIGHTS = {"src0": 100, "src1": 50, "src2": 25, "src3": 10}
_MIX_SQL = " ".join(
    f"WHEN source = '{s}' THEN {w}" for s, w in _MIX_WEIGHTS.items()
)


@register(
    "corpus_mixture_sample",
    oracle=f"""
WITH hashed AS (
  SELECT doc_id, source, n_chars, {_HASH_SQL} AS h FROM documents
)
SELECT source,
       COUNT(*) AS n_candidates,
       COUNT(*) FILTER (WHERE h % 100 < CASE {_MIX_SQL} ELSE 0 END) AS n_sampled,
       CAST(SUM(n_chars) FILTER (WHERE h % 100 < CASE {_MIX_SQL} ELSE 0 END) AS BIGINT)
         AS sampled_chars
FROM hashed
GROUP BY source
""",
    tags=("sampling", "X4"),
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixture by deterministic hash thresholding
    (keep doc iff hash%100 < weight[source]): the per-source
    up/down-sampling step of pretraining-data assembly, reproducible
    across runs and partitionings. One scan, no shuffle before the
    accounting agg."""
    docs = load(spark, sf_dir, "documents")
    h = _doc_hash()
    w = F.lit(0)
    expr = None
    for s, pct in _MIX_WEIGHTS.items():
        expr = (
            F.when(F.col("source") == s, pct)
            if expr is None
            else expr.when(F.col("source") == s, pct)
        )
    keep = h % 100 < expr.otherwise(0)
    return docs.select("source", "n_chars", keep.alias("keep")).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.count(F.when(F.col("keep"), 1)).alias("n_sampled"),
        F.sum(F.when(F.col("keep"), F.col("n_chars"))).cast("bigint").alias(
            "sampled_chars"
        ),
    )


_CHUNK = 100  # characters per chunk
_OVERLAP = 20  # characters of overlap between consecutive chunks


@register(
    "doc_chunking",
    oracle=f"""
SELECT doc_id, chunk_idx,
       substr(text, chunk_idx * ({_CHUNK} - {_OVERLAP}) + 1, {_CHUNK}) AS chunk_text,
       length(substr(text, chunk_idx * ({_CHUNK} - {_OVERLAP}) + 1, {_CHUNK})) AS chunk_len
FROM (
  SELECT doc_id, text,
         unnest(range(0, GREATEST(CAST(ceil((length(text) - {_OVERLAP}) * 1.0 / ({_CHUNK} - {_OVERLAP})) AS BIGINT), 1))) AS chunk_idx
  FROM documents
  WHERE doc_id < 100 AND length(text) > 0
)
""",
    tags=("sampling", "chunking", "X4"),
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking with overlap (100-char windows, 20-char
    stride overlap): the fan-out that turns documents into
    model-ingestible sequences. Executor-side explode of a computed
    index range — the chunk count per doc is derived, not stored, and
    the explode never touches the driver."""
    docs = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & (F.length("text") > 0)
    )
    stride = _CHUNK - _OVERLAP
    # clamp to >=1: a doc shorter than the overlap still yields one
    # chunk (and Spark's sequence(0,-1) would DESCEND, not be empty)
    n_chunks = F.greatest(
        F.ceil((F.length("text") - _OVERLAP) * 1.0 / stride).cast("long"), F.lit(1)
    )
    idx = F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1))
    chunked = docs.select("doc_id", "text", idx.alias("chunk_idx"))
    chunk = F.expr(f"substr(text, chunk_idx * {stride} + 1, {_CHUNK})")
    return chunked.select(
        "doc_id",
        "chunk_idx",
        chunk.alias("chunk_text"),
        F.length(chunk).alias("chunk_len"),
    )


_PACK_BUDGET = 2048  # tokens per packed training sequence


@register(
    "sequence_packing",
    oracle=f"""
WITH sized AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT source, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM sized
),
binned AS (
  SELECT source, doc_id, n_tokens,
         CAST((cum_tokens - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS bin
  FROM cum
)
SELECT source, bin,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc_id,
       MAX(doc_id) AS last_doc_id
FROM binned
GROUP BY source, bin
""",
    tags=("sampling", "packing", "X4"),
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed token-budget
    training sequences ({_PACK_BUDGET} tokens) by sequential fill —
    running token sum in stable doc_id order, bin = starting offset
    div budget. The step between chunking (splitting long docs) and
    batching: short docs pack together so sequences waste no budget.

    Scale shape: packing runs PER SOURCE GROUP (partition by source,
    order by doc_id) — each group's running sum sorts independently,
    so the window is a partitioned sort, never a global one; 1000
    executors pack 1000 sources concurrently. Per-bin accounting
    partial-aggregates after the window."""
    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "source", "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = sized.select(
        "source",
        "doc_id",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_BUDGET
        ).alias("bin"),
    )
    return binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )


@register(
    "corpus_shuffle",
    oracle="""
WITH keyed AS (
  SELECT doc_id, source,
         md5('shuf42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
),
sharded AS (
  SELECT doc_id, source, shuffle_key,
         CAST(concat('0x', substr(shuffle_key, 1, 12)) AS BIGINT) % 8 AS shard
  FROM keyed
)
SELECT doc_id, source, shard,
       ROW_NUMBER() OVER (PARTITION BY shard ORDER BY shuffle_key) AS pos
FROM sharded
""",
    tags=("sampling", "shuffle"),
)
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle for training order: every
    document gets a seeded md5 shuffle key, a shard (48-bit key prefix
    mod n_shards), and a within-shard position — the reproducible
    random permutation an LLM data loader consumes (same seed → same
    order on any engine, any partitioning, any retry; contrast
    rand()-based shuffles, which are neither rerun- nor
    engine-stable).

    Scale: one hash shuffle on `shard` + a per-shard window sort over
    the 16-byte keys (never the texts). At 100 TB the materialized
    form is repartitionByRange(shard, shuffle_key) →
    sortWithinPartitions → write partitionBy(shard): the data loader
    then streams shards sequentially with no further sort. The md5
    prefix is parsed with conv() here and CAST('0x…') in the oracle —
    both exact on 48 bits, far under BIGINT range."""
    docs = load(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("shuf42:"), F.col("doc_id").cast("string")))
    keyed = docs.select("doc_id", "source", key.alias("shuffle_key"))
    shard = (
        F.conv(F.substring("shuffle_key", 1, 12), 16, 10).cast("bigint") % 8
    ).alias("shard")
    sharded = keyed.select("doc_id", "source", "shuffle_key", shard)
    w = Window.partitionBy("shard").orderBy("shuffle_key")
    return sharded.select(
        "doc_id", "source", "shard", F.row_number().over(w).alias("pos")
    )


@register(
    "stratified_sample",
    oracle="""
WITH strata AS (
  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
),
tot AS (SELECT SUM(n_docs) AS n_total FROM strata),
alloc AS (
  SELECT lang, n_docs,
         CAST(FLOOR(n_docs * 100.0 / n_total) AS BIGINT) AS base_quota,
         (n_docs * 100.0 / n_total) - FLOOR(n_docs * 100.0 / n_total) AS remainder
  FROM strata, tot
),
ranked AS (
  SELECT lang, n_docs, base_quota,
         ROW_NUMBER() OVER (ORDER BY remainder DESC, lang) AS rem_rank,
         100 - SUM(base_quota) OVER () AS leftover
  FROM alloc
),
quotas AS (
  SELECT lang, n_docs,
         base_quota + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END AS quota
  FROM ranked
),
ordered AS (
  SELECT d.doc_id, d.lang,
         ROW_NUMBER() OVER (
           PARTITION BY d.lang
           ORDER BY md5('strat42:' || CAST(d.doc_id AS VARCHAR))
         ) AS rn
  FROM documents d
)
SELECT o.doc_id, o.lang, q.quota AS lang_quota
FROM ordered o JOIN quotas q USING (lang)
WHERE o.rn <= q.quota
""",
    tags=("sampling", "stratified"),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified sampling: draw EXACTLY 100 documents with
    per-language quotas proportional to stratum size, apportioned by
    the largest-remainder method (floor quotas + the leftover seats to
    the largest fractional remainders — deterministic tie-break on
    lang). Members are picked per stratum by seeded-md5 order, so the
    draw is reproducible across engines/retries like the rest of the
    pack — contrast `sampleBy`, which is Bernoulli-approximate and
    gives neither exact counts nor engine-stable membership.

    Scale: stratum sizes are one partial-agg pass (tiny result),
    quotas a driver-size window over |strata| rows; member selection
    is one hash shuffle on lang + per-stratum rank over 16-byte keys.
    The rank-limit filter (rn <= quota) bounds window state per
    stratum. Skewed strata are exactly the salting/AQE-skew case the
    key_skew_profile report flags first."""
    docs = load(spark, sf_dir, "documents")
    n_target = 100
    strata = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = strata.agg(F.sum("n_docs").alias("n_total"))
    share = F.col("n_docs") * n_target * 1.0 / F.col("n_total")
    alloc = strata.crossJoin(tot).select(
        "lang",
        "n_docs",
        F.floor(share).cast("bigint").alias("base_quota"),
        (share - F.floor(share)).alias("remainder"),
    )
    w_rem = Window.orderBy(F.desc("remainder"), F.asc("lang"))
    w_all = Window.partitionBy()
    ranked = alloc.select(
        "lang",
        "n_docs",
        "base_quota",
        F.row_number().over(w_rem).alias("rem_rank"),
        (F.lit(n_target) - F.sum("base_quota").over(w_all)).alias("leftover"),
    )
    quotas = ranked.select(
        "lang",
        "n_docs",
        (
            F.col("base_quota")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        ).alias("quota"),
    )
    w_lang = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("strat42:"), F.col("doc_id").cast("string")))
    )
    ordered = docs.select("doc_id", "lang", F.row_number().over(w_lang).alias("rn"))
    return (
        ordered.join(quotas.select("lang", "quota"), "lang")
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", "lang", F.col("quota").alias("lang_quota"))
    )


@register(
    "mixture_temperature_sample",
    oracle="""
WITH per_source AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
weighted AS (
  SELECT source, n_docs,
         CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT)
           AS weight_micro
  FROM per_source
),
tot AS (SELECT CAST(SUM(weight_micro) AS BIGINT) AS w_total,
               CAST(SUM(n_docs) AS BIGINT) AS n_total FROM weighted),
rates AS (
  SELECT source, n_docs, weight_micro,
         CAST(FLOOR(weight_micro * 10000.0 / (SELECT w_total FROM tot))
              AS BIGINT) AS rate_bp
  FROM weighted
),
sampled AS (
  SELECT d.source, COUNT(*) AS n_sampled
  FROM documents d JOIN rates r ON d.source = r.source
  WHERE CAST(concat('0x', substr(md5('mix42:' || CAST(d.doc_id AS VARCHAR)), 1, 12))
             AS BIGINT) % 10000 < r.rate_bp
  GROUP BY d.source
)
SELECT r.source, r.n_docs, r.weight_micro, r.rate_bp,
       COALESCE(s.n_sampled, 0) AS n_sampled
FROM rates r LEFT JOIN sampled s ON r.source = s.source
""",
    tags=("sampling", "mixture", "X4"),
)
def mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (the multilingual/multi-source
    rebalancing rule of mT5/XLM-R: sample source i proportional to
    n_i^alpha with alpha=0.5, so huge sources stop drowning small
    ones): per-source sqrt-weights fixed to integer micro-units BEFORE
    the normalizing sum (order-independent exact total — a raw double
    sum over sources would be partition-order-dependent), per-source
    admission rate in floored bp of the weight share, then
    deterministic membership by seeded-md5 (same doc set on any
    engine, partitioning, or retry — rand() is none of those).

    Scale: per-source counts are one map-side-combined agg; rates are
    a |sources|-row frame BROADCAST back onto the corpus scan; the
    admission test is a pure projection. One corpus pass + one pass
    over the winners."""
    docs = load(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    weighted = per_source.select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1_000_000.0)
        .cast("bigint")
        .alias("weight_micro"),
    )
    tot = weighted.agg(F.sum("weight_micro").cast("bigint").alias("w_total"))
    rates = (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "weight_micro",
            F.floor(F.col("weight_micro") * 10000.0 / F.col("w_total"))
            .cast("bigint")
            .alias("rate_bp"),
        )
    )
    key = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix42:"), F.col("doc_id").cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("bigint")
    admitted = (
        docs.join(F.broadcast(rates.select("source", "rate_bp")), "source")
        .filter(key % 10000 < F.col("rate_bp"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        rates.join(admitted, "source", "left")
        .select(
            "source",
            "n_docs",
            "weight_micro",
            "rate_bp",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        )
    )


_N_EPOCHS = 3
_N_SHARDS = 8


@register(
    "epoch_shard_plan",
    oracle=f"""
WITH epochs AS (SELECT unnest(range(0, {_N_EPOCHS})) AS epoch),
keyed AS (
  SELECT e.epoch, d.doc_id,
         md5('ep' || CAST(e.epoch AS VARCHAR) || ':'
             || CAST(d.doc_id AS VARCHAR)) AS k
  FROM documents d CROSS JOIN epochs e
),
sharded AS (
  SELECT epoch, doc_id, k,
         CAST(concat('0x', substr(k, 1, 12)) AS BIGINT) % {_N_SHARDS} AS shard
  FROM keyed
)
SELECT epoch, shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS first_doc,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY k)) AS order_digest
FROM sharded
GROUP BY epoch, shard
""",
    tags=("sampling", "shuffle", "epochs"),
)
def epoch_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch data-loader plan: for each training epoch, every
    document is assigned a shard and a within-shard order by a seeded
    md5 key ('ep<epoch>:<doc_id>') — each epoch is an INDEPENDENT
    reproducible permutation (per-epoch reshuffling, the standard
    LLM-training requirement), and the report digests each (epoch,
    shard) stream's exact document order into one md5 so two engines
    — or two reruns — can certify identical loader order without
    materializing it.

    Scale: the per-(epoch, shard) rollup shuffles (epoch, shard,
    16-byte key, doc_id) rows only; the order digest is an ordered
    string_agg per group (Spark: sort-by-key collect within the
    grouped window, same shape as the packing window). |epochs| is a
    small constant — the explode multiplies rows 3×, not a join."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    epochs = F.explode(
        F.sequence(F.lit(0), F.lit(_N_EPOCHS - 1))
    ).alias("epoch")
    keyed = docs.select("doc_id", epochs).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(
                F.lit("ep"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("k"),
    )
    sharded = keyed.select(
        "epoch",
        "doc_id",
        "k",
        (F.conv(F.substring("k", 1, 12), 16, 10).cast("bigint") % _N_SHARDS).alias(
            "shard"
        ),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("k")
    ordered = sharded.select(
        "epoch", "shard", "doc_id", F.row_number().over(w).alias("pos")
    )
    return (
        ordered.groupBy("epoch", "shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.md5(
                F.concat_ws(
                    ",", F.array_sort(F.collect_list(F.struct("pos", "doc_id")))
                    .getField("doc_id")
                    .cast("array<string>"),
                )
            ).alias("order_digest"),
        )
    )


@register(
    "doc_priority_sample",
    oracle="""
WITH keyed AS (
  SELECT doc_id, lang, GREATEST(n_chars, 1) AS weight,
         (CAST(concat('0x', substr(md5('ps42:' || CAST(doc_id AS VARCHAR)),
                                   1, 12)) AS BIGINT) + 1)
           / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS key_ratio
  FROM documents
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY key_ratio, doc_id) AS BIGINT)
         AS rank,
       doc_id, lang, CAST(weight AS BIGINT) AS weight, key_ratio
FROM keyed
ORDER BY key_ratio, doc_id
LIMIT 64
""",
    tags=("sampling", "weighted", "X4"),
)
def doc_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via priority sampling
    (Duffield–Lund–Thorup): per-doc priority w/u with u seeded-md5
    uniform — take the k largest priorities ⟺ the k SMALLEST
    (h+1)/w ratios. Chosen over Efraimidis–Spirakis's u^(1/w)
    because exp/ln are libm-dependent (Java vs DuckDB may differ in
    the last ulp and flip marginal ranks); a single IEEE division of
    a 48-bit integer by a small weight is correctly rounded and
    bit-identical on every engine — the same determinism discipline
    as the md5 membership tricks above. Plan: one projection, then
    TakeOrderedAndProject (per-partition top-k, k rows to the
    driver) — no full sort, no shuffle of the corpus; the length-
    weighted sample favors long documents the way a token-budgeted
    training mix would."""
    docs = load(spark, sf_dir, "documents")
    w = F.greatest(F.col("n_chars"), F.lit(1))
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ps42:"), F.col("doc_id").cast("string"))),
            1, 12,
        ),
        16, 10,
    ).cast("bigint")
    keyed = docs.select(
        "doc_id", "lang",
        w.cast("bigint").alias("weight"),
        ((h + 1).cast("double") / w.cast("double")).alias("key_ratio"),
    )
    top = keyed.orderBy("key_ratio", "doc_id").limit(64)
    win = Window.orderBy("key_ratio", "doc_id")
    return top.select(
        F.row_number().over(win).cast("bigint").alias("rank"),
        "doc_id", "lang", "weight", "key_ratio",
    )


@register(
    "token_budget_mixture",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, (n_chars + 3) // 4 AS toks,
         CAST(substr(source, 4) AS INTEGER) % 4 + 1 AS w,
         md5('tb42:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
tot AS (
  SELECT SUM(toks) * 3 // 10 AS budget_total, SUM(w_src) AS w_sum
  FROM (SELECT MAX(w) AS w_src, SUM(toks) AS toks
        FROM toks GROUP BY source) s
),
budgets AS (
  SELECT t.source, MAX(t.w) AS w,
         MAX(tot.budget_total) * MAX(t.w) // MAX(tot.w_sum)
           AS budget_tokens
  FROM toks t CROSS JOIN tot GROUP BY t.source
),
ordered AS (
  SELECT t.source, t.toks,
         SUM(t.toks) OVER (
           PARTITION BY t.source ORDER BY t.h, t.doc_id
         ) AS cum
  FROM toks t
)
SELECT b.source,
       CAST(b.budget_tokens AS BIGINT) AS budget_tokens,
       CAST(COUNT(o.cum) AS BIGINT) AS n_picked,
       CAST(COALESCE(MAX(o.cum), 0) AS BIGINT) AS tokens_picked,
       CAST(COALESCE(MAX(o.cum), 0) * 10000 // b.budget_tokens
            AS BIGINT) AS utilization_bp
FROM budgets b
LEFT JOIN ordered o ON o.source = b.source AND o.cum <= b.budget_tokens
GROUP BY b.source, b.budget_tokens
""",
    tags=("sampling", "mixture", "X4"),
)
def token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-BUDGETED mixture selection — the other half of the
    mixture story: `corpus_mixture_sample` answers "sample at these
    RATES", this answers "fill exactly this many training tokens at
    these mixture WEIGHTS" (the way an actual pretraining data order
    is cut). Per source: budget = total-corpus budget × weight share;
    docs admit in seeded-md5 order while the running token count
    stays inside the budget — deterministic membership on any
    engine/partitioning. Plan: one tiny per-source aggregate
    broadcast back (budgets), one window cumsum per source (the only
    corpus-wide shuffle, on the natural mixture key), one grouped
    rollup; the corpus crosses exactly one exchange. Token counts use
    the chars//4 proxy (the real tokenizer runs in bpe_tokenize_stats
    — budget arithmetic is identical either way)."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        ((F.col("n_chars") + 3) / 4).cast("bigint").alias("toks"),
        (
            F.substring("source", 4, 10).cast("int") % 4 + 1
        ).alias("w"),
        F.md5(
            F.concat(F.lit("tb42:"), F.col("doc_id").cast("string"))
        ).alias("h"),
    )
    per_src = toks.groupBy("source").agg(
        F.max("w").alias("w"), F.sum("toks").alias("src_toks")
    )
    tot = per_src.agg(
        (F.sum("src_toks") * 3 / 10).cast("bigint").alias("budget_total"),
        F.sum("w").alias("w_sum"),
    )
    budgets = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        (F.col("budget_total") * F.col("w") / F.col("w_sum"))
        .cast("bigint")
        .alias("budget_tokens"),
    )
    win = Window.partitionBy("source").orderBy("h", "doc_id")
    ordered = toks.select(
        "source", F.sum("toks").over(win).alias("cum")
    )
    picked = ordered.join(F.broadcast(budgets), "source").filter(
        F.col("cum") <= F.col("budget_tokens")
    )
    agg = picked.groupBy("source", "budget_tokens").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_picked"),
        F.max("cum").cast("bigint").alias("tokens_picked"),
    )
    return (
        F.broadcast(budgets)
        .join(agg, ["source", "budget_tokens"], "left")
        .select(
            "source",
            F.col("budget_tokens").cast("bigint").alias("budget_tokens"),
            F.coalesce("n_picked", F.lit(0)).cast("bigint").alias(
                "n_picked"
            ),
            F.coalesce("tokens_picked", F.lit(0))
            .cast("bigint")
            .alias("tokens_picked"),
            F.expr(
                "CAST(coalesce(tokens_picked, 0) * 10000 div "
                "budget_tokens AS BIGINT)"
            ).alias("utilization_bp"),
        )
    )


# -- sequence-length bucketing / padding-waste report (r11) --------------

_PAD_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)


def _pad_bucket_sql(expr: str) -> str:
    arms = " ".join(
        f"WHEN {expr} <= {c} THEN {c}" for c in _PAD_BUCKETS[:-1]
    )
    return f"CASE {arms} ELSE {_PAD_BUCKETS[-1]} END"


@register(
    "length_bucket_padding",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
b AS (
  SELECT {_pad_bucket_sql('n_tokens')} AS bucket_cap,
         LEAST(n_tokens, {_PAD_BUCKETS[-1]}) AS eff_tokens
  FROM toks
)
SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap,
       COUNT(*) AS n_docs,
       CAST(SUM(eff_tokens) AS BIGINT) AS sum_tokens,
       CAST(COUNT(*) * bucket_cap - SUM(eff_tokens) AS BIGINT)
         AS padded_tokens,
       CAST((COUNT(*) * bucket_cap - SUM(eff_tokens)) * 10000
            // (COUNT(*) * bucket_cap) AS BIGINT) AS waste_bp
FROM b
GROUP BY bucket_cap
""",
    tags=("sampling", "packing", "X4"),
)
def length_bucket_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing report (r11): assign every document
    to the smallest power-of-two context bucket that fits it (32 …
    8192; longer docs truncate to the top bucket) and report the
    padding waste a bucketed training batcher would pay per bucket —
    the standard decision input for choosing bucket boundaries vs
    packing (`sequence_packing`). The bucket ladder is an exact
    integer CASE in BOTH engines (a float log2 at a boundary value
    would misbucket).

    100 TB: one pass — tokenize-count projection (no explode; `size
    (split(...))` never materializes the token array in a shuffle)
    into a 9-group hash aggregate; partial aggregation map-side, the
    exchange carries 9 rows per task."""
    docs = load(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    cap = F.lit(_PAD_BUCKETS[-1])
    for c in reversed(_PAD_BUCKETS[:-1]):
        cap = F.when(n <= c, F.lit(c)).otherwise(cap)
    eff = F.least(n, F.lit(_PAD_BUCKETS[-1]))
    return (
        docs.select(cap.alias("bucket_cap"), eff.alias("eff_tokens"))
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("eff_tokens").alias("sum_tokens"),
        )
        .select(
            F.col("bucket_cap").cast("bigint"),
            F.col("n_docs").cast("bigint"),
            F.col("sum_tokens").cast("bigint"),
            (F.col("n_docs") * F.col("bucket_cap") - F.col("sum_tokens"))
            .cast("bigint")
            .alias("padded_tokens"),
            F.expr(
                "CAST((n_docs * bucket_cap - sum_tokens) * 10000 div "
                "(n_docs * bucket_cap) AS BIGINT)"
            ).alias("waste_bp"),
        )
    )


# -- packing-efficiency curve across context lengths (r12) ----------------

_PACK_CTXS = (512, 1024, 2048, 4096, 8192)


@register(
    "packing_efficiency_curve",
    oracle=f"""
WITH toks AS (
  SELECT len(string_split(text, ' ')) AS n FROM documents
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n) AS BIGINT) AS total_tokens,
         {", ".join(f"CAST(SUM(LEAST(n, {c})) AS BIGINT) AS eff_{c}" for c in _PACK_CTXS)}
  FROM toks
),
curve AS (
  {" UNION ALL ".join(
      f"SELECT CAST({c} AS BIGINT) AS ctx, n_docs, total_tokens, "
      f"eff_{c} AS eff_tokens FROM agg" for c in _PACK_CTXS
  )}
)
SELECT ctx, n_docs, eff_tokens,
       total_tokens - eff_tokens AS tokens_truncated,
       (eff_tokens + ctx - 1) // ctx AS packed_seqs_lb,
       eff_tokens * 10000 // (((eff_tokens + ctx - 1) // ctx) * ctx)
         AS packed_util_bp,
       eff_tokens * 10000 // (n_docs * ctx) AS padded_util_bp
FROM curve
""",
    tags=("sampling", "packing", "X4"),
)
def packing_efficiency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length decision curve (r12): for each candidate context
    window, the idealized packed-sequence count (the bin-packing lower
    bound ceil(Σ min(len, ctx) / ctx)), the utilization it would
    achieve, the utilization one-doc-per-sequence padding achieves,
    and the tokens truncation would discard — the three numbers a
    training-data team weighs when picking ctx and choosing packing
    vs padding vs bucketing (`sequence_packing` /
    `length_bucket_padding` are the per-doc companions).

    100 TB: ONE pass, no explode and no per-ctx re-scan — the five
    conditional sums fold into a single map-side-partial aggregate
    producing one row, and the curve unpivots that row with stack()
    (5 rows, driver-scale). The exchange carries one row per task."""
    docs = load(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    one = docs.select(n.alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("total_tokens"),
        *[
            F.sum(F.least(F.col("n"), F.lit(c))).cast("bigint").alias(f"eff_{c}")
            for c in _PACK_CTXS
        ],
    )
    stacked = one.selectExpr(
        "n_docs",
        "total_tokens",
        f"stack({len(_PACK_CTXS)}, "
        + ", ".join(f"CAST({c} AS BIGINT), eff_{c}" for c in _PACK_CTXS)
        + ") AS (ctx, eff_tokens)",
    )
    return stacked.select(
        "ctx",
        "n_docs",
        "eff_tokens",
        (F.col("total_tokens") - F.col("eff_tokens")).alias("tokens_truncated"),
        F.expr("CAST((eff_tokens + ctx - 1) div ctx AS BIGINT)").alias(
            "packed_seqs_lb"
        ),
        F.expr(
            "CAST(eff_tokens * 10000 div "
            "(((eff_tokens + ctx - 1) div ctx) * ctx) AS BIGINT)"
        ).alias("packed_util_bp"),
        F.expr(
            "CAST(eff_tokens * 10000 div (n_docs * ctx) AS BIGINT)"
        ).alias("padded_util_bp"),
    )
