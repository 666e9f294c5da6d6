"""Similarity-search pack (SURVEY.md §2.10 X3 + north-star): cosine
top-k over the `embeddings` array<float> column — exact brute-force as
the verifiable baseline, LSH-bucketed and IVF variants as the scale
paths.

Engine parity note: Spark's sequential double fold
(aggregate(zip_with(a,b,*), 0.0, +)) is bit-identical to DuckDB's
list_cosine_similarity on DOUBLE[] (verified: 0.4927657135003488 both
engines), so the exact variants are value-hash oracle-checkable.

Scale design: brute-force top-k is O(n·q) but embarrassingly parallel
— queries broadcast, corpus partition-local scoring, per-partition
heap via rank-limit pushdown. The LSH/IVF variants cut the scored
candidate set per query to a bucket (~n/buckets), which is the 100 TB
path; both are recall-tested against the exact baseline in
tests/test_llm_pack.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

_N_QUERIES = 5  # fixed query set: vec_id < 5
_TOP_K = 3


def _cosine(a: Column, b: Column) -> Column:
    """Exact cosine in double precision, sequential fold (bit-matches
    the DuckDB oracle — see module docstring)."""
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    nb = F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    return dot / (F.sqrt(na) * F.sqrt(nb))


_COS_SQL = "list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def _dot_fold_sql(vec_col: str, signs: list[int]) -> str:
    """Spark-SQL text of the exact integer sign-projection fold:
    ``aggregate(zip_with(vec, array(±1L…), (x, y) -> x * y), 0L,
    (s, v) -> s + v)``. Parses to the same expression the Column-API
    form built, in ONE py4j call instead of ~2 per sign element (the
    per-literal construction measured seconds of driver time per
    query build — guide §7.3)."""
    csv = ",".join(f"{s}L" for s in signs)
    return (
        f"aggregate(zip_with({vec_col}, array({csv}), (x, y) -> x * y), "
        "0L, (s, v) -> s + v)"
    )


def _norm(c: Column) -> Column:
    """sqrt(Σx²) — one side of _cosine's denominator, split out so
    join-shaped scorers can evaluate it once per ROW instead of once
    per PAIR. Multiplying two _norm columns reproduces _cosine's
    sqrt(na)·sqrt(nb) denominator bit-exactly (same op order)."""
    cd = c.cast("array<double>")
    return F.sqrt(
        F.aggregate(F.transform(cd, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — _cosine's numerator."""
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, v: s + v,
    )


@register(
    "similarity_topk_cosine",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id, e.label,
         {_COS_SQL.format(a="e.embedding", b="q.qv")} AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY q.query_id
           ORDER BY {_COS_SQL.format(a="e.embedding", b="q.qv")} DESC, e.vec_id
         ) AS rn
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, label, ROUND(cosine, 6) AS cosine
FROM scored WHERE rn <= {_TOP_K}
""",
    tags=("X3", "similarity", "bench"),
)
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k (X3 baseline): 5 query vectors ×
    full corpus, top-3 neighbors each.

    Plan: queries broadcast (5 rows at any SF) → corpus-partition-local
    scoring (no shuffle of the corpus) → row_number window per query
    with rank-limit pushdown → only k·q rows cross the final shuffle.
    Norms are precomputed per corpus row and per query row (_norm), so
    each of the q×n scores evaluates only the dot fold."""
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "en", _norm(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("en").alias("qn"),
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (F.col("en") * F.col("qn"))
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "label", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "vec_id", "label", F.round("cosine", 6).alias("cosine"))
    )


@register(
    "similarity_blocked_pairs",
    oracle=f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
       ROUND({_COS_SQL.format(a="a.embedding", b="b.embedding")}, 6) AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_COS_SQL.format(a="a.embedding", b="b.embedding")} >= 0.35
""",
    tags=("X2", "X3", "similarity"),
)
def similarity_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate candidates with label blocking
    (north-star "embedding-cosine near-dup"): pairs are only formed
    within a block (here the label; at 100 TB a coarse quantizer
    cell), turning O(n²) into Σ|block|². The equi-join on the block
    key is a plain hash shuffle; norms precompute per row (_norm) so
    only the dot fold runs per pair."""
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("label"),
        F.col("embedding").alias("ea"), _norm(F.col("embedding")).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("label"),
        F.col("embedding").alias("eb"), _norm(F.col("embedding")).alias("nb"),
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine_raw", cos)
        .filter(F.col("cosine_raw") >= 0.35)
        .select("vec_a", "vec_b", "label", F.round("cosine_raw", 6).alias("cosine"))
    )


@register(
    "similarity_lsh_bucketed",
    oracle=None,  # approximate — recall-tested vs exact top-k in tests
    tags=("X3", "similarity", "approx"),
    eager_build=True,  # LSH fit runs at construction
)
def similarity_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate neighbor candidates (X3 scale path):
    normalize vectors (cosine ≡ euclidean on the unit sphere), random-
    hyperplane-project into buckets via BucketedRandomProjectionLSH,
    score only within-bucket candidates. Sub-quadratic: candidate
    count ≈ n²/buckets instead of n²."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", array_to_vector(F.col("embedding").cast("array<double>")).alias("vec")
    )
    norm = Normalizer(inputCol="vec", outputCol="unit", p=2.0)
    unit = norm.transform(emb)
    lsh = BucketedRandomProjectionLSH(
        inputCol="unit", outputCol="hashes", bucketLength=0.9, numHashTables=4, seed=42
    )
    model = lsh.fit(unit)
    # euclidean distance d on unit vectors ⇒ cosine = 1 - d²/2
    pairs = model.approxSimilarityJoin(unit, unit, 1.2, distCol="euclid")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round(1 - F.col("euclid") * F.col("euclid") / 2, 6).alias("cosine_est"),
        )
        .filter(F.col("cosine_est") >= 0.2)
    )


@register(
    "embedding_norm_stats",
    oracle="""
WITH norms AS (
  SELECT label,
         len(embedding) AS dim,
         sqrt(list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
                          (s, v) -> s + v)) AS nrm
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vectors, MIN(dim) AS dim,
       ROUND(MIN(nrm), 6) AS min_norm, ROUND(MAX(nrm), 6) AS max_norm,
       ROUND(CAST(SUM(CAST(nrm AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_norm
FROM norms GROUP BY label
""",
    tags=("X3", "similarity", "profiling"),
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column profiling (the sanity pass before any
    similarity/ANN run at scale: catch zero vectors, dimension drift,
    norm explosions): per label — vector count, dimensionality, and
    min/max/avg L2 norm. Norms fold sequentially in double (bit-matches
    the DuckDB reduce); the norm SUM routes through decimal so the
    average is partition-order-independent. One scan, one tiny agg."""
    emb = load(spark, sf_dir, "embeddings")
    ed = F.col("embedding").cast("array<double>")
    norm = F.sqrt(
        F.aggregate(F.transform(ed, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )
    return (
        emb.select("label", F.size("embedding").alias("dim"), norm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("dim").alias("dim"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
            F.round(
                F.sum(F.col("nrm").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_norm"),
        )
    )


# ---------------------------------------------------------------------------
# IVF: fit/query split. At 100 TB the coarse quantizer is trained ONCE
# (on a sample), persisted, and every ingest/search run loads it —
# query-time does no KMeans fit, and cell assignment is a pure column
# expression against literal centroids (no ML model, no shuffle).
# ---------------------------------------------------------------------------


def fit_ivf_quantizer(corpus: DataFrame, k_cells: int = 8, seed: int = 42) -> DataFrame:
    """Train the IVF coarse quantizer (the ONLY fitting step): KMeans
    over the corpus embeddings → a tiny (cell, centroid) table. Run
    once, persist with save_ivf_quantizer, reuse across every search
    and ingest run."""
    from pyspark.ml.clustering import KMeans

    from pyspark.ml.functions import array_to_vector

    vecs = corpus.select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("vec")
    )
    model = KMeans(k=k_cells, seed=seed, featuresCol="vec", predictionCol="cell").fit(
        vecs
    )
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return corpus.sparkSession.createDataFrame(
        rows, "cell int, centroid array<double>"
    )


def save_ivf_quantizer(centroids: DataFrame, path: str) -> None:
    centroids.coalesce(1).write.mode("overwrite").parquet(path)


def load_ivf_quantizer(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _assign_cell(centroid_rows: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid cell id as a single column expression: fold
    over literal centroids tracking (best_dist², best_cell). Runs
    inside whole-stage codegen against each corpus partition — zero
    shuffle, zero ML dependency at assignment time. This expression is
    the 100 TB partition key: write the corpus partitioned by it and a
    query touches only its nprobe cells' files."""
    emb = F.col("embedding").cast("array<double>")
    cents = F.array(
        *[
            F.struct(
                F.lit(int(cell)).alias("cell"),
                F.array(*[F.lit(float(v)) for v in vec]).alias("c"),
            )
            for cell, vec in centroid_rows
        ]
    )
    dist = lambda c: F.aggregate(  # noqa: E731 — squared euclidean
        F.zip_with(emb, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    # array_min over (d, cell) structs: struct ordering compares d
    # first (ties break on the lower cell id — deterministic). Each
    # centroid's distance is computed exactly ONCE — Catalyst does not
    # CSE subexpressions inside higher-order-function lambdas, so a
    # compare-then-keep fold would pay 2·k·d multiply-adds per row.
    best = F.array_min(
        F.transform(
            cents,
            lambda x: F.struct(dist(x["c"]).alias("d"), x["cell"].alias("cell")),
        )
    )
    return best["cell"]


def ivf_search(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int = 3,
    top_k: int = _TOP_K,
) -> DataFrame:
    """Fit-free IVF search: assign corpus rows to cells via the literal
    centroid expression, route each query to its nprobe nearest cells
    (cosine, tiny crossJoin against the broadcast centroid table), and
    score exact cosine only within probed cells. ``queries`` needs
    (query_id, qv) columns."""
    centroid_rows = [
        (r["cell"], list(r["centroid"])) for r in centroids.collect()
    ]  # k rows of metadata — the broadcast-literal form of the quantizer
    assigned = corpus.select(
        "vec_id",
        "label",
        "embedding",
        _assign_cell(centroid_rows).alias("cell"),
        _norm(F.col("embedding")).alias("en"),
    )
    cdf = F.broadcast(centroids)
    qcells = (
        queries.crossJoin(cdf)
        .withColumn("cdist", _cosine(F.col("qv"), F.col("centroid")))
        .withColumn(
            "crn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cdist"), F.asc("cell"))
            ),
        )
        .filter(F.col("crn") <= nprobe)
        .select("query_id", "qv", "cell", _norm(F.col("qv")).alias("qn"))
    )
    scored = (
        assigned.join(F.broadcast(qcells), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("embedding"), F.col("qv")) / (F.col("en") * F.col("qn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("query_id", "vec_id", "label", F.round("cosine", 6).alias("cosine"))
    )


@register(
    "ann_ivf_topk",
    oracle=None,  # approximate — recall-tested vs exact top-k in tests
    tags=("X3", "similarity", "approx"),
    eager_build=True,  # quantizer fit + centroid collect at construction
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k (X3 scale path): KMeans
    coarse quantizer partitions the corpus into cells; each query
    probes its nprobe=3 nearest cells and scores exact cosine only
    there — a top-k touches ~nprobe/k_cells of the data.

    Composed from the fit/query split: fit_ivf_quantizer (one-time at
    scale; re-fit here because the bench fixture is self-contained) +
    ivf_search (no fitting, pure-expression cell assignment)."""
    emb = load(spark, sf_dir, "embeddings")
    centroids = fit_ivf_quantizer(emb, k_cells=8, seed=42)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return ivf_search(emb, queries, centroids, nprobe=3, top_k=_TOP_K)


@register(
    "embedding_quantize_stats",
    oracle="""
WITH scale AS (
  SELECT MAX(list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))))) AS s
  FROM embeddings
),
q AS (
  SELECT vec_id,
         list_transform(embedding,
           v -> GREATEST(-127, LEAST(127,
                CAST(FLOOR(CAST(v AS DOUBLE) * 127.0 / s + 0.5) AS BIGINT)))) AS qv,
         list_max(list_transform(embedding,
           v -> abs(CAST(v AS DOUBLE)
                    - (GREATEST(-127, LEAST(127,
                         CAST(FLOOR(CAST(v AS DOUBLE) * 127.0 / s + 0.5) AS BIGINT)))
                       * s / 127.0)))) AS max_err
  FROM embeddings, scale
)
SELECT vec_id,
       CAST(list_sum(qv) AS BIGINT) AS q_checksum,
       CAST(FLOOR(max_err * 10000.0 / (SELECT s FROM scale)) AS BIGINT) AS max_err_bp
FROM q
WHERE vec_id < 200
""",
    tags=("X3", "embedding", "quantize"),
)
def embedding_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column with
    reconstruction-error accounting — the compression step an
    embedding pipeline runs before ANN serving (4× smaller vectors,
    SIMD-friendly int8 dot products). Symmetric scheme: one corpus
    max-|v| scale, q = clamp(round(v·127/s)), error vs dequantized
    value reported as floored bp of the scale.

    Determinism: round-half is floor(x+0.5) on doubles in BOTH engines
    (round() rounding rules differ across engines — memory:
    oracle-parity-discipline); float32→double widening is exact; the
    scale is an exact MAX. Per-doc output is an integer checksum of
    the quantized vector plus the error bp — both engine-portable.

    Scale: the corpus max is one partial-agg scalar broadcast into a
    pure per-row projection — one scan + one 1-row broadcast join,
    no shuffle of the vectors themselves."""
    emb = load(spark, sf_dir, "embeddings")
    vd = lambda v: v.cast("double")  # noqa: E731
    scale = emb.agg(
        F.max(F.array_max(F.transform(F.col("embedding"), lambda v: F.abs(vd(v)))))
        .alias("s")
    )
    with_s = emb.filter(F.col("vec_id") < 200).crossJoin(F.broadcast(scale))
    qexpr = lambda v: F.greatest(  # noqa: E731
        F.lit(-127),
        F.least(
            F.lit(127),
            F.floor(vd(v) * 127.0 / F.col("s") + 0.5).cast("bigint"),
        ),
    )
    return with_s.select(
        "vec_id",
        F.aggregate(
            F.transform(F.col("embedding"), qexpr),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("q_checksum"),
        F.floor(
            F.array_max(
                F.transform(
                    F.col("embedding"),
                    lambda v: F.abs(vd(v) - qexpr(v) * F.col("s") / 127.0),
                )
            )
            * 10000.0
            / F.col("s")
        )
        .cast("bigint")
        .alias("max_err_bp"),
    )


@register(
    "embedding_centroid_drift",
    oracle="""
WITH comp AS (
  SELECT label, unnest([{'dim': i, 'v': embedding[i]}
                 for i in range(1, len(embedding) + 1)]) AS c
  FROM embeddings
),
sums AS (
  SELECT label, c.dim AS dim,
         SUM(CAST(FLOOR(CAST(c.v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
           AS s_micro,
         COUNT(*) AS n
  FROM comp GROUP BY label, c.dim
),
cent AS (
  SELECT label, dim,
         CAST(FLOOR(s_micro * 1.0 / n) AS BIGINT) AS c_micro, n
  FROM sums
)
SELECT a.label AS label_a, b.label AS label_b,
       MIN(a.n) AS n_a, MIN(b.n) AS n_b,
       CAST(SUM((a.c_micro - b.c_micro) * (a.c_micro - b.c_micro)) AS BIGINT)
         AS dist_micro2
FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
GROUP BY a.label, b.label
""",
    tags=("X3", "embedding", "drift"),
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids + pairwise centroid distances —
    the corpus-drift / domain-signature report (are two sources or two
    ingest batches embedding-distributionally close?). Components are
    fixed to integer micro-units (floor(v*1e6 + 0.5) on exactly-
    widened float32->double) BEFORE summing, so the centroid is an
    order-independent integer mean and the distance matrix is exact
    integer math on every engine — the same portability discipline as
    embedding_quantize_stats.

    Scale: posexplode to (label, dim, micro) is the only corpus-sized
    stage, and it aggregates word-count-style (map-side partial sums,
    |labels|x|dims| result). Everything after — centroid division,
    dim-aligned self-join, pairwise reduce — runs on that tiny frame.
    Vectors themselves never shuffle; the label-pair matrix is
    |labels|^2/2 rows."""
    emb = load(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("dim0", "v")
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("v").cast("double") * 1000000.0 + 0.5)
        .cast("bigint")
        .alias("micro"),
    )
    cent = (
        comp.groupBy("label", "dim")
        .agg(F.sum("micro").alias("s_micro"), F.count(F.lit(1)).alias("n"))
        .select(
            "label",
            "dim",
            F.floor(F.col("s_micro") * 1.0 / F.col("n")).cast("bigint").alias(
                "c_micro"
            ),
            "n",
        )
    )
    a = cent.select(
        F.col("label").alias("label_a"),
        "dim",
        F.col("c_micro").alias("ca"),
        F.col("n").alias("na"),
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        "dim",
        F.col("c_micro").alias("cb"),
        F.col("n").alias("nb"),
    )
    return (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.min("na").alias("n_a"),
            F.min("nb").alias("n_b"),
            F.sum(
                (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))
            ).alias("dist_micro2"),
        )
    )


_CENT_SPLIT = 400  # vec_id threshold: < = indexed corpus, >= = new batch


@register(
    "centroid_incremental_update",
    oracle=f"""
WITH comp AS (
  SELECT vec_id, label,
         unnest([{{'dim': i, 'micro':
           CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)}}
                 for i in range(1, len(embedding) + 1)]) AS c
  FROM embeddings
),
old_s AS (
  SELECT label, c.dim AS dim, CAST(SUM(c.micro) AS BIGINT) AS s, COUNT(*) AS n
  FROM comp WHERE vec_id < {_CENT_SPLIT} GROUP BY label, c.dim
),
batch_s AS (
  SELECT label, c.dim AS dim, CAST(SUM(c.micro) AS BIGINT) AS s, COUNT(*) AS n
  FROM comp WHERE vec_id >= {_CENT_SPLIT} GROUP BY label, c.dim
),
merged AS (
  SELECT o.label, o.dim,
         CAST(FLOOR(o.s * 1.0 / o.n) AS BIGINT) AS c_old,
         CAST(FLOOR((o.s + COALESCE(b.s, 0)) * 1.0
                    / (o.n + COALESCE(b.n, 0))) AS BIGINT) AS c_new,
         o.n AS n_old, COALESCE(b.n, 0) AS n_batch
  FROM old_s o LEFT JOIN batch_s b ON o.label = b.label AND o.dim = b.dim
)
SELECT label,
       MIN(n_old) AS n_old,
       MIN(n_batch) AS n_batch,
       CAST(SUM((c_new - c_old) * (c_new - c_old)) AS BIGINT) AS shift_micro2
FROM merged GROUP BY label
""",
    tags=("X3", "embedding", "maintenance"),
)
def centroid_incremental_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental centroid maintenance for a serving ANN index: fold
    a NEW ingest batch (vec_id >= {_CENT_SPLIT}) into the indexed
    corpus's per-label centroids WITHOUT re-reading the corpus — the
    mini-batch update rule new_c = (S_old + S_batch)/(n_old + n_batch)
    on persisted (sum, count) state, then report per label how far
    each centroid moved (squared-L2 in integer micro-units). The
    drift figure is what decides a quantizer re-fit (compare
    fit_ivf_quantizer: full refit vs this O(batch) maintenance).

    Determinism: components fix to integer micro-units BEFORE any sum
    (the embedding_centroid_drift discipline) — sums, merged means
    (floored), and shift distances are exact integer math on every
    engine.

    Scale: the batch-sized posexplode is the only new work; the
    corpus-side sums are the persisted index state (recomputed here
    only because the fixture is self-contained — the docstring
    contract is (label, dim, s, n) state + an O(batch) fold). The
    dim-aligned merge joins |labels|x|dims| rows; vectors never
    shuffle."""
    emb = load(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "v"),
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("v") * 1_000_000.0 + 0.5).cast("bigint").alias("micro"),
    )

    def sums(df: DataFrame) -> DataFrame:
        return df.groupBy("label", "dim").agg(
            F.sum("micro").cast("bigint").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )

    old_s = sums(comp.filter(F.col("vec_id") < _CENT_SPLIT))
    batch_s = sums(comp.filter(F.col("vec_id") >= _CENT_SPLIT)).select(
        "label", "dim", F.col("s").alias("bs"), F.col("n").alias("bn")
    )
    merged = old_s.join(batch_s, ["label", "dim"], "left").select(
        "label",
        "dim",
        F.floor(F.col("s") * 1.0 / F.col("n")).cast("bigint").alias("c_old"),
        F.floor(
            (F.col("s") + F.coalesce("bs", F.lit(0)))
            * 1.0
            / (F.col("n") + F.coalesce("bn", F.lit(0)))
        )
        .cast("bigint")
        .alias("c_new"),
        F.col("n").alias("n_old"),
        F.coalesce("bn", F.lit(0)).alias("n_batch"),
    )
    return merged.groupBy("label").agg(
        F.min("n_old").alias("n_old"),
        F.min("n_batch").alias("n_batch"),
        F.sum((F.col("c_new") - F.col("c_old")) * (F.col("c_new") - F.col("c_old")))
        .cast("bigint")
        .alias("shift_micro2"),
    )


_DEDUP_COS_TAU = 0.35  # duplicate threshold (fixture embeddings are near-orthogonal)


@register(
    "dedup_embedding_survivors",
    oracle=f"""
WITH pairs AS (
  SELECT a.vec_id AS keep_id, b.vec_id AS drop_id
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE {_COS_SQL.format(a="a.embedding", b="b.embedding")} >= {_DEDUP_COS_TAU}
),
dropped AS (SELECT DISTINCT drop_id FROM pairs)
SELECT e.label,
       COUNT(*) AS n_vectors,
       COUNT(*) FILTER (WHERE d.drop_id IS NULL) AS n_survivors,
       COUNT(*) FILTER (WHERE d.drop_id IS NOT NULL) AS n_dropped
FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.drop_id
GROUP BY e.label
""",
    tags=("X1", "X2", "X3", "dedup", "similarity"),
)
def dedup_embedding_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate DEDUP (north-star "embedding-
    cosine near-dup" closed as an actual dedup pass, not just a pair
    report): a vector is dropped when any smaller-id vector in its
    block is cosine-similar above τ={_DEDUP_COS_TAU}; survivors per
    label are what a curation pipeline keeps.

    Scale: candidate pairs form only within a block (the label here; a
    coarse quantizer cell at 100 TB — same blocking contract as
    similarity_blocked_pairs), so the pair join is a hash equi-join
    with Σ|block|² fan-out, never corpus². The drop set is a distinct
    projection of pair targets (32-byte ids, vectors never shuffle
    into it) and returns via one LEFT join for the per-label
    keep/drop accounting. Keep-smallest-id is the same deterministic
    survivor rule as exact dedup (X1).

    Per-pair cost: each side's norm is precomputed per ROW before the
    join (sqrt(Σx²) once per vector), so only the dot product runs
    per pair — a 3× cut on the join's fold work. Bit-parity with the
    oracle holds because the arithmetic is unchanged:
    dot / (sqrt(na)·sqrt(nb)), the exact _cosine / DuckDB
    list_cosine_similarity form, just evaluated earlier."""
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("keep_id"), "label",
        F.col("embedding").alias("ea"), _norm(F.col("embedding")).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("drop_id"), "label",
        F.col("embedding").alias("eb"), _norm(F.col("embedding")).alias("nb"),
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    pairs = (
        a.join(b, "label")
        .filter(F.col("keep_id") < F.col("drop_id"))
        .filter(cos >= _DEDUP_COS_TAU)
    )
    dropped = pairs.select("drop_id").distinct()
    return (
        emb.join(dropped, emb["vec_id"] == dropped["drop_id"], "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.count(F.when(F.col("drop_id").isNull(), F.lit(1))).alias("n_survivors"),
            F.count(F.when(F.col("drop_id").isNotNull(), F.lit(1))).alias("n_dropped"),
        )
    )


_ANISO_ITERS = 64


@register(
    "embedding_anisotropy",
    oracle=None,  # eigendecomposition is not SQL-expressible —
    # rows-only driver check; accuracy gated in pytest against
    # numpy.linalg.eigh on the identical vectors.
    tags=("X3", "arrow", "diagnostics"),
)
def embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding anisotropy (representation-collapse
    diagnostic): the share of variance captured by the top principal
    direction of each label's centered covariance — near 10000 bp
    means the label's vectors collapsed onto a line (a degenerate
    embedding space that breaks cosine retrieval). The designed
    ``applyInPandas`` shape: covariance + power iteration are linear
    algebra Catalyst cannot express, so each label group lands in one
    Arrow batch and numpy does the math.

    Determinism: rows sort by vec_id inside the group before any
    float accumulation; power iteration runs a FIXED 64 rounds from a
    fixed start vector — no convergence test, no RNG — so the result
    is a pure function of the group's content, independent of
    partitioning (layout-invariance suite covers it).

    Scale: the shuffle is label-keyed and carries (label, vec) once;
    each group must fit one executor's memory — at 100 TB you either
    pre-aggregate to per-label (sum, sum-outer-product) matrices with
    d² Spark columns first, or uniform-sample each label to a bounded
    cohort; the diagnostic needs only a stable estimate, and the
    report shape is unchanged."""
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")

    def per_label(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values("vec_id")
        X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        n, d = X.shape
        Xc = X - X.mean(axis=0)
        C = (Xc.T @ Xc) / n
        total_var = float(np.trace(C))
        v = np.full(d, 1.0 / np.sqrt(d))
        for _ in range(_ANISO_ITERS):
            v = C @ v
            nv = float(np.linalg.norm(v))
            if nv == 0.0:
                break
            v = v / nv
        top_var = float(v @ C @ v)
        share_bp = int(top_var * 10000 // total_var) if total_var > 0 else 0
        mean_norm = float(np.linalg.norm(X, axis=1).mean())
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n_vectors": [n],
                "dim": [d],
                "top_eig_share_bp": [share_bp],
                "mean_norm_micro": [int(mean_norm * 1_000_000)],
            }
        )

    return emb.groupBy("label").applyInPandas(
        per_label,
        schema="label int, n_vectors bigint, dim int, "
        "top_eig_share_bp bigint, mean_norm_micro bigint",
    )


@register(
    "cosine_threshold_sweep",
    oracle=f"""
SELECT CAST(FLOOR({_COS_SQL.format(a="a.embedding", b="b.embedding")} * 20)
            * 5 AS BIGINT) AS cosine_band_pct,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_COS_SQL.format(a="a.embedding", b="b.embedding")} >= 0.3
GROUP BY 1
""",
    tags=("X3", "similarity", "tuning"),
)
def cosine_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-dedup threshold sensitivity: label-blocked pair
    counts per 5%-wide cosine band (from 30% up) — the tuning table
    for `dedup_embedding_survivors`' cut, the vector-space twin of
    `jaccard_threshold_sweep`. A cliff at the production threshold
    means borderline semantic duplicates flip on embedding noise; a
    valley means the threshold has slack.

    Determinism: the cosine is the bit-exact fold both engines
    already agree on (the similarity pack's _dot/_norm discipline);
    FLOOR of the identical double assigns identical bands.

    Scale: the same Σ|block|² blocked join as the pair report —
    per-row norm precompute, the banding replaces the threshold
    filter with a handful of aggregate rows."""
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("label"),
        F.col("embedding").alias("ea"), _norm(F.col("embedding")).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("label"),
        F.col("embedding").alias("eb"), _norm(F.col("embedding")).alias("nb"),
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= 0.3)
        .select((F.floor(F.col("cos") * 20) * 5).cast("bigint").alias(
            "cosine_band_pct"
        ))
        .groupBy("cosine_band_pct")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


@register(
    "embedding_label_confusion",
    oracle="""
WITH comp AS (
  SELECT vec_id, label, (u).dim AS dim,
         CAST(FLOOR(CAST((u).v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
           AS v_micro
  FROM (
    SELECT vec_id, label,
           unnest([{'dim': i, 'v': embedding[i]}
                   for i in range(1, len(embedding) + 1)]) AS u
    FROM embeddings
  )
),
cent AS (
  SELECT label AS c_label, dim,
         CAST(FLOOR(SUM(v_micro) * 1.0 / COUNT(*)) AS BIGINT) AS c_micro
  FROM comp GROUP BY label, dim
),
dist AS (
  SELECT comp.vec_id, comp.label AS true_label, cent.c_label,
         CAST(SUM((comp.v_micro - cent.c_micro) * (comp.v_micro - cent.c_micro))
              AS BIGINT) AS d2
  FROM comp JOIN cent ON comp.dim = cent.dim
  GROUP BY comp.vec_id, comp.label, cent.c_label
),
assigned AS (
  SELECT vec_id, true_label, c_label AS assigned_label,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk
  FROM dist
)
SELECT true_label, assigned_label, CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM assigned WHERE rk = 1
GROUP BY true_label, assigned_label
""",
    tags=("X3", "embedding", "clustering"),
)
def embedding_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label↔centroid confusion matrix: every vector assigned to its
    nearest per-label centroid (exact integer-micro squared L2, the
    centroid-drift discipline), counted per (true, assigned) cell —
    the cluster-purity / mislabeling report that decides whether
    label blocking (similarity_blocked_pairs, dedup_embedding_
    survivors) is trustworthy, and the evaluation twin of the IVF
    quantizer's cell assignment.

    Determinism: micro-unit components before any sum (order-
    independent integer centroids), exact integer distances, and a
    fully tie-broken argmin (d2, then label).

    Scale: the corpus-sized stages are the component explode and the
    |vecs|·|dims|·|labels| distance join — at warehouse scale the
    |labels|-wide centroid table broadcasts and the per-vector argmin
    is a TakeOrdered-per-key window over |labels| rows per vector.
    Vectors never shuffle whole."""
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "v"),
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("v") * 1000000.0 + 0.5).cast("bigint").alias("v_micro"),
    )
    cent = comp.groupBy(F.col("label").alias("c_label"), "dim").agg(
        F.floor(F.sum("v_micro") * 1.0 / F.count(F.lit(1)))
        .cast("bigint")
        .alias("c_micro")
    )
    dist = (
        comp.join(cent, "dim")
        .groupBy("vec_id", F.col("label").alias("true_label"), "c_label")
        .agg(
            F.sum(
                (F.col("v_micro") - F.col("c_micro"))
                * (F.col("v_micro") - F.col("c_micro"))
            )
            .cast("bigint")
            .alias("d2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "c_label")
    return (
        dist.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy("true_label", F.col("c_label").alias("assigned_label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
    )


# ---------------------------------------------------------------------------
# Oracle-checked cosine-LSH (md5-seeded hyperplanes, integer-exact signs)
# ---------------------------------------------------------------------------

_CLSH_TABLES = 4
_CLSH_PLANES = 4  # per table → 4-bit buckets, 4 independent tables
_CLSH_DIM = 64
_CLSH_MIN_COS = 0.2


def _clsh_signs() -> list[list[int]]:
    """Rademacher (±1) hyperplanes derived from md5 — one flat list
    per (table, plane), shared verbatim by the Spark expressions and
    the generated oracle SQL, so both engines project through the
    IDENTICAL planes."""
    import hashlib

    out = []
    for t in range(_CLSH_TABLES):
        for p in range(_CLSH_PLANES):
            row = [
                1
                if int(hashlib.md5(f"hp{t}:{p}:{d}".encode()).hexdigest()[:2], 16) & 1
                else -1
                for d in range(_CLSH_DIM)
            ]
            out.append(row)
    return out


_CLSH_SIGN_ROWS = _clsh_signs()


def _cosine_lsh_md5_oracle() -> str:
    q = (
        "[CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT) "
        "FOR x IN CAST(embedding AS DOUBLE[])]"
    )
    dots = ", ".join(
        f"CAST(list_dot_product(q, {_CLSH_SIGN_ROWS[t * _CLSH_PLANES + p]}) AS BIGINT)"
        f" AS dot_{t}_{p}"
        for t in range(_CLSH_TABLES)
        for p in range(_CLSH_PLANES)
    )
    buckets = " UNION ALL ".join(
        "SELECT vec_id, {} AS tbl, {} AS bucket FROM dots".format(
            t,
            " + ".join(
                f"CASE WHEN dot_{t}_{p} > 0 THEN {1 << p} ELSE 0 END"
                for p in range(_CLSH_PLANES)
            ),
        )
        for t in range(_CLSH_TABLES)
    )
    cos = _COS_SQL.format(a="ea.embedding", b="eb.embedding")
    return f"""
WITH qv AS (SELECT vec_id, embedding, {q} AS q FROM embeddings),
dots AS (SELECT vec_id, {dots} FROM qv),
buckets AS ({buckets}),
pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT p.vec_a, p.vec_b, ROUND({cos}, 6) AS cosine
FROM pairs p
JOIN embeddings ea ON p.vec_a = ea.vec_id
JOIN embeddings eb ON p.vec_b = eb.vec_id
WHERE {cos} >= {_CLSH_MIN_COS}
"""


@register(
    "cosine_lsh_md5_pairs",
    oracle=_cosine_lsh_md5_oracle(),
    tags=("X3", "similarity", "lsh"),
)
def cosine_lsh_md5_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked cosine-LSH candidates (X3): the engine-portable
    twin of `similarity_lsh_bucketed` — 4 hash tables of 4 Rademacher
    (±1) hyperplanes derived from md5 constants shared verbatim with
    the oracle, vectors quantized to integer micros with the portable
    FLOOR(x·1e6 + 0.5) rounding so every projection SIGN is exact
    integer arithmetic on both engines (a float-fold sign near zero
    could differ; an integer dot cannot). Candidates collide in ≥1
    table; survivors are scored with the exact sequential-fold cosine
    and gated at {_CLSH_MIN_COS}. The Spark-ML form stays rows-only —
    its hyperplanes come from a JVM RNG; THIS query proves the
    random-hyperplane LSH construction itself.

    100 TB: per-table equi joins on 4-bit buckets (widen planes/tables
    to hold bucket occupancy flat); projections are a map over scan
    partitions; vectors never shuffle for bucketing — only
    (tbl, bucket, vec_id)."""
    emb = load(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.floor(x * 1000000 + 0.5).cast("long"),
    )
    docs = emb.select("vec_id", "embedding", qv.alias("q"))
    # One F.expr string per dot (r14): the old form built each signs
    # array from 64 F.lit().cast() Column objects — ~2 py4j round
    # trips per element, >2,000 per construction, measured seconds of
    # DRIVER time per execution (guide §7.3: plan-construction cost).
    # The SQL string parses to the IDENTICAL expression (same integer
    # fold, same literal types via the L suffix) in one call.
    dot_cols = [
        F.expr(_dot_fold_sql("q", _CLSH_SIGN_ROWS[t * _CLSH_PLANES + p])).alias(
            f"dot_{t}_{p}"
        )
        for t in range(_CLSH_TABLES)
        for p in range(_CLSH_PLANES)
    ]
    dots = docs.select("vec_id", *dot_cols)
    buckets = dots.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        sum(
                            [
                                F.when(
                                    F.col(f"dot_{t}_{p}") > 0, F.lit(1 << p)
                                ).otherwise(F.lit(0))
                                for p in range(_CLSH_PLANES)
                            ]
                        ).alias("bucket"),
                    )
                    for t in range(_CLSH_TABLES)
                ]
            )
        ).alias("tb"),
    ).select(
        "vec_id", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket")
    )
    a = buckets.select(F.col("vec_id").alias("vec_a"), "tbl", "bucket")
    b = buckets.select(F.col("vec_id").alias("vec_b"), "tbl", "bucket")
    pairs = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"),
        _norm(F.col("embedding")).alias("na"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"),
        _norm(F.col("embedding")).alias("nb"),
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cosine_raw", cos)
        .filter(F.col("cosine_raw") >= _CLSH_MIN_COS)
        .select("vec_a", "vec_b", F.round("cosine_raw", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Corpus-adaptive cosine-LSH (VERDICT r6/r7 #1: the fixed 4-plane form's
# 16 buckets/table make candidate volume grow ~(n/16)² with the corpus)
# ---------------------------------------------------------------------------

# Plane-count ladder on the corpus row count: 4 planes below 1k
# vectors (degenerating EXACTLY to cosine_lsh_md5_pairs' tables —
# the first 4 adaptive hyperplanes are the fixed form's, same md5
# constants), +1 plane per corpus doubling, capped at 8 (256
# buckets/table). E[vectors per bucket] = n / 2^planes stays ~flat as
# the corpus doubles, so per-table join fan-out stays flat where the
# fixed form quadruples.
_CLSH_ADAPT_LADDER = (
    (8_000, 8),
    (4_000, 7),
    (2_000, 6),
    (1_000, 5),
)
_CLSH_ADAPT_MAX_PLANES = max(p for _, p in _CLSH_ADAPT_LADDER)


def _clsh_adapt_signs() -> list[list[int]]:
    """Rademacher hyperplanes for the adaptive form: same md5 scheme
    as `_clsh_signs` extended to the ladder's max plane count, so
    planes 0-3 of each table are IDENTICAL to the fixed form's."""
    import hashlib

    out = []
    for t in range(_CLSH_TABLES):
        for p in range(_CLSH_ADAPT_MAX_PLANES):
            row = [
                1
                if int(hashlib.md5(f"hp{t}:{p}:{d}".encode()).hexdigest()[:2], 16) & 1
                else -1
                for d in range(_CLSH_DIM)
            ]
            out.append(row)
    return out


_CLSH_ADAPT_SIGN_ROWS = _clsh_adapt_signs()


def _cosine_lsh_adaptive_oracle() -> str:
    q = (
        "[CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT) "
        "FOR x IN CAST(embedding AS DOUBLE[])]"
    )
    ladder = " ".join(
        f"WHEN n >= {t} THEN {p}" for t, p in _CLSH_ADAPT_LADDER
    )
    dots = ", ".join(
        f"CAST(list_dot_product(q, "
        f"{_CLSH_ADAPT_SIGN_ROWS[t * _CLSH_ADAPT_MAX_PLANES + p]}) AS BIGINT)"
        f" AS dot_{t}_{p}"
        for t in range(_CLSH_TABLES)
        for p in range(_CLSH_ADAPT_MAX_PLANES)
    )
    buckets = " UNION ALL ".join(
        "SELECT vec_id, {} AS tbl, {} AS bucket, np FROM dots, params".format(
            t,
            " + ".join(
                f"CASE WHEN dot_{t}_{p} > 0 AND {p} < np THEN {1 << p} ELSE 0 END"
                for p in range(_CLSH_ADAPT_MAX_PLANES)
            ),
        )
        for t in range(_CLSH_TABLES)
    )
    cos = _COS_SQL.format(a="ea.embedding", b="eb.embedding")
    return f"""
WITH params AS (
  SELECT n, CASE {ladder} ELSE {_CLSH_PLANES} END AS np
  FROM (SELECT COUNT(*) AS n FROM embeddings)
),
qv AS (SELECT vec_id, embedding, {q} AS q FROM embeddings),
dots AS (SELECT vec_id, {dots} FROM qv),
buckets AS ({buckets}),
pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b, a.np
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT p.vec_a, p.vec_b, ROUND({cos}, 6) AS cosine,
       CAST(p.np AS BIGINT) AS planes
FROM pairs p
JOIN embeddings ea ON p.vec_a = ea.vec_id
JOIN embeddings eb ON p.vec_b = eb.vec_id
WHERE {cos} >= {_CLSH_MIN_COS}
"""


@register(
    "cosine_lsh_adaptive_planes",
    oracle=_cosine_lsh_adaptive_oracle(),
    tags=("X3", "similarity", "lsh", "scale"),
)
def cosine_lsh_adaptive_planes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-LSH candidates with CORPUS-ADAPTIVE plane count (X3):
    the fixed form (`cosine_lsh_md5_pairs`) names "widen planes/
    tables" as its scale lever but has no mechanism — 4 planes mean
    16 buckets/table forever, so within-bucket candidate pairs grow
    ~(n/16)² (VERDICT r6 #1, r7 #2). This query makes the lever PART
    OF THE PLAN, exactly like `simhash_adaptive_bands`
    (operators/dedup.py): plane count follows an integer ladder on
    the corpus row count (4 planes below 1k vectors, +1 per corpus
    doubling, capped at 8 = 256 buckets/table), evaluated as a 1-row
    count aggregate broadcast onto the projection stream — no driver
    round-trip — and the SAME ladder runs inside the DuckDB twin, so
    the adaptive construction itself is oracle-checked. Below 1k
    vectors the candidate set degenerates to exactly the fixed form's
    (the first 4 hyperplanes per table are byte-identical md5
    constants) — pinned by a pytest equivalence — while larger
    corpora self-widen: 2k vectors → 6 planes, 8k → 8.

    100 TB: E[vectors per bucket] = n/2^planes holds ~flat per corpus
    doubling, so the per-table self-join fan-out stays proportional
    to n where the fixed form's grows ~n²; the scale probe records
    the adaptive ratio (the fixed form is deliberately NOT probed —
    its ~k² candidate growth at k=4 would be the gate-breaking
    quadratic this query exists to replace). Beyond the 8-plane cap a
    production deployment adds hash tables (recall) while the ladder
    keeps projections in exact-integer territory for the oracle."""
    emb = load(spark, sf_dir, "embeddings")
    np_col = F.lit(_CLSH_PLANES)
    for threshold, planes in reversed(_CLSH_ADAPT_LADDER):
        np_col = F.when(F.col("n") >= threshold, planes).otherwise(np_col)
    params = (
        emb.agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select("n", np_col.cast("int").alias("np"))
    )
    qv = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.floor(x * 1000000 + 0.5).cast("long"),
    )
    docs = (
        emb.select("vec_id", qv.alias("q"))
        .crossJoin(F.broadcast(params))
    )
    # one F.expr per dot — see _dot_fold_sql (the 32×64 per-literal
    # Column build dominated this query's wall time: measured ~8-12 s
    # of driver-side construction per execution, r14)
    dot_cols = [
        F.expr(
            _dot_fold_sql(
                "q", _CLSH_ADAPT_SIGN_ROWS[t * _CLSH_ADAPT_MAX_PLANES + p]
            )
        ).alias(f"dot_{t}_{p}")
        for t in range(_CLSH_TABLES)
        for p in range(_CLSH_ADAPT_MAX_PLANES)
    ]
    dots = docs.select("vec_id", "np", *dot_cols)
    buckets = dots.select(
        "vec_id",
        "np",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        sum(
                            [
                                F.when(
                                    (F.col(f"dot_{t}_{p}") > 0)
                                    & (F.lit(p) < F.col("np")),
                                    F.lit(1 << p),
                                ).otherwise(F.lit(0))
                                for p in range(_CLSH_ADAPT_MAX_PLANES)
                            ]
                        ).alias("bucket"),
                    )
                    for t in range(_CLSH_TABLES)
                ]
            )
        ).alias("tb"),
    ).select(
        "vec_id", "np",
        F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"),
    )
    a = buckets.select(F.col("vec_id").alias("vec_a"), "tbl", "bucket", "np")
    b = buckets.select(F.col("vec_id").alias("vec_b"), "tbl", "bucket")
    pairs = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "np")
        .distinct()
    )
    ea = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"),
        _norm(F.col("embedding")).alias("na"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"),
        _norm(F.col("embedding")).alias("nb"),
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cosine_raw", cos)
        .filter(F.col("cosine_raw") >= _CLSH_MIN_COS)
        .select(
            "vec_a", "vec_b",
            F.round("cosine_raw", 6).alias("cosine"),
            F.col("np").cast("bigint").alias("planes"),
        )
    )


@register(
    "hard_negative_mining",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
  FROM embeddings WHERE vec_id < 8
),
scored AS (
  SELECT q.query_id, q.qlabel, e.vec_id, e.label,
         {_COS_SQL.format(a="e.embedding", b="q.qv")} AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
pos AS (
  SELECT query_id, MAX(cosine) AS max_pos
  FROM scored WHERE label = qlabel GROUP BY 1
),
negs AS (
  SELECT query_id, vec_id, label, cosine,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, vec_id
         ) AS rn
  FROM scored WHERE label <> qlabel
)
SELECT n.query_id,
       CAST(n.rn AS BIGINT) AS rank,
       n.vec_id AS neg_vec_id,
       n.label AS neg_label,
       ROUND(n.cosine, 6) AS neg_cosine,
       ROUND(p.max_pos, 6) AS max_pos_cosine,
       n.cosine > p.max_pos AS margin_violation
FROM negs n JOIN pos p USING (query_id)
WHERE n.rn <= 5
""",
    tags=("X3", "similarity", "training-data"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: per
    anchor vector, the top-5 most-similar OTHER-label vectors, each
    flagged when it outscores the anchor's best same-label positive
    (a margin violation — exactly the pairs a triplet-loss curriculum
    wants). One broadcast cross of the 8 anchors against the corpus
    scores every pair partition-locally (no corpus shuffle; the same
    plan as similarity_topk_cosine), the positive ceiling is a tiny
    per-anchor max, and only k·q negative rows plus q positive maxima
    cross the final exchanges; the violation flag compares the two
    bit-exact cosine folds, so it is engine-deterministic."""
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "en", _norm(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("en").alias("qn"),
        F.col("label").alias("qlabel"),
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (F.col("en") * F.col("qn"))
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qlabel", "vec_id", "label", cos.alias("cosine"))
    )
    pos = (
        scored.filter(F.col("label") == F.col("qlabel"))
        .groupBy("query_id")
        .agg(F.max("cosine").alias("max_pos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    negs = (
        scored.filter(F.col("label") != F.col("qlabel"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )
    return negs.join(F.broadcast(pos), "query_id").select(
        "query_id",
        F.col("rn").cast("bigint").alias("rank"),
        F.col("vec_id").alias("neg_vec_id"),
        F.col("label").alias("neg_label"),
        F.round("cosine", 6).alias("neg_cosine"),
        F.round("max_pos", 6).alias("max_pos_cosine"),
        (F.col("cosine") > F.col("max_pos")).alias("margin_violation"),
    )
