"""Expression-level helpers shared by operator packs.

All pure Column expressions (JVM codegen) — the engine's rule is that
helpers compose expressions, they never wrap Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unscaled_micros(c: Column) -> Column:
    """Exact 6-dp quantization of a numeric column as LONG micros:
    ``cast(x as decimal(38,6)) * 1e6`` is an exact integer value (the
    decimal cast rounds HALF_UP at 6 dp — the SAME quantization the
    repo's decimal sums apply), and the long cast is lossless for
    |x| < 9.2e12. Input to the fast-hash-map sum pattern below."""
    return (c.cast("decimal(38,6)") * 1_000_000).cast("long")


def micros_hilo_sums(col: str) -> list[Column]:
    """Overflow-safe EXACT sum of long micros on the codegen fast
    hash-map path (r13, guide §1.2 per-task work): Spark's first-level
    vectorized hash map supports LONG buffers but not decimals wider
    than 18 digits, so ``SUM(decimal(38,6))`` drops every row of a
    grouped aggregate onto the slow BytesToBytesMap path — measured
    ~5-7× slower than long sums on the Q1-shaped scan. Splitting each
    micro value m into (m div 1e6, m % 1e6) and summing the two LONGs
    keeps exactness (sum(m) = 1e6·Σhi + Σlo, the identity holds for
    negatives under Java div/% semantics) with overflow only past
    9.2e18 whole units per group — ~10 PB of revenue micros, far past
    the 100 TB posture. Recombine with :func:`micros_total`."""
    return [
        F.sum(F.expr(f"{col} div 1000000")).alias(f"{col}_hi"),
        F.sum(F.expr(f"{col} % 1000000")).alias(f"{col}_lo"),
    ]


def micros_total(col: str) -> Column:
    """Recombine :func:`micros_hilo_sums` partials into the exact
    total as DECIMAL(38,6) — bit-identical to what
    ``SUM(cast(x as decimal(38,6)))`` would have produced."""
    return (
        F.col(f"{col}_hi").cast("decimal(38,0)") * 1_000_000
        + F.col(f"{col}_lo").cast("decimal(38,0)")
    ) / 1_000_000


def format_bytes(col: Column) -> Column:
    """pg_size_pretty-equivalent with the reference's IEC renaming
    quirk (monitoring.ps1:32-47 maps kB→KiB, MB→MiB, …): tiered CASE
    producing e.g. '1.5 MiB'. Tiers are 1024-based like pg."""
    b = col.cast("double")
    return (
        F.when(b >= 1024.0**4, F.concat(F.round(b / 1024.0**4, 1), F.lit(" TiB")))
        .when(b >= 1024.0**3, F.concat(F.round(b / 1024.0**3, 1), F.lit(" GiB")))
        .when(b >= 1024.0**2, F.concat(F.round(b / 1024.0**2, 1), F.lit(" MiB")))
        .when(b >= 1024.0, F.concat(F.round(b / 1024.0, 1), F.lit(" KiB")))
        .otherwise(F.concat(b.cast("long"), F.lit(" B")))
    )


def ngram_expr(tok_col: Column | str, n: int) -> Column:
    """Word-n-gram array from a MATERIALIZED token-array column:
    transform(sequence(0, size-n), i -> concat_ws(' ', tok[i..i+n-1])).

    The token array must be a named column, not the raw split()
    expression — Catalyst does not CSE subexpressions inside
    higher-order-function lambdas, so referencing split(text) in the
    lambda re-splits the document per element, turning an O(tokens)
    build into O(tokens²) (measured 5× at sf0.1). Callers guard
    size(tok) >= n (Spark's sequence DESCENDS for a negative span
    instead of being empty). Single shared definition for the shingle
    index (dedup), decontamination n-grams (curation), and repetition
    bigrams (text_analysis)."""
    tok = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    return F.transform(
        F.sequence(F.lit(0), F.size(tok) - n),
        lambda i: F.concat_ws(" ", *[F.get(tok, i + j) for j in range(n)]),
    )


# Shared stopword list for quality features — single source for the
# composite score below AND quality_score's stopword_bp column
# (text_analysis imports it; two copies would silently desynchronize
# the bp column from the composite and from the DuckDB oracles).
QUALITY_STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def quality_expr(
    text_col: Column | str = "text", n_chars_col: Column | str = "n_chars"
) -> Column:
    """Composite document-quality score in [0, 1] (the Gopher/C4-style
    filter rule): 0.5·length + 0.3·stopword-density + 0.2·(1 − punct
    density), each term clamped. Single shared definition behind
    quality_score (X4), the composed training pipeline, the curation
    funnel, and the streaming ingest filter — one expression tree, one
    DuckDB twin to keep in sync. Operand order is part of the oracle
    contract (see memory: floor'd basis points amplify fp deviations)."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    n_chars = F.col(n_chars_col) if isinstance(n_chars_col, str) else n_chars_col
    tokens = F.split(text, " ")
    n_tokens = F.size(tokens)
    stop_hits = F.size(
        F.filter(
            tokens,
            lambda t: F.array_contains(
                F.array(*[F.lit(w) for w in QUALITY_STOPWORDS]), t
            ),
        )
    )
    punct = F.regexp_count(text, F.lit(r"[^a-zA-Z0-9 ]"))
    return (
        F.least(n_tokens / 50.0, F.lit(1.0)) * 0.5
        + F.least(stop_hits * 1.0 / n_tokens * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct * 1.0 / n_chars * 10.0, F.lit(1.0))) * 0.2
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Exact cosine over array columns (double fold) — the canonical
    form used by the similarity pack; see operators/similarity.py for
    the engine-parity notes."""
    ad, bd = a.cast("array<double>"), b.cast("array<double>")
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    nb = F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    return dot / (F.sqrt(na) * F.sqrt(nb))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join: salt the big side's key with a random
    bucket, replicate the small side across all buckets, join on
    (key, salt). Use when ONE key dominates (power-law FKs at 100 TB)
    and AQE's skew split isn't enough — e.g. a single customer holding
    10% of orders. Replication factor = salt_buckets on the small side
    only; the big side's skewed key now spreads over salt_buckets
    tasks."""
    salted_big = big.withColumn(
        "_salt", (F.rand(42) * salt_buckets).cast("int")
    )
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_big.join(exploded_small, [key, "_salt"], how)
    return out.drop("_salt")
