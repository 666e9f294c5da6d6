"""Composed end-to-end training-data pipeline (the north-star use:
"a user of the reference could switch and run every query" — and then
some): documents → exact dedup → near-dup removal → quality filter →
per-language corpus accounting, as ONE declarative plan.

This is the canonical 100 TB preprocessing chain (C4/Gopher-style):
each stage is an operator from the packs (X1, X2, X4) composed by
dataframe joins — Catalyst fuses the pipeline; nothing materializes
between stages unless the optimizer chooses to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.helpers import quality_expr
from ..registry import register
from .dedup import _JACCARD_T, dedup_ngram_jaccard


@register(
    "training_data_pipeline",
    oracle=f"""
WITH sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, unnest([tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]
                           for i in range(1, len(tok) - 1)]) AS s
    FROM (SELECT doc_id, string_split(text, ' ') AS tok FROM documents)
    WHERE len(tok) >= 3
  )
),
df_ok AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 100),
sh2 AS (SELECT sh.doc_id, sh.s FROM sh JOIN df_ok USING (s)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
neardup_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM sh2 a JOIN sh2 b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
neardup_losers AS (
  SELECT DISTINCT doc_b AS doc_id
  FROM neardup_pairs
  JOIN sizes s1 ON doc_a = s1.doc_id
  JOIN sizes s2 ON doc_b = s2.doc_id
  WHERE shared * 1.0 / (s1.n + s2.n - shared) >= {_JACCARD_T}
),
exact_keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
quality AS (
  SELECT doc_id,
         LEAST(len(string_split(text, ' ')) / 50.0, 1.0) * 0.5
       + LEAST(len(list_filter(string_split(text, ' '),
                t -> list_contains(['the','a','of','and','to','in'], t)))
               * 1.0 / len(string_split(text, ' ')) * 5.0, 1.0) * 0.3
       + (1.0 - LEAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))
               * 1.0 / n_chars * 10.0, 1.0)) * 0.2 AS q
  FROM documents
)
SELECT d.lang,
       COUNT(*) AS n_docs_kept,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars_kept
FROM documents d
JOIN exact_keep USING (doc_id)
LEFT JOIN neardup_losers nl ON d.doc_id = nl.doc_id
JOIN quality USING (doc_id)
WHERE nl.doc_id IS NULL AND quality.q >= 0.7
GROUP BY d.lang
""",
    tags=("X1", "X2", "X4", "pipeline", "bench"),
    eager_build=True,  # near-dup stage builds the shared shingle index
)
def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning: drop exact duplicates (keep lowest
    doc_id), drop the higher-id member of every near-dup pair
    (Jaccard >= 0.8), keep only quality >= 0.7 docs, report surviving
    docs/chars per language.

    Scale shape: exact-dedup is a hash agg on text digest; near-dup is
    the blocked shingle join (X2); the quality filter is a pure
    projection; the final agg partial-combines. One composed plan —
    no intermediate materialization, no driver round-trips."""
    docs = load(spark, sf_dir, "documents")
    exact_keep = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id"
    )
    losers = (
        dedup_ngram_jaccard(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    # quality_score (the pack query) limits to doc_id < 200 for its
    # oracle; the pipeline scores ALL docs with the same shared
    # expression (functions/helpers.quality_expr)
    q = quality_expr()
    kept = (
        docs.join(exact_keep, "doc_id")
        .join(losers, "doc_id", "left_anti")
        .filter(q >= 0.7)
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_chars").cast("bigint").alias("total_chars_kept"),
    )
