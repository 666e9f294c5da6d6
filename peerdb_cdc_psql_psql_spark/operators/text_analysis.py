"""Text-analysis pack (SURVEY.md §2.10 X4 + north-star): language-ID,
quality scoring, token counting, fingerprinting over `documents` —
all built-in expressions (regexp/split/aggregate), zero Python UDFs,
so the whole pack stays inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.helpers import QUALITY_STOPWORDS, ngram_expr, quality_expr
from ..registry import register

# Tiny marker lexicons for the n-gram/stopword language heuristic.
# (A real pipeline ships per-language frequency tables; the heuristic
# *shape* — per-language token-hit scoring + argmax — is identical.)
_LANG_MARKERS = {
    "en": ["the", "a", "fast", "small"],
    "es": ["el", "la", "que", "de"],
    "de": ["der", "die", "und", "nicht"],
    "fr": ["le", "la", "et", "que"],
    "zh": ["de", "shi", "bu", "le"],
}

_STOPWORDS = QUALITY_STOPWORDS  # single source (functions/helpers.py)


def _hit_count(tokens: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(tokens, arr))


@register(
    "text_stats_by_lang",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CAST(len(string_split(text, ' ')) AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_tokens,
       MAX(len(string_split(text, ' '))) AS max_tokens
FROM documents
GROUP BY lang
""",
    tags=("X4", "text"),
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics (doc counts, characters, token
    lengths) — the groupBy(lang) shape of SURVEY.md §2.10 X4."""
    docs = load(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " "))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (
            F.sum(ntok.cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))
        ).alias("avg_tokens"),
        F.max(ntok).alias("max_tokens"),
    )


@register(
    "token_count",
    oracle=r"""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS bpe_ish_tokens,
       CAST(ceil(n_chars / 4.0) AS BIGINT) AS approx_llm_tokens
FROM documents
WHERE doc_id < 200
""",
    tags=("X4", "text"),
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways (north-star "token counting"):
    whitespace tokens, a BPE-ish regex segmentation (letter runs /
    digit runs / single punctuation — the GPT-2 pre-tokenizer shape),
    and the chars/4 LLM heuristic. regexp_count is JVM codegen."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.regexp_count(
            F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
        ).alias("bpe_ish_tokens"),
        F.ceil(F.col("n_chars") / 4.0).alias("approx_llm_tokens"),
    )


@register(
    "quality_score",
    oracle="""
WITH feats AS (
  SELECT doc_id, lang, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             t -> list_contains(['the','a','of','and','to','in'], t))) AS stop_hits,
         len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS punct_chars
  FROM documents
)
-- scores reported in floor'd basis points: floor is rounding-rule
-- independent across engines, round-half is not (0.86875 case)
SELECT doc_id, lang, n_tokens,
       CAST(FLOOR(stop_hits * 10000.0 / n_tokens) AS BIGINT) AS stopword_bp,
       CAST(FLOOR(punct_chars * 10000.0 / n_chars) AS BIGINT) AS punct_bp,
       CAST(FLOOR((LEAST(n_tokens / 50.0, 1.0) * 0.5
           + LEAST(stop_hits * 1.0 / n_tokens * 5.0, 1.0) * 0.3
           + (1.0 - LEAST(punct_chars * 1.0 / n_chars * 10.0, 1.0)) * 0.2) * 10000.0) AS BIGINT)
         AS quality_bp,
       CASE WHEN LEAST(n_tokens / 50.0, 1.0) * 0.5
             + LEAST(stop_hits * 1.0 / n_tokens * 5.0, 1.0) * 0.3
             + (1.0 - LEAST(punct_chars * 1.0 / n_chars * 10.0, 1.0)) * 0.2 >= 0.7
            THEN 'KEEP' ELSE 'REVIEW' END AS quality_band
FROM feats
WHERE doc_id < 200
""",
    tags=("X4", "text", "bench"),
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring (north-star): length, stopword ratio,
    punctuation density → weighted composite + KEEP/REVIEW band (the
    Gopher/C4-style filter-rule shape as one expression tree)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tokens = F.split(F.col("text"), " ")
    n_tokens = F.size(tokens)
    stop_hits = F.size(
        F.filter(tokens, lambda t: F.array_contains(F.array(*[F.lit(w) for w in _STOPWORDS]), t))
    )
    punct = F.regexp_count(F.col("text"), F.lit(r"[^a-zA-Z0-9 ]"))
    quality = quality_expr()  # shared composite (functions/helpers.py)
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        # op order mirrors the oracle exactly: s*10000.0/n, NOT
        # (s/n)*10000 — fp results differ and floor amplifies it
        F.floor(stop_hits * 10000.0 / n_tokens).cast("bigint").alias("stopword_bp"),
        F.floor(punct * 10000.0 / F.col("n_chars")).cast("bigint").alias("punct_bp"),
        F.floor(quality * 10000.0).cast("bigint").alias("quality_bp"),
        F.when(quality >= 0.7, "KEEP").otherwise("REVIEW").alias("quality_band"),
    )


@register(
    "lang_id_heuristic",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
         len(list_filter(string_split(text, ' '), t -> list_contains(['the','a','fast','small'], t))) AS s_en,
         len(list_filter(string_split(text, ' '), t -> list_contains(['el','la','que','de'], t))) AS s_es,
         len(list_filter(string_split(text, ' '), t -> list_contains(['der','die','und','nicht'], t))) AS s_de,
         len(list_filter(string_split(text, ' '), t -> list_contains(['le','la','et','que'], t))) AS s_fr,
         len(list_filter(string_split(text, ' '), t -> list_contains(['de','shi','bu','le'], t))) AS s_zh
  FROM documents
)
SELECT predicted_lang, COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE predicted_lang = labeled_lang) AS n_label_agree
FROM (
  SELECT labeled_lang,
         CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
              WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
              WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
              WHEN s_fr >= s_zh THEN 'fr'
              ELSE 'zh' END AS predicted_lang
  FROM scored
)
GROUP BY predicted_lang
""",
    tags=("X4", "text"),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by marker-token scoring + argmax (north-star
    "language-ID (n-gram heuristic)"). The fixture corpus is synthetic
    English-ish for every label, so the heuristic (correctly) predicts
    'en' — the value verified is the scoring/argmax machinery, and
    n_label_agree quantifies heuristic-vs-label agreement."""
    docs = load(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    scores = {
        lang: _hit_count(tokens, words) for lang, words in _LANG_MARKERS.items()
    }
    # deterministic argmax with fixed precedence en > es > de > fr > zh
    pred = (
        F.when(
            (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["zh"]),
            "en",
        )
        .when(
            (scores["es"] >= scores["de"])
            & (scores["es"] >= scores["fr"])
            & (scores["es"] >= scores["zh"]),
            "es",
        )
        .when((scores["de"] >= scores["fr"]) & (scores["de"] >= scores["zh"]), "de")
        .when(scores["fr"] >= scores["zh"], "fr")
        .otherwise("zh")
    )
    scored = docs.select(F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang"))
    return scored.groupBy("predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("predicted_lang") == F.col("labeled_lang"), 1)).alias(
            "n_label_agree"
        ),
    )


@register(
    "repetition_stats",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
  WHERE doc_id < 200
),
bg AS (
  SELECT doc_id, unnest([tok[i] || ' ' || tok[i+1]
                         for i in range(1, len(tok))]) AS g
  FROM toks WHERE len(tok) >= 2
),
cnt AS (SELECT doc_id, g, COUNT(*) AS n FROM bg GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
         COUNT(*) AS n_distinct_bigrams, MAX(n) AS top_bigram_n
  FROM cnt GROUP BY doc_id
)
SELECT doc_id, n_bigrams, n_distinct_bigrams, top_bigram_n,
       CAST(FLOOR(top_bigram_n * 10000.0 / n_bigrams) AS BIGINT) AS top_bigram_bp,
       CAST(FLOOR((n_bigrams - n_distinct_bigrams) * 10000.0 / n_bigrams) AS BIGINT)
         AS dup_bigram_bp,
       CASE WHEN top_bigram_n * 1.0 / n_bigrams <= 0.2
            THEN 'KEEP' ELSE 'REPETITIVE' END AS rep_band
FROM agg
""",
    tags=("X4", "text", "quality"),
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signal (the Gopher duplicate-n-gram
    rules): per document, total vs distinct word-bigrams, the most
    frequent bigram's share (floored basis points), and a
    KEEP/REPETITIVE band at the top-bigram ≤ 20% rule.

    Scale shape: the whole computation is per-document array
    expressions — bigram array, array_distinct, a counted filter per
    distinct gram (docs are short; d² stays tiny) — so it runs inside
    one codegen stage with ZERO shuffle: no gram explode ever leaves
    the partition, unlike the groupBy(doc, gram) formulation which
    shuffles every token at corpus scale."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("tok")).filter(
        F.size("tok") >= 2
    )
    withbg = toks.select("doc_id", ngram_expr("tok", 2).alias("bg")).select(
        "doc_id",
        F.size("bg").cast("bigint").alias("n_bigrams"),
        F.size(F.array_distinct("bg")).cast("bigint").alias("n_distinct_bigrams"),
        F.array_max(
            F.transform(
                F.array_distinct("bg"),
                lambda x: F.size(F.filter(F.col("bg"), lambda y: y == x)),
            )
        )
        .cast("bigint")
        .alias("top_bigram_n"),
    )
    return withbg.select(
        "doc_id",
        "n_bigrams",
        "n_distinct_bigrams",
        "top_bigram_n",
        F.floor(F.col("top_bigram_n") * 10000.0 / F.col("n_bigrams"))
        .cast("bigint")
        .alias("top_bigram_bp"),
        F.floor(
            (F.col("n_bigrams") - F.col("n_distinct_bigrams"))
            * 10000.0
            / F.col("n_bigrams")
        )
        .cast("bigint")
        .alias("dup_bigram_bp"),
        F.when(
            F.col("top_bigram_n") * 1.0 / F.col("n_bigrams") <= 0.2, "KEEP"
        )
        .otherwise("REPETITIVE")
        .alias("rep_band"),
    )


_SEARCH_TERMS = ["vector", "merge", "scan"]


@register(
    "keyword_search",
    oracle=f"""
WITH terms(term) AS (VALUES {", ".join(f"('{t}')" for t in _SEARCH_TERMS)}),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM toks JOIN terms USING (term) GROUP BY 1, 2
),
idf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id,
       COUNT(*) AS n_terms_matched,
       CAST(SUM(tf * ((n_docs * 1000000) // df)) AS BIGINT) AS score_micro
FROM tf JOIN idf USING (term) CROSS JOIN n
GROUP BY doc_id
""",
    tags=("X4", "text", "search"),
)
def keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword search with tf-idf-style ranking over the corpus — the
    retrieval primitive of a training-data pipeline (find documents
    about X at 100 TB), scored in EXACT integer arithmetic:
    score_micro = Σ tf(term, doc) · (N·10⁶ div df(term)). Integer
    rarity weights make the score order-independent and bit-identical
    across engines — no transcendental idf, no float-sum ambiguity.

    Plan shape is an inverted-index probe: the term filter applies
    BEFORE the shuffle, so only matching postings move; the per-term
    document frequencies are a k-row broadcast; the final agg shuffles
    one row per (doc, matched term)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term").isin(_SEARCH_TERMS))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("w", F.expr("tf * ((n_docs * 1000000) div df)"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.sum("w").cast("bigint").alias("score_micro"),
    )


@register(
    "doc_fingerprint",
    oracle="""
SELECT doc_id,
       substr(md5(text), 1, 16) AS fp_md5,
       list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, length(text) + 1),
                   i -> CAST(ascii(text[i]) AS BIGINT)),
                   (h, c) -> (h * 31 + c) % 1000000007) AS fp_rolling
FROM documents
WHERE doc_id < 200
""",
    tags=("X4", "text"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (north-star "rolling hash"): a stable
    md5 prefix plus a polynomial rolling hash (h·31+c mod 1e9+7) folded
    over the character stream with `aggregate` — both pure expressions,
    both engine-portable (the oracle computes the identical fold)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    # substr with a *column* start index needs the SQL expr form
    codes = F.expr(
        "transform(sequence(1, length(text)), i -> cast(ascii(substr(text, i, 1)) as bigint))"
    )
    rolling = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda h, c: (h * 31 + c) % 1000000007,
    )
    return docs.select(
        "doc_id",
        F.substring(F.md5(F.col("text").cast("binary")), 1, 16).alias("fp_md5"),
        rolling.alias("fp_rolling"),
    )


@register(
    "text_suite",
    oracle=r"""
WITH feats AS (
  SELECT doc_id, lang, n_chars, text,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             t -> list_contains(['the','a','of','and','to','in'], t))) AS stop_hits,
         len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS punct_chars,
         len(list_filter(string_split(text, ' '), t -> list_contains(['the','a','fast','small'], t))) AS s_en,
         len(list_filter(string_split(text, ' '), t -> list_contains(['el','la','que','de'], t))) AS s_es,
         len(list_filter(string_split(text, ' '), t -> list_contains(['der','die','und','nicht'], t))) AS s_de,
         len(list_filter(string_split(text, ' '), t -> list_contains(['le','la','et','que'], t))) AS s_fr,
         len(list_filter(string_split(text, ' '), t -> list_contains(['de','shi','bu','le'], t))) AS s_zh
  FROM documents WHERE doc_id < 300
)
SELECT doc_id, lang,
       n_tokens AS ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS bpe_ish_tokens,
       CAST(ceil(n_chars / 4.0) AS BIGINT) AS approx_llm_tokens,
       CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
            WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
            WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
            WHEN s_fr >= s_zh THEN 'fr'
            ELSE 'zh' END AS predicted_lang,
       CAST(FLOOR((LEAST(n_tokens / 50.0, 1.0) * 0.5
           + LEAST(stop_hits * 1.0 / n_tokens * 5.0, 1.0) * 0.3
           + (1.0 - LEAST(punct_chars * 1.0 / n_chars * 10.0, 1.0)) * 0.2) * 10000.0) AS BIGINT)
         AS quality_bp,
       CASE WHEN LEAST(n_tokens / 50.0, 1.0) * 0.5
             + LEAST(stop_hits * 1.0 / n_tokens * 5.0, 1.0) * 0.3
             + (1.0 - LEAST(punct_chars * 1.0 / n_chars * 10.0, 1.0)) * 0.2 >= 0.7
            THEN 'KEEP' ELSE 'REVIEW' END AS quality_band,
       substr(md5(text), 1, 16) AS fp_md5,
       list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, length(text) + 1),
                   i -> CAST(ascii(text[i]) AS BIGINT)),
                   (h, c) -> (h * 31 + c) % 1000000007) AS fp_rolling
FROM feats
""",
    tags=("X4", "text"),
)
def text_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis suite: one per-document projection pinning every
    north-star X4 capability in a single driver row — token counting
    three ways (whitespace, BPE-ish regex segmentation, chars/4 LLM
    heuristic), marker-lexicon language-ID argmax, the shared composite
    quality score (functions/helpers.quality_expr, floored basis
    points), and both document fingerprints (md5 prefix + polynomial
    rolling hash folded with `aggregate`).

    Scale: pure per-row expressions — one scan, zero shuffle, whole
    plan inside a single codegen stage; nothing leaves the partition.
    The single-capability forms (`token_count`, `lang_id_heuristic`,
    `quality_score`, `doc_fingerprint`, `text_stats_by_lang`) remain
    registered below the driver window."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    tokens = F.split(F.col("text"), " ")
    scores = {
        lang: _hit_count(tokens, words) for lang, words in _LANG_MARKERS.items()
    }
    pred = (
        F.when(
            (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["zh"]),
            "en",
        )
        .when(
            (scores["es"] >= scores["de"])
            & (scores["es"] >= scores["fr"])
            & (scores["es"] >= scores["zh"]),
            "es",
        )
        .when((scores["de"] >= scores["fr"]) & (scores["de"] >= scores["zh"]), "de")
        .when(scores["fr"] >= scores["zh"], "fr")
        .otherwise("zh")
    )
    quality = quality_expr()
    codes = F.expr(
        "transform(sequence(1, length(text)), i -> cast(ascii(substr(text, i, 1)) as bigint))"
    )
    rolling = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda h, c: (h * 31 + c) % 1000000007,
    )
    return docs.select(
        "doc_id",
        "lang",
        F.size(tokens).alias("ws_tokens"),
        F.regexp_count(
            F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
        ).alias("bpe_ish_tokens"),
        F.ceil(F.col("n_chars") / 4.0).alias("approx_llm_tokens"),
        pred.alias("predicted_lang"),
        F.floor(quality * 10000.0).cast("bigint").alias("quality_bp"),
        F.when(quality >= 0.7, "KEEP").otherwise("REVIEW").alias("quality_band"),
        F.substring(F.md5(F.col("text").cast("binary")), 1, 16).alias("fp_md5"),
        rolling.alias("fp_rolling"),
    )


@register(
    "vocab_coverage",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
counts AS (
  SELECT token, COUNT(*) AS n FROM tok WHERE token <> '' GROUP BY token
),
tot AS (SELECT SUM(n) AS n_total FROM counts),
ranked AS (
  SELECT token, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank,
         SUM(n) OVER (ORDER BY n DESC, token
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
  FROM counts
)
SELECT rank, token, n,
       CAST(FLOOR(cum_n * 10000.0 / n_total) AS BIGINT) AS coverage_bp
FROM ranked, tot
WHERE rank <= 64
""",
    tags=("X4", "text", "vocab"),
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary frequency table + corpus-coverage curve — the
    tokenizer-training precursor (what fraction of all tokens the
    top-k vocabulary covers, the BPE/unigram budget question): global
    token counts, rank by frequency (deterministic token tie-break),
    cumulative coverage in floored basis points.

    Scale: the token count is canonical word-count — explode shuffles
    only (token, partial-count) pairs thanks to map-side combine, so
    the wire volume is |distinct tokens per partition|, not corpus
    tokens. The ranking window runs over the aggregated vocabulary
    (million-scale rows at 100 TB, fine for one 16-byte-key sort);
    the rank<=64 cut is WindowGroupLimit-pruned before the final
    projection. Coverage uses integer cum-sums over exact longs —
    engine-portable, no fp accumulation."""
    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("n_total"))
    w_rank = Window.orderBy(F.desc("n"), F.asc("token"))
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = counts.select(
        "token",
        "n",
        F.row_number().over(w_rank).alias("rank"),
        F.sum("n").over(w_cum).alias("cum_n"),
    )
    return (
        ranked.filter(F.col("rank") <= 64)
        .crossJoin(tot)
        .select(
            "rank",
            "token",
            "n",
            F.floor(F.col("cum_n") * 10000.0 / F.col("n_total"))
            .cast("bigint")
            .alias("coverage_bp"),
        )
    )


@register(
    "bigram_lm_stats",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
),
bg AS (
  SELECT unnest([{'w1': tok[i], 'w2': tok[i+1]}
                 for i in range(1, len(tok))]) AS g
  FROM toks WHERE len(tok) >= 2
),
pairs AS (
  SELECT g.w1 AS w1, g.w2 AS w2, COUNT(*) AS n FROM bg GROUP BY 1, 2
),
prefix AS (
  SELECT w1, SUM(n) AS n_prefix FROM pairs GROUP BY w1
)
SELECT p.w1, p.w2, p.n,
       CAST(FLOOR(p.n * 10000.0 / f.n_prefix) AS BIGINT) AS p_cond_bp
FROM pairs p JOIN prefix f USING (w1)
ORDER BY p.n DESC, p.w1, p.w2 LIMIT 64
""",
    tags=("X4", "text", "lm"),
)
def bigram_lm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model statistics: global bigram counts
    and the conditional probability P(w2|w1) in floored basis points —
    the count table an n-gram LM (or a next-token filter heuristic)
    trains from. Complements `repetition_stats`, which is per-doc and
    shuffle-free; THIS op is the corpus-level aggregation.

    Scale: explode + groupBy(w1, w2) is word-count-shaped — partial
    aggregation combines per partition before the shuffle, so wire
    volume is distinct-bigrams-per-partition, not corpus tokens.
    Prefix totals reuse the aggregated pairs (SUM over the small
    table), never a second corpus pass. Top-64 by (n, w1, w2) is
    TakeOrderedAndProject — per-partition heaps, no global sort.
    All-integer output: engine-portable."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.col("text"), " ").alias("tok")).filter(
        F.size("tok") >= 2
    )
    pairs = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(tok) - 2),"
                    " i -> struct(tok[i] AS w1, tok[i + 1] AS w2))"
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    prefix = pairs.groupBy("w1").agg(F.sum("n").alias("n_prefix"))
    return (
        pairs.join(prefix, "w1")
        .select(
            "w1",
            "w2",
            "n",
            F.floor(F.col("n") * 10000.0 / F.col("n_prefix"))
            .cast("bigint")
            .alias("p_cond_bp"),
        )
        .orderBy(F.desc("n"), F.asc("w1"), F.asc("w2"))
        .limit(64)
    )


# Predictability bands for the bigram-LM document filter. Calibrated
# on the fixture corpus (score range 302..490 bp, median 344): >= 400
# only the planted repetitive/duplicate docs reach; < 330 is the noisy
# tail (~p10). A production run recalibrates on a corpus sample.
_PRED_HIGH_BP = 400
_PRED_LOW_BP = 330

_BAND_SQL = f"""CASE WHEN avg_pcond_bp >= {_PRED_HIGH_BP} THEN 'high_predictability'
     WHEN avg_pcond_bp < {_PRED_LOW_BP} THEN 'low_predictability'
     ELSE 'typical' END"""


@register(
    "doc_perplexity_filter",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
),
bg AS (
  SELECT doc_id, unnest([{{'w1': tok[i], 'w2': tok[i+1]}}
                 for i in range(1, len(tok))]) AS g
  FROM toks WHERE len(tok) >= 2
),
doc_bg AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM bg),
pairs AS (SELECT w1, w2, COUNT(*) AS n FROM doc_bg GROUP BY 1, 2),
prefix AS (SELECT w1, SUM(n) AS n_prefix FROM pairs GROUP BY w1),
probs AS (
  SELECT p.w1, p.w2, CAST(FLOOR(p.n * 10000.0 / f.n_prefix) AS BIGINT) AS pb
  FROM pairs p JOIN prefix f USING (w1)
),
scored AS (
  SELECT d.doc_id, COUNT(*) AS n_bigrams,
         CAST(FLOOR(SUM(pb) * 1.0 / COUNT(*)) AS BIGINT) AS avg_pcond_bp
  FROM doc_bg d JOIN probs USING (w1, w2)
  GROUP BY d.doc_id
)
SELECT doc_id, n_bigrams, avg_pcond_bp, {_BAND_SQL} AS band
FROM scored
""",
    tags=("X4", "text", "lm", "curation"),
)
def doc_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style document filter (the CCNet/Gopher LM-quality
    gate): train bigram conditionals P(w2|w1) on the corpus itself,
    score every document by the mean conditional probability of its
    bigrams, and band high-predictability (repetitive / near-dup
    suspects), typical, and low-predictability (noisy) docs.

    The score is the integer mean of per-bigram floored basis points —
    deliberately NOT a float sum of logs: log-prob accumulation order
    differs across engines and can flip a rounding boundary, while
    integer sums are exact everywhere. A production filter swaps in a
    pretrained KenLM and real log-space perplexity; the pipeline shape
    (train stats -> broadcast/join -> per-doc mean -> band) is
    identical.

    Scale: one corpus pass builds (doc_id, w1, w2) bigram occurrences
    (persisted — it feeds both the count agg and the scoring join; at
    100 TB materialize it to a bucketed table like the shingle index,
    or drop the persist and pay one extra parse scan). Counts are
    word-count-shaped (map-side combine). The scoring join shuffles
    both sides on (w1, w2) — distinct-bigram-sized model table, AQE
    balances skew on stop-bigrams; the per-doc mean then reduces on
    doc_id. No Python UDFs anywhere."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("tok")
    ).filter(F.size("tok") >= 2)
    doc_bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(tok) - 2),"
                " i -> struct(tok[i] AS w1, tok[i + 1] AS w2))"
            )
        ).alias("g"),
    ).select("doc_id", "g.w1", "g.w2").persist()
    pairs = doc_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    prefix = pairs.groupBy("w1").agg(F.sum("n").alias("n_prefix"))
    probs = pairs.join(prefix, "w1").select(
        "w1",
        "w2",
        F.floor(F.col("n") * 10000.0 / F.col("n_prefix"))
        .cast("bigint")
        .alias("pb"),
    )
    scored = (
        doc_bg.join(probs, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.floor(F.sum("pb") * 1.0 / F.count(F.lit(1)))
            .cast("bigint")
            .alias("avg_pcond_bp"),
        )
    )
    band = (
        F.when(F.col("avg_pcond_bp") >= _PRED_HIGH_BP, "high_predictability")
        .when(F.col("avg_pcond_bp") < _PRED_LOW_BP, "low_predictability")
        .otherwise("typical")
    )
    return scored.select(
        "doc_id", "n_bigrams", "avg_pcond_bp", band.alias("band")
    )


@register(
    "tfidf_top_terms",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok WHERE token <> ''
  GROUP BY doc_id, token
),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         tf.tf * CAST(FLOOR(n.n_docs * 10000.0 / df.df) AS BIGINT) AS score
  FROM tf JOIN df USING (token), n
),
ranked AS (
  SELECT doc_id, token, tf, df, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, token) AS rank
  FROM scored
)
SELECT doc_id, token, tf, df, score, rank FROM ranked WHERE rank <= 3
""",
    tags=("X4", "text", "tfidf"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 characteristic terms by TF-IDF — the
    keyword-extraction / topic-labeling primitive of corpus curation.
    IDF is the integer proxy floor(N_docs * 10000 / df) rather than
    ln(N/df): same ordering for ranking purposes, but exact integer
    arithmetic on every engine (a real deployment swaps ln back in —
    only this scoring expression changes, the plan shape doesn't).

    Scale: TF is word-count-shaped (explode -> partial agg -> shuffle
    on (doc_id, token)); DF reduces the already-aggregated TF table on
    token (distinct-vocabulary-sized, far smaller than the corpus);
    the TF<->DF join shuffles on token with AQE handling stop-word
    skew; the per-doc top-3 window is WindowGroupLimit-pruned — each
    task keeps a 3-row heap per doc, never a full sort of the doc's
    vocabulary."""
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        # Feeds both the DF reduction and the scoring join; persist so
        # the corpus is parsed/exploded ONCE (without it Catalyst
        # re-derives DF from a second full scan — visible in explain).
        .persist()
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(n_docs)
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (
                F.col("tf")
                * F.floor(F.col("n_docs") * 10000.0 / F.col("df")).cast(
                    "bigint"
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.select(
            "doc_id", "token", "tf", "df", "score", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= 3)
    )


@register(
    "doc_compressibility",
    oracle=None,  # zlib is not expressible in SQL — rows-only driver
    # check; exactness gated by tests/test_llm_pack.py against direct
    # zlib on the same bytes, layout invariance by the perturbation
    # suite (zlib output is a pure function of (bytes, level)).
    tags=("X4", "quality", "arrow"),
)
def doc_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal (the Gopher/RefinedWeb "too
    compressible = boilerplate, incompressible = noise" heuristic):
    per-document zlib-compressed size over raw size, in floored bp,
    banded for the curation funnel. This is the designed Arrow escape
    hatch: zlib isn't expressible as Catalyst expressions, so the doc
    batch flows through ``mapInPandas`` (Arrow columnar transfer, one
    Python roundtrip per ~10k-row batch — never per row).

    Scale: the Pandas stage is a pure per-row map — no state, no
    group, no skew; it pipelines inside the scan stage with ZERO
    shuffle before or after (plan-pinned). Banding happens back in
    JVM expressions. zlib level is pinned (6) so the ratio is a pure
    function of the bytes — reruns and layout changes are bit-stable."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")

    def batches(it):
        import zlib

        for pdf in it:
            raw = pdf["text"].map(lambda t: t.encode("utf-8"))
            out = pdf[["doc_id", "lang"]].copy()
            out["raw_bytes"] = raw.map(len).astype("int64")
            out["zlib_bytes"] = raw.map(
                lambda b: len(zlib.compress(b, 6))
            ).astype("int64")
            yield out

    stats = docs.mapInPandas(
        batches,
        schema="doc_id bigint, lang string, raw_bytes bigint, zlib_bytes bigint",
    )
    ratio_bp = F.expr("zlib_bytes * 10000 DIV raw_bytes")
    band = (
        F.when(ratio_bp < 3000, "HIGHLY_REPETITIVE")
        .when(ratio_bp < 4500, "REPETITIVE")
        .when(ratio_bp < 8000, "NORMAL")
        .otherwise("INCOMPRESSIBLE")
    )
    return stats.select(
        "doc_id",
        "lang",
        "raw_bytes",
        "zlib_bytes",
        ratio_bp.cast("bigint").alias("ratio_bp"),
        band.alias("band"),
    )


@register(
    "bpe_pair_counts",
    oracle="""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
vocab AS (
  SELECT word, COUNT(*) AS cnt FROM words WHERE len(word) >= 2 GROUP BY word
),
pairs AS (
  SELECT unnest([substr(word, i, 2) for i in range(1, len(word))]) AS pair,
         word, cnt
  FROM vocab
)
SELECT pair,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words,
       CAST(SUM(cnt) AS BIGINT) AS total_count
FROM pairs GROUP BY pair
ORDER BY total_count DESC, pair ASC LIMIT 64
""",
    tags=("X4", "tokenizer"),
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE merge-step statistic (Sennrich et al., "Neural Machine
    Translation of Rare Words with Subword Units"): corpus-weighted
    counts of adjacent character pairs — the argmax row IS the first
    merge a BPE tokenizer trainer would perform, and the top-64 table
    is the working set an unrolled trainer consumes. Completes the
    tokenizer-precursor family (`vocab_coverage` budgets whole-word
    vocabulary; this measures the subword frontier).

    Scale: the corpus-sized stage is the word count (map-side
    combined — the only pass over raw text). Character pairs explode
    from the VOCABULARY (|distinct words|, bounded and Zipf-small),
    each weighted by its corpus frequency, so 100 TB of text meets
    the same |vocab|·(avg word length) pair rows as 1 GB. Overlapping
    pairs within a word count once per occurrence on both engines
    (the 'aaa' → two 'aa' convention). TakeOrdered top-64 with a
    total-then-pair tiebreak keeps the cut deterministic."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.length("word") >= 2)
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    pairs = vocab.select(
        "word",
        "cnt",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word)-1), i -> substring(word, i, 2))"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.countDistinct("word").cast("bigint").alias("n_words"),
            F.sum("cnt").cast("bigint").alias("total_count"),
        )
        .orderBy(F.desc("total_count"), F.asc("pair"))
        .limit(64)
    )


@register(
    "lexical_diversity",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         AS n_distinct,
       CAST(len(list_distinct(string_split(text, ' '))) * 10000
            // len(string_split(text, ' ')) AS BIGINT) AS ttr_bp
FROM documents WHERE doc_id < 300
""",
    tags=("X4", "text", "quality"),
)
def lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio per document (lexical diversity, in
    truncating bp): the repetition-quality signal at WORD granularity
    — low TTR flags keyword-stuffed or template text that the bigram
    rules (repetition_stats) and compressibility can miss, high TTR
    flags word-salad. Pure array expressions, zero shuffle.

    Determinism: counts of exact token arrays; the ratio is one
    truncating integer division."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    tok = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(tok).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(tok)).cast("bigint").alias("n_distinct"),
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) * 10000"
            " div size(split(text, ' ')) AS BIGINT)"
        ).alias("ttr_bp"),
    )


@register(
    "hapax_rate",
    oracle="""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
vocab AS (SELECT word, COUNT(*) AS cnt FROM words GROUP BY word)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(COUNT(*) FILTER (WHERE cnt = 1) AS BIGINT) AS n_hapax,
       CAST(COUNT(*) FILTER (WHERE cnt = 1) * 10000 // COUNT(*) AS BIGINT)
         AS hapax_bp,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens
FROM vocab
""",
    tags=("X4", "text", "vocab"),
)
def hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus hapax-legomena rate: the share of vocabulary occurring
    exactly once — the Zipf-tail health check a tokenizer-training
    run reads next to `vocab_coverage` (a hapax share far off the
    natural-language ~40-60% band signals OCR noise, ID strings, or
    boilerplate duplication distorting the tail).

    Scale: the corpus-sized stage is the map-side-combined word
    count (the same shuffle vocab_coverage pays); the hapax test is
    a 1-row conditional aggregate over the vocabulary."""
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_hapax = F.count(F.when(F.col("cnt") == 1, 1))
    return vocab.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        n_hapax.cast("bigint").alias("n_hapax"),
        F.expr(
            "CAST(count(CASE WHEN cnt = 1 THEN 1 END) * 10000"
            " div count(1) AS BIGINT)"
        ).alias("hapax_bp"),
        F.sum("cnt").cast("bigint").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Full BPE tokenizer training (round 6): the iterative merge loop
# (Sennrich et al. 2016) that `bpe_pair_counts` computes one step of.
# ---------------------------------------------------------------------------

_BPE_N_MERGES = 8


def bpe_train_merges(
    spark: SparkSession, vocab: DataFrame, n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Distributed BPE trainer: ``vocab`` is (word, cnt); each round
    counts corpus-weighted adjacent symbol pairs, takes the argmax
    (count desc, pair lex asc — a pinned deterministic tie-break
    where Sennrich's dict-order is not), and rewrites every word's
    symbol array through one left-to-right non-overlapping merge
    fold. Returns [(rank, left, right, pair_count)].

    Scale: the corpus-sized stage is the word count the CALLER does
    once (map-side combined); the loop runs over the VOCABULARY
    (Zipf-small — ~10^6 rows for 100 TB of text). Per round: one
    pair aggregate (shuffle carries symbol pairs), one narrow array
    fold, one 1-row argmax fetch (the sanctioned bounded collect,
    same as the centroid fetch). Single-reference-per-round persist
    discipline avoids the 2^rounds Catalyst blowup (graph.py)."""
    syms = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    cur = vocab.select("cnt", syms.alias("syms")).persist()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pair_l = F.expr(
            "transform(sequence(1, size(syms) - 1),"
            " i -> element_at(syms, i))"
        )
        pair_r = F.expr(
            "transform(sequence(1, size(syms) - 1),"
            " i -> element_at(syms, i + 1))"
        )
        pairs = (
            cur.filter(F.size("syms") >= 2)
            .select("cnt", F.explode(F.arrays_zip(pair_l, pair_r)).alias("p"))
            .select(
                F.col("p.0").alias("l"), F.col("p.1").alias("r"), "cnt"
            )
        )
        top = (
            pairs.groupBy("l", "r")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .first()
        )
        if top is None:
            break
        left, right, count = top["l"], top["r"], int(top["c"])
        merges.append((rank, left, right, count))
        def make_fold(l_s: str, r_s: str):
            l_lit, r_lit, m_lit = F.lit(l_s), F.lit(r_s), F.lit(l_s + r_s)

            def fold(acc, s):
                return F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == l_lit)
                    & (s == r_lit),
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - 1),
                        F.array(m_lit),
                    ),
                ).otherwise(F.concat(acc, F.array(s)))

            return fold

        fold = make_fold(left, right)

        nxt = cur.select(
            "cnt",
            F.aggregate(
                F.col("syms"), F.array().cast("array<string>"), fold
            ).alias("syms"),
        ).persist()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return merges


@register(
    "bpe_train",
    oracle=None,  # iterative merge fixpoint — not SQL-expressible;
    # pinned instead by tests/test_llm_pack.py parity against a pure-
    # Python Sennrich reference, and round 1 must equal the
    # bpe_pair_counts argmax (oracle-checked separately).
    tags=("X4", "tokenizer"),
    eager_build=True,  # driver-side merge loop runs jobs at construction
)
def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE tokenizer training, 8 merge rounds over the corpus
    vocabulary — upgrades `bpe_pair_counts` (one merge-step statistic)
    to the actual trainer loop a tokenizer build runs. Output is the
    learned merge table: (rank, left, right, merged, pair_count)."""
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merges = bpe_train_merges(spark, vocab, _BPE_N_MERGES)
    return spark.createDataFrame(
        [(r, l, rr, l + rr, c) for r, l, rr, c in merges],
        "rank BIGINT, left STRING, right STRING, merged STRING,"
        " pair_count BIGINT",
    )


def _bpe_apply_expr(col, merges: list[tuple[int, str, str, int]]):
    """Chain the learned merges (in rank order) over a symbol-array
    column — the APPLY side of BPE: the same left-to-right
    non-overlapping fold the trainer used, once per merge."""
    def make_fold(l_l, r_l, m_l):
        def fold(acc, s):
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == l_l)
                & (s == r_l),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(m_l)
                ),
            ).otherwise(F.concat(acc, F.array(s)))

        return fold

    out = col
    for _rank, left, right, _cnt in merges:
        out = F.aggregate(
            out, F.array().cast("array<string>"),
            make_fold(F.lit(left), F.lit(right), F.lit(left + right)),
        )
    return out


@register(
    "bpe_tokenize_stats",
    oracle=None,  # depends on the learned merge table (iterative) —
    # pinned by tests/test_llm_pack.py parity against the pure-Python
    # reference tokenizer applied with the same merges.
    tags=("X4", "tokenizer"),
    eager_build=True,  # training loop runs at construction
)
def bpe_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY at corpus scale: train 8 BPE merges, then
    tokenize every document with them and report per-doc subword
    counts — the token-budget accounting a training pipeline runs
    with its real learned tokenizer rather than the chars/4 heuristic.

    Scale: merges are a tiny driver-side list (n_merges rows);
    tokenization runs over the DISTINCT-WORD vocabulary (Zipf-small)
    and joins token counts back to word occurrences — the corpus pays
    one word-explode shuffle, never per-occurrence array folds."""
    docs = load(spark, sf_dir, "documents")
    vocab_src = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merges = bpe_train_merges(spark, vocab_src, _BPE_N_MERGES)
    chars = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    word_tokens = (
        docs.filter(F.col("doc_id") < 300)
        .select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        # guard empty tokens from repeated separators: sequence(1, 0)
        # is DESCENDING in Spark, so a 0-length word would fabricate
        # two phantom symbols
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.collect_list("doc_id").alias("doc_ids"))
        .select(
            "doc_ids",
            F.length("word").alias("n_chars"),
            F.size(_bpe_apply_expr(chars, merges)).alias("n_sub"),
        )
        .select(
            F.explode("doc_ids").alias("doc_id"), "n_chars", "n_sub"
        )
    )
    return (
        word_tokens.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_subwords"),
            F.sum("n_chars").cast("bigint").alias("n_word_chars"),
            F.expr("sum(n_sub) * 10000 DIV sum(n_chars)")
            .cast("bigint")
            .alias("subwords_per_char_bp"),
        )
        .orderBy("doc_id")
    )
