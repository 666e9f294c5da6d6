"""Scalar-function pack (SURVEY.md §2.8: F1-F17) — regex extraction,
string ops, date/time arithmetic, math, unit conversion, all as
built-in JVM expressions inside whole-stage codegen (zero Python UDFs,
per the §4 goal). Each query bundles a related function family so the
inventory stays reviewable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "regex_extract_stats",
    oracle=r"""
SELECT event_type,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS DECIMAL(38,6))) AS DOUBLE) AS sum_k,
       MAX(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
    tags=("F1", "F17", "A7"),
)
def regex_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group extraction → typed column → grouped aggregation —
    the reference's log-parsing backbone (insert.ps1:99,150,164;
    monitoring.ps1:1073,1085 extract counters from text then
    aggregate). regexp_extract runs JVM-side in codegen."""
    ev = load(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(k.cast("decimal(38,6)")).cast("double").alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "string_functions",
    oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       string_split_regex(p_name, ' ')[1] AS first_word,
       concat_ws('/', p_brand, p_type) AS brand_type,
       printf('%-12s|%6d', p_type, p_size) AS fixed_width,
       trim(' ' || p_name || ' ') AS trimmed,
       length(p_name) AS name_len
FROM part
WHERE p_partkey <= 100
""",
    tags=("F3", "F4", "F5"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String split/trim/concat/fixed-width formatting
    (monitoring.ps1:524,892 pipe-split + trim; :23,29 fixed-width table
    rows; insert.ps1:175-176 concatenated log lines)."""
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.format_string("%-12s|%6d", F.col("p_type"), F.col("p_size")).alias(
            "fixed_width"
        ),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.length("p_name").alias("name_len"),
    )


@register(
    "date_functions",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_ref,
       epoch_us(o_orderdate) AS order_epoch_us
FROM orders
WHERE o_orderkey <= 500
""",
    tags=("F7", "F9", "F10"),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date formatting / field extraction / day arithmetic / epoch
    durations (insert.ps1:43,173,275 yyyy-MM-dd formatting;
    monitoring.ps1:734 timestamp parse; insert.ps1:306-307 ms
    durations)."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.datediff(
            F.lit("2002-01-01 00:00:00").cast("timestamp"), F.col("o_orderdate")
        ).alias("days_to_ref"),
        # o_orderdate is TIMESTAMP_NTZ (parquet ms, not UTC-adjusted);
        # with session tz pinned to UTC the cast is value-preserving
        # and matches DuckDB's epoch_us on the naive value.
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("order_epoch_us"),
    )


@register(
    "math_functions",
    oracle="""
SELECT event_id,
       round(value, 2) AS value_2dp,
       abs(value - 50.0) AS dist_from_mid,
       CAST(ceil(value) AS BIGINT) AS value_ceil,
       CAST(floor(value) AS BIGINT) AS value_floor,
       least(value, 50.0) AS clamped_low,
       greatest(value, 50.0) AS clamped_high
FROM events
WHERE event_id <= 200
""",
    tags=("F12", "F13", "F14"),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/least/greatest (insert.ps1:256,261,307;
    monitoring.ps1:599,627,1134-1135). ceil/floor cast to BIGINT on
    both sides — Spark returns LONG, DuckDB DOUBLE by default."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") <= 200)
    return ev.select(
        "event_id",
        F.round("value", 2).alias("value_2dp"),
        F.abs(F.col("value") - 50.0).alias("dist_from_mid"),
        F.ceil("value").alias("value_ceil"),
        F.floor("value").alias("value_floor"),
        F.least(F.col("value"), F.lit(50.0)).alias("clamped_low"),
        F.greatest(F.col("value"), F.lit(50.0)).alias("clamped_high"),
    )


@register(
    "unit_conversion_bands",
    oracle="""
SELECT doc_id, n_chars,
       CASE WHEN n_chars >= 1024 THEN round(n_chars / 1024.0, 2)
            ELSE CAST(n_chars AS DOUBLE) END AS display_size,
       CASE WHEN n_chars >= 1024 THEN 'KiB' ELSE 'B' END AS display_unit,
       round(n_chars / 1024.0, 4) AS size_kib
FROM documents
WHERE doc_id < 300
""",
    tags=("F2", "F15", "F18"),
)
def unit_conversion_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-size tiering + unit conversion (monitoring.ps1:32-47
    pg_size_pretty-style kB→KiB renaming; :544-549,1093-1098 K/M/G
    CASE normalization) as pure expressions."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return docs.select(
        "doc_id",
        "n_chars",
        F.when(
            F.col("n_chars") >= 1024, F.round(F.col("n_chars") / 1024.0, 2)
        )
        .otherwise(F.col("n_chars").cast("double"))
        .alias("display_size"),
        F.when(F.col("n_chars") >= 1024, "KiB").otherwise("B").alias("display_unit"),
        F.round(F.col("n_chars") / 1024.0, 4).alias("size_kib"),
    )


@register(
    "case_classification",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(*) FILTER (WHERE o_totalprice >= 300000) AS n_large,
       CASE WHEN COUNT(*) FILTER (WHERE o_totalprice >= 300000) = 0 THEN 'NONE'
            WHEN 100.0 * COUNT(*) FILTER (WHERE o_totalprice >= 300000) / COUNT(*) >= 25.0 THEN 'HEAVY'
            ELSE 'MIXED' END AS size_profile
FROM orders
GROUP BY o_orderpriority
""",
    tags=("F16", "A9"),
)
def case_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold CASE classification over grouped ratios — the
    efficiency/health banding idiom (monitoring.ps1:596-606,626-637,
    807-808) on order-size mix per priority."""
    orders = load(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    n_large = F.count(F.when(F.col("o_totalprice") >= 300000, 1))
    return orders.groupBy("o_orderpriority").agg(
        n.alias("n_orders"),
        n_large.alias("n_large"),
        F.when(n_large == 0, "NONE")
        .when(100.0 * n_large / n >= 25.0, "HEAVY")
        .otherwise("MIXED")
        .alias("size_profile"),
    )


@register(
    "pretty_sizes",
    oracle="""
SELECT doc_id, n_chars,
       CASE WHEN n_chars >= 1048576 THEN CAST(round(n_chars / 1048576.0, 1) AS VARCHAR) || ' MiB'
            WHEN n_chars >= 1024 THEN CAST(round(n_chars / 1024.0, 1) AS VARCHAR) || ' KiB'
            ELSE CAST(n_chars AS VARCHAR) || ' B' END AS pretty_size
FROM documents
WHERE doc_id < 100
""",
    tags=("F2", "F18"),
)
def pretty_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pg_size_pretty with the reference's IEC units
    (monitoring.ps1:32-47 kB→KiB renaming; F18 size introspection) as
    a pure string expression — functions/helpers.format_bytes is the
    reusable form."""
    from ..catalog import load as _load

    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    b = F.col("n_chars")
    pretty = (
        F.when(b >= 1048576,
               F.concat(F.round(b / 1048576.0, 1).cast("string"), F.lit(" MiB")))
        .when(b >= 1024,
              F.concat(F.round(b / 1024.0, 1).cast("string"), F.lit(" KiB")))
        .otherwise(F.concat(b.cast("string"), F.lit(" B")))
    )
    return docs.select("doc_id", "n_chars", pretty.alias("pretty_size"))


@register(
    "json_extract_props",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
            THEN 'HIGH' ELSE 'LOW' END AS k_band
FROM events
WHERE event_id < 300
""",
    tags=("json", "F1"),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON field extraction from the props payload column —
    the schema-on-read path for semi-structured event attributes
    (idiomatic-Spark extension; the reference regex-scrapes instead,
    monitoring.ps1:1085). get_json_object is JVM codegen; for wide
    extraction prefer from_json with an explicit schema (one parse,
    many fields)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.select(
        "event_id",
        k.alias("k_value"),
        F.when(k >= 50, "HIGH").otherwise("LOW").alias("k_band"),
    )


@register(
    "scalar_suite",
    oracle="""
SELECT event_id,
       -- string family (F3-F5)
       upper(event_type) AS type_upper,
       concat_ws('/', event_type, CAST(user_id AS VARCHAR)) AS type_user,
       printf('%-8s|%6d', event_type, event_id) AS fixed_width,
       trim(' ' || event_type || ' ') AS trimmed,
       length(props) AS props_len,
       -- date family (F7-F10)
       strftime(ts, '%Y-%m-%d') AS event_date_str,
       CAST(year(ts) AS INT) AS event_year,
       CAST(month(ts) AS INT) AS event_month,
       date_diff('day', ts, TIMESTAMP '2024-07-01 00:00:00') AS days_to_ref,
       epoch_us(ts) AS event_epoch_us,
       -- math family (F12-F14)
       round(value, 2) AS value_2dp,
       abs(value - 50.0) AS dist_from_mid,
       CAST(ceil(value) AS BIGINT) AS value_ceil,
       CAST(floor(value) AS BIGINT) AS value_floor,
       least(value, 50.0) AS clamped_low,
       greatest(value, 50.0) AS clamped_high
FROM events
WHERE event_id <= 300
""",
    tags=("F3", "F4", "F5", "F7", "F8", "F9", "F10", "F12", "F13", "F14"),
)
def scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function suite: the string (F3-F5), date/time (F7-F10)
    and math (F12-F14) families evaluated over one events scan, so the
    driver gate pins all three §2.8 families in a single row.

    Reference idioms covered: pipe-split/trim and fixed-width report
    rows (monitoring.ps1:524,892 / :23,29), concatenated log lines
    (insert.ps1:175-176), yyyy-MM-dd formatting and field extraction
    (insert.ps1:43,173,275), timestamp parse (monitoring.ps1:734),
    day/epoch arithmetic (insert.ps1:306-307), round/abs/ceil/floor
    banding (insert.ps1:256,261,307; monitoring.ps1:599,627).

    All expressions are JVM whole-stage codegen; one scan, zero
    shuffle (no aggregation). ceil/floor cast to BIGINT on both sides
    (Spark returns LONG, DuckDB DOUBLE); `ts` is TIMESTAMP_NTZ parquet
    so with the session tz pinned to UTC, epoch_us on the naive value
    matches unix_micros. The single-family forms (`string_functions`,
    `date_functions`, `math_functions`) remain registered below the
    driver window."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") <= 300)
    return ev.select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.concat_ws("/", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "type_user"
        ),
        F.format_string("%-8s|%6d", F.col("event_type"), F.col("event_id")).alias(
            "fixed_width"
        ),
        F.trim(F.concat(F.lit(" "), F.col("event_type"), F.lit(" "))).alias("trimmed"),
        F.length("props").alias("props_len"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_date_str"),
        F.year("ts").alias("event_year"),
        F.month("ts").alias("event_month"),
        F.datediff(
            F.lit("2024-07-01 00:00:00").cast("timestamp"), F.col("ts")
        ).alias("days_to_ref"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("event_epoch_us"),
        F.round("value", 2).alias("value_2dp"),
        F.abs(F.col("value") - 50.0).alias("dist_from_mid"),
        F.ceil("value").alias("value_ceil"),
        F.floor("value").alias("value_floor"),
        F.least(F.col("value"), F.lit(50.0)).alias("clamped_low"),
        F.greatest(F.col("value"), F.lit(50.0)).alias("clamped_high"),
    )


@register(
    "json_key_profile",
    oracle="""
WITH keys AS (
  SELECT unnest(json_keys(props)) AS key, props
  FROM events WHERE props IS NOT NULL
)
SELECT key,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT json_extract_string(props, '$.' || key))
            AS BIGINT) AS n_distinct_values,
       MIN(json_extract_string(props, '$.' || key)) AS min_value,
       MAX(json_extract_string(props, '$.' || key)) AS max_value
FROM keys GROUP BY key
""",
    tags=("json", "F19", "profiling"),
)
def json_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema discovery over the semi-structured props column: which
    JSON keys exist, in how many rows, with how many distinct values
    and what string range — the report that decides the explicit
    `from_json` schema (one parse, many typed fields) a production
    reader should pin instead of repeated path extraction. The F19
    catalog-introspection idea applied INSIDE a payload column.

    Determinism: key explosion + string min/max/exact distinct —
    integers and strings only.

    Scale: one scan exploding |keys-per-row| (small) rows; the
    per-key aggregate is a word-count shape with map-side combine;
    exact COUNT(DISTINCT) shuffles (key, value) pairs — values here
    are short scalars (the payload stays unparsed past the scan)."""
    ev = load(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    keys = ev.select(
        "props", F.explode(F.json_object_keys(F.col("props"))).alias("key")
    )
    # the PySpark wrapper requires a literal path; the SQL form takes
    # a computed one (per-row path re-parse — fine for profiling; a
    # production reader pins from_json with the discovered schema)
    val = F.expr("get_json_object(props, concat('$.', key))")
    return keys.select("key", val.alias("v")).groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_distinct("v").cast("bigint").alias("n_distinct_values"),
        F.min("v").alias("min_value"),
        F.max("v").alias("max_value"),
    )
