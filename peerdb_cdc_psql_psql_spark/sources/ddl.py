"""DDL/DML surface (SURVEY.md §2.2 D1-D5): databases as namespaces,
DDL-first table creation with declared schemas, batched appends with
write verification — the Spark re-expression of
quickstart_prepare_peers.sh:16-77 and insert.ps1's batched INSERTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def create_database(spark: SparkSession, name: str) -> None:
    """D1: CREATE DATABASE IF NOT EXISTS (the reference creates
    `source`/`target` side by side, quickstart_prepare_peers.sh:16-19)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def create_table(
    spark: SparkSession,
    database: str,
    table: str,
    schema: T.StructType,
    path: str,
    primary_key: str | None = None,
    foreign_keys: dict[str, tuple[str, str]] | None = None,
) -> None:
    """D2: DDL-first table registration with declared StructType
    (quickstart_prepare_peers.sh:25-49). Spark enforces neither PK nor
    FK — they are recorded as table properties and validated by the
    check queries in integrity_checks() (SURVEY.md §1.2)."""
    spark.catalog.createTable(
        f"{database}.{table}", path=path, schema=schema, source="parquet"
    )
    props = []
    if primary_key:
        props.append(f"'primary_key' = '{primary_key}'")
    for col, (ref_t, ref_c) in (foreign_keys or {}).items():
        props.append(f"'fk_{col}' = '{ref_t}.{ref_c}'")
    # Parquet-backed catalog tables erase StructField nullability, so
    # declared NOT NULL columns are recorded as a property too — the
    # information_schema check_constraints emulation serves them back
    # (pg_compat, r10), like Postgres surfaces NOT NULL as CHECKs.
    not_null = [f.name for f in schema.fields if not f.nullable]
    if not_null:
        props.append(f"'not_null' = '{','.join(not_null)}'")
    if props:
        spark.sql(
            f"ALTER TABLE {database}.{table} SET TBLPROPERTIES ({', '.join(props)})"
        )


def append_rows(df: DataFrame, path: str) -> int:
    """D3/D4: batched append (multi-row INSERT, insert.ps1:280-283).
    Returns the row count written (computed pre-write — Spark writes
    are all-or-nothing per job via the commit protocol)."""
    n = df.count()
    df.write.mode("append").parquet(path)
    return n


def verify_insert(spark: SparkSession, path: str, expected_delta: int, before: int) -> bool:
    """D5: `INSERT 0 N` verification (insert.ps1:287) — recount and
    compare against the expected post-write total."""
    after = spark.read.parquet(path).count()
    return after == before + expected_delta


def primary_key_violations(df: DataFrame, pk: str) -> DataFrame:
    """PK uniqueness check query (SURVEY.md §1.2): empty ⇒ valid."""
    from pyspark.sql import functions as F

    return df.groupBy(pk).count().filter(F.col("count") > 1)


def foreign_key_violations(child: DataFrame, fk: str, parent: DataFrame, pk: str) -> DataFrame:
    """FK referential-integrity check (left-anti must be empty)."""
    return child.join(parent, child[fk] == parent[pk], "left_anti")
