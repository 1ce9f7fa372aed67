"""Typed readers with the reference's read surface.

geopetl's read entry points (``frompostgis`` ``postgis.py:54-79``,
``fromoraclesde`` ``oracle_sde.py:26-33``) expose: column projection
(``fields=``, P1), row predicate (``where=``, P5), ``limit=`` (P6), raw SQL
passthrough (``sql=``, P7), header lowercasing (P9), an optional ingest
audit timestamp column (P4), and an empty-source guard
(``oracle_sde.py:29-30``).

Here every one of those compiles to a declarative DataFrame op so Catalyst
pushes projection/predicate/limit down into the parquet scan (verified in
``tests/test_plans.py``). No SQL strings are hand-assembled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _apply_read_surface(
    df: DataFrame,
    fields: list[str] | None = None,
    where: str | None = None,
    limit: int | None = None,
    lowercase_headers: bool = True,
    audit_timestamp: bool = False,
) -> DataFrame:
    if lowercase_headers:
        # header lowercasing, oracle_sde.py:1157-1159 (etl.setheader)
        df = df.toDF(*[c.lower() for c in df.columns])
    if where:
        # where= passthrough, postgis.py:1021-1023 / oracle_sde.py:1203-1215.
        # The reference AND-joins clauses; a single expr string suffices here
        # because Spark exprs compose. NOTE: the reference emits a buggy second
        # WHERE when where= and limit= are combined on Oracle
        # (oracle_sde.py:1215,1218) — not reproduced.
        df = df.filter(F.expr(where))
    if fields:
        df = df.select(*[F.col(c) for c in fields])
    if audit_timestamp:
        # etl_read_timestamp audit column, oracle_sde.py:1187-1188
        df = df.withColumn("etl_read_timestamp", F.current_timestamp())
    if limit is not None:
        df = df.limit(int(limit))
    return df


def from_parquet(
    spark: SparkSession,
    path: str,
    fields: list[str] | None = None,
    where: str | None = None,
    limit: int | None = None,
    sql: str | None = None,
    fail_on_empty: bool = False,
    audit_timestamp: bool = False,
) -> DataFrame:
    """Parquet source with the geopetl read surface (S2 analog)."""
    df = spark.read.parquet(path)
    if sql:
        # raw-SQL passthrough, oracle_sde.py:1137-1139 / postgis.py:985
        df.createOrReplaceTempView("_geopetl_src")
        df = spark.sql(sql)
        return df
    df = _apply_read_surface(df, fields, where, limit, audit_timestamp=audit_timestamp)
    if fail_on_empty and df.isEmpty():
        # empty-table refusal, oracle_sde.py:29-30
        raise ValueError(f"source is empty: {path}")
    return df


def from_orc(
    spark: SparkSession,
    path: str,
    fields: list[str] | None = None,
    where: str | None = None,
    limit: int | None = None,
    sql: str | None = None,
    fail_on_empty: bool = False,
    audit_timestamp: bool = False,
) -> DataFrame:
    """ORC source with the same read surface as :func:`from_parquet` —
    projection/predicate/limit push into the ORC scan (Spark's native ORC
    reader supports the same pushdowns as parquet)."""
    df = spark.read.orc(path)
    if sql:
        df.createOrReplaceTempView("_geopetl_src")
        return spark.sql(sql)
    df = _apply_read_surface(df, fields, where, limit, audit_timestamp=audit_timestamp)
    if fail_on_empty and df.isEmpty():
        raise ValueError(f"source is empty: {path}")
    return df


def from_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    fields: list[str] | None = None,
    where: str | None = None,
    limit: int | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV source (S10: the reference's tests read golden CSVs with petl and
    post-convert types; here an explicit schema replaces the post-convert)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "false")
    df = reader.csv(path)
    return _apply_read_surface(df, fields, where, limit)


def from_json(
    spark: SparkSession,
    path: str,
    schema=None,
    **kw,
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return _apply_read_surface(reader.json(path), **kw)


def from_table(
    spark: SparkSession,
    name: str,
    fields: list[str] | None = None,
    where: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Catalog-table source (S1 analog: ``spark.table`` replaces the
    OracleSdeDatabase/Table introspection chain, SURVEY §3.1)."""
    return _apply_read_surface(spark.table(name), fields, where, limit)
