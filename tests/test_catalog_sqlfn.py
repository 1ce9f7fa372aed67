"""Catalog introspection + SQL-function registry tests."""

import pytest
from pyspark.sql import types as T

from geopetl_spark import LakeTable, catalog
from geopetl_spark.functions.sql_registry import register_sql_functions


def test_table_names_and_exists(spark):
    spark.range(3).createOrReplaceTempView("cat_probe_table")
    spark.range(1).createOrReplaceTempView("_internal_probe")
    names = catalog.table_names(spark)
    assert "cat_probe_table" in names
    assert "_internal_probe" not in names  # internal-name exclusion (C1)
    assert catalog.table_exists(spark, "cat_probe_table")
    assert not catalog.table_exists(spark, "no_such_table_xyz")


def test_database_object_type(spark):
    spark.range(3).createOrReplaceTempView("cat_type_probe")
    assert "view" in catalog.database_object_type(spark, "cat_type_probe")
    with pytest.raises(ValueError):
        catalog.database_object_type(spark, "nope_nope")  # unsupported -> reject (C3)


def test_lake_table_discovery(spark, tmp_path):
    schema = T.StructType([T.StructField("doc_id", T.StringType(), False)])
    LakeTable(spark, str(tmp_path / "a" / "t1")).create(schema, key_col="doc_id", n_buckets=2)
    LakeTable(spark, str(tmp_path / "t2")).create(schema, key_col="doc_id", n_buckets=2)
    found = catalog.lake_tables(str(tmp_path))
    assert len(found) == 2 and all(p.endswith(("t1", "t2")) for p in found)


def test_find_payload_column(spark):
    df = spark.createDataFrame([("a", [1, 2], 1.0)], "id string, tokens array<int>, x double")
    assert catalog.find_payload_column(df) == "tokens"
    two = spark.createDataFrame([("a", [1], [0.5])], "id string, t1 array<int>, t2 array<float>")
    with pytest.raises(ValueError):
        catalog.find_payload_column(two)  # error on multiple (oracle_sde.py:503-504)
    none = spark.createDataFrame([("a",)], "id string")
    assert catalog.find_payload_column(none) is None


def test_sniff_payload_in_strings(spark):
    df = spark.createDataFrame(
        [("x", "[1, 2, 3]", "hello"), ("y", "4,5", "world")],
        "id string, payload string, text string",
    )
    assert catalog.sniff_payload_in_strings(df) == "payload"
    # version-tagged payloads (EWKT 'SRID=n;' analog) detected too
    df2 = spark.createDataFrame([("x", "V2;[1,2]")], "id string, p string")
    assert catalog.sniff_payload_in_strings(df2) == "p"


def test_sql_function_registry(spark):
    names = register_sql_functions(spark)
    assert "gp_fingerprint" in names
    row = spark.sql(
        "select gp_token_count('a b  c') tc, gp_word_hash('hello') wh,"
        " gp_fingerprint('a b') fp, round(gp_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) cs,"
        " gp_sanitize_tokens(null) st"
    ).collect()[0]
    assert row["tc"] == 3
    assert row["wh"] == 26248916684786474  # cross-checked against DuckDB
    assert row["cs"] == 1.0
    assert row["st"] == []
    # SQL function matches the DataFrame function bit-for-bit
    from pyspark.sql import functions as F

    from geopetl_spark.functions.text import fingerprint

    df = spark.createDataFrame([("the quick brown fox",)], "t string")
    a = df.select(fingerprint(F.col("t")).alias("fp")).collect()[0]["fp"]
    b = spark.sql("select gp_fingerprint('the quick brown fox') fp").collect()[0]["fp"]
    assert a == b


def test_sql_normalize_redact_bucket_match_dataframe(spark):
    """gp_normalize_text / gp_redact_pii / gp_hash_bucket mirror their
    DataFrame twins exactly."""
    register_sql_functions(spark)
    from pyspark.sql import functions as F

    from geopetl_spark.functions.text import normalize_text, redact_pii
    from geopetl_spark.operators.sample import hash_bucket

    raw = "Mail A.b@c.io, call +1 555 123 4567!  OK?"
    df = spark.createDataFrame([(raw,)], "t string")
    a = df.select(
        normalize_text(F.col("t")).alias("n"),
        redact_pii(F.col("t")).alias("r"),
        hash_bucket(F.lit("doc-1"), 1000).alias("b"),
    ).collect()[0]
    b = spark.sql(
        "select gp_normalize_text(t) n, gp_redact_pii(t) r, gp_hash_bucket('doc-1', 1000) b "
        "from values ('" + raw.replace("'", "''") + "') as v(t)"
    ).collect()[0]
    assert (a.n, a.r, a.b) == (b.n, b.r, b.b)
    assert "[EMAIL]" in a.r and "[PHONE]" in a.r
