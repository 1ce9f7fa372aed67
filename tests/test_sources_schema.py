"""Sources (read surface, URI registry), schema layer, and plan-shape tests
(the reference's pushdown behaviors P1-P9 recast as Catalyst assertions)."""

import pytest
from pyspark.sql import types as T

from geopetl_spark import (
    LakeTable,
    diff_schemas,
    doc_to_schema,
    evolve_schema,
    extract_table_schema,
    from_parquet,
    read_schema_doc,
    read_source,
    schema_to_doc,
    write_schema_doc,
    write_sink,
)
from geopetl_spark.sources.registry import parse_source_url


def test_read_surface_projection_filter_limit(spark, sf_dir):
    df = from_parquet(
        spark,
        f"{sf_dir}/customer.parquet",
        fields=["c_custkey", "c_name"],
        where="c_custkey < 10",
        limit=5,
    )
    assert df.columns == ["c_custkey", "c_name"]
    assert df.count() == 5


def test_pushdown_reaches_scan(spark, sf_dir):
    """P1/P5 parity: projection and predicate must reach the parquet scan
    (the reference pushes them into generated SQL; Catalyst must push them
    into the file source)."""
    df = from_parquet(
        spark, f"{sf_dir}/lineitem.parquet", fields=["l_orderkey"], where="l_orderkey < 100"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,100)]" in plan
    assert "ReadSchema: struct<l_orderkey:bigint>" in plan


def test_empty_source_guard(spark, tmp_path):
    p = str(tmp_path / "empty.parquet")
    spark.createDataFrame([], "a long").write.parquet(p)
    with pytest.raises(ValueError):
        from_parquet(spark, p, fail_on_empty=True)  # fromoraclesde parity


def test_audit_timestamp_column(spark, sf_dir):
    df = from_parquet(spark, f"{sf_dir}/region.parquet", audit_timestamp=True)
    assert "etl_read_timestamp" in df.columns  # P4: etl_read_timestamp


def test_raw_sql_passthrough(spark, sf_dir):
    df = from_parquet(
        spark,
        f"{sf_dir}/region.parquet",
        sql="select r_regionkey from _geopetl_src where r_regionkey > 1",
    )
    assert df.columns == ["r_regionkey"] and df.count() > 0  # P7


def test_header_lowercasing(spark, tmp_path):
    p = str(tmp_path / "upper.parquet")
    spark.createDataFrame([(1,)], "UPPER_CASE long").write.parquet(p)
    assert from_parquet(spark, p).columns == ["upper_case"]  # P9


def test_uri_registry_roundtrip(spark, tmp_path):
    assert parse_source_url("/x/y.csv") == ("csv", "/x/y.csv")
    assert parse_source_url("parquet:///x") == ("parquet", "/x")
    assert parse_source_url("POSTGRES-QL://x")[0] == "postgresql"
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    out = str(tmp_path / "rt")
    write_sink(df, f"parquet://{out}")  # togis analog
    back = read_source(spark, f"parquet://{out}")  # fromgis analog
    assert back.collect() == df.collect()
    with pytest.raises(ValueError):
        read_source(spark, "oracle://whatever")  # unknown scheme rejected


def test_schema_doc_roundtrip(tmp_path):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    doc = schema_to_doc(schema, primary_key=["doc_id"])
    p = str(tmp_path / "schema.json")
    write_schema_doc(doc, p)
    back = doc_to_schema(read_schema_doc(p))
    assert back == schema
    assert doc["primaryKey"] == ["doc_id"]
    assert doc["fields"][0]["constraints"] == {"required": True}


def test_schema_diff_and_evolution():
    a = T.StructType([T.StructField("x", T.LongType()), T.StructField("y", T.StringType())])
    b = T.StructType([T.StructField("x", T.IntegerType()), T.StructField("z", T.DoubleType())])
    d = diff_schemas(a, b)
    assert [f.name for f in d.added] == ["z"]
    assert d.missing == ["y"]
    assert d.compatible  # int -> long is a safe widening
    ev = evolve_schema(a, b)
    assert ev.fieldNames() == ["x", "y", "z"]
    bad = T.StructType([T.StructField("x", T.StringType())])
    with pytest.raises(TypeError):
        evolve_schema(a, bad)


def test_extract_table_schema(spark, tmp_lake, tmp_path):
    schema = T.StructType(
        [T.StructField("doc_id", T.StringType(), False), T.StructField("n", T.LongType(), True)]
    )
    t = LakeTable(spark, tmp_lake).create(schema, key_col="doc_id", n_buckets=4)
    out = str(tmp_path / "extracted.json")
    doc = extract_table_schema(t, out)  # S9 analog
    assert doc["primaryKey"] == ["doc_id"]
    t2_path = str(tmp_path / "lake2")
    t2 = LakeTable.create_from_schema_doc(spark, t2_path, read_schema_doc(out))  # S11 analog
    assert t2.schema() == t.schema() and t2.key_col == "doc_id"


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC source/sink: write documents to ORC, read back through the
    registry with projection + predicate, assert both push into the scan."""
    from geopetl_spark.sources.registry import read_source, write_sink
    from geopetl_spark.sources.readers import from_orc

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dest = str(tmp_path / "docs.orc")
    write_sink(d, f"orc://{dest}")
    back = read_source(spark, f"orc://{dest}", fields=["doc_id", "n_chars"], where="n_chars > 100")
    assert back.columns == ["doc_id", "n_chars"]
    exp = d.filter("n_chars > 100").count()
    assert back.count() == exp and exp > 0
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "n_chars" in plan.split("PushedFilters")[1][:120]
    # bare .orc path routes without a scheme; empty guard works
    assert from_orc(spark, dest, limit=3).count() == 3
