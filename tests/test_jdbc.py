"""JDBC option-compilation tests.

No live database / driver jar ships in this sandbox, so coverage mirrors the
reference's strategy of asserting the generated SQL statement
(``oracle_sde.py:1176-1218``) rather than round-tripping a server: every
read-surface combination must compile to the exact pushdown subquery and
reader options, and the runtime path must fail with an actionable error
when the driver jar is absent.
"""

import pytest

from geopetl_spark.sources.jdbc import (
    build_select,
    compile_jdbc_options,
    compile_jdbc_write_options,
    from_jdbc,
    jdbc_subprotocol,
)

PG = "jdbc:postgresql://dbhost:5432/gis"
ORA = "jdbc:oracle:thin:@dbhost:1521/svc"


def test_subprotocol_parse():
    assert jdbc_subprotocol(PG) == "postgresql"
    assert jdbc_subprotocol(ORA) == "oracle"
    with pytest.raises(ValueError):
        jdbc_subprotocol("postgresql://nope")


def test_build_select_projection_where_limit_postgres():
    stmt = build_select(
        "sch.tbl", "postgresql", fields=["a", "B"], where="x > 5", limit=10
    )
    assert stmt == 'SELECT "a", "B" FROM "sch"."tbl" WHERE (x > 5) LIMIT 10'


def test_build_select_oracle_rownum_single_where():
    """Oracle row capping via ROWNUM, AND-joined into ONE WHERE — the
    reference emits a second WHERE when where= and limit= are combined
    (oracle_sde.py:1215 vs :1218); fixed here."""
    stmt = build_select("t", "oracle", where="x > 5", limit=3)
    assert stmt == 'SELECT * FROM "t" WHERE (x > 5) AND (ROWNUM <= 3)'
    assert stmt.count("WHERE") == 1


def test_compile_options_pushdown_subquery():
    opts = compile_jdbc_options(PG, table="tbl", fields=["a"], where="b = 1", limit=5, user="u")
    assert opts["dbtable"] == '(SELECT "a" FROM "tbl" WHERE (b = 1) LIMIT 5) geopetl_src'
    assert opts["url"] == PG
    assert opts["driver"] == "org.postgresql.Driver"
    assert opts["user"] == "u"
    assert opts["fetchsize"] == "10000"


def test_compile_options_raw_sql_passthrough():
    opts = compile_jdbc_options(PG, sql="select count(*) n from t")
    assert opts["dbtable"] == "(select count(*) n from t) geopetl_src"
    with pytest.raises(ValueError):
        compile_jdbc_options(PG, sql="select 1", fields=["a"])
    with pytest.raises(ValueError):
        compile_jdbc_options(PG)  # neither table nor sql


def test_compile_options_partitioned_read():
    opts = compile_jdbc_options(
        PG, table="big", partition_column="id", num_partitions=16,
        lower_bound=0, upper_bound=1_000_000,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"
    with pytest.raises(ValueError):
        compile_jdbc_options(PG, table="big", partition_column="id")  # missing bounds


def test_compile_write_options():
    opts = compile_jdbc_write_options(ORA, "t", truncate=True, batchsize=1000)
    assert opts["driver"] == "oracle.jdbc.OracleDriver"
    assert opts["truncate"] == "true"
    assert opts["batchsize"] == "1000"  # DEFAULT_WRITE_BUFFER_SIZE parity (oracle_sde.py:17)


def test_from_jdbc_clean_error_without_driver_jar(spark):
    with pytest.raises(RuntimeError, match="classpath"):
        from_jdbc(spark, PG, table="t")
