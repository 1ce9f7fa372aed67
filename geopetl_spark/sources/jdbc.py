"""JDBC source/sink: the live-database extract/load surface.

The reference's raison d'être is pulling from / loading into live databases
(``fromoraclesde`` ``/root/reference/geopetl/oracle_sde.py:26-33``,
``frompostgis`` ``postgis.py:54-79``). Here the same read surface
(``fields=``, ``where=``, ``limit=``, ``sql=``) compiles into the
``dbtable`` subquery of a ``spark.read.format("jdbc")`` reader, so
projection/filter/limit execute INSIDE the source database — the same
pushdown the reference achieves by hand-assembling SELECT statements
(``oracle_sde.py:1176-1218``, ``postgis.py:1000-1029``).

Scale surface: ``partition_column``/``num_partitions``/bounds map to Spark's
partitioned JDBC reads (one connection per partition — the only way a JDBC
scan parallelizes), and ``fetchsize`` controls cursor batching (the analog
of the reference's ``buffer_size``, ``oracle_sde.py:17``).

Test coverage is two-layer: statement-builder parity against expected SQL
strings (``tests/test_jdbc.py`` — how the reference unit-tests its builders,
``oracle_sde.py:1176-1218``) PLUS a LIVE write/read round-trip through
embedded Apache Derby (``tests/test_jdbc_live.py``) — Derby ships inside the
Spark distribution, so a real database exercises the pushdown subquery,
append/overwrite modes, raw-SQL passthrough, and header lowercasing without
any network. ``from_jdbc``/``to_jdbc`` raise a clean, actionable error when
a driver jar is absent (tested with sqlite, which does NOT ship).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# subprotocol -> canonical driver class (informational default; callers with
# a nonstandard driver pass driver= explicitly)
_DRIVERS = {
    "postgresql": "org.postgresql.Driver",
    "oracle": "oracle.jdbc.OracleDriver",
    "mysql": "com.mysql.cj.jdbc.Driver",
    "sqlserver": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    "sqlite": "org.sqlite.JDBC",
    # embedded Derby SHIPS with Spark (metastore dependency), so this is the
    # one live-database path available offline — tests/test_jdbc_live.py runs
    # a real write/read round-trip through it
    "derby": "org.apache.derby.jdbc.EmbeddedDriver",
}


def jdbc_subprotocol(url: str) -> str:
    """'jdbc:postgresql://h/db' -> 'postgresql'."""
    parts = url.split(":", 2)
    if len(parts) < 3 or parts[0].lower() != "jdbc":
        raise ValueError(f"not a JDBC url: {url!r} (expected jdbc:<subprotocol>:...)")
    return parts[1].lower()


def _quote_ident(name: str) -> str:
    """Quote a (possibly schema-qualified) identifier the way the reference
    does via petl's _quote (postgis.py:1000-1006): per-part double quotes,
    already-quoted parts passed through."""
    out = []
    for part in name.split("."):
        if part.startswith('"') and part.endswith('"'):
            out.append(part)
        else:
            out.append('"' + part.replace('"', '""') + '"')
    return ".".join(out)


def build_select(
    table: str,
    subprotocol: str = "postgresql",
    fields: list[str] | None = None,
    where: str | None = None,
    limit: int | None = None,
) -> str:
    """Render the pushdown SELECT (statement-builder parity with
    ``OracleSdeQuery.stmt`` ``oracle_sde.py:1176-1218`` and
    ``PostgisQuery.stmt`` ``postgis.py:1000-1029``).

    Oracle has no LIMIT: row capping uses ROWNUM, AND-joined into the single
    WHERE clause — deliberately FIXING the reference's bug of emitting a
    second ``WHERE`` when ``where=`` and ``limit=`` are combined
    (``oracle_sde.py:1215`` vs ``:1218``). Derby (the live-tested embedded
    dialect) has no LIMIT either: it takes ANSI ``FETCH FIRST n ROWS ONLY``.
    """
    cols = ", ".join(_quote_ident(f) for f in fields) if fields else "*"
    clauses = [c for c in [where] if c]
    if limit is not None and subprotocol == "oracle":
        clauses.append(f"ROWNUM <= {int(limit)}")
    stmt = f"SELECT {cols} FROM {_quote_ident(table)}"
    if clauses:
        stmt += " WHERE " + " AND ".join(f"({c})" for c in clauses)
    if limit is not None and subprotocol != "oracle":
        if subprotocol == "derby":
            stmt += f" FETCH FIRST {int(limit)} ROWS ONLY"
        else:
            stmt += f" LIMIT {int(limit)}"
    return stmt


def compile_jdbc_options(
    url: str,
    table: str | None = None,
    fields: list[str] | None = None,
    where: str | None = None,
    limit: int | None = None,
    sql: str | None = None,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound=None,
    upper_bound=None,
    fetchsize: int = 10_000,
    options: dict | None = None,
) -> dict[str, str]:
    """Compile the geopetl read surface into Spark JDBC reader options.

    ``sql=`` is the raw passthrough (P7, ``oracle_sde.py:1137-1139``) and is
    mutually exclusive with fields/where/limit; otherwise the statement
    builder renders the pushdown subquery. Either way the query ships as
    ``dbtable = (<stmt>) geopetl_src`` so the source DB executes it.
    """
    sub = jdbc_subprotocol(url)
    if sql is not None:
        if fields or where or limit is not None:
            raise ValueError("sql= is a raw passthrough; fields/where/limit must be None")
        stmt = sql
    else:
        if table is None:
            raise ValueError("either table= or sql= is required")
        stmt = build_select(table, sub, fields=fields, where=where, limit=limit)
    opts: dict[str, str] = {
        "url": url,
        "dbtable": f"({stmt}) geopetl_src",  # bare alias: valid on Oracle too (no AS)
        "fetchsize": str(int(fetchsize)),
    }
    opts["driver"] = driver or _DRIVERS.get(sub, "")
    if not opts["driver"]:
        del opts["driver"]  # let Spark resolve from the url if unknown subprotocol
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if partition_column is not None:
        if num_partitions is None or lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC reads need partition_column, num_partitions, "
                "lower_bound and upper_bound together"
            )
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(int(num_partitions)),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    opts.update({k: str(v) for k, v in (options or {}).items()})
    return opts


def compile_jdbc_write_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    batchsize: int = 1_000,
    truncate: bool = False,
    options: dict | None = None,
) -> dict[str, str]:
    """Writer options. ``batchsize`` defaults to the reference's write
    buffer (DEFAULT_WRITE_BUFFER_SIZE=1000, ``oracle_sde.py:17``);
    ``truncate=True`` maps overwrite mode to TRUNCATE-then-load instead of
    DROP+CREATE — the ``tooraclesde(truncate=True)`` semantics (W1)."""
    sub = jdbc_subprotocol(url)
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "batchsize": str(int(batchsize)),
        "truncate": str(bool(truncate)).lower(),
    }
    opts["driver"] = driver or _DRIVERS.get(sub, "")
    if not opts["driver"]:
        del opts["driver"]
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    opts.update({k: str(v) for k, v in (options or {}).items()})
    return opts


def from_jdbc(spark: SparkSession, url: str, lowercase_headers: bool = True, **kw) -> DataFrame:
    """``fromoraclesde``/``frompostgis`` analog over a live database.

    fields/where/limit/sql are pushed into the generated dbtable subquery
    (compile_jdbc_options); header lowercasing (P9) happens Spark-side.
    """
    opts = compile_jdbc_options(url, **kw)
    try:
        df = spark.read.format("jdbc").options(**opts).load()
    except Exception as e:  # Py4J surfaces ClassNotFound as an opaque error
        if "ClassNotFound" in str(e) or "No suitable driver" in str(e):
            raise RuntimeError(
                f"JDBC driver for {jdbc_subprotocol(url)!r} is not on the Spark "
                "classpath; add the driver jar via spark.jars / spark.jars.packages"
            ) from e
        raise
    if lowercase_headers:
        df = df.toDF(*[c.lower() for c in df.columns])
    return df


def to_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **kw) -> None:
    """``tooraclesde``/``topostgis`` analog: mode='overwrite' with
    truncate=True ≈ truncate+load; mode='append' ≈ appendoraclesde."""
    opts = compile_jdbc_write_options(url, table, **kw)
    try:
        df.write.format("jdbc").options(**opts).mode(mode).save()
    except Exception as e:
        if "ClassNotFound" in str(e) or "No suitable driver" in str(e):
            raise RuntimeError(
                f"JDBC driver for {jdbc_subprotocol(url)!r} is not on the Spark "
                "classpath; add the driver jar via spark.jars / spark.jars.packages"
            ) from e
        raise
