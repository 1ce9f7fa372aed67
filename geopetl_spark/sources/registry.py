"""URI-routed source/sink registry.

Reference: ``fromgis``/``togis`` parse a SQLAlchemy-style URL and dispatch to
``from<scheme>``/``to<scheme>`` (``/root/reference/geopetl/__init__.py:13-52``);
``parse_db_url`` normalizes schemes (``postgresql -> postgis``, strips
``-``/``_``: ``util.py:9-39``).

Here the scheme routes to Spark reader formats; ``read_source(spark, uri)``
and ``write_sink(df, uri)`` are the thin registry over them.
"""

from __future__ import annotations

from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

from . import readers

_SCHEME_ALIASES = {
    # scheme normalization like util.py:20-23 (lower, strip -/_ and +driver)
    "file": "parquet",
    "pq": "parquet",
    "csvfile": "csv",
    "lake": "lake",
}


def _normalize_scheme(scheme: str) -> str:
    s = scheme.lower().split("+")[0].replace("-", "").replace("_", "")
    return _SCHEME_ALIASES.get(s, s)


def parse_source_url(uri: str) -> tuple[str, str]:
    """Return (scheme, path). Bare paths default to parquet dirs."""
    p = urlparse(uri)
    if not p.scheme or len(p.scheme) == 1:  # windows-drive / bare path
        if uri.endswith(".csv"):
            return "csv", uri
        if uri.endswith(".json") or uri.endswith(".jsonl"):
            return "json", uri
        if uri.endswith(".orc"):
            return "orc", uri
        return "parquet", uri
    path = (p.netloc + p.path) if p.netloc else p.path
    return _normalize_scheme(p.scheme), path


def read_source(spark: SparkSession, uri: str, **kw) -> DataFrame:
    """``fromgis`` analog (``__init__.py:13-30``)."""
    if uri.lower().startswith("jdbc:"):
        # live-database extract (S1/S2): the whole uri IS the JDBC url;
        # fields/where/limit/sql push down into the dbtable subquery
        from .jdbc import from_jdbc

        return from_jdbc(spark, uri, **kw)
    scheme, path = parse_source_url(uri)
    if scheme == "parquet":
        return readers.from_parquet(spark, path, **kw)
    if scheme == "orc":
        return readers.from_orc(spark, path, **kw)
    if scheme == "csv":
        return readers.from_csv(spark, path, **kw)
    if scheme == "json":
        return readers.from_json(spark, path, **kw)
    if scheme == "table":
        return readers.from_table(spark, path, **kw)
    if scheme == "lake":
        from ..lake.table import LakeTable

        return LakeTable(spark, path).read(**kw)
    raise ValueError(f"no reader registered for scheme {scheme!r}")  # __init__.py:28-30 analog


def write_sink(df: DataFrame, uri: str, mode: str = "overwrite", **kw) -> None:
    """``togis`` analog (``__init__.py:33-52``)."""
    if uri.lower().startswith("jdbc:"):
        from .jdbc import to_jdbc

        to_jdbc(df, uri, mode=mode, **kw)
        return
    scheme, path = parse_source_url(uri)
    if scheme == "parquet":
        df.write.mode(mode).parquet(path, **kw)
        return
    if scheme == "orc":
        df.write.mode(mode).orc(path, **kw)
        return
    if scheme == "csv":
        # CSV sink ≈ tocarto's temp-CSV dump step (carto.py:24-27)
        df.write.mode(mode).option("header", "true").csv(path, **kw)
        return
    if scheme == "json":
        df.write.mode(mode).json(path, **kw)
        return
    if scheme == "lake":
        from ..lake.table import LakeTable

        LakeTable(df.sparkSession, path).write(df, mode=mode, **kw)
        return
    raise ValueError(f"no writer registered for scheme {scheme!r}")
