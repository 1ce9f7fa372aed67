"""Catalog/introspection surface.

Reference parity (SURVEY §2.6): ``users/all_tables/tables_for_user/
table_names`` with SDE-internal exclusions (``oracle_sde.py:176-246``),
``tables/get_schemas`` (``postgis.py:252-269``), ``database_object_type``
(``postgis.py:409-441``), capability probes (``postgis.py:208-240``),
``geom_field`` payload-column discovery (``postgis.py:561-631``,
``oracle_sde.py:498-505``).

Spark side: ``spark.catalog`` for registered tables, plus lake-table
discovery by directory scan (a lake dir is any dir containing ``_current``).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# internal-table exclusion patterns, ≈ oracle_sde.py:235-241's
# ^S\d+_IDX\$$ / ^KEYSET_ / SDE_LOGFILE exclusions
INTERNAL_PATTERNS = [re.compile(r"^_"), re.compile(r"\.tmp-"), re.compile(r"^snap-")]


def table_names(spark: SparkSession, database: str | None = None) -> list[str]:
    """Registered catalog tables, internal names excluded (C1/C2)."""
    tables = spark.catalog.listTables(database) if database else spark.catalog.listTables()
    out = []
    for t in tables:
        if any(p.search(t.name) for p in INTERNAL_PATTERNS):
            continue
        out.append(t.name)
    return sorted(out)


def databases(spark: SparkSession) -> list[str]:
    return sorted(d.name for d in spark.catalog.listDatabases())


def table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)


def database_object_type(spark: SparkSession, name: str) -> str:
    """table/view classification (C3, ≈ pg_class.relkind switch,
    postgis.py:409-441); raises on unknown objects like the reference."""
    try:
        t = spark.catalog.getTable(name)
    except Exception as e:  # noqa: BLE001 - reference raises ValueError too
        raise ValueError(f"unknown database object: {name}") from e
    kind = (t.tableType or "table").lower()
    # normalize to the reference's vocabulary (table/view/materialized view,
    # postgis.py:409-441): Spark reports MANAGED/EXTERNAL/VIEW/TEMPORARY
    return {"managed": "table", "external": "table", "temporary": "view"}.get(kind, kind)


def lake_tables(root: str) -> list[str]:
    """Discover lake tables under a root dir (a lake table dir contains
    ``_current``) — the engine-native catalog listing."""
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        if "_current" in filenames:
            out.append(dirpath)
            dirnames.clear()
    return sorted(out)


_CAPABILITIES_CACHE: dict[int, dict] = {}


def capabilities(spark: SparkSession) -> dict:
    """Engine capability probes, cached per session (C4 analog: the
    reference caches ``is_sde_enabled``/``is_postgis_enabled`` probes,
    ``postgis.py:208-240, 444-461``). These are the feature facts a sink or
    operator checks before relying on a behavior."""
    key = id(spark)
    if key in _CAPABILITIES_CACHE:
        return _CAPABILITIES_CACHE[key]
    conf = spark.conf

    def flag(name: str, default: str = "false") -> bool:
        try:
            return (conf.get(name, default) or default).lower() == "true"
        except Exception:  # noqa: BLE001 - unreadable conf = capability absent
            return False

    caps = {
        "arrow_enabled": flag("spark.sql.execution.arrow.pyspark.enabled"),
        "aqe_enabled": flag("spark.sql.adaptive.enabled"),
        "aqe_skew_join": flag("spark.sql.adaptive.skewJoin.enabled"),
        "ansi_mode": flag("spark.sql.ansi.enabled"),
        "session_timezone": conf.get("spark.sql.session.timeZone", None),
        "shuffle_partitions": int(conf.get("spark.sql.shuffle.partitions", "200")),
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "spark_version": spark.version,
    }
    _CAPABILITIES_CACHE[key] = caps
    return caps


def find_payload_column(schema_or_df, error_on_multiple: bool = True) -> str | None:
    """Payload-column discovery by type (C5 / F6 analog): the reference
    scans table metadata for the single geometry-typed column and errors on
    multiple (``oracle_sde.py:498-505``). Here the payload type is an
    integer/float array (tokens/embedding)."""
    schema = schema_or_df.schema if isinstance(schema_or_df, DataFrame) else schema_or_df
    hits = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, T.ArrayType)
        and isinstance(f.dataType.elementType, (T.IntegerType, T.LongType, T.ShortType, T.FloatType, T.DoubleType))
    ]
    if not hits:
        return None
    if len(hits) > 1 and error_on_multiple:
        raise ValueError(f"multiple payload columns found: {hits}")  # oracle_sde.py:503-504
    return hits[0]


def sniff_payload_in_strings(df: DataFrame, sample_rows: int = 10) -> str | None:
    """Schema-by-content detection at the untyped (CSV) boundary (F6,
    ≈ first-row WKT-prefix sniffing, oracle_sde.py:872-889): find the one
    string column whose sampled values look like serialized token arrays
    ('[1,2,3]' or '1,2,3' or 'SRID-tag;...' analog 'V1;...')."""
    pat = re.compile(r"^(V\d+;)?\[?\s*-?\d+(\s*,\s*-?\d+)*\s*\]?$")
    rows = df.limit(sample_rows).collect()
    if not rows:
        return None
    candidates = []
    for f in df.schema.fields:
        if not isinstance(f.dataType, T.StringType):
            continue
        vals = [r[f.name] for r in rows if r[f.name] not in (None, "")]
        if vals and all(pat.match(v) for v in vals):
            candidates.append(f.name)
    if len(candidates) > 1:
        raise ValueError(f"multiple payload-like columns: {candidates}")
    return candidates[0] if candidates else None
