"""Schema layer: internal type vocabulary, JSON schema documents, evolution.

Reference parity (``/root/reference/geopetl``):

* The reference introspects schemas from the source DB and normalizes them
  into a small type vocabulary via ``FIELD_TYPE_MAP`` (``oracle_sde.py:270-308``,
  ``postgis.py:341-379``). Here the vocabulary maps to Spark ``DataType``s.
* ``extract_table_schema`` dumps a frictionless-style JSON schema document
  (``oracle_sde.py:447-488``, ``postgis.py:505-543``); ``get_fields_from_jsonfile``
  /``create_table`` consume it to auto-create tables (``postgis.py:275-333``).
  Here: :func:`schema_to_doc` / :func:`doc_to_schema` / :func:`write_schema_doc`.
* The reference *errors* on unknown fields at write time
  (``oracle_sde.py:923-927``); per the north rule the new engine upgrades this
  to **additive schema evolution**: :func:`diff_schemas` classifies the drift
  and :func:`evolve_schema` applies the additive part, rejecting type
  conflicts.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import types as T

# Internal type vocabulary (reference FIELD_TYPE_MAP target values,
# oracle_sde.py:270-308 / postgis.py:341-379) -> Spark types.
VOCAB_TO_SPARK: dict[str, T.DataType] = {
    "num": T.DoubleType(),
    "integer": T.LongType(),
    "text": T.StringType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "timestamp without time zone": T.TimestampNTZType(),
    "timestamp with time zone": T.TimestampType(),
    "timestamptz": T.TimestampType(),
    "boolean": T.BooleanType(),
    "uuid": T.StringType(),
    "money": T.DecimalType(19, 4),
    "time": T.StringType(),
    "binary": T.BinaryType(),
    # geometry in-flight representation is WKT text in the reference;
    # the new engine's payload analog is a token array (BASELINE input_hint).
    "geometry": T.StringType(),
    "geom": T.StringType(),
    "tokens": T.ArrayType(T.IntegerType()),
    "embedding": T.ArrayType(T.FloatType()),
    "object": T.StringType(),  # reference maps object/array -> jsonb (postgis.py:16-34)
    "array": T.StringType(),
    "other": T.StringType(),
}

_SPARK_TO_VOCAB: dict[str, str] = {
    "double": "num",
    "float": "num",
    "decimal": "num",
    "bigint": "integer",
    "int": "integer",
    "smallint": "integer",
    "tinyint": "integer",
    "string": "text",
    "date": "date",
    "timestamp_ntz": "timestamp",
    "timestamp": "timestamp with time zone",
    "boolean": "boolean",
    "binary": "binary",
    "array<int>": "tokens",
    "array<integer>": "tokens",
    "array<float>": "embedding",
}


def vocab_for(dt: T.DataType) -> str:
    """Internal vocabulary name for a Spark type (best effort, 'other' fallback)."""
    s = dt.simpleString()
    if s in _SPARK_TO_VOCAB:
        return _SPARK_TO_VOCAB[s]
    if s.startswith("decimal"):
        return "num"
    if s.startswith("array<int"):
        return "tokens"
    if s.startswith("array<float") or s.startswith("array<double"):
        return "embedding"
    return "other"


def spark_type_for(vocab: str) -> T.DataType:
    if vocab not in VOCAB_TO_SPARK:
        # Reference raises on unknown types at write (_prepare_val,
        # oracle_sde.py:742-743); keep that strictness for the vocabulary.
        raise TypeError(f"unknown internal type: {vocab!r}")
    return VOCAB_TO_SPARK[vocab]


# ---------------------------------------------------------------------------
# JSON schema documents (frictionless-style, like tests/fixtures_data/schemas/)
# ---------------------------------------------------------------------------

def schema_to_doc(
    schema: T.StructType,
    primary_key: list[str] | None = None,
    table_props: dict | None = None,
) -> dict:
    """Render a StructType as a frictionless-style schema document.

    Mirrors the shape written by ``extract_table_schema``
    (``oracle_sde.py:447-488``): a ``fields`` list with name/type/constraints
    plus a ``primaryKey`` list.
    """
    fields = []
    for f in schema.fields:
        entry: dict = {"name": f.name, "type": vocab_for(f.dataType)}
        entry["spark_type"] = f.dataType.json()
        if not f.nullable:
            entry["constraints"] = {"required": True}
        if f.metadata:
            entry["metadata"] = dict(f.metadata)
        fields.append(entry)
    doc: dict = {"fields": fields}
    if primary_key:
        doc["primaryKey"] = list(primary_key)
    if table_props:
        doc["tableProps"] = dict(table_props)
    return doc


def doc_to_schema(doc: dict) -> T.StructType:
    """Build a StructType from a schema document (consumer side of S11,
    ``postgis.py:275-333``). Prefers the exact ``spark_type`` when present,
    falls back to the vocabulary mapping."""
    out = []
    for f in doc["fields"]:
        if "spark_type" in f:
            dt = T._parse_datatype_json_string(f["spark_type"])
        else:
            dt = spark_type_for(f["type"])
        nullable = not (f.get("constraints") or {}).get("required", False)
        meta = f.get("metadata") or {}
        out.append(T.StructField(f["name"], dt, nullable, metadata=meta))
    return T.StructType(out)


def write_schema_doc(doc: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=2, sort_keys=True)
    os.replace(tmp, path)


def read_schema_doc(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


# ---------------------------------------------------------------------------
# Schema diff + additive evolution (north-rule upgrade of W6's strictness)
# ---------------------------------------------------------------------------

@dataclass
class SchemaDiff:
    added: list[T.StructField] = field(default_factory=list)      # in incoming, not in table
    missing: list[str] = field(default_factory=list)              # in table, not in incoming
    conflicts: list[tuple[str, str, str]] = field(default_factory=list)  # (name, table_t, in_t)

    @property
    def compatible(self) -> bool:
        return not self.conflicts


# Safe widenings we accept silently (incoming narrower than table).
_WIDENINGS = {
    ("int", "bigint"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("tinyint", "smallint"),
    ("tinyint", "int"),
    ("tinyint", "bigint"),
    ("float", "double"),
    ("int", "double"),
    ("bigint", "double"),
    ("date", "timestamp"),
    ("date", "timestamp_ntz"),
}


def diff_schemas(table: T.StructType, incoming: T.StructType) -> SchemaDiff:
    d = SchemaDiff()
    tmap = {f.name.lower(): f for f in table.fields}
    imap = {f.name.lower(): f for f in incoming.fields}
    for name, f in imap.items():
        if name not in tmap:
            d.added.append(T.StructField(f.name, f.dataType, True))
        else:
            ts, is_ = tmap[name].dataType.simpleString(), f.dataType.simpleString()
            if ts != is_ and (is_, ts) not in _WIDENINGS:
                d.conflicts.append((f.name, ts, is_))
    for name in tmap:
        if name not in imap:
            d.missing.append(tmap[name].name)
    return d


def evolve_schema(table: T.StructType, incoming: T.StructType) -> T.StructType:
    """Additive evolution: append new incoming columns (as nullable) to the
    table schema. Type conflicts raise — the engine refuses destructive
    drift, matching the reference's unknown-field error (oracle_sde.py:923-927)
    upgraded per the north rule to allow *additive* drift only."""
    d = diff_schemas(table, incoming)
    if not d.compatible:
        raise TypeError(f"incompatible schema drift: {d.conflicts}")
    if not d.added:
        return table
    return T.StructType(list(table.fields) + d.added)
