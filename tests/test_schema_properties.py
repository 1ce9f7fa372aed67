"""Property-based tests (hypothesis) for the pure-Python layers: schema
evolution algebra, checkpoint/lineage file robustness, URI routing."""

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from geopetl_spark.schema import diff_schemas, doc_to_schema, evolve_schema, schema_to_doc
from geopetl_spark.sources.registry import parse_source_url
from geopetl_spark.streaming.checkpoint import Checkpoint
from geopetl_spark.streaming.lineage import LineageLog

_TYPES = [T.LongType(), T.IntegerType(), T.DoubleType(), T.StringType(),
          T.BooleanType(), T.DateType(), T.ArrayType(T.IntegerType())]

names = st.lists(
    st.text(alphabet="abcdefghij_", min_size=1, max_size=8), min_size=1, max_size=6, unique=True
)


def _schema(names_list, rng):
    return T.StructType(
        [T.StructField(n, _TYPES[(hash(n) + rng) % len(_TYPES)], True) for n in names_list]
    )


@given(names, st.integers(0, 6))
@settings(max_examples=50, deadline=None)
def test_schema_doc_roundtrip_property(ns, rng):
    schema = _schema(ns, rng)
    assert doc_to_schema(schema_to_doc(schema)) == schema


@given(names, names, st.integers(0, 6))
@settings(max_examples=50, deadline=None)
def test_evolution_is_idempotent_and_monotone(a_names, b_names, rng):
    a = _schema(a_names, rng)
    b = _schema(b_names, rng)  # same rng -> shared names get identical types
    ev = evolve_schema(a, b)
    # monotone: every original field kept, in order, with its type
    assert ev.fields[: len(a.fields)] == a.fields
    # idempotent: evolving again with the same incoming adds nothing
    assert evolve_schema(ev, b) == ev
    # complete: every incoming field present
    assert set(f.name.lower() for f in b.fields) <= set(f.name.lower() for f in ev.fields)
    # diff after evolution reports nothing to add
    assert diff_schemas(ev, b).added == []


@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=20))
@settings(max_examples=30, deadline=None)
def test_checkpoint_last_write_wins(tmp_path_factory_ints):
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ck = Checkpoint(d)
        for e in tmp_path_factory_ints:
            ck.save(last_epoch=e)
        assert ck.load()["last_epoch"] == tmp_path_factory_ints[-1]
        assert ck.next_epoch_after() == tmp_path_factory_ints[-1] + 1


def test_lineage_log_tolerates_torn_tail(tmp_path):
    log = LineageLog(str(tmp_path))
    log.record(epoch=0, partitions=[{"partition_id": 0, "rows": 5, "min_lsn": 1, "max_lsn": 5}],
               commit_summary={}, snapshot_id="s", started_at=0.0, finished_at=1.0)
    # simulate a crash mid-append: torn JSON on the last line
    with open(log.file, "a") as fh:
        fh.write('{"epoch": 1, "rows": ')
    entries = log.read()
    assert len(entries) == 1 and entries[0]["epoch"] == 0


def test_parse_source_url_total():
    # the router never throws on parse; unknown schemes fail at dispatch
    for uri in ["/a/b", "x.csv", "a.jsonl", "parquet:///x", "weird+driver://h/p", "table://db.t"]:
        scheme, path = parse_source_url(uri)
        assert isinstance(scheme, str) and path
