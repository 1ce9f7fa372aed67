"""Merge-on-read mode: delta-file merges must produce IDENTICAL logical
state to copy-on-write merges under every CDC contract (exactly-once replay,
out-of-order LSNs, deletes, schema evolution), and compaction must fold
deltas back into the base losslessly.

Rationale (VERDICT round 1): CoW rewrites every touched bucket — in the
uniform-key big-epoch regime that is a full-table rewrite per epoch. MoR
writes O(batch) delta files and defers reconciliation to read/compact.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geopetl_spark import LakeTable, generate_cdc_events

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def _mk(spark, tmp_path, name, **props):
    return LakeTable(spark, str(tmp_path / name)).create(
        DOC_SCHEMA, key_col="doc_id", n_buckets=8, properties=props or None
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string, op string, lsn long"
    )


@pytest.fixture(scope="module")
def events(spark):
    df = generate_cdc_events(spark, 3000, n_keys=150, events_per_epoch=1000).cache()
    yield df
    df.unpersist()  # session-scoped SparkSession: don't leak storage into later modules


def test_mor_equals_cow_final_state(spark, tmp_path, events):
    """The headline equivalence: same epochs through both strategies ->
    byte-identical logical state (order-independent checksum)."""
    cow = _mk(spark, tmp_path, "cow")
    mor = _mk(spark, tmp_path, "mor")
    for e in range(3):
        batch = events.filter(F.col("epoch") == e)
        cow.merge(batch, epoch_id=e, strategy="cow")
        mor.merge(batch, epoch_id=e, strategy="mor")
    assert mor.manifest()["summary"]["mode"] == "mor"
    assert mor.manifest()["deltas"]  # deltas actually accumulated
    assert cow.checksum() == mor.checksum()
    assert cow.read().count() == mor.read().count()


def test_mor_strategy_from_table_property(spark, tmp_path, events):
    t = _mk(spark, tmp_path, "prop", **{"write.merge-mode": "mor"})
    t.merge(events.filter(F.col("epoch") == 0), epoch_id=0)
    assert t.manifest()["summary"]["mode"] == "mor"
    with pytest.raises(ValueError):
        t.merge(events.filter(F.col("epoch") == 1), epoch_id=1, strategy="nope")


def test_mor_exactly_once_epoch_recommit(spark, tmp_path, events):
    t = _mk(spark, tmp_path, "eo")
    b0 = events.filter(F.col("epoch") == 0)
    t.merge(b0, epoch_id=0, strategy="mor")
    cs = t.checksum()
    res = t.merge(b0, epoch_id=0, strategy="mor")  # replayed epoch
    assert res["operation"] == "skip"
    assert t.checksum() == cs


def test_mor_out_of_order_replay_cannot_regress(spark, tmp_path):
    t = _mk(spark, tmp_path, "ooo")
    t.merge(_batch(spark, [("k", [1], 1, "s", "U", 10)]), epoch_id=0, strategy="mor")
    t.merge(_batch(spark, [("k", [9, 9], 2, "s", "U", 20)]), epoch_id=1, strategy="mor")
    # an older event replayed under a NEW epoch id must lose to lsn=20
    t.merge(_batch(spark, [("k", [5], 1, "s", "U", 15)]), epoch_id=2, strategy="mor")
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["tokens"] == [9, 9]


def test_mor_deletes_are_tombstones(spark, tmp_path):
    t = _mk(spark, tmp_path, "del")
    t.merge(_batch(spark, [("a", [1], 1, "s", "I", 1), ("b", [2], 1, "s", "I", 2)]),
            epoch_id=0, strategy="mor")
    t.merge(_batch(spark, [("a", None, None, None, "D", 3)]), epoch_id=1, strategy="mor")
    assert {r["doc_id"] for r in t.read().collect()} == {"b"}
    # late replay of an older upsert cannot resurrect the deleted key
    t.merge(_batch(spark, [("a", [7], 1, "s", "U", 2)]), epoch_id=2, strategy="mor")
    assert {r["doc_id"] for r in t.read().collect()} == {"b"}


def test_mor_compact_folds_deltas(spark, tmp_path, events):
    t = _mk(spark, tmp_path, "cmp")
    for e in range(3):
        t.merge(events.filter(F.col("epoch") == e), epoch_id=e, strategy="mor")
    cs = t.checksum()
    n = t.read().count()
    assert t.manifest()["deltas"]
    assert t.count() == n  # total_rows is None -> count() falls back to a scan
    t.compact()
    assert t.manifest()["deltas"] == {}
    assert t.checksum() == cs
    assert t.count() == n  # metadata-exact again after compaction
    # post-compact merges keep working (seq ordering survives the rewrite)
    t.merge(_batch(spark, [("newkey", [1], 1, "s", "I", 10_000_000)]),
            epoch_id="post", strategy="mor")
    assert t.read().filter("doc_id = 'newkey'").count() == 1


def test_cow_merge_folds_affected_bucket_deltas(spark, tmp_path):
    """Mixed-mode: a CoW merge over a table with MoR deltas reduces the
    affected buckets' deltas into the rewrite and drops them from the
    manifest — no double-apply on later reads."""
    t = _mk(spark, tmp_path, "mix")
    cow_ref = _mk(spark, tmp_path, "mixref")
    b0 = _batch(spark, [("a", [1], 1, "s", "I", 1), ("b", [2], 1, "s", "I", 2)])
    b1 = _batch(spark, [("a", [3, 3], 2, "s", "U", 5)])
    t.merge(b0, epoch_id=0, strategy="mor")
    t.merge(b1, epoch_id=1, strategy="cow")
    cow_ref.merge(b0, epoch_id=0, strategy="cow")
    cow_ref.merge(b1, epoch_id=1, strategy="cow")
    assert t.checksum() == cow_ref.checksum()
    # key 'a' bucket's delta folded away
    m = t.manifest()
    akey_bucket = t.read(include_system=True).filter("doc_id = 'a'").select("_bucket").collect()[0][0]
    assert str(akey_bucket) not in m.get("deltas", {})


def test_mor_schema_evolution(spark, tmp_path):
    t = _mk(spark, tmp_path, "evo")
    t.merge(_batch(spark, [("a", [1], 1, "s", "I", 1)]), epoch_id=0, strategy="mor")
    wide = spark.createDataFrame(
        [("b", [2], 1, "s", "fr", "I", 2)],
        "doc_id string, tokens array<int>, n_tok int, source string, lang string, op string, lsn long",
    )
    t.merge(wide, epoch_id=1, strategy="mor")
    rows = {r["doc_id"]: r["lang"] for r in t.read().collect()}
    assert rows == {"a": None, "b": "fr"}  # old rows surface NULL in the new column


def test_mor_vacuum_keeps_live_deltas(spark, tmp_path, events):
    t = _mk(spark, tmp_path, "vac")
    for e in range(2):
        t.merge(events.filter(F.col("epoch") == e), epoch_id=e, strategy="mor")
    cs = t.checksum()
    t.vacuum(keep_last_versions=1)
    assert t.checksum() == cs  # delta dirs referenced by the kept manifest survive
