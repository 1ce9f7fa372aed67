"""Lake lifecycle: compaction, tombstone reclamation, vacuum, commit
conflicts, and the reference-style golden round-trip (SURVEY §5)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geopetl_spark import LakeTable, generate_cdc_events
from geopetl_spark.lake.table import CommitConflict

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


@pytest.fixture()
def merged_table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "lake")).create(DOC_SCHEMA, key_col="doc_id", n_buckets=8)
    ev = generate_cdc_events(spark, 3000, n_keys=150, events_per_epoch=1000)
    for e in range(3):
        t.merge(ev.filter(F.col("epoch") == e), epoch_id=e)
    return t


def _n_data_dirs(t):
    root = os.path.join(t.path, "data")
    return sum(len(dirs) == 0 for _, dirs, _ in os.walk(root))  # leaf dirs


def test_compact_preserves_state_and_reduces_dirs(merged_table):
    t = merged_table
    cs = t.checksum()
    dirs_before = sum(len(v) for v in t.manifest()["buckets"].values())
    t.compact()
    assert t.checksum() == cs
    dirs_after = sum(len(v) for v in t.manifest()["buckets"].values())
    assert dirs_after <= dirs_before


def test_compact_drop_tombstones(merged_table, spark):
    t = merged_table
    cs = t.checksum()
    had_tombstones = (
        t.read(include_system=True).filter(F.col("_deleted")).count() > 0
    )
    assert had_tombstones  # the generator plants deletes
    t.compact(drop_tombstones=True)
    assert t.checksum() == cs  # live state untouched
    assert t.read(include_system=True).filter(F.col("_deleted")).count() == 0


def test_vacuum_reclaims_old_snapshots(merged_table, spark):
    t = merged_table
    cs = t.checksum()
    t.compact()
    res = t.vacuum(keep_last_versions=1)
    assert res["removed_data_dirs"] > 0
    assert res["removed_manifests"] > 0
    assert t.checksum() == cs  # current snapshot fully readable
    # time travel beyond the kept window is gone
    with pytest.raises(Exception):
        t.read(version=0).count()


def test_commit_conflict_one_winner(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "lake")).create(DOC_SCHEMA, key_col="doc_id", n_buckets=4)
    df = spark.createDataFrame([("k1", [1], 1, "s")], DOC_SCHEMA)
    # simulate a racing writer that published the same next version first
    m = t.manifest()
    racing = dict(m, version=m["version"] + 1, snapshot_id="racer")
    t._publish(racing)
    stale = LakeTable(spark, t.path)
    stale_m = dict(m, version=m["version"] + 1, snapshot_id="loser")
    with pytest.raises(CommitConflict):
        stale._publish(stale_m)
    assert t.manifest()["snapshot_id"] == "racer"  # winner's commit intact
    # a retry against the refreshed state succeeds
    t.write(df, mode="append")
    assert t.read().count() == 1


# ---------------------------------------------------------------------------
# Reference test-strategy carry-over (SURVEY §5): golden edge-case rows
# round-tripped through the sink and compared field by field. Edge content
# from the reference's point.csv: NULL row, special characters, embedded
# quotes, negative/zero/large numbers, tz offsets, empty payload.
# ---------------------------------------------------------------------------

GOLDEN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("textfield", T.StringType(), True),
        T.StructField("ts_tz", T.TimestampType(), True),
        T.StructField("numericfield", T.DoubleType(), True),
        T.StructField("datefield", T.DateType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
    ]
)

import datetime as dt

GOLDEN_ROWS = [
    ("r01", None, None, None, None, None),  # all-NULL row (point.csv row 1)
    ("r02", "ab#$%c", dt.datetime(2019, 5, 15, 15, 53, 53, 522000, tzinfo=dt.timezone.utc), 1.0, dt.date(2005, 1, 1), [1, 2, 3]),
    ("r03", "d!@^&*?-=+ef", dt.datetime(2019, 5, 15, 19, 53, 53, tzinfo=dt.timezone(dt.timedelta(hours=-4))), -123.0, dt.date(2015, 3, 1), [0]),
    ("r04", 'y"ea::h', dt.datetime(2032, 4, 30, 0, 0, 0, tzinfo=dt.timezone(dt.timedelta(hours=5))), 2132134342.0, dt.date(2031, 2, 28), [2147483647 - 1]),
    ("r05", "qwe'qeqdqw", None, 0.0, None, []),  # empty payload ≈ POINT EMPTY
    ("r06", "po{}tato", None, 0.123456789, dt.date(1971, 1, 1), [7, 7, 7]),
    ("r07", "v[]im", None, None, None, None),
]


def test_golden_roundtrip_field_by_field(spark, tmp_path):
    """write -> read -> write -> read; both reads identical and equal to the
    golden rows (the reference's round-trip idempotence test,
    test_postgis.py:499-530, recast)."""
    src = spark.createDataFrame(GOLDEN_ROWS, GOLDEN_SCHEMA)
    t1 = LakeTable(spark, str(tmp_path / "g1")).create(GOLDEN_SCHEMA, key_col="doc_id", n_buckets=4)
    t1.write(src, mode="overwrite")
    read1 = {r["doc_id"]: r.asDict() for r in t1.read().collect()}

    t2 = LakeTable(spark, str(tmp_path / "g2")).create(GOLDEN_SCHEMA, key_col="doc_id", n_buckets=4)
    t2.write(t1.read(), mode="overwrite")
    read2 = {r["doc_id"]: r.asDict() for r in t2.read().collect()}

    golden = {r[0]: dict(zip(GOLDEN_SCHEMA.fieldNames(), r)) for r in GOLDEN_ROWS}
    assert read1 == read2  # round-trip idempotence
    for k, grow in golden.items():
        got = read1[k]
        for field, want in grow.items():
            if field == "ts_tz" and want is not None:
                # tz values compare in UTC (reference parses both sides
                # before compare, test_oraclesde.py:243-252)
                assert got[field].replace(tzinfo=dt.timezone.utc) == want.astimezone(dt.timezone.utc), field
            elif field == "tokens" and want is not None:
                assert (got[field] or []) == want, field  # token-array equality
            else:
                assert got[field] == want, (k, field)
