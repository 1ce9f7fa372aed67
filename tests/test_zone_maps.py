"""Zone-map data skipping: per-bucket column min/max harvested from parquet
footers at write time, conservative predicate pruning at read time (simple
AND-range conjunctions only; MoR-delta buckets never pruned)."""

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from geopetl_spark import LakeTable  # noqa: E402
from tests.test_cdc_engine import DOC_SCHEMA  # noqa: E402


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [(f"k{i}", [i], i, "src", "I", i) for i in range(lo, hi)],
        "doc_id string, tokens array<int>, n_tok int, source string, op string, lsn long",
    ).drop("op", "lsn")


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "lake")).create(
        DOC_SCHEMA, key_col="doc_id", n_buckets=4
    )
    t.write(_rows(spark, 0, 200), mode="overwrite")
    return t


def test_zones_recorded_with_correct_global_range(table):
    stats = table.manifest()["bucket_stats"]
    assert stats
    mins, maxs = [], []
    for b, s in stats.items():
        z = s["zones"]
        assert set(z) >= {"doc_id", "n_tok", "source"}
        mins.append(z["n_tok"][0])
        maxs.append(z["n_tok"][1])
        assert z["source"] == ["src", "src"]
    assert min(mins) == 0 and max(maxs) == 199


def test_distributed_harvest_identical_to_driver_serial(table, spark, monkeypatch):
    """The executor-side footer harvest (commit path, large epochs) must be
    byte-identical to the driver-serial reference on the same files."""
    m = table.manifest()
    written = {b: list(dl) for b, dl in m["buckets"].items()}
    serial = {b: LakeTable._file_stats(dl) for b, dl in written.items()}
    monkeypatch.setattr(LakeTable, "_HARVEST_DRIVER_MAX_FILES", 0)  # force the job path
    distributed = table._harvest_stats(written)
    assert distributed == serial
    # and the stats the ORIGINAL commit recorded match both (modulo the
    # per-dir zones the commit path adds on top of the harvest)
    recorded = {
        b: {k: v for k, v in m["bucket_stats"][b].items() if k != "dirs"} for b in written
    }
    assert recorded == serial


def test_pruning_excludes_provably_empty_buckets(table):
    m = table.manifest()
    # out-of-range predicate -> every bucket provably empty
    assert table._pruned_buckets(m, "n_tok > 5000") == set(m["buckets"].keys())
    assert table._pruned_buckets(m, "n_tok = 9999") == set(m["buckets"].keys())
    assert table._pruned_buckets(m, "source = 'other'") == set(m["buckets"].keys())
    # in-range -> nothing provably empty (every bucket spans the range)
    assert table._pruned_buckets(m, "n_tok >= 0") == set()
    # BETWEEN and IN prune via their range envelopes (round 5)
    assert table._pruned_buckets(m, "n_tok between 5000 and 6000") == set(m["buckets"].keys())
    assert table._pruned_buckets(m, "n_tok in (7000, 8000)") == set(m["buckets"].keys())
    assert table._pruned_buckets(m, "source in ('zz1', 'zz2')") == set(m["buckets"].keys())
    assert table._pruned_buckets(m, "n_tok between 0 and 199") == set()
    assert table._pruned_buckets(m, "n_tok in (5, 9000)") == set()  # envelope spans zones
    # complex expressions disable pruning, never wrong results
    assert table._pruned_buckets(m, "n_tok > 5000 or n_tok < 0") == set()
    assert table._pruned_buckets(m, "abs(n_tok) > 5000") == set()
    assert table._pruned_buckets(m, "n_tok is null") == set()
    assert table._pruned_buckets(m, "n_tok not between 0 and 5000") == set()
    assert table._pruned_buckets(m, "n_tok not in (1, 2)") == set()
    assert table._pruned_buckets(m, "source = 'a between 1 and 3'") == set()


def test_pruned_read_matches_unpruned_filter(table):
    full = table.read()
    for where in ("n_tok > 150", "n_tok <= 10", "n_tok = 42 and source = 'src'", "n_tok > 5000",
                  "n_tok between 40 and 60", "n_tok in (5, 42, 7000)",
                  "n_tok between 20 and 30 and source = 'src'"):
        got = sorted(r.doc_id for r in table.read(where=where).collect())
        exp = sorted(r.doc_id for r in full.filter(where).collect())
        assert got == exp, where


def test_append_widens_zones(table, spark):
    table.write(_rows(spark, 1000, 1050), mode="append")
    stats = table.manifest()["bucket_stats"]
    maxs = [s["zones"]["n_tok"][1] for s in stats.values() if s.get("zones")]
    assert max(maxs) == 1049
    # the old range is still covered: nothing in [0,200) is prunable
    assert table._pruned_buckets(table.manifest(), "n_tok = 100") == set()


def test_per_dir_pruning_within_append_buckets(table, spark):
    """Round-5 extension: an append-heavy bucket's UNION zones are wide
    ([0,1049]) so bucket-level pruning is blind, but each DIR keeps its own
    zones — a predicate inside only one append's range scans only that
    append's dirs. Results must equal the unpruned filter either way."""
    table.write(_rows(spark, 1000, 1050), mode="append")
    all_files = len(table.read().inputFiles())
    hi = table.read(where="n_tok >= 1000")
    lo = table.read(where="n_tok < 200")
    assert 0 < len(hi.inputFiles()) < all_files
    assert 0 < len(lo.inputFiles()) < all_files
    assert sorted(r.doc_id for r in hi.collect()) == sorted(f"k{i}" for i in range(1000, 1050))
    assert sorted(r.doc_id for r in lo.collect()) == sorted(f"k{i}" for i in range(200))
    # with MoR deltas present anywhere, per-dir pruning turns OFF (the
    # read-time reduce makes rows interdependent) but results stay right
    batch = spark.createDataFrame(
        [("k0", [7], 5, "src", "U", 10_000)],
        "doc_id string, tokens array<int>, n_tok int, source string, op string, lsn long",
    )
    table.merge(batch, epoch_id=7, lsn_col="lsn", op_col="op", strategy="mor")
    hi2 = table.read(where="n_tok >= 1000")
    assert sorted(r.doc_id for r in hi2.collect()) == sorted(f"k{i}" for i in range(1000, 1050))
    got_k0 = table.read(where="n_tok = 5").collect()
    assert {r.doc_id for r in got_k0} >= {"k0"}


def test_mor_delta_bucket_survives_pruning_when_delta_matches(table, spark):
    batch = spark.createDataFrame(
        [("k0", [7], 7000, "src", "U", 10_000)],
        "doc_id string, tokens array<int>, n_tok int, source string, op string, lsn long",
    )
    table.merge(batch, epoch_id=99, lsn_col="lsn", op_col="op", strategy="mor")
    m = table.manifest()
    delta_buckets = set(m["deltas"].keys())
    assert delta_buckets
    # n_tok = 7000 is outside every BASE zone, but the delta bucket must
    # survive pruning (its DELTA zones cover 7000)
    pruned = table._pruned_buckets(m, "n_tok = 7000")
    assert pruned.isdisjoint(delta_buckets)
    got = {r.doc_id for r in table.read(where="n_tok = 7000").collect()}
    assert got == {"k0"}


def test_mor_delta_bucket_prunes_when_base_and_delta_both_miss(table, spark):
    """Round-4 directive #6: a delta-carrying bucket prunes when base AND
    delta zones provably miss, and MoR reads stay equal to the unpruned
    filter."""
    batch = spark.createDataFrame(
        [("k0", [7], 150, "src", "U", 10_000)],  # in-band update, zones stay ≤ 199-ish
        "doc_id string, tokens array<int>, n_tok int, source string, op string, lsn long",
    )
    table.merge(batch, epoch_id=99, lsn_col="lsn", op_col="op", strategy="mor")
    m = table.manifest()
    delta_buckets = set(m["deltas"].keys())
    assert delta_buckets and m.get("delta_stats")
    # predicate outside BOTH base (0..199) and delta (150) zones -> every
    # bucket, delta-carrying ones included, provably misses
    pruned = table._pruned_buckets(m, "n_tok > 5000")
    assert delta_buckets <= pruned
    assert pruned == set(m["buckets"]) | delta_buckets
    # correctness: pruned read == unpruned filter, on both sides of the zone
    full = table.read()
    for where in ("n_tok > 5000", "n_tok = 150", "n_tok <= 10"):
        got = sorted(r.doc_id for r in table.read(where=where).collect())
        exp = sorted(r.doc_id for r in full.filter(where).collect())
        assert got == exp, where
    # a second delta commit WIDENS the delta zones
    batch2 = spark.createDataFrame(
        [("k1", [8], 6000, "src", "U", 10_001)],
        "doc_id string, tokens array<int>, n_tok int, source string, op string, lsn long",
    )
    table.merge(batch2, epoch_id=100, lsn_col="lsn", op_col="op", strategy="mor")
    m2 = table.manifest()
    b_k1 = [b for b, s in m2["delta_stats"].items() if s["zones"].get("n_tok", [0, 0])[1] == 6000]
    assert b_k1
    assert b_k1[0] not in table._pruned_buckets(m2, "n_tok = 6000")
    got = {r.doc_id for r in table.read(where="n_tok = 6000").collect()}
    assert got == {"k1"}


def test_mor_delta_without_stats_never_prunes(table, spark):
    """Delta dirs from manifests written before delta-zone tracking have
    unknown zones and must never prune (conservative)."""
    import json as _json

    batch = spark.createDataFrame(
        [("k0", [7], 150, "src", "U", 10_000)],
        "doc_id string, tokens array<int>, n_tok int, source string, op string, lsn long",
    )
    table.merge(batch, epoch_id=99, lsn_col="lsn", op_col="op", strategy="mor")
    m = table.manifest()
    # simulate a pre-tracking manifest: strip delta_stats
    mpath = table._manifest_path(m["version"])
    m.pop("delta_stats", None)
    with open(mpath, "w") as fh:
        _json.dump(m, fh)
    pruned = table._pruned_buckets(table.manifest(), "n_tok > 5000")
    assert pruned.isdisjoint(set(m["deltas"]))
    assert table.read(where="n_tok > 5000").count() == 0


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, op string, lsn long",
    )


def test_changelog_emits_only_post_watermark_state(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "cl")).create(DOC_SCHEMA, key_col="doc_id", n_buckets=8)
    t.merge(
        _batch(spark, [(f"k{i}", [i], i, "s", "I", i + 1) for i in range(20)]),
        epoch_id=0, lsn_col="lsn", op_col="op",
    )
    v1 = t.manifest()["version"]
    assert t.manifest()["lsn_watermark"] == 20
    # epoch 1: one update, one delete
    t.merge(
        _batch(spark, [("k3", [99], 99, "s", "U", 100), ("k7", None, None, "s", "D", 101)]),
        epoch_id=1, lsn_col="lsn", op_col="op",
    )
    assert t.manifest()["lsn_watermark"] == 101
    changes = {r.doc_id: (r.n_tok, r._deleted, r._lsn) for r in t.read_changes(v1).collect()}
    assert changes == {"k3": (99, False, 100), "k7": (None, True, 101)}
    # changelog from table creation = full CDC-derived state (19 live + 1 tombstone)
    assert t.read_changes(0).count() == 20
    # _lsn zone pruning: only the buckets epoch 1 touched are read
    m = t.manifest()
    pruned = t._pruned_buckets(m, f"_lsn > {20}")
    touched = len(m["buckets"]) - len(pruned)
    assert 1 <= touched <= 2, (touched, pruned)


def test_changelog_mor_and_bulk_rows_excluded(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "cl2")).create(DOC_SCHEMA, key_col="doc_id", n_buckets=4)
    t.merge(
        _batch(spark, [(f"k{i}", [i], i, "s", "I", i + 1) for i in range(10)]),
        epoch_id=0, lsn_col="lsn", op_col="op",
    )
    v1 = t.manifest()["version"]
    # bulk-written rows carry no LSN -> can never surface in the changelog,
    # so a window spanning the bulk append RAISES by default (round-4
    # directive #5: no silently-missed backfills)...
    t.write(_rows(spark, 500, 505), mode="append")
    with pytest.raises(ValueError, match="bulk-append"):
        t.read_changes(v1)
    # MoR epoch: delta-only change still surfaces through the reduce
    t.merge(
        _batch(spark, [("k2", [7], 777, "s", "U", 50)]),
        epoch_id=1, lsn_col="lsn", op_col="op", strategy="mor",
    )
    # ...and on_bulk='ignore' opts into the documented merge-only view
    got = {r.doc_id: r.n_tok for r in t.read_changes(v1, on_bulk="ignore").collect()}
    assert got == {"k2": 777}
    # a window STARTING at/after the bulk commit is clean — no raise
    v_bulk = t.manifest()["bulk_write_versions"][-1]
    assert t.read_changes(v_bulk).count() == 1
    # compaction folds deltas but must not regress the watermark or
    # resurrect pre-watermark rows in the changelog
    wm_before = t.manifest()["lsn_watermark"]
    t.compact()
    assert t.manifest()["lsn_watermark"] == wm_before
    got2 = {r.doc_id: r.n_tok for r in t.read_changes(v1, on_bulk="ignore").collect()}
    assert got2 == {"k2": 777}


def test_changelog_retention_contract_on_history_breaks(spark, tmp_path):
    """ADVICE r4: overwrite / truncate / tombstone-dropping compaction
    advance changelog_min_version; stale incremental reads raise instead of
    silently losing delete events."""
    t = LakeTable(spark, str(tmp_path / "cl4")).create(DOC_SCHEMA, key_col="doc_id", n_buckets=4)
    t.merge(
        _batch(spark, [(f"k{i}", [i], i, "s", "I", i + 1) for i in range(6)]),
        epoch_id=0, lsn_col="lsn", op_col="op",
    )
    v1 = t.manifest()["version"]
    t.merge(
        _batch(spark, [("k1", None, None, "s", "D", 100)]),
        epoch_id=1, lsn_col="lsn", op_col="op",
    )
    # before the drop: the delete surfaces as a tombstone
    assert {r.doc_id for r in t.read_changes(v1).collect()} == {"k1"}
    t.compact(drop_tombstones=True)
    v_compact = t.manifest()["version"]
    # after the drop: reading across the break must raise, not lose "k1"
    with pytest.raises(ValueError, match="predates"):
        t.read_changes(v1)
    # restarting the changelog from the break is fine
    assert t.read_changes(v_compact).count() == 0
    # overwrite breaks history too
    t.write(_rows(spark, 0, 3), mode="overwrite")
    with pytest.raises(ValueError, match="predates"):
        t.read_changes(v_compact)
    # a since_version vacuumed out of the retention window (no history
    # break — just manifest retention) raises a retention error, not a
    # raw FileNotFoundError
    t2 = LakeTable(spark, str(tmp_path / "cl5")).create(DOC_SCHEMA, key_col="doc_id", n_buckets=4)
    t2.merge(_batch(spark, [("a", [1], 1, "s", "I", 1)]), epoch_id=0, lsn_col="lsn", op_col="op")
    t2.merge(_batch(spark, [("b", [2], 2, "s", "I", 2)]), epoch_id=1, lsn_col="lsn", op_col="op")
    t2.vacuum(keep_last_versions=1)
    with pytest.raises(ValueError, match="vacuumed"):
        t2.read_changes(1)


def test_iter_changes_tails_per_commit_deltas(spark, tmp_path):
    """The CDC-out subscriber loop: one (version, delta, summary) per
    data-changing commit; metadata-only commits and watermark-neutral
    maintenance rewrites yield nothing."""
    t = LakeTable(spark, str(tmp_path / "tail")).create(DOC_SCHEMA, key_col="doc_id", n_buckets=4)
    t.merge(
        _batch(spark, [(f"k{i}", [i], i, "s", "I", i + 1) for i in range(5)]),
        epoch_id=0, lsn_col="lsn", op_col="op",
    )
    v0 = t.manifest()["version"]
    t.merge(_batch(spark, [("k1", [9], 9, "s", "U", 10)]), epoch_id=1, lsn_col="lsn", op_col="op")
    t.grant("alice", "SELECT")  # metadata-only commit: no yield
    t.merge(_batch(spark, [("k2", None, None, "s", "D", 11)]), epoch_id=2, lsn_col="lsn", op_col="op")
    t.compact()  # watermark-neutral rewrite: no yield
    out = [(v, {(r.doc_id, r._deleted) for r in df.collect()}, s) for v, df, s in t.iter_changes(v0)]
    assert [v for v, _, _ in out] == [v0 + 1, v0 + 3]
    assert out[0][1] == {("k1", False)}
    assert out[1][1] == {("k2", True)}
    assert out[0][2]["operation"] == "merge"
    # caught up: nothing more
    assert list(t.iter_changes(t.manifest()["version"])) == []
    # a bulk append inside the tail window raises per the on_bulk contract
    # (review finding: the tailing loop must not silently skip backfills)
    v_pre = t.manifest()["version"]
    t.write(
        spark.createDataFrame([("x1", [1], 1, "s")],
                              "doc_id string, tokens array<int>, n_tok int, source string"),
        mode="append",
    )
    with pytest.raises(ValueError, match="bulk-append"):
        list(t.iter_changes(v_pre))
    assert [v for v, _, _ in t.iter_changes(v_pre, on_bulk="ignore")] == [v_pre + 1]
    # a vacuumed resume point raises the retention error, not FileNotFoundError
    t.merge(_batch(spark, [("k0", [8], 8, "s", "U", 99)]), epoch_id=3, lsn_col="lsn", op_col="op")
    t.vacuum(keep_last_versions=1)
    with pytest.raises(ValueError, match="vacuumed"):
        list(t.iter_changes(v_pre))


def test_changelog_surfaces_evolved_columns(spark, tmp_path):
    """A column added by a later epoch appears in the changelog; rows from
    before the column existed would read as NULL under the evolved schema."""
    t = LakeTable(spark, str(tmp_path / "cl3")).create(DOC_SCHEMA, key_col="doc_id", n_buckets=4)
    t.merge(
        _batch(spark, [("a", [1], 1, "s", "I", 1), ("b", [2], 2, "s", "I", 2)]),
        epoch_id=0, lsn_col="lsn", op_col="op",
    )
    v1 = t.manifest()["version"]
    evolved = spark.createDataFrame(
        [("a", [9], 9, "s", "web", "U", 10)],
        "doc_id string, tokens array<int>, n_tok int, source string, origin string, op string, lsn long",
    )
    t.merge(evolved, epoch_id=1, lsn_col="lsn", op_col="op")
    ch = t.read_changes(v1)
    assert "origin" in ch.columns
    rows = {r.doc_id: r.origin for r in ch.collect()}
    assert rows == {"a": "web"}
