"""Resumable changelog subscriber: the --follow tail owns a durable
consumer cursor (``lake/cursor.py``) advanced atomically per emitted
commit, so a killed tail resumes where it left off and emits each version
exactly once across the kill (commit-after-process discipline).

Parity note: the reference re-extracts full tables every run
(``geopetl/postgis.py:54-129``) and has no subscriber state; the cursor is
the piece that turns the engine's incremental changelog into a resumable
subscription.
"""

import json
import sys

import pytest

sys.path.insert(0, ".")
from geopetl_spark import LakeTable, run  # noqa: E402
from geopetl_spark.lake.cursor import ConsumerCursor  # noqa: E402
from tests.test_cdc_engine import DOC_SCHEMA  # noqa: E402
from tests.test_zone_maps import _batch  # noqa: E402


@pytest.fixture()
def tailed_table(spark, tmp_path):
    """A table with 4 merge commits past its creation version."""
    t = LakeTable(spark, str(tmp_path / "lake")).create(
        DOC_SCHEMA, key_col="doc_id", n_buckets=4
    )
    for e in range(4):
        t.merge(
            _batch(spark, [(f"k{e}", [e], e, "s", "I", e + 1)]),
            epoch_id=e, lsn_col="lsn", op_col="op",
        )
    return t


def _follow(t, tmp_path, *extra):
    argv = [
        "--log", str(tmp_path / "log"),
        "--table", t.path,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--follow", "0",
        *extra,
    ]
    return run.main(argv)["commits"]


def test_kill_resume_emits_each_version_exactly_once(tailed_table, tmp_path):
    cur = str(tmp_path / "cursor.json")
    # consumer dies after 2 commits (deterministic kill: --max-commits)
    first = _follow(tailed_table, tmp_path, "--cursor", cur, "--max-commits", "2")
    # resume: the cursor wins over the (stale) --follow 0 seed
    second = _follow(tailed_table, tmp_path, "--cursor", cur)
    emitted = [r["version"] for r in first + second]
    assert emitted == sorted(set(emitted)), "a version was re-emitted or reordered"
    assert len(first) == 2
    # union covers the full tail exactly once
    uncursored = _follow(tailed_table, tmp_path)
    assert emitted == [r["version"] for r in uncursored]
    # caught up: a third run emits nothing, cursor unchanged
    assert _follow(tailed_table, tmp_path, "--cursor", cur) == []
    assert ConsumerCursor(cur).load() == emitted[-1]


def test_cursor_seeds_from_follow_version_when_missing(tailed_table, tmp_path):
    cur = str(tmp_path / "cursor.json")
    out = _follow(tailed_table, tmp_path, "--cursor", cur)
    assert len(out) == 4
    assert ConsumerCursor(cur).load() == out[-1]["version"]


def test_cursor_survives_new_commits_between_runs(tailed_table, tmp_path, spark):
    cur = str(tmp_path / "cursor.json")
    _follow(tailed_table, tmp_path, "--cursor", cur)
    tailed_table.merge(
        _batch(spark, [("k9", [9], 9, "s", "I", 99)]),
        epoch_id=9, lsn_col="lsn", op_col="op",
    )
    out = _follow(tailed_table, tmp_path, "--cursor", cur)
    assert [r["version"] for r in out] == [tailed_table.manifest()["version"]]


def test_cursor_is_monotone_and_rejects_torn_state(tmp_path):
    c = ConsumerCursor(str(tmp_path / "c.json"))
    assert c.load() is None
    c.advance(5)
    c.advance(3)  # stale advance: no-op
    assert c.load() == 5
    with open(c.path, "w") as f:
        f.write("{not json")
    with pytest.raises(ValueError, match="unreadable consumer cursor"):
        c.load()
    c.advance(7)  # advance overwrites torn state with good state
    assert c.load() == 7


def test_torn_cursor_fails_follow_loudly(tailed_table, tmp_path):
    cur = str(tmp_path / "cursor.json")
    with open(cur, "w") as f:
        f.write("garbage")
    with pytest.raises(ValueError, match="unreadable consumer cursor"):
        _follow(tailed_table, tmp_path, "--cursor", cur)
