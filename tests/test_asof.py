"""As-of join operator tests (planted-data truth table)."""

import datetime as dt

from geopetl_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 12:00:00")),
            (3, "u2", _ts("2024-01-01 09:00:00")),  # before any right row
            (4, "u3", _ts("2024-01-01 10:00:00")),  # key with no right rows
        ],
        "lid long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), 100),
            ("u1", _ts("2024-01-01 11:00:00"), 200),
            ("u1", _ts("2024-01-01 13:00:00"), 300),  # after every left row
            ("u2", _ts("2024-01-01 09:00:00"), 400),  # exact tie -> inclusive
        ],
        "user string, rts timestamp, rv int",
    )
    out = {
        r["lid"]: r["rv_asof"]
        for r in asof_join(left, right, key="user", left_ts="ts", right_ts="rts").collect()
    }
    assert out == {1: 100, 2: 200, 3: 400, 4: None}


def test_asof_join_tie_is_deterministic(spark):
    """Two right rows with identical (key, ts): the struct tiebreak in the
    carry window must pick a stable winner (the struct-max row) on every run
    and partitioning."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 12:00:00"))], "lid long, user string, ts timestamp"
    )
    dup_rows = [("u1", _ts("2024-01-01 10:00:00"), v) for v in (7, 3, 9, 1)]
    for _ in range(3):  # shuffled input orders must not change the winner
        right = spark.createDataFrame(dup_rows, "user string, rts timestamp, rv int").repartition(4)
        out = asof_join(left, right, key="user", left_ts="ts", right_ts="rts").collect()
        assert out[0]["rv_asof"] == 9  # max struct = deterministic winner


def test_asof_join_carries_whole_row_on_nulls(spark):
    """A NULL column in the most recent right row must NOT be backfilled from
    an older right row — all carried values come from one row (true ASOF)."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 12:00:00"))], "lid long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"), 1, 2),
            ("u1", _ts("2024-01-01 11:00:00"), None, 3),  # latest row: a is NULL
        ],
        "user string, rts timestamp, a int, b int",
    )
    row = asof_join(left, right, key="user", left_ts="ts", right_ts="rts").collect()[0]
    assert row["a_asof"] is None and row["b_asof"] == 3


def test_asof_join_preserves_left_rowcount(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = ev.filter("event_type = 'purchase'").select("event_id", "user_id", "ts")
    clicks = ev.filter("event_type = 'click'").select("user_id", "ts", "value")
    out = asof_join(purchases, clicks, key="user_id", left_ts="ts", right_ts="ts")
    assert out.count() == purchases.count()
    assert set(out.columns) == {"event_id", "user_id", "ts", "value_asof"}
