"""Watermarked stream-stream interval join.

Joins two live streams on a key plus an event-time interval condition
(left.ts in [right.ts, right.ts + interval]) — the streaming counterpart of
the batch as-of/range join family (operators/asof.py, operators/range_join.py).
Watermarks on BOTH sides bound the join state: a buffered right row can be
evicted once the left watermark passes right.ts + interval, so state is
O(events per watermark horizon), never O(stream).

Scale shape: both sides hash-partition by key into the stateful join; the
interval condition prunes state inside each key partition. The watermark
horizon (not history) bounds the JOIN's state; end-to-end memory is bounded
only with a distributed sink — ``sink='memory'`` is the test-only
convenience (driver-side collection, per Spark's own docs).

Reference parity: geopetl has no streaming surface; SURVEY §2.7 gap fill.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

__all__ = ["stream_interval_join"]


def stream_interval_join(
    spark: SparkSession,
    left_path: str,
    right_path: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    interval: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "stream_join",
    left_schema=None,
    right_schema=None,
    sink: str | None = None,
):
    """Tail two parquet directories as streams and inner-join them where
    ``left.key == right.key`` and ``left.ts`` falls within
    ``[right.ts, right.ts + interval]``. Right columns come out prefixed
    ``r_``.

    With ``sink=None`` (default) returns the joined STREAMING DataFrame for
    the caller's own production sink (the scale path). ``sink='memory'``
    appends to an in-memory sink named ``query_name`` and returns the
    started query (availableNow trigger) — test-only."""
    if left_schema is None:
        left_schema = spark.read.parquet(left_path).schema
    if right_schema is None:
        right_schema = spark.read.parquet(right_path).schema

    left = (
        spark.readStream.schema(left_schema).parquet(left_path)
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
    )
    right = spark.readStream.schema(right_schema).parquet(right_path).withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    right = right.select([F.col(c).alias(f"r_{c}") for c in right.columns]).withWatermark(
        f"r_{ts_col}", watermark
    )

    cond = (
        (F.col(key_col) == F.col(f"r_{key_col}"))
        & (F.col(ts_col) >= F.col(f"r_{ts_col}"))
        & (F.col(ts_col) <= F.col(f"r_{ts_col}") + F.expr(f"INTERVAL {interval}"))
    )
    joined = left.join(right, cond, "inner")
    if sink is None:
        return joined
    if sink != "memory":
        raise ValueError(f"unknown sink {sink!r} (None|'memory')")
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
