"""Watermarked stream-stream interval join.

Joins two live streams on a key plus an event-time interval condition
(left.ts in [right.ts, right.ts + interval]) — the streaming counterpart of
the batch as-of/range join family (operators/asof.py, operators/range_join.py).
Watermarks on BOTH sides bound the join state: a buffered right row can be
evicted once the left watermark passes right.ts + interval, so state is
O(events per watermark horizon), never O(stream).

Scale shape: both sides hash-partition by key into the stateful join; the
interval condition prunes state inside each key partition. At 100 TB/day the
watermark horizon (not history) bounds executor memory.

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
):
    """Tail two parquet directories as streams and inner-join them where
    ``left.key == right.key`` and ``left.ts`` falls within
    ``[right.ts, right.ts + interval]``. Right columns come out prefixed
    ``r_``. Appends to an in-memory sink named ``query_name``; returns the
    started query (availableNow trigger)."""
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
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
