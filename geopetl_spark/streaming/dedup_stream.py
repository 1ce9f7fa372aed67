"""Streaming exact deduplication with bounded state.

The batch engine dedups replayed/duplicated change events with a hash
groupBy (``operators/dedup_cdc.py``); a live tail needs the same guarantee
without unbounded key state. ``dropDuplicatesWithinWatermark`` keeps each key
only until the event-time watermark passes it, so state size is
O(keys per watermark horizon) — the standard at-least-once source →
exactly-once pipeline repair (duplicate deliveries land within the
redelivery window, i.e. inside the watermark).

Scale shape: dedup state is hash-partitioned by key across executors; the
only shuffle is the one keyed exchange into the stateful operator. The
watermark horizon (not the corpus size) bounds the OPERATOR's state; total
memory is then bounded only if the caller attaches a distributed sink —
the built-in ``sink='memory'`` convenience collects all output on the
driver and is test-only (per Spark's own docs).

Reference parity: geopetl has no streaming surface; this fills SURVEY §2.7's
streaming gap alongside stream_ingest/stateful_sessionize.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

__all__ = ["dedup_stream"]


def dedup_stream(
    spark: SparkSession,
    path: str,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
    schema=None,
    query_name: str = "dedup_stream",
    max_files_per_trigger: int = 1,
    sink: str | None = None,
):
    """Tail ``path`` as a stream and drop duplicate ``keys`` arriving within
    the ``watermark`` horizon.

    With ``sink=None`` (default) returns the transformed STREAMING DataFrame
    — the caller attaches its own production sink (``writeStream`` to
    parquet/kafka, or ``foreachBatch``), which is the 100-TB path: output
    flows executor-side, never through the driver. ``sink='memory'`` starts
    an in-memory append sink named ``query_name`` and returns the started
    query (availableNow trigger) — TEST-ONLY, since the memory sink collects
    all output on the driver."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    deduped = (
        src.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )
    if sink is None:
        return deduped
    if sink != "memory":
        raise ValueError(f"unknown sink {sink!r} (None|'memory')")
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
