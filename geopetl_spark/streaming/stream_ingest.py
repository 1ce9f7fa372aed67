"""Structured Streaming front-end for the CDC ingest engine.

The batch epoch loop (:mod:`geopetl_spark.streaming.pipeline`) is the
engine's native driver because the sandbox's change log is a static parquet
directory; this module is the ``readStream`` adapter for a live tail:
``readStream`` over the log directory → ``foreachBatch`` → the SAME
:func:`apply_epoch` body. Exactly-once composes from Spark's streaming
checkpoint (offset tracking) × the sink's epoch-keyed idempotent commits —
a foreachBatch retry of batch N hits the committed-epoch check and becomes
a no-op, exactly like a crash-replay in the batch loop.

Also here: event-time windowed aggregation with watermarked late-data
handling (:func:`windowed_counts_stream`) — the streaming counterpart of the
batch ``tumbling_window_counts`` query in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.table import LakeTable
from .lineage import LineageLog
from .pipeline import IngestConfig, apply_epoch


def stream_ingest(
    spark: SparkSession,
    cfg: IngestConfig,
    schema=None,
    max_files_per_trigger: int = 8,
    await_all: bool = True,
):
    """Tail the change log as a stream and apply each micro-batch through
    the engine's MERGE path. Returns the (stopped, if await_all) query."""
    table = LakeTable(spark, cfg.table_path)
    lineage_log = LineageLog(cfg.checkpoint_path)
    if schema is None:
        schema = spark.read.parquet(cfg.log_path).schema

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(cfg.log_path)
    )
    if "_epoch_part" in [f.name for f in schema.fields]:
        src = src.drop("_epoch_part")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # epoch id = Spark's micro-batch id: stable across foreachBatch
        # retries, which is exactly what the idempotent sink keys on
        apply_epoch(spark, cfg, table, batch_df, epoch=f"stream-{batch_id}", lineage_log=lineage_log)

    q = (
        src.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", f"{cfg.checkpoint_path}/stream")
        .trigger(availableNow=True)
        .start()
    )
    if await_all:
        q.awaitTermination()
    return q


def windowed_counts_stream(
    spark: SparkSession,
    path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    schema=None,
):
    """Watermarked tumbling-window counts over a streamed source: late rows
    beyond the watermark are dropped, on-time updates accumulate. Returns a
    started query writing to an in-memory sink named 'windowed_counts'."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    # FileStreamSource requires a directory; a single-file path becomes
    # parent dir + glob filter
    import os

    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    src = reader.parquet(path)
    agg = (
        src.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("windowed_counts")
        .trigger(availableNow=True)
        .start()
    )
