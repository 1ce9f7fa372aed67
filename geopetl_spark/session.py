"""SparkSession factory for the engine.

Replaces the reference's per-connection session setup (geopetl sets
``ALTER SESSION SET NLS_DATE_FORMAT ...`` on every Oracle connection,
``/root/reference/geopetl/oracle_sde.py:319-321``, and ``NLS_LANG`` env at
:119) with one well-configured SparkSession: UTC session timezone, Arrow
enabled for all pandas interchange, AQE with skew-join handling on, and a
shuffle-partition count sized to the actual parallelism rather than the
200 default.

All knobs here are cluster-size-relative so the same code runs on
``local[8]`` and on a 1000-executor cluster: shuffle partitions default to
``2 * defaultParallelism`` (a common production heuristic), and AQE
coalesces them back down at runtime when the data is small.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "geopetl_spark"


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    in the sandbox; on a real cluster, pass ``None`` with a spark-submit
    supplied master.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"

    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)

    n_threads = _master_threads(master)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * n_threads, 8)

    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.sql.parquet.compression.codec": "snappy",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _master_threads(master: str) -> int:
    """Parse thread count out of a local[N] master string; 32 fallback."""
    if master and master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 32
        try:
            return int(inner)
        except ValueError:
            return 32
    return 32
