"""Stream-stream interval join matches the equivalent batch join."""

import sys

sys.path.insert(0, ".")
from pyspark.sql import functions as F  # noqa: E402

from geopetl_spark.streaming.stream_join import stream_interval_join  # noqa: E402


def test_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks_dir = str(tmp_path / "clicks")
    purch_dir = str(tmp_path / "purchases")
    ev.filter("event_type = 'click'").write.mode("overwrite").parquet(clicks_dir)
    ev.filter("event_type = 'purchase'").write.mode("overwrite").parquet(purch_dir)

    q = stream_interval_join(
        spark, purch_dir, clicks_dir,
        key_col="user_id", ts_col="ts",
        interval="1 hour", watermark="24 hours",
        query_name="sj_test", sink="memory",
    )
    q.awaitTermination()
    got = spark.table("sj_test").select("event_id", "r_event_id")
    stream_pairs = {(r.event_id, r.r_event_id) for r in got.collect()}

    p = spark.read.parquet(purch_dir)
    c = spark.read.parquet(clicks_dir).select([F.col(x).alias(f"r_{x}") for x in ev.columns])
    batch = p.join(
        c,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("ts") >= F.col("r_ts"))
        & (F.col("ts") <= F.col("r_ts") + F.expr("INTERVAL 1 hour")),
    )
    batch_pairs = {(r.event_id, r.r_event_id) for r in batch.select("event_id", "r_event_id").collect()}
    assert stream_pairs == batch_pairs
    assert len(stream_pairs) > 0
