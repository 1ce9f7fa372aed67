"""Deterministic synthetic CDC event generator.

The north rule's input is a binlog/WAL tail of change events over a table of
pre-tokenized training sequences (``BASELINE.json`` input_hint:
``doc_id:string, tokens:array<int32>, n_tok:int32, source:string``). The
reference has no generator — its tests load 11-row golden CSVs
(``/root/reference/geopetl/tests/fixtures_data/staging/point.csv``); this is
the scale-up analog: a seeded, fully *distributed* generator (pure column
arithmetic over ``spark.range`` — no driver-side loops, no Python UDFs) so the
same code synthesizes 10^4 events in tests and 10^10 on a cluster.

Planted properties (all deterministic in ``seed``):
* hot-key skew          — ``hot_fraction`` of events hit ``n_hot`` keys;
* out-of-order arrival  — row order is a hash scramble of LSN order;
* duplicate deliveries  — ``dup_fraction`` of events appear twice
                          (at-least-once transport);
* deletes               — ``delete_fraction`` of ops are ``D``;
* schema drift          — from ``drift_epoch`` on, events carry an extra
                          ``quality`` column (additive evolution trigger).

Envelope columns: ``op`` (I/U/D), ``lsn`` (monotone long, unique per change),
``commit_ts``, ``epoch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CDC_COLUMNS = ["op", "lsn", "commit_ts", "epoch", "doc_id", "tokens", "n_tok", "source"]


def generate_cdc_events(
    spark: SparkSession,
    n_events: int,
    n_keys: int = 1000,
    n_hot: int = 5,
    hot_fraction: float = 0.2,
    dup_fraction: float = 0.02,
    delete_fraction: float = 0.05,
    events_per_epoch: int = 10_000,
    max_tokens: int = 64,
    vocab_size: int = 50_000,
    n_sources: int = 20,
    seed: int = 42,
    drift_epoch: int | None = None,
    shuffle_order: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Build the event log as a lazy DataFrame (nothing materializes here)."""
    rng = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)

    lsn = F.col("id")
    h = F.xxhash64(lsn, F.lit(seed))
    h2 = F.xxhash64(lsn, F.lit(seed + 1))
    hu = F.pmod(h, F.lit(10_000))

    hot_cut = int(hot_fraction * 10_000)
    key_id = F.when(hu < hot_cut, F.pmod(h2, F.lit(n_hot))).otherwise(
        F.lit(n_hot) + F.pmod(h2, F.lit(max(n_keys - n_hot, 1)))
    )
    doc_id = F.concat(F.lit("doc-"), F.lpad(key_id.cast("string"), 8, "0"))

    del_cut = int(delete_fraction * 10_000)
    op_sel = F.pmod(F.xxhash64(lsn, F.lit(seed + 2)), F.lit(10_000))
    op = (
        F.when(op_sel < del_cut, F.lit("D"))
        .when(op_sel < del_cut + 3000, F.lit("I"))
        .otherwise(F.lit("U"))
    )

    n_tok = (F.lit(1) + F.pmod(F.xxhash64(lsn, F.lit(seed + 3)), F.lit(max_tokens))).cast("int")
    # tokens derived from (key, lsn, position): JVM-side transform over a
    # sequence — the payload analog of the reference's WKT payloads, kept
    # entirely inside whole-stage codegen.
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.pmod(F.xxhash64(key_id, lsn, i), F.lit(vocab_size)).cast("int"),
    )
    source = F.concat(F.lit("src"), F.pmod(F.xxhash64(key_id, F.lit(seed + 4)), F.lit(n_sources)).cast("string"))
    commit_ts = F.timestamp_seconds(F.lit(1704067200) + (lsn / F.lit(100.0)))  # 2024-01-01 + 10ms/event
    epoch = (lsn / F.lit(events_per_epoch)).cast("long")

    df = rng.select(
        op.alias("op"),
        lsn.alias("lsn"),
        commit_ts.alias("commit_ts"),
        epoch.alias("epoch"),
        doc_id.alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        source.alias("source"),
    )

    if drift_epoch is not None:
        # additive schema drift: a new nullable payload column appears
        # mid-stream; earlier epochs carry NULL.
        quality = F.when(
            F.col("epoch") >= F.lit(drift_epoch),
            (F.pmod(F.xxhash64(F.col("lsn"), F.lit(seed + 5)), F.lit(1000)) / 1000.0).cast("float"),
        )
        df = df.withColumn("quality", quality)

    if dup_fraction > 0:
        # duplicate delivery: re-emit a deterministic subset verbatim
        # (same lsn — exactly what at-least-once transport produces).
        dup_cut = int(dup_fraction * 10_000)
        dupes = df.filter(F.pmod(F.xxhash64(F.col("lsn"), F.lit(seed + 6)), F.lit(10_000)) < dup_cut)
        df = df.unionByName(dupes)

    if shuffle_order:
        # arrival order != LSN order: scramble deterministically.
        df = df.orderBy(F.xxhash64(F.col("lsn"), F.lit(seed + 7)), F.col("lsn"))

    return df


def write_cdc_log(
    spark: SparkSession,
    path: str,
    n_events: int,
    **kwargs,
) -> None:
    """Materialize the event log to parquet, partitioned by epoch so the
    ingest loop's per-epoch reads are partition-pruned scans."""
    df = generate_cdc_events(spark, n_events, **kwargs)
    (
        df.withColumn("_epoch_part", F.col("epoch"))
        .write.mode("overwrite")
        .partitionBy("_epoch_part")
        .parquet(path)
    )
