"""Per-epoch, per-partition lineage records + throughput metrics.

Reference analogs: the ``etl_read_timestamp`` audit column
(``/root/reference/geopetl/oracle_sde.py:1187-1188``) and the
``times_db_called`` frugality counter (``oracle_sde.py:1111-1112``). The
north rule requires real lineage: every micro-batch emits per-partition
source offsets (min/max LSN), row counts, and the commit snapshot id.

Lineage is computed with one distributed aggregation over the batch
(``groupBy(spark_partition_id())``) — the rows returned are O(partitions),
not O(data).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_lineage(
    batch: DataFrame, lsn_col: str = "lsn", invalid_pred=None
) -> list[dict]:
    """Per-input-partition offsets and counts for one micro-batch. When
    ``invalid_pred`` is given, poison-row counts ride the same aggregation —
    data-quality accounting costs zero extra jobs."""
    aggs = [
        F.count("*").alias("rows"),
        F.min(lsn_col).alias("min_lsn"),
        F.max(lsn_col).alias("max_lsn"),
    ]
    if invalid_pred is not None:
        aggs.append(F.sum(F.when(invalid_pred, 1).otherwise(0)).alias("invalid_rows"))
    rows = batch.groupBy(F.spark_partition_id().alias("partition_id")).agg(*aggs).collect()
    return [r.asDict() for r in rows]


class LineageLog:
    """Append-only JSONL lineage log next to the checkpoint.

    ``partitions`` record format: on the normal ingest path the epoch's
    offsets/counts are observed as a side-effect of the dedup scan
    (``Observation`` — zero extra jobs) which cannot attribute rows to input
    partitions, so the epoch carries ONE aggregate record with the sentinel
    ``partition_id = -1``. Per-partition granularity (``partition_id >= 0``,
    one record per input partition from :func:`partition_lineage`) appears
    on paths that run the dedicated lineage scan (e.g. re-apply of an
    already-committed epoch). Consumers must branch on the sentinel."""

    def __init__(self, path: str):
        self.path = path
        self.file = os.path.join(path, "lineage.jsonl")

    def record(
        self,
        epoch: int,
        partitions: list[dict],
        commit_summary: dict,
        snapshot_id: str | None,
        started_at: float,
        finished_at: float | None = None,
    ) -> dict:
        finished_at = finished_at or time.time()
        n_rows = sum(p["rows"] for p in partitions)
        elapsed = max(finished_at - started_at, 1e-9)
        entry = {
            "epoch": epoch,
            "rows": n_rows,
            "events_per_sec": n_rows / elapsed,
            "elapsed_sec": elapsed,
            "partitions": partitions,
            "commit": commit_summary,
            "snapshot_id": snapshot_id,
            "started_at": started_at,
            "finished_at": finished_at,
        }
        os.makedirs(self.path, exist_ok=True)
        # single-writer append; rewrite-free and crash-tolerant (a torn last
        # line is ignored by read())
        with open(self.file, "a") as fh:
            fh.write(json.dumps(entry) + "\n")
        return entry

    def read(self) -> list[dict]:
        if not os.path.exists(self.file):
            return []
        out = []
        with open(self.file) as fh:
            for line in fh:
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    break
        return out


def read_lineage(spark, checkpoint_path: str):
    """The lineage log as a DataFrame (observability surface): one row per
    epoch with rows, events/sec, commit summary, snapshot id."""
    log = LineageLog(checkpoint_path)
    entries = log.read()
    if not entries:
        raise ValueError(f"no lineage at {checkpoint_path}")
    flat = [
        {
            "epoch": str(e["epoch"]),
            "rows": e["rows"],
            "events_per_sec": e["events_per_sec"],
            "elapsed_sec": e["elapsed_sec"],
            "snapshot_id": e.get("snapshot_id"),
            "n_partitions": len(e.get("partitions", [])),
            "min_lsn": min((p["min_lsn"] for p in e.get("partitions", []) if p.get("min_lsn") is not None), default=None),
            "max_lsn": max((p["max_lsn"] for p in e.get("partitions", []) if p.get("max_lsn") is not None), default=None),
            "rows_quarantined": (e.get("commit") or {}).get("rows_quarantined", 0),
        }
        for e in entries
    ]
    return spark.createDataFrame(flat)
