from .checkpoint import Checkpoint
from .dedup_stream import dedup_stream
from .lineage import LineageLog, partition_lineage, read_lineage
from .pipeline import EpochResult, IngestConfig, apply_epoch, read_epoch, run_ingest
from .stateful import stateful_sessionize
from .stream_join import stream_interval_join
from .stream_ingest import stream_ingest, windowed_counts_stream

__all__ = [
    "Checkpoint", "LineageLog", "partition_lineage", "read_lineage",
    "EpochResult", "IngestConfig", "apply_epoch", "read_epoch", "run_ingest",
    "dedup_stream", "stateful_sessionize", "stream_ingest", "stream_interval_join",
    "windowed_counts_stream",
]
