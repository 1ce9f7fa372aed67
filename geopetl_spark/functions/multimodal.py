"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing) is real and tested; the codec step itself is
STUBBED — image/audio libraries are not in this container, so
``decode_image`` understands only the engine's deterministic FAKE container
format (below) and raises ``NotImplementedError`` for real codecs. Swapping
in Pillow/torchaudio later changes only the marked inner function.

FAKE container format (deterministic, produced by :func:`make_fake_image`):
  magic b'FIMG' | width:uint16 BE | height:uint16 BE | payload bytes
                  (pixel i = payload[i % len(payload)])

geopetl parity: binary payloads map to the reference's LOB columns
(BLOB/CLOB handling via output type handler, /root/reference/geopetl/
oracle_sde.py:1114-1129, LOB-last ordering oracle_sde.py:861-865); the
"decode in Arrow batches, never per-row" rule is the north rule's
no-per-row-Python applied to media.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_MAGIC = b"FIMG"

_MAGIC_MIME = {
    b"FIMG": "image/x-fake",
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"GIF8": "image/gif",
}


def make_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic fake image blob for tests/benchmarks."""
    payload = bytes((seed * 31 + i * 7) % 256 for i in range(min(width * height, 256)))
    return FAKE_MAGIC + struct.pack(">HH", width, height) + payload


def attach_blob_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Typed metadata columns from the binary payload — pure column
    expressions (size, magic sniff → mime), no Python."""
    b = F.col(blob_col)
    mime = F.lit("application/octet-stream")
    for magic, m in _MAGIC_MIME.items():
        hexs = magic.hex()
        mime = F.when(F.hex(F.substring(b, 1, len(magic))) == hexs.upper(), F.lit(m)).otherwise(mime)
    return df.withColumn("blob_size", F.length(b).cast("long")).withColumn("blob_mime", mime)


def _decode_fake(blob: bytes) -> tuple[int, int, float]:
    """THE STUB BOUNDARY: replace this with a real codec (Pillow etc.).
    Returns (width, height, mean_pixel)."""
    if blob is None or len(blob) < 8 or blob[:4] != FAKE_MAGIC:
        raise NotImplementedError(
            "real image codecs are not available in this container; "
            "only the FIMG fake container is decodable"
        )
    w, h = struct.unpack(">HH", blob[4:8])
    payload = blob[8:]
    mean = (sum(payload) / len(payload)) if payload else 0.0
    return w, h, mean


DECODE_SCHEMA = "id long, width int, height int, mean_pixel double, decode_error string"


def decode_images(df: DataFrame, blob_col: str = "blob", id_col: str = "id") -> DataFrame:
    """Arrow-batched decode via mapInPandas: one pandas batch in, one typed
    metadata batch out. Errors are captured per row (a poisoned blob must
    not kill the partition — the 100 TB rule)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "width": [], "height": [], "mean_pixel": [], "decode_error": []}
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    w, h, m = _decode_fake(bytes(blob) if blob is not None else None)
                    out["id"].append(i); out["width"].append(w)
                    out["height"].append(h); out["mean_pixel"].append(m)
                    out["decode_error"].append(None)
                except NotImplementedError as e:
                    out["id"].append(i); out["width"].append(None)
                    out["height"].append(None); out["mean_pixel"].append(None)
                    out["decode_error"].append(str(e)[:80])
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(run, schema=DECODE_SCHEMA)


def resize_stub(df: DataFrame, target_w: int, target_h: int, blob_col: str = "blob", id_col: str = "id") -> DataFrame:
    """Resize plumbing: re-encodes the fake container at the target size
    (a real implementation swaps the inner transform only)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for blob in pdf[blob_col]:
                try:
                    _w, _h, m = _decode_fake(bytes(blob) if blob is not None else None)
                    blobs.append(make_fake_image(target_w, target_h, seed=int(m)))
                except NotImplementedError:
                    blobs.append(None)
            yield pd.DataFrame({"id": pdf[id_col], "blob": blobs})

    return df.select(id_col, blob_col).mapInPandas(run, schema="id long, blob binary")


def frame_sample_stub(df: DataFrame, every_n: int = 10, blob_col: str = "blob", id_col: str = "id") -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled 'frame'
    (1:N row fan-out through mapInPandas — the shape a real decoder needs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, offs = [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    w, h, _ = _decode_fake(bytes(blob) if blob is not None else None)
                    n_frames = max((len(bytes(blob)) - 8) // max(every_n, 1), 1)
                    for f in range(n_frames):
                        ids.append(i); frames.append(f); offs.append(8 + f * every_n)
                except NotImplementedError:
                    continue
            yield pd.DataFrame({"id": ids, "frame_no": frames, "byte_offset": offs})

    return df.select(id_col, blob_col).mapInPandas(run, schema="id long, frame_no int, byte_offset long")
