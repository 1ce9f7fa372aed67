"""External-publish sink: the ``tocarto`` analog (S7 tail).

The reference's ``tocarto`` (``/root/reference/geopetl/carto.py:7-38``)
reprojects to a canonical SRID, renames the payload column to the service's
expected name, dumps a CSV to a temp file, and hands it to the service's
FileImportJob. The engine analog keeps every step except the network call:

1. canonicalize the payload (sanitize + ``V{n};`` tag — the reproject-to-4326
   + rename analog);
2. dump ONE csv file (coalesced, header) with a deterministic name;
3. hand the file to a caller-supplied ``publisher`` callable — the external
   service boundary. With no publisher the sink stops after the dump and
   returns the upload manifest it WOULD have sent (dry-run), because no
   external service exists in this environment; the boundary is explicit
   rather than faked.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame

from ..transforms import sanitize_tokens, tag_payload


def publish_csv(
    df: DataFrame,
    out_dir: str,
    name: str,
    tokens_col: str = "tokens",
    payload_name: str = "the_payload",
    payload_version: int = 1,
    publisher: Callable[[str, dict], dict] | None = None,
) -> dict:
    """Dump ``df`` as one canonical CSV and (optionally) publish it.

    ≈ ``tocarto``: payload canonicalization (``carto.py:12-20``), temp CSV
    dump (``carto.py:24-27``), FileImportJob upload (``carto.py:29-36``) —
    the upload step is the injected ``publisher(path, manifest)``.
    """
    out = df
    if tokens_col in df.columns:
        out = sanitize_tokens(out, tokens_col=tokens_col)
        out = tag_payload(out, tokens_col, version=payload_version, out_col=payload_name)
        out = out.drop(tokens_col)
    tmp = os.path.join(out_dir, f"_{name}_csv_tmp")
    # one file: the external service ingests a single CSV (carto.py:24-27);
    # coalesce(1) is the deliberate final-mile funnel, not a scale path
    out.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    final = os.path.join(out_dir, f"{name}.csv")
    os.replace(part, final)
    shutil.rmtree(tmp, ignore_errors=True)

    h = hashlib.sha256()
    with open(final, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    manifest = {
        "name": name,
        "path": final,
        "bytes": os.path.getsize(final),
        "sha256": h.hexdigest(),
        "published": False,
    }
    if publisher is not None:
        result = publisher(final, dict(manifest))
        manifest["published"] = True
        manifest["publish_result"] = result
    return manifest
