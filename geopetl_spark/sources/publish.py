"""External-publish sink: the ``tocarto`` analog (S7 tail).

The reference's ``tocarto`` (``/root/reference/geopetl/carto.py:7-38``)
reprojects to a canonical SRID, renames the payload column to the service's
expected name, dumps a CSV to a temp file, and hands it to the service's
FileImportJob. The engine analog keeps every step except the network call:

1. canonicalize the payload (sanitize + ``V{n};`` tag — the reproject-to-4326
   + rename analog);
2. dump ONE csv file (coalesced, header) with a deterministic name;
3. hand the file to a ``publisher`` callable — the external service
   boundary. With no publisher the sink stops after the dump and returns
   the upload manifest it WOULD have sent (dry-run).

Two publisher implementations SHIP with the engine so the injected path is
a real code path, not just a seam: :func:`file_publisher` (delivery into an
upload directory + receipt — the FileImportJob analog for a mounted drop
zone) and :func:`http_publisher` (HTTP POST of the CSV bytes with the
manifest in headers — the networked analog, exercised in tests against a
local server). No default publisher is WIRED because no external service
exists in this environment; the boundary stays explicit.
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


def file_publisher(target_dir: str) -> Callable[[str, dict], dict]:
    """Shipped publisher #1: deliver the CSV into an upload directory and
    write a ``<name>.receipt.json`` next to it (the FileImportJob analog
    for a mounted drop zone). Delivery is atomic (temp file + rename) and
    verified: the receipt records the copied file's sha256, recomputed on
    the TARGET side, so a torn copy can't produce a valid receipt."""

    def publish(path: str, manifest: dict) -> dict:
        import json

        os.makedirs(target_dir, exist_ok=True)
        dest = os.path.join(target_dir, os.path.basename(path))
        tmp = dest + ".uploading"
        shutil.copyfile(path, tmp)
        os.replace(tmp, dest)
        h = hashlib.sha256()
        with open(dest, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
        delivered_sha = h.hexdigest()
        if delivered_sha != manifest["sha256"]:
            raise IOError(f"delivery corrupted: {delivered_sha} != {manifest['sha256']}")
        receipt = {
            "delivered_to": dest,
            "bytes": os.path.getsize(dest),
            "sha256": delivered_sha,
            "source_manifest": manifest,
        }
        with open(os.path.join(target_dir, f"{manifest['name']}.receipt.json"), "w") as fh:
            json.dump(receipt, fh)
        return receipt

    return publish


def http_publisher(url: str, timeout: float = 30.0) -> Callable[[str, dict], dict]:
    """Shipped publisher #2: POST the CSV bytes to ``url`` with the manifest
    riding in headers (``X-Publish-Name`` / ``X-Publish-Sha256``), the
    networked FileImportJob analog. Raises on any non-2xx status, so a
    failed upload fails the publish step loudly."""

    def publish(path: str, manifest: dict) -> dict:
        import urllib.request

        with open(path, "rb") as fh:
            body = fh.read()
        req = urllib.request.Request(
            url,
            data=body,
            method="POST",
            headers={
                "Content-Type": "text/csv",
                "X-Publish-Name": manifest["name"],
                "X-Publish-Sha256": manifest["sha256"],
            },
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return {
                "status": resp.status,
                "response": resp.read().decode("utf-8", "replace"),
                "bytes_sent": len(body),
            }

    return publish
