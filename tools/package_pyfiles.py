"""Build the --py-files artifact for cluster submission:

    python tools/package_pyfiles.py          # -> dist/geopetl_spark.zip
    spark-submit --py-files dist/geopetl_spark.zip -m geopetl_spark.run ...

Zips the package sources (plus the shipped BPE merges table) with
deterministic entry ordering and zeroed timestamps, so rebuilding an
unchanged tree produces a byte-identical artifact (reproducible deploys).
"""

import os
import sys
import zipfile


def build(out_path: str = "dist/geopetl_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "geopetl_spark")
    os.makedirs(os.path.dirname(os.path.join(root, out_path)), exist_ok=True)
    out = os.path.join(root, out_path)
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".py", ".json")):
                full = os.path.join(dirpath, fn)
                entries.append((full, os.path.relpath(full, root)))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                zf.writestr(info, fh.read(), zipfile.ZIP_DEFLATED)
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else "dist/geopetl_spark.zip")
    print(path)
