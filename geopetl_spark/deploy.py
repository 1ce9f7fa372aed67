"""Cluster deployment helper: package the engine for spark-submit.

The north rule's deployment mode is ``spark-submit --py-files`` on a
multi-executor cluster. :func:`make_pyfiles_zip` builds the archive;
the job entry point is ``geopetl_spark/run.py``:

    python -m geopetl_spark.deploy --out geopetl_spark.zip
    spark-submit --master <cluster> --py-files geopetl_spark.zip \\
        run.py --log hdfs://.../cdc_log --table hdfs://.../lake \\
        --checkpoint hdfs://.../ckpt

Note the lake's one portability seam (lake/table.py): manifest publication
uses POSIX rename; on an object store, point the table path at a fuse mount
or swap ``LakeTable._publish`` for a metastore CAS.
"""

from __future__ import annotations

import argparse
import os
import zipfile


def make_pyfiles_zip(out_path: str, package_dir: str | None = None) -> str:
    """Zip the geopetl_spark package for --py-files distribution."""
    if package_dir is None:
        package_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(package_dir)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(package_dir):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for name in filenames:
                if name.endswith(".py"):
                    full = os.path.join(dirpath, name)
                    zf.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="geopetl_spark.zip")
    args = p.parse_args()
    print(make_pyfiles_zip(args.out))
