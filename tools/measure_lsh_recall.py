"""Measure delivered LSH near-dup recall vs the exact blocked audit on the
sf0.1 embeddings — the BENCH/BASELINE.md recall table. Run after any change
to `lsh_config_for` or the hyperplane family.

Usage: python tools/measure_lsh_recall.py [--sf-dir /root/testdata/sf0.1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--thresholds", default="0.4,0.6")
    args = ap.parse_args()

    from geopetl_spark.operators import ann
    from geopetl_spark.session import get_spark

    spark = get_spark(app_name="lsh-recall")
    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
    for thr in [float(t) for t in args.thresholds.split(",")]:
        nb, nt, modeled = ann.lsh_config_for(thr)
        exact = {
            (r.id_a, r.id_b)
            for r in ann.embedding_near_dup_pairs(emb, threshold=thr, method="blocked").collect()
        }
        t0 = time.perf_counter()
        got = {
            (r.id_a, r.id_b)
            for r in ann.embedding_near_dup_pairs(emb, threshold=thr).collect()
        }
        wall = time.perf_counter() - t0
        recall = len(got & exact) / len(exact) if exact else 1.0
        assert got <= exact, "LSH emitted a pair the exact audit did not (values must be exact)"
        print(
            f"threshold={thr:.2f} config={nb}x{nt} modeled={modeled:.3f} "
            f"exact_pairs={len(exact)} lsh_pairs={len(got)} "
            f"measured_recall={recall:.3f} lsh_wall={wall:.1f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
