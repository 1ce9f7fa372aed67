"""Trained-vs-seeded IVF recall against the exact cosine_topk ground truth
— the BENCH/BASELINE.md IVF recall rows (round-4 judge directive #3).

Usage: python tools/measure_ivf_recall.py [--sf-dir /root/testdata/sf0.1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--n-centroids", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from geopetl_spark.operators import ann
    from geopetl_spark.session import get_spark

    spark = get_spark(app_name="ivf-recall")
    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in ann.cosine_topk(q, emb, k=args.k).collect()
    }

    def recall(cen) -> float:
        got = {
            (r.query_id, r.neighbor_id)
            for r in ann.ivf_topk(
                q, emb, k=args.k, nprobe=args.nprobe, centroids=cen
            ).collect()
        }
        return len(got & truth) / len(truth)

    t0 = time.perf_counter()
    seeded = ann.ivf_centroid_array(emb, args.n_centroids)
    r_seed = recall(seeded)
    t_seed = time.perf_counter() - t0
    t0 = time.perf_counter()
    trained = ann.ivf_train_centroids(emb, n_centroids=args.n_centroids, n_iter=5)
    r_train = recall(trained)
    t_train = time.perf_counter() - t0
    print(
        f"k={args.k} nprobe={args.nprobe}/{args.n_centroids} "
        f"truth_pairs={len(truth)} seeded_recall={r_seed:.3f} ({t_seed:.1f}s) "
        f"trained_recall={r_train:.3f} ({t_train:.1f}s incl. 5 Lloyd iters)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
