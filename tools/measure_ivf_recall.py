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


def autoconfig() -> None:
    """Round-6 auto-config row: on PLANTED-CLUSTER vectors (where IVF
    structure exists) `ivf_config_for` must deliver measured recall ≥ the
    requested target with the nprobe it solves for.

    Usage: python tools/measure_ivf_recall.py autoconfig [target ...]
    """
    import numpy as np

    from pyspark.sql import functions as F

    from geopetl_spark.operators import ann
    from geopetl_spark.session import get_spark

    spark = get_spark(app_name="ivf-autoconfig")
    rng = np.random.default_rng(7)
    bases = rng.normal(size=(24, 64))
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    rows = []
    vid = 0
    for b in bases:
        for _ in range(80):
            v = b + 0.45 * rng.normal(size=64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    # calibrate on one query per cluster, MEASURE on a disjoint held-out set
    q_cal = corpus.filter(F.col("vec_id") % 80 == 0)
    q_held = corpus.filter(F.col("vec_id") % 80 == 40)
    targets = [float(t) for t in (sys.argv[2:] or ["0.8", "0.9", "0.95"])]
    print(
        f"planted corpus: {corpus.count()} vecs, 24 overlapping clusters (jitter 0.45), "
        f"{q_cal.count()} calibration + {q_held.count()} held-out queries, k=5"
    )
    for target in targets:
        t0 = time.perf_counter()
        n_cen, nprobe, cal_recall, cen = ann.ivf_config_for(
            q_cal, corpus, recall_target=target, k=5, n_centroids=24
        )
        t_cal = time.perf_counter() - t0
        truth = {(r.query_id, r.neighbor_id) for r in ann.cosine_topk(q_held, corpus, k=5).collect()}
        got = {
            (r.query_id, r.neighbor_id)
            for r in ann.ivf_topk(q_held, corpus, k=5, nprobe=nprobe, centroids=cen).collect()
        }
        measured = len(got & truth) / len(truth)
        ok = "OK " if measured >= target else "MISS"
        print(
            f"{ok} target={target:.2f} -> nprobe={nprobe}/{n_cen} "
            f"calibrated={cal_recall:.3f} measured={measured:.3f} ({t_cal:.1f}s calibration)"
        )
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "autoconfig":
        autoconfig()
    else:
        main()
