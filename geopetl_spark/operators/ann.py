"""Similarity search over embedding columns.

* :func:`cosine_topk` — exact brute-force top-k (the correctness baseline):
  broadcast the (small) query set against the corpus, window top-k. At
  cluster scale the corpus side stays partitioned and never shuffles; only
  the per-partition top-k rows move (the final window input is ≤ k rows per
  query per partition after the partial prune).
* :func:`lsh_bucketed_topk` — the scale path: random-hyperplane LSH buckets
  (deterministic integer hyperplanes, cross-engine reproducible), equi-join
  on bucket, top-k within bucket. Recall < 1 by construction; bucket width
  (``n_bits``) trades recall for candidate count.
* :func:`embedding_near_dup_pairs` — cosine-threshold near-dup pairs.

All vector math is built-in (zip_with/aggregate → codegen); similarities are
rounded to 6dp for cross-engine hash determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arrays import cosine, dot, to_double_array
from ..plans.barriers import opaque
from ..plans.ckpt import materialize


def with_unit_vector(df: DataFrame, vec_col: str, out_col: str = "_unit") -> DataFrame:
    """Precompute the L2-normalized vector ONCE per row, so pairwise cosine
    reduces to a single dot product. The normalization order of operations
    (sequential sum of squares -> sqrt -> per-element divide) is mirrored
    exactly in the SQL oracles, keeping round-6 cross-engine parity."""
    v = to_double_array(F.col(vec_col))
    # opaque() stops CollapseProject from inlining the norm aggregate into
    # the per-element divide (which would make normalization O(dim^2))
    df = df.withColumn("_nrm", opaque(F.sqrt(dot(v, v)), seed=3))
    return df.withColumn(out_col, F.transform(v, lambda x: x / F.col("_nrm"))).drop("_nrm")


def _np_units(df: DataFrame, id_col: str, vec_col: str, out_id: str, out_vec: str) -> DataFrame:
    """(id, unit-vector) via one Arrow-batched numpy pass — bit-identical to
    :func:`with_unit_vector`'s sequential fold (see :func:`_np_unit`), ~100×
    cheaper than the interpreted higher-order-function evaluation. The id
    column keeps its INPUT type (string/UUID ids work, not just integers)."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(out_id, df.schema[id_col].dataType),
            T.StructField(out_vec, T.ArrayType(T.DoubleType())),
        ]
    )

    def go(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            yield pd.DataFrame({out_id: pdf[id_col], out_vec: list(_np_unit(v))})

    return df.mapInPandas(go, schema=out_schema)


def _np_pair_scored(pairs: DataFrame, a_vec: str, b_vec: str, keep: list[str]) -> DataFrame:
    """Exact sequential-fold cosine for joined (unit_a, unit_b) pairs, as a
    vectorized numpy scan. Emits ``keep`` (input types preserved) + rounded
    ``similarity``."""
    from pyspark.sql import types as T

    def go(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            va = np.array([np.asarray(x, dtype=np.float64) for x in pdf[a_vec]])
            vb = np.array([np.asarray(x, dtype=np.float64) for x in pdf[b_vec]])
            out = {c: pdf[c] for c in keep}
            out["_sim"] = _np_seq_dot(va, vb)
            yield pd.DataFrame(out)

    schema = T.StructType(
        [T.StructField(c, pairs.schema[c].dataType) for c in keep]
        + [T.StructField("_sim", T.DoubleType())]
    )
    return pairs.mapInPandas(go, schema=schema).select(
        *keep, F.round(F.col("_sim"), 6).alias("similarity")
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "gemm",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (excludes self-matches).
    Ties break on neighbor id for full determinism.

    ``method='gemm'`` (default, r7 layout): the query set — small by the
    operator's own contract (it was broadcast before) — is collected and
    normalized driver-side, then ONE Arrow pass over the corpus scores each
    batch against every query with the sequential-scan kernel
    (bit-identical to the fold — ``tests/test_text_clean_ivf.py`` proves
    the kernel) and emits only a margin-pruned per-batch top-k
    (:func:`_topk_prune`). The corpus is never joined or replicated per
    query — the r6 shape shipped |corpus|×|queries| vector PAIRS through
    Arrow; now only corpus bytes cross once and O(k·queries) candidate rows
    reach the final window. ``method='fold'`` is the pure-expression
    variant."""
    if method == "gemm":
        import numpy as np
        from pyspark.sql import types as T

        q_rows = queries.select(id_col, vec_col).collect()
        q_ids = [r[id_col] for r in q_rows]
        q_mat = (
            _np_unit(np.array([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows]))
            if q_rows
            else None
        )
        out_schema = T.StructType(
            [
                T.StructField("query_id", queries.schema[id_col].dataType),
                T.StructField("neighbor_id", corpus.schema[id_col].dataType),
                T.StructField("_sim", T.DoubleType()),
            ]
        )

        def scan(batches):
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0 or not q_ids:
                    continue
                u = _np_unit(np.array([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]))
                ids = pdf[id_col].to_numpy()
                out_q, out_n, out_s = [], [], []
                for qi, qid in enumerate(q_ids):
                    sims = _np_seq_dot(u, q_mat[qi][None, :])
                    m = ids != qid
                    pid, psim = _topk_prune(ids[m], sims[m], k)
                    out_q.extend([qid] * len(pid))
                    out_n.extend(pid.tolist())
                    out_s.extend(psim.tolist())
                if out_q:
                    yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "_sim": out_s})

        scored = (
            corpus.select(id_col, vec_col)
            .mapInPandas(scan, schema=out_schema)
            .select("query_id", "neighbor_id", F.round(F.col("_sim"), 6).alias("similarity"))
        )
    else:
        q = with_unit_vector(queries, vec_col).select(
            F.col(id_col).alias("query_id"), F.col("_unit").alias("_qv")
        )
        c = with_unit_vector(corpus, vec_col).select(
            F.col(id_col).alias("neighbor_id"), F.col("_unit").alias("_cv")
        )
        scored = (
            c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.round(dot(F.col("_qv"), F.col("_cv")), 6).alias("similarity"),
            )
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("similarity"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "similarity", "rank")
    )


def _hyperplane_weight(d: int, j: int) -> float:
    """Deterministic integer 'random' hyperplane weight, shared bit-for-bit
    with the SQL oracle (``__spark_entry__._lsh_bucket_sql``):

        k(d, j) = (1103515245*(d + 64*j) + 12345) mod 2^31
        w(d, j) = ((k*k) // 2048) mod 2001 - 1000

    The quadratic mix is what makes planes INDEPENDENT: round 4's affine
    family ``(a*(d + 31*j) + c) mod 2001`` collapses to one arithmetic
    progression mod 2001 (every plane = the same vector plus a per-plane
    constant, modulo wraparound), so tables correlated and multi-table
    recall undershot its model by ~2× in miss rate (measured 0.843 vs
    modeled 0.911 at θ=0.40, BENCH/BASELINE.md). Squaring k breaks the
    affinity in ``d``; measured recall now tracks the independence model
    (0.958 vs 0.955 at 4×18). All ops stay in int64 (k < 2^31, k² < 2^62)
    so DuckDB reproduces them exactly."""
    k = (1103515245 * (d + 64 * j) + 12345) % 2147483648
    return float(((k * k) // 2048) % 2001 - 1000)


def _hyperplane_sign_bits(vec, n_bits: int, dim: int):
    """Bucket id from ``n_bits`` deterministic hyperplanes
    (:func:`_hyperplane_weight`): sum_j sign_bit_j * 2^j."""
    v = to_double_array(vec)
    bucket = F.lit(0).cast("long")
    for j in range(n_bits):
        w_j = F.array(*[F.lit(_hyperplane_weight(d, j)) for d in range(dim)])
        s = dot(v, w_j)
        bucket = bucket + F.when(s > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return bucket


def lsh_bucket(df: DataFrame, n_bits: int, dim: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("bucket", _hyperplane_sign_bits(F.col(vec_col), n_bits, dim))


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "gemm",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.
    At scale only same-bucket pairs are scored — the pair space is never
    enumerated.

    ``method='gemm'`` (default, r7 layout): the small query set is
    collected, normalized, and bucketed driver-side (identical hyperplane
    family and kernels — table 0 of :func:`_multi_table_keyed` IS
    :func:`lsh_bucket`'s plane set), then ONE Arrow pass over the corpus
    buckets each batch, scores rows that share a query's bucket with the
    sequential-scan kernel, and emits a margin-pruned per-batch top-k
    (:func:`_topk_prune`) — no bucket join, no per-pair vector shipping,
    one corpus pass total (the r6 shape ran the keyer pass per side plus a
    pair-scoring pass). ``method='fold'``: pure-expression variant, same
    results."""
    if method == "gemm":
        import numpy as np
        from pyspark.sql import types as T

        q_rows = queries.select(id_col, vec_col).collect()
        q_ids = [r[id_col] for r in q_rows]
        q_buckets = q_mat = None  # empty query set: the scan emits nothing
        if q_rows:
            v_q = np.array([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
            if dim is not None and dim > v_q.shape[1]:
                raise ValueError(
                    f"dim={dim} exceeds vector length {v_q.shape[1]} for LSH bucketing"
                )
            vb_q = v_q if dim is None else v_q[:, :dim]
            W_q = np.array(
                [[_hyperplane_weight(d, j) for d in range(vb_q.shape[1])] for j in range(n_bits)]
            )
            signs_q = np.empty((len(q_rows), n_bits), dtype=bool)
            for j in range(n_bits):
                signs_q[:, j] = _np_seq_dot(vb_q, W_q[j][None, :]) > 0
            q_buckets = (signs_q * (1 << np.arange(n_bits))).sum(axis=1)
            q_mat = _np_unit(v_q)
        out_schema = T.StructType(
            [
                T.StructField("query_id", queries.schema[id_col].dataType),
                T.StructField("neighbor_id", corpus.schema[id_col].dataType),
                T.StructField("_sim", T.DoubleType()),
            ]
        )

        def scan(batches):
            import pandas as pd

            W = None
            for pdf in batches:
                if len(pdf) == 0 or not q_ids:
                    continue
                v = np.array([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
                if dim is not None and dim > v.shape[1]:
                    raise ValueError(
                        f"dim={dim} exceeds vector length {v.shape[1]} for LSH bucketing"
                    )
                vb = v if dim is None else v[:, :dim]
                if W is None:
                    W = np.array(
                        [
                            [_hyperplane_weight(d, j) for d in range(vb.shape[1])]
                            for j in range(n_bits)
                        ]
                    )
                u = _np_unit(v)
                signs = np.empty((len(pdf), n_bits), dtype=bool)
                for j in range(n_bits):
                    signs[:, j] = _np_seq_dot(vb, W[j][None, :]) > 0
                buckets = (signs * (1 << np.arange(n_bits))).sum(axis=1)
                ids = pdf[id_col].to_numpy()
                out_q, out_n, out_s = [], [], []
                for qi, qid in enumerate(q_ids):
                    m = (buckets == q_buckets[qi]) & (ids != qid)
                    if not m.any():
                        continue
                    sims = _np_seq_dot(u[m], q_mat[qi][None, :])
                    pid, psim = _topk_prune(ids[m], sims, k)
                    out_q.extend([qid] * len(pid))
                    out_n.extend(pid.tolist())
                    out_s.extend(psim.tolist())
                if out_q:
                    yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "_sim": out_s})

        scored = (
            corpus.select(id_col, vec_col)
            .mapInPandas(scan, schema=out_schema)
            .select("query_id", "neighbor_id", F.round(F.col("_sim"), 6).alias("similarity"))
        )
    else:
        qb = with_unit_vector(lsh_bucket(queries, n_bits, dim, id_col, vec_col), vec_col).select(
            F.col(id_col).alias("query_id"), F.col("_unit").alias("_qv"), "bucket"
        )
        cb = with_unit_vector(lsh_bucket(corpus, n_bits, dim, id_col, vec_col), vec_col).select(
            F.col(id_col).alias("neighbor_id"), F.col("_unit").alias("_cv"), "bucket"
        )
        scored = (
            cb.join(F.broadcast(qb), ["bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", F.round(dot(F.col("_qv"), F.col("_cv")), 6).alias("similarity"))
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("similarity"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "similarity", "rank")
    )


def _multi_table_keyed(
    df: DataFrame,
    n_bits: int,
    n_tables: int,
    id_col: str,
    vec_col: str,
    dim: int | None = None,
) -> DataFrame:
    """One Arrow-batched pass over the corpus emitting, per row, the
    L2-normalized vector plus ``n_tables`` LSH bucket keys ('t:bucket').

    Table t uses hyperplanes j = t*n_bits .. t*n_bits+n_bits-1 of the shared
    deterministic family (:func:`_hyperplane_sign_bits`), so table 0 is
    byte-compatible with :func:`lsh_bucket` and every table is reproducible
    in the SQL oracle. Buckets hash the RAW (double-cast) vector — the same
    convention as :func:`lsh_bucket` — and all dots are sequential IEEE
    scans (:func:`_np_seq_dot`), bit-identical to the Spark expression fold.

    ``dim`` (optional) pins the hyperplane width like :func:`lsh_bucket`'s
    parameter: with ``dim < len(vector)`` only the first ``dim`` components
    enter the bucket dot (the zip_with truncation semantics of the fold
    path); ``dim > len(vector)`` raises (the fold would yield nulls).
    Default: the vectors' own width. The id column keeps its input type."""
    import numpy as np
    from pyspark.sql import types as T

    def _planes(width: int):
        # hyperplane weights are a pure function of (j, d): any executor (and
        # the SQL oracle) regenerates the identical family for its width
        return np.array(
            [
                [_hyperplane_weight(d, j) for d in range(width)]
                for j in range(n_bits * n_tables)
            ],
            dtype=np.float64,
        )

    out_schema = T.StructType(
        [
            T.StructField("_id", df.schema[id_col].dataType),
            T.StructField("_unit", T.ArrayType(T.DoubleType())),
            T.StructField("_keys", T.ArrayType(T.StringType())),
        ]
    )

    def keyer(batches):
        import pandas as pd

        W = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            if dim is not None and dim > v.shape[1]:
                raise ValueError(
                    f"dim={dim} exceeds vector length {v.shape[1]} for LSH bucketing"
                )
            vb = v if dim is None else v[:, :dim]
            if W is None:
                W = _planes(vb.shape[1])
            u = _np_unit(v)
            signs = np.empty((len(pdf), n_bits * n_tables), dtype=bool)
            for j in range(n_bits * n_tables):
                signs[:, j] = _np_seq_dot(vb, W[j][None, :]) > 0
            keys = []
            for t in range(n_tables):
                b = (signs[:, t * n_bits : (t + 1) * n_bits] * (1 << np.arange(n_bits))).sum(axis=1)
                keys.append(np.char.add(f"{t}:", b.astype(np.int64).astype(str)))
            kmat = np.stack(keys, axis=1)
            yield pd.DataFrame(
                {
                    "_id": pdf[id_col],
                    "_unit": list(u),
                    "_keys": list(kmat),
                }
            )

    return df.mapInPandas(keyer, schema=out_schema)


def lsh_config_for(
    threshold: float,
    recall_target: float = 0.9,
    n_bits: int = 4,
    max_tables: int = 64,
    calibration: float = 2.0,
) -> tuple[int, int, float]:
    """Size the multi-table hyperplane index for a cosine threshold.

    Model: a hyperplane separates two vectors at angle θ with probability
    θ/π, so a pair at exactly ``threshold`` collides in one ``n_bits``-bit
    table with p = (1 - arccos(threshold)/π)^n_bits and is FOUND by at
    least one of T tables with recall = 1 - (1-p)^T. Solving for the
    smallest T meeting the target gives the config; pairs ABOVE the
    threshold collide more often, so the model is a lower bound across the
    qualifying range.

    **Calibration (round-5):** the independence model overestimates this
    engine's family — the hyperplanes are deterministic integer
    pseudo-planes applied to raw non-centered vectors, so collisions
    correlate across tables (measured miss rate ≈ 1.8× the modeled one on
    the sf0.1 benchmark; BENCH/BASELINE.md). The solver therefore sizes
    for a miss rate of ``(1 - recall_target) / calibration`` (default 2 —
    halve the modeled misses), so the DELIVERED recall meets the requested
    target instead of undershooting it by the correlation factor.

    Returns ``(n_bits, n_tables, modeled_recall)`` — modeled_recall is the
    un-calibrated independence-model value for the chosen table count (the
    honest model output, tabulated against measured recall in
    BENCH/BASELINE.md) — and warns if ``max_tables`` caps recall below the
    target (candidate volume grows linearly in T — the cap is the cost
    guard)."""
    import math
    import warnings

    if not -1.0 < threshold < 1.0:
        raise ValueError("threshold must be in (-1, 1)")
    if not 0.0 < recall_target < 1.0:
        raise ValueError("recall_target must be in (0, 1)")
    if calibration < 1.0:
        raise ValueError("calibration must be >= 1 (1 = trust the model)")
    eff_target = 1.0 - (1.0 - recall_target) / calibration
    p_table = (1.0 - math.acos(threshold) / math.pi) ** n_bits
    if p_table <= 0.0:
        need = max_tables + 1
    elif p_table >= 1.0:
        need = 1
    else:
        need = math.ceil(math.log(1.0 - eff_target) / math.log(1.0 - p_table))
    n_tables = max(1, min(need, max_tables))
    recall = 1.0 - (1.0 - p_table) ** n_tables
    if need > max_tables:
        warnings.warn(
            f"LSH recall target {recall_target} at threshold {threshold} needs "
            f"{need} tables; capped at {max_tables} (modeled recall {recall:.3f}). "
            f"Raise max_tables, lower n_bits, or use method='blocked' for an "
            f"exact audit.",
            stacklevel=2,
        )
    return n_bits, n_tables, recall


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    n_blocks: int = 8,
    n_bits: int | None = None,
    n_tables: int | None = None,
    recall_target: float = 0.9,
    lut_threshold_bytes: int = 128 << 20,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold).

    ``method='lsh'`` (default — the 100-TB path): sub-quadratic candidate
    generation, then exact verification of candidates ONLY —

    1. **candidate pass**: every vector is hashed into ``n_tables``
       independent random-hyperplane bucket tables (``n_bits`` bits each,
       deterministic shared hyperplane family); pairs sharing any
       (table, bucket) key become candidates via one bucket **equi-join** —
       the pair space is never enumerated. Work ∝ Σ bucket², bounded by
       the bucket granularity, not n².
    2. **verify pass**: candidates join back to their unit vectors and get
       an exact sequential-fold cosine (Arrow-batched numpy scan,
       bit-identical to the expression fold), rounded to 6dp, thresholded.

    Recall < 1 by construction (a true pair colliding in no table is
    missed). By DEFAULT the index is SIZED FROM THE THRESHOLD: leaving
    ``n_bits``/``n_tables`` unset invokes :func:`lsh_config_for`, which
    solves the (1 - θ/π)^n_bits collision model for the smallest table
    count whose modeled recall meets ``recall_target`` (0.9), and warns
    when the 64-table cost cap forces lower — so an aggressive (low)
    threshold buys more tables instead of silently dropping pairs.
    Measured recall per config is tabulated in ``BENCH/BASELINE.md``.
    Exactness of emitted VALUES is unconditional: only membership is
    approximate; pin both knobs explicitly to freeze a config.

    ``method='blocked'``: exact all-pairs for small corpora / recall audits,
    fully-distributed (no driver materialization, no corpus broadcast) —

    1. **candidate pass**: every vector is hashed into one of ``n_blocks``
       blocks; each unordered block pair (bi ≤ bj) becomes one
       ``applyInPandas`` group holding exactly two blocks of unit vectors,
       multiplied with one numpy BLAS GEMM. A pair of vectors belongs to
       exactly one block pair, so coverage is exact and duplicate-free.
       Pairs with approximate sim ≥ threshold - 1e-6 survive (BLAS summation
       differs from the sequential fold only in final ulps).
    2. **refine pass**: the surviving pairs (tiny) get the exact sequential
       fold, preserving bit-parity with the SQL oracle.

    Scale model: executor memory per task = 2·(n/n_blocks) vectors — raise
    ``n_blocks`` with corpus size (tasks = B(B+1)/2, replication factor = B;
    communication O(n·B) for the inherently O(n²) exact problem, with BLAS
    doing the flops instead of an interpreted fold).

    ``method='fold'``: single-pass expression-only variant (no Python at
    all) — the conservative fallback.
    """
    if method == "lsh":
        from .dedup_text import _small_relation

        if n_bits is None:
            n_bits = 4
        if n_tables is None:
            _, n_tables, _ = lsh_config_for(threshold, recall_target, n_bits)
        # materialize the keyed corpus ONCE (guide §3.3): its consumers
        # below (candidate sides a/b + the verify side) sit behind
        # differently-keyed joins, so without the checkpoint the Arrow
        # normalize+hash pass over the corpus runs 4× (confirmed in the r6
        # physical plan: four MapInPandas nodes over the same scan)
        keyed = materialize(
            _multi_table_keyed(df, n_bits, n_tables, id_col, vec_col), "ann_keyed"
        )
        kx = keyed.select("_id", F.explode("_keys").alias("_tb"))
        ka, kb = kx.alias("ka"), kx.alias("kb")
        raw_pairs = (
            ka.join(kb, (F.col("ka._tb") == F.col("kb._tb")) & (F.col("ka._id") < F.col("kb._id")))
            .select(F.col("ka._id").alias("id_a"), F.col("kb._id").alias("id_b"))
        )
        if _small_relation(df, lut_threshold_bytes):
            # Small-corpus pair path (r7): group the exploded index by
            # (table, bucket) and generate + score + threshold-filter each
            # bucket's pairs INSIDE one vectorized kernel — the candidate
            # slots (Σ bucket², sf0.1: 4.5M for 2,000 vectors under the
            # frozen 4-bit/18-table family) never exist as rows, never
            # cross a join, and never ship through Arrow; only survivors
            # (~900) leave the kernel, so the cross-table dedup distinct
            # is trivial. Values are exact: the same cumsum kernel per
            # pair; the kernel keeps raw sims ≥ threshold − 1e-6 (2× the
            # max 6-dp rounding perturbation) and the exact rounded filter
            # below decides membership, so the emitted set is identical to
            # the join-verify path's. Gated by the same plan-stats probe
            # as the dedup broadcast hints: per-task memory is bounded by
            # the largest bucket, which the gate caps at the corpus size;
            # above the gate — the 100-TB case — the equi-join + pair
            # verify below keeps the work spread across the cluster.
            import numpy as np
            from pyspark.sql import types as T

            margin = 1e-6
            exploded = keyed.select("_id", "_unit", F.explode("_keys").alias("_tb"))
            schema = T.StructType(
                [
                    T.StructField("id_a", keyed.schema["_id"].dataType),
                    T.StructField("id_b", keyed.schema["_id"].dataType),
                    T.StructField("_sim", T.DoubleType()),
                ]
            )

            def bucket_pairs(pdf):
                import pandas as pd

                if len(pdf) < 2:
                    return pd.DataFrame(columns=["id_a", "id_b", "_sim"])
                ids = pdf["_id"].to_numpy()
                order = np.argsort(ids, kind="stable")
                ids = ids[order]
                mat = np.array([np.asarray(x, dtype=np.float64) for x in pdf["_unit"]])[order]
                ii, jj = np.triu_indices(len(ids), k=1)
                out_a, out_b, out_s = [], [], []
                step = 1 << 20  # bound the cumsum intermediate to ~0.5 GB
                for s in range(0, len(ii), step):
                    isl, jsl = ii[s : s + step], jj[s : s + step]
                    sims = _np_seq_dot(mat[isl], mat[jsl])
                    m = sims >= threshold - margin
                    if m.any():
                        out_a.append(ids[isl[m]])
                        out_b.append(ids[jsl[m]])
                        out_s.append(sims[m])
                if not out_a:
                    return pd.DataFrame(columns=["id_a", "id_b", "_sim"])
                return pd.DataFrame(
                    {
                        "id_a": np.concatenate(out_a),
                        "id_b": np.concatenate(out_b),
                        "_sim": np.concatenate(out_s),
                    }
                )

            return (
                exploded.groupBy("_tb")
                .applyInPandas(bucket_pairs, schema=schema)
                .select("id_a", "id_b", F.round(F.col("_sim"), 6).alias("similarity"))
                .distinct()
                .filter(F.col("similarity") >= threshold)
            )
        candidates = raw_pairs.distinct()
        ua = keyed.select(F.col("_id").alias("id_a"), F.col("_unit").alias("_va"))
        ub = keyed.select(F.col("_id").alias("id_b"), F.col("_unit").alias("_vb"))
        pairs = candidates.join(ua, "id_a").join(ub, "id_b")
        return _np_pair_scored(pairs, "_va", "_vb", ["id_a", "id_b"]).filter(
            F.col("similarity") >= threshold
        )

    u = with_unit_vector(df, vec_col)
    if method == "fold":
        a = u.select(F.col(id_col).alias("id_a"), F.col("_unit").alias("_va"))
        b = u.select(F.col(id_col).alias("id_b"), F.col("_unit").alias("_vb"))
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            # opaque() keeps the similarity fold out of the join condition:
            # without it the threshold filter is pushed into the nested-loop
            # join and the fold runs for every candidate pair, twice
            .select("id_a", "id_b", F.round(opaque(dot(F.col("_va"), F.col("_vb"))), 6).alias("similarity"))
            .filter(F.col("similarity") >= threshold)
        )

    import numpy as np
    from pyspark.sql import types as T

    # the blocked GEMM kernel runs ids through int64 numpy arrays — loud
    # precondition instead of mangled UUIDs (lsh/fold preserve any id type)
    if not isinstance(
        df.schema[id_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    ):
        raise ValueError(
            f"method='blocked' requires an integer id column; {id_col} is "
            f"{df.schema[id_col].dataType.simpleString()} (use method='lsh' or 'fold')"
        )

    spark = df.sparkSession
    margin = 1e-6
    block_pairs = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)], "bi int, bj int"
    )
    ub = u.select(F.col(id_col).cast("long").alias("_id"), "_unit").withColumn(
        "_blk", F.pmod(F.xxhash64(F.col("_id").cast("string")), F.lit(n_blocks)).cast("int")
    )
    # each vector is replicated to every block pair its block participates in
    # (tiny broadcast side; the OR condition compiles to a nested-loop join
    # against the B(B+1)/2-row literal table)
    rep = ub.join(
        F.broadcast(block_pairs), (F.col("_blk") == F.col("bi")) | (F.col("_blk") == F.col("bj"))
    )

    def gemm(pdf):
        import pandas as pd

        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        left = pdf[pdf["_blk"] == bi]
        ids_l = left["_id"].to_numpy()
        mat_l = np.array(list(left["_unit"]), dtype=np.float64)
        out_a, out_b = [], []
        if bi == bj:
            if len(ids_l) >= 2:
                sims = mat_l @ mat_l.T
                ii, jj = np.nonzero(np.triu(sims >= threshold - margin, k=1))
                a, b = ids_l[ii], ids_l[jj]
                out_a, out_b = np.minimum(a, b), np.maximum(a, b)
        else:
            right = pdf[pdf["_blk"] == bj]
            ids_r = right["_id"].to_numpy()
            if len(ids_l) and len(ids_r):
                mat_r = np.array(list(right["_unit"]), dtype=np.float64)
                sims = mat_l @ mat_r.T
                ii, jj = np.nonzero(sims >= threshold - margin)
                a, b = ids_l[ii], ids_r[jj]
                keep = a != b
                out_a, out_b = np.minimum(a[keep], b[keep]), np.maximum(a[keep], b[keep])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    cand = rep.groupBy("bi", "bj").applyInPandas(gemm, schema="id_a long, id_b long")
    ua = u.select(F.col(id_col).cast("long").alias("id_a"), F.col("_unit").alias("_va"))
    vb = u.select(F.col(id_col).cast("long").alias("id_b"), F.col("_unit").alias("_vb"))
    return (
        cand.join(ua, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(opaque(dot(F.col("_va"), F.col("_vb"))), 6).alias("similarity"))
        .filter(F.col("similarity") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: the centroid-partitioned scale path
# ---------------------------------------------------------------------------

def ivf_centroid_array(
    corpus: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """One-row LITERAL DataFrame holding the centroid table as a sorted
    ``array<struct<cid, u>>`` of unit vectors — the build-once artifact of
    the IVF index (eager: runs one TakeOrdered job of ``n_centroids`` rows).

    Centroid choice is deliberately *training-free and deterministic* — the
    ``n_centroids`` corpus rows with the smallest ids (a seeded-sample
    stand-in, cross-engine reproducible). At scale you'd swap in offline
    k-means centroids; :func:`ivf_assign`/:func:`ivf_topk` below are
    agnostic to where the centroid rows came from. Normalization happens
    driver-side over the k collected rows with the cumsum scan
    (:func:`_np_unit`) — bit-identical to the Spark expression fold, so the
    literal is byte-compatible with the previous in-plan construction."""
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).cast("long").alias("cid"), F.col(vec_col).alias("_cv"))
        .orderBy("cid")
        .limit(n_centroids)
        .collect()
    )
    mat = np.array([np.asarray(r["_cv"], dtype=np.float64) for r in rows])
    units = _np_unit(mat) if len(rows) else mat
    lit = [(int(r["cid"]), [float(x) for x in u]) for r, u in zip(rows, units)]
    return corpus.sparkSession.createDataFrame(
        [(lit,)], "_centroids array<struct<cid:bigint,u:array<double>>>"
    )


# unit-vector quantization scale for the k-means trainer: floor(u*1e9+0.5)
# per component. |q| <= 1e9, so INT64 cluster sums stay exact up to ~9.2e9
# member rows — far beyond any training sample; integer sums make the
# reduce order-free and the whole trainer SQL-replayable.
_IVF_QUANT = 1e9


def _centroid_sims(unit_col, centroids_col):
    """array<struct<s, negcid>> of rounded cosine sims against every
    centroid. negcid makes array_max/array_sort break similarity ties toward
    the SMALLEST centroid id (struct comparison is lexicographic)."""
    return F.transform(
        centroids_col,
        lambda c: F.struct(
            F.round(dot(unit_col, c["u"]), 6).alias("s"), (-c["cid"]).alias("negcid")
        ),
    )


def _np_unit(mat):
    """L2-normalize rows BIT-IDENTICALLY to with_unit_vector's sequential
    fold: numpy's cumsum is a left-to-right IEEE scan, so
    cumsum(v*v)[-1] == aggregate(zip_with(v,v,*), 0.0, +) exactly (0.0 + x0
    is exactly x0; every subsequent add is the same op in the same order)."""
    import numpy as np

    nrm = np.sqrt(np.cumsum(mat * mat, axis=1)[:, -1])
    return mat / nrm[:, None]


def _np_seq_dot(a, b):
    """Row-wise dot via sequential scan — bit-identical to the Spark fold
    (``functions.arrays.dot``), unlike np.dot/@ which use pairwise/BLAS
    summation orders."""
    import numpy as np

    return np.cumsum(a * b, axis=1)[:, -1]


def _topk_prune(ids, sims, k, margin=2e-6):
    """Per-batch candidate prune for a global (round6(sim) desc, id asc)
    top-k: keep every row whose RAW sim is within ``margin`` of the batch's
    k-th largest raw sim. Safe under the later 6-dp rounding: a dropped row
    has ≥ k same-batch rows whose raw sim exceeds it by > margin > 2× the
    max rounding perturbation (5e-7), so those k rows' ROUNDED sims are
    strictly greater and the dropped row can never reach the global top-k
    under any id tiebreak — the emitted top-k set is exactly the unpruned
    one. This is what lets the scan emit O(k) rows per (query, batch)
    instead of shipping every scored pair to the window."""
    if len(ids) > k:
        import numpy as np

        kth = np.partition(sims, len(sims) - k)[len(sims) - k]
        keep = sims >= kth - margin
        return ids[keep], sims[keep]
    return ids, sims


def _assignment_expr(censims_col, cids: list[int]):
    """argmax over the per-centroid sim array with (round6 desc, cid asc)
    ties — the same discipline as the expression path, evaluated over 8
    scalars per row (cheap) instead of 8 interpreted vector folds."""
    zipped = F.arrays_zip(censims_col.alias("s"), F.array(*[F.lit(int(c)).cast("long") for c in cids]).alias("cid"))
    best = F.array_max(
        F.transform(zipped, lambda e: F.struct(F.round(e["s"], 6).alias("s"), (-e["cid"]).alias("negcid")))
    )
    return (-best["negcid"]).cast("long")


def ivf_train_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    driver_threshold_bytes: int = 128 << 20,
) -> DataFrame:
    """Offline spherical k-means training for the IVF index — the
    quality upgrade over :func:`ivf_centroid_array`'s smallest-id seeding
    (whose docstring reserves exactly this slot).

    Shape per Lloyd iteration (the 100-TB-honest layout):

    * **assign + partial sums, ONE Arrow pass**: every corpus partition
      assigns its vectors to the nearest current centroid (same cumsum
      kernels as :func:`ivf_assign` — bit-identical dots) and emits one
      (centroid, count, sum-vector) row PER BATCH — the map-side combine.
      The corpus never shuffles.
    * **driver reduce over k·n_batches tiny rows.**

    Cross-engine exactness (round 6 — the ``embed_ivf_trained`` oracle):
    each row's unit vector is quantized per component to a scaled INT64
    (``floor(u*1e9 + 0.5)``) before summation, so cluster partial sums are
    exact integers — associative, commutative, independent of Arrow batch
    boundaries and reduce order — and a SQL engine summing the identical
    per-row integers reproduces the centroids bit-for-bit (the unquantized
    kernels — sequential-fold norm and dot — already match DuckDB's
    ``list_dot_product``, proven by the hash-green cosine queries; the
    assignment comparator uses the same ``floor(s*1e6 + 0.5)`` rule both
    sides). New centroid = mean of quantized units, L2-renormalized
    (spherical k-means). Empty clusters keep their previous centroid.

    Returns the same one-row literal shape as :func:`ivf_centroid_array`
    (``cid`` = 0..k-1), directly usable as ``ivf_topk(centroids=...)``.
    Iteration count is fixed (``n_iter``) rather than threshold-based —
    deterministic wall-clock and output.

    **Small-corpus fast path (r7):** when Catalyst's plan-size estimate says
    the training corpus fits comfortably on the driver (the same
    plan-stats/file-size probe the dedup broadcast hints use, threshold
    ``driver_threshold_bytes``), the vectors are collected ONCE and all
    ``n_iter`` Lloyd iterations run locally — replacing ``n_iter``
    sequential (Arrow scan + collect) job pairs with one job. The INT64
    quantization makes the two paths exactly equal (integer cluster sums
    are order-free, and every float op is the identical numpy kernel in the
    identical sequence), asserted by
    ``tests/test_text_clean_ivf.py::test_trainer_driver_and_distributed_agree``.
    Training corpora above the threshold — the 100-TB case — keep the
    distributed map-side-combine layout unchanged."""
    import numpy as np
    from pyspark.sql import types as T

    from .dedup_text import _small_relation

    seed_rows = (
        corpus.select(F.col(id_col).cast("long").alias("cid"), F.col(vec_col).alias("_cv"))
        .orderBy("cid")
        .limit(n_centroids)
        .collect()
    )
    if not seed_rows:
        raise ValueError("cannot train centroids on an empty corpus")
    cmat = _np_unit(np.array([np.asarray(r["_cv"], dtype=np.float64) for r in seed_rows]))

    if _small_relation(corpus, driver_threshold_bytes):
        rows = corpus.select(F.col(vec_col).alias("_v")).collect()
        u = _np_unit(np.array([np.asarray(r["_v"], dtype=np.float64) for r in rows]))
        q = np.floor(u * _IVF_QUANT + 0.5).astype(np.int64)
        for _ in range(n_iter):
            sims = np.empty((len(u), len(cmat)), dtype=np.float64)
            for j in range(len(cmat)):
                sims[:, j] = _np_seq_dot(u, cmat[j][None, :])
            # same quantized comparator as the distributed partials below:
            # argmax of floor(s*1e6+0.5), first max -> smallest centroid id
            assign = np.argmax(np.floor(sims * 1e6 + 0.5), axis=1)
            new = cmat.copy()
            for c in np.unique(assign):
                mask = assign == c
                # exact INT64 cluster sum — identical to the distributed
                # reduce over per-batch partials (integer addition is
                # order-free), then the same (sum/n)/SCALE op order
                new[c] = (q[mask].sum(axis=0).astype(np.float64) / int(mask.sum())) / _IVF_QUANT
            cmat = _np_unit(new)
        lit = [(int(c), [float(x) for x in cmat[c]]) for c in range(len(cmat))]
        return corpus.sparkSession.createDataFrame(
            [(lit,)], "_centroids array<struct<cid:bigint,u:array<double>>>"
        )

    out_schema = T.StructType(
        [
            T.StructField("_cid", T.IntegerType()),
            T.StructField("_n", T.LongType()),
            T.StructField("_sum", T.ArrayType(T.LongType())),
        ]
    )

    for _ in range(n_iter):
        planes = cmat  # closure snapshot for this iteration

        def partials(batches, planes=planes):
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = np.array([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
                u = _np_unit(v)
                sims = np.empty((len(pdf), len(planes)), dtype=np.float64)
                for j in range(len(planes)):
                    sims[:, j] = _np_seq_dot(u, planes[j][None, :])
                # quantized comparator (floor(s*1e6+0.5) desc, cid asc) —
                # round-half-up on BOTH engines, no half-even ambiguity;
                # argmax returns the FIRST max -> smallest centroid id
                assign = np.argmax(np.floor(sims * 1e6 + 0.5), axis=1)
                # per-component round-half-up INT64 quantization of the unit
                # vector: cluster sums become exact integers — associative,
                # commutative, invariant to Arrow batch layout and reduce
                # order, and replayable by any SQL engine
                q = np.floor(u * _IVF_QUANT + 0.5).astype(np.int64)
                rows = []
                for cid in np.unique(assign):
                    mask = assign == cid
                    rows.append((int(cid), int(mask.sum()), [int(x) for x in q[mask].sum(axis=0)]))
                yield pd.DataFrame(rows, columns=["_cid", "_n", "_sum"])

        parts = corpus.mapInPandas(partials, schema=out_schema).collect()
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for r in parts:  # integer sums: order-free
            c = int(r["_cid"])
            vec = np.asarray(r["_sum"], dtype=np.int64)
            sums[c] = sums.get(c, 0) + vec
            counts[c] = counts.get(c, 0) + int(r["_n"])
        new = cmat.copy()
        for c, s in sums.items():
            if counts[c] > 0:
                # fixed op order (sum/n)/SCALE, mirrored verbatim in the
                # DuckDB oracle (__spark_entry__._ivf_trained_oracle_sql)
                new[c] = (s.astype(np.float64) / counts[c]) / _IVF_QUANT
        cmat = _np_unit(new)

    lit = [(int(c), [float(x) for x in cmat[c]]) for c in range(len(cmat))]
    return corpus.sparkSession.createDataFrame(
        [(lit,)], "_centroids array<struct<cid:bigint,u:array<double>>>"
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "gemm",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (max cosine, ties
    to the smallest cid) — the IVF list build. Output = corpus columns +
    ``_unit`` (the L2-normalized vector) + ``centroid_id``.

    ``method='gemm'`` (default): Arrow-batched numpy kernel. Spark's
    higher-order functions (aggregate/zip_with lambdas) are CodegenFallback —
    interpreted, ~0.25 ms per 64-dim dot — so the 8-dots-per-row assignment
    is 100× cheaper as a vectorized numpy scan. The scan uses cumsum
    (sequential IEEE adds), which reproduces the Spark fold BIT-FOR-BIT, so
    cross-engine parity is exact, not approximate. The centroid table (k
    rows) ships in the UDF closure — the one deliberate driver materialization,
    bounded by n_centroids, never by the corpus.

    ``method='fold'``: pure-expression variant (one broadcast array row +
    array_max fold) — zero Python, corpus partitioning untouched; right when
    Python workers are unavailable. Same results.
    """
    if method == "fold":
        out = corpus.crossJoin(F.broadcast(centroids))
        u = with_unit_vector(out, vec_col)
        best = F.array_max(_centroid_sims(F.col("_unit"), F.col("_centroids")))
        return u.withColumn("centroid_id", (-best["negcid"]).cast("long")).drop("_centroids")
    if method != "gemm":
        raise ValueError(f"unknown method {method!r} (gemm|fold)")

    import numpy as np
    from pyspark.sql import types as T

    cen_rows = centroids.collect()[0]["_centroids"]  # k rows, Spark-exact unit vecs
    cids = [int(r["cid"]) for r in cen_rows]
    cmat = np.array([list(r["u"]) for r in cen_rows], dtype=np.float64)

    out_schema = T.StructType(
        list(corpus.schema.fields)
        + [
            T.StructField("_unit", T.ArrayType(T.DoubleType())),
            T.StructField("_censims", T.ArrayType(T.DoubleType())),
        ]
    )

    def score_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            u = _np_unit(v)
            sims = np.empty((len(pdf), len(cids)), dtype=np.float64)
            for j in range(len(cids)):
                sims[:, j] = _np_seq_dot(u, cmat[j][None, :])
            pdf = pdf.copy()
            pdf["_unit"] = list(u)
            pdf["_censims"] = list(sims)
            yield pdf

    scored = corpus.mapInPandas(score_batches, schema=out_schema)
    # round/tie semantics stay in Spark expressions (exact parity with the
    # fold path and the SQL oracles)
    return scored.withColumn("centroid_id", _assignment_expr(F.col("_censims"), cids)).drop("_censims")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "gemm",
    centroids: DataFrame | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: score a query only against the inverted lists
    of its ``nprobe`` nearest centroids.

    The search is a centroid_id equi-join (corpus side hash-partitioned by
    centroid at scale; skewed lists handled by AQE), never a cross join.
    Recall < 1 by construction, rising with ``nprobe``; candidates scored
    per query ≈ corpus · nprobe / n_centroids. ``method='gemm'`` runs the
    candidate scoring as a vectorized numpy scan (bit-identical to the fold —
    see :func:`ivf_assign`); ``method='fold'`` stays pure-expression.

    The centroid table and the assigned corpus ARE the IVF index — build
    them once, search many times (real IVF never re-partitions the corpus
    per query). Pass ``centroids`` (a :func:`ivf_centroid_array`-shaped
    one-row frame; ``n_centroids`` is then ignored) to skip the centroid
    build, and ``assigned`` (the output of :func:`ivf_assign` on the same
    corpus + centroids, typically persisted or written to the lake) to skip
    the assignment pass too — the call then runs ONLY the probe equi-join
    search."""
    if centroids is None:
        centroids = ivf_centroid_array(corpus, n_centroids, id_col, vec_col)
    cen = centroids
    if assigned is None:
        assigned = ivf_assign(corpus, cen, id_col, vec_col, method=method)
    c = assigned.select(
        F.col(id_col).cast("long").alias("neighbor_id"), F.col("_unit").alias("_cv"), "centroid_id"
    )
    q = with_unit_vector(queries.crossJoin(F.broadcast(cen)), vec_col)
    # top-nprobe probe lists per query: sort sims asc, reverse -> (s desc,
    # cid asc) — the same tie discipline as assignment. Queries are few;
    # the expression path is fine here.
    probes = F.slice(F.reverse(F.array_sort(_centroid_sims(F.col("_unit"), F.col("_centroids")))), 1, nprobe)
    qp = (
        q.withColumn("_p", F.explode(probes))
        .select(
            F.col(id_col).cast("long").alias("query_id"),
            F.col("_unit").alias("_qv"),
            (-F.col("_p")["negcid"]).cast("long").alias("centroid_id"),
        )
    )
    if method == "gemm":
        # r7 layout: the probe table (queries × nprobe — small by the same
        # contract that let it be broadcast before) is collected, and ONE
        # Arrow pass over the persisted index scores each batch's rows
        # whose inverted list a query probes — the r6 shape materialized
        # the (candidate × both-vectors) join through Arrow; now only the
        # index crosses once and a margin-pruned per-batch top-k
        # (:func:`_topk_prune`) reaches the window. The probe-list
        # computation itself stays in Spark expressions (exact round/tie
        # parity with the fold path and the SQL oracles).
        import numpy as np

        probes: dict = {}
        for r in qp.collect():
            ent = probes.setdefault(
                int(r["query_id"]), (np.asarray(r["_qv"], dtype=np.float64), [])
            )
            ent[1].append(int(r["centroid_id"]))

        def scan(batches):
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0 or not probes:
                    continue
                mat = np.array([np.asarray(x, dtype=np.float64) for x in pdf["_cv"]])
                ids = pdf["neighbor_id"].to_numpy()
                cents = pdf["centroid_id"].to_numpy()
                out_q, out_n, out_s = [], [], []
                for qid, (qv, cids) in probes.items():
                    m = np.isin(cents, cids) & (ids != qid)
                    if not m.any():
                        continue
                    sims = _np_seq_dot(mat[m], qv[None, :])
                    pid, psim = _topk_prune(ids[m], sims, k)
                    out_q.extend([qid] * len(pid))
                    out_n.extend(pid.tolist())
                    out_s.extend(psim.tolist())
                if out_q:
                    yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "_sim": out_s})

        scored = c.mapInPandas(
            scan, schema="query_id long, neighbor_id long, _sim double"
        ).select("query_id", "neighbor_id", F.round(F.col("_sim"), 6).alias("similarity"))
    else:
        pairs = c.join(F.broadcast(qp), ["centroid_id"]).filter(
            F.col("query_id") != F.col("neighbor_id")
        )
        scored = pairs.select(
            "query_id", "neighbor_id", F.round(dot(F.col("_qv"), F.col("_cv")), 6).alias("similarity")
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("similarity"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "similarity", "rank")
    )


def ivf_config_for(
    queries: DataFrame,
    corpus: DataFrame,
    recall_target: float = 0.9,
    k: int = 5,
    n_centroids: int | None = None,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trained: bool = True,
) -> tuple[int, int, float, DataFrame]:
    """Size the IVF index for a recall target — the :func:`lsh_config_for`
    twin for the centroid path. LSH admits a closed-form collision model;
    IVF recall depends entirely on how the data clusters, so this solver
    CALIBRATES instead of modeling: it builds the index once on the given
    (sample) corpus, computes the exact top-``k`` ground truth for the
    query sample, and derives the full recall-vs-nprobe curve from a
    single pass — for every true (query, neighbor) pair, the rank of the
    neighbor's cell in the query's centroid ordering is the smallest
    ``nprobe`` that finds it. The returned ``nprobe`` is the smallest with
    empirical recall ≥ target; probing all cells is exhaustive search, so
    the solver always terminates with a config that meets any target < 1.

    Scale shape: ground truth is brute-force over the SAMPLE the caller
    passes (calibrate on a bounded sample, serve the full corpus — the
    curve is a property of the data distribution, not the corpus size);
    the curve itself reduces to ≤ ``n_centroids`` histogram rows. The
    centroid table is returned so serving reuses the calibrated index
    instead of retraining.

    ``n_centroids`` defaults to ~√corpus_count (the standard IVF cell
    heuristic: balances cell count against cell size), clamped to [2, 256].

    Returns ``(n_centroids, nprobe, measured_recall, centroids)``.
    """
    if not 0.0 < recall_target < 1.0:
        raise ValueError("recall_target must be in (0, 1)")
    if n_centroids is None:
        import math

        n_centroids = max(2, min(256, int(round(math.sqrt(corpus.count())))))
    if trained:
        cen = ivf_train_centroids(corpus, n_centroids, n_iter, id_col, vec_col)
    else:
        cen = ivf_centroid_array(corpus, n_centroids, id_col, vec_col)

    truth = cosine_topk(queries, corpus, k=k, id_col=id_col, vec_col=vec_col).select(
        "query_id", "neighbor_id"
    )
    cells = ivf_assign(corpus, cen, id_col, vec_col).select(
        F.col(id_col).cast("long").alias("neighbor_id"), "centroid_id"
    )
    # rank of every cell in each query's probe order (sim desc, cid asc —
    # the exact ivf_topk probe discipline), via one posexplode
    qp = with_unit_vector(queries.crossJoin(F.broadcast(cen)), vec_col).select(
        F.col(id_col).cast("long").alias("query_id"),
        F.posexplode(
            F.reverse(F.array_sort(_centroid_sims(F.col("_unit"), F.col("_centroids"))))
        ).alias("_pos", "_p"),
    ).select(
        "query_id",
        (-F.col("_p")["negcid"]).cast("long").alias("centroid_id"),
        (F.col("_pos") + 1).alias("_needed_nprobe"),
    )
    hist = (
        truth.join(cells, "neighbor_id")
        .join(qp, ["query_id", "centroid_id"])
        .groupBy("_needed_nprobe")
        .count()
        .collect()  # bounded: <= n_centroids rows
    )
    total = sum(r["count"] for r in hist)
    if total == 0:
        raise ValueError("no ground-truth pairs: query/corpus sample too small for calibration")
    cum = 0
    by_rank = {int(r["_needed_nprobe"]): int(r["count"]) for r in hist}
    nprobe, recall = n_centroids, 1.0
    for n in range(1, n_centroids + 1):
        cum += by_rank.get(n, 0)
        if cum / total >= recall_target:
            nprobe, recall = n, cum / total
            break
    return n_centroids, nprobe, recall, cen
