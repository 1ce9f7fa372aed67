"""Connected components over a near-duplicate pair graph — the transitive
grouping stage every dedup pipeline needs between pair generation
(MinHash/SimHash/embedding near-dup) and canonical-document selection:
if A~B and B~C, then {A,B,C} is ONE duplicate cluster even when A~C was
never emitted as a pair.

Algorithm: iterative min-label propagation. Every node starts labeled with
its own id; each round, a node adopts the minimum label among itself and
its neighbors; converges in O(graph diameter) rounds — and near-dup
clusters are shallow (diameter a handful), so rounds stay small even at
100 TB. Each round is ONE edges⋈labels shuffle join + ONE min aggregation,
both key-partitioned; nothing unbounded is ever collected to the driver
(convergence is detected by a one-scalar aggregate: labels only ever
DECREASE, so the label sum strictly falls until the fixpoint).

Two structural decisions that matter at scale:

* **Logical-plan cut per round.** Naively, round k's plan embeds TWO
  copies of round k-1's plan (the neighbor join and the self side), so
  plan size doubles per round and Catalyst analysis goes exponential —
  measured as a hard hang near ~12 rounds. Each round therefore rebases
  the labels on an RDD boundary (``createDataFrame(df.rdd, schema)`` →
  ``LogicalRDD``): plan depth stays O(1) while the RDD lineage (linear,
  recomputable) is retained — unlike ``localCheckpoint``, whose truncated
  lineage would make the result unrecoverable after release.
* **Releasable storage, caller-owned lifetime.** Each round's labels are
  DataFrame-``persist()``-ed (CacheManager-managed) and the previous
  round's persist is dropped once the next is materialized — at most two
  O(nodes) snapshots live. The RETURNED frame is the final persisted
  snapshot: write it out, then ``result.unpersist()`` (after which it is
  still recomputable through the linear RDD chain, merely slow).
  ``tests/test_components.py`` asserts storage is empty after release.

Scale notes: for graphs with huge diameter or giant components the
two-phase large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce and Beyond") converges in O(log n) rounds with the
same join primitive — the ``max_iter`` guard raises before silently
returning partial labels, which is where that upgrade would slot in.
Wall-clock on SMALL inputs is dominated by per-round fixed job cost
(scheduling + tiny shuffles), a constant that amortizes completely at real
graph sizes; AQE coalesces the tiny exchanges at runtime.

Reference parity: geopetl has no graph surface; this fills the dedup
pipeline gap alongside operators/dedup_text.py (SURVEY §2.7 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dup_components", "component_stats"]


def _cut_lineage(df: DataFrame) -> DataFrame:
    """Rebase ``df`` on its own RDD: O(1) logical plan, linear RDD lineage."""
    return df.sparkSession.createDataFrame(df.rdd, df.schema)


def dup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected pair graph with its component id
    (the MINIMUM node id in the component — deterministic and stable under
    pair-order changes). Returns ``(doc_id, component_id)``, persisted —
    see the module docstring's lifetime contract.

    Raises ``RuntimeError`` if the fixpoint is not reached in ``max_iter``
    rounds (possible only for pathological diameter; see module docstring)
    — partial labels are never returned silently.
    """
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).persist()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .persist()
    )

    def label_sum(lbl: DataFrame):
        # labels only decrease -> the sum strictly decreases until fixpoint;
        # decimal(38,0) keeps the scalar exact for any 64-bit id volume
        return lbl.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = label_sum(labels)  # also materializes the persist
    try:
        for _ in range(max_iter):
            neighbor_min = (
                edges.join(labels, edges.dst == labels.node)
                .groupBy("src")
                .agg(F.min("comp").alias("ncomp"))
            )
            new_labels = _cut_lineage(
                labels.join(neighbor_min, labels.node == neighbor_min.src, "left").select(
                    "node",
                    F.least(
                        F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                    ).alias("comp"),
                )
            ).persist()
            cur_sum = label_sum(new_labels)  # materializes this round
            labels.unpersist(False)
            labels = new_labels
            if cur_sum == prev_sum:
                out = labels.select(
                    F.col("node").alias("doc_id"), F.col("comp").alias("component_id")
                )
                # persist the RENAMED frame (unpersist on a projection of a
                # persisted parent is a no-op for the parent) so the handle
                # the caller releases is the one holding the storage
                out = out.persist()
                out.count()
                labels.unpersist(False)
                return out
            prev_sum = cur_sum
        labels.unpersist(False)
        raise RuntimeError(f"dup_components did not converge in {max_iter} rounds")
    finally:
        edges.unpersist(False)


def component_stats(components: DataFrame) -> DataFrame:
    """Per-component accounting: size and canonical (minimum) member —
    the keep-one-per-cluster selection input."""
    return components.groupBy("component_id").agg(
        F.count("*").alias("n_members"),
        F.min("doc_id").alias("canonical_doc_id"),
    )
