"""Range / interval join as a binned equi-join.

The reference expresses range predicates only as SQL pushed into the source
(``where=`` kwarg, ``/root/reference/geopetl/postgis.py:54-79``); joining a
point column against an interval table has no reference operator, so this is
a gap-fill (SURVEY §2.7). The naive Spark plan for

    left JOIN right ON left.v >= right.lo AND left.v < right.hi

is a BroadcastNestedLoopJoin (or worse, a cartesian product) — O(|L|·|R|)
comparisons, the classic 100-TB killer. This operator rewrites it as an
equi-join on a bin key:

* every right interval is exploded to the bin ids it overlaps
  (``sequence(floor(lo/w), floor(hi/w))``),
* every left point gets its single bin id (``floor(v/w)``),
* the join is a plain hash/sort-merge equi-join on ``bin``,
* the exact predicate is re-applied as a post-join filter (the extra bin a
  closed ``floor(hi/w)`` end may add is filtered here, so bin arithmetic
  never affects correctness).

Cost: |R| · (avg interval width / bin_width) exploded rows, then a shuffled
equi-join — linear, partitionable, AQE-skew-handled. Choose ``bin_width``
near the typical interval width; a point matches via exactly one bin, so the
left side is never duplicated by binning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` points to ``right`` intervals with
    ``lo <= value < hi`` semantics via a bin equi-join.

    ``how`` may be ``inner`` or ``left`` (unmatched left points kept with
    NULL right columns). Overlapping intervals each produce a match row,
    exactly like the raw theta join would.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r} (inner|left)")
    w = float(bin_width)

    binned_right = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
            )
        ),
    )
    binned_left = left.withColumn("__bin", F.floor(F.col(value_col) / F.lit(w)).cast("long"))

    exact = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    if how == "inner":
        out = binned_left.join(binned_right, on="__bin", how="inner").where(exact)
        return out.drop("__bin")

    # left join: equi-join + exact predicate inside the join condition so
    # unmatched points survive with NULLs (a post-join filter would drop them).
    lhs = binned_left.alias("l")
    rhs = binned_right.alias("r")
    cond = (F.col("l.__bin") == F.col("r.__bin")) & (
        (F.col(f"l.{value_col}") >= F.col(f"r.{lo_col}"))
        & (F.col(f"l.{value_col}") < F.col(f"r.{hi_col}"))
    )
    out = lhs.join(rhs, cond, "left")
    return out.select([F.col(f"l.{c}") for c in left.columns] + [F.col(f"r.{c}") for c in right.columns])
