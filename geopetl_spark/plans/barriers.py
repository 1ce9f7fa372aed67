"""Plan-shaping helpers: controlled *non*-optimization.

Catalyst's PushDownPredicates and CollapseProject are nearly always right;
two places in this engine they are measurably wrong:

1. A filter over an expensive computed column (pairwise similarity) gets
   pushed into a BroadcastNestedLoopJoin *condition*, evaluating the fold
   for every candidate pair (n² instead of n²/2) and then re-evaluating it
   in the project above — observed 10× slowdown at sf0.1.
2. CollapseProject inlines a per-row norm aggregate into a per-element
   lambda, turning O(dim) per row into O(dim²).

:func:`opaque` wraps a column in a guard Catalyst must treat as
nondeterministic (``when(rand() >= -1, col)`` — always true, value exactly
unchanged), which legally blocks predicate pushdown and projection collapse
through it. This is the engine's single deliberate optimizer override; every
other plan is left to Catalyst (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def opaque(col: Column, seed: int = 7) -> Column:
    """Return ``col`` unchanged, behind a nondeterministic guard that stops
    Catalyst from pushing predicates through it or collapsing it into
    downstream lambdas. rand(seed) >= -1.0 is a tautology — the value and
    type of ``col`` are untouched."""
    return F.when(F.rand(seed) >= F.lit(-1.0), col)
