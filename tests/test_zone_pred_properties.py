"""Property-based safety net (hypothesis) for zone-map predicate pruning:
for ANY predicate the parser accepts, a zone it declares prunable must
contain NO value satisfying the predicate — wrong pruning is data loss,
while declining to prune is merely a missed optimization. Pure-Python
(no Spark): the parser and the zone matcher are exercised against a
brute-force evaluator over the zone's value range."""

from hypothesis import given, settings
from hypothesis import strategies as st

from geopetl_spark.functions import bpe
from geopetl_spark.lake.table import LakeTable

ints = st.integers(-1000, 1000)


@st.composite
def simple_pred(draw):
    col = draw(st.sampled_from(["a", "b"]))
    kind = draw(st.sampled_from(["cmp", "between", "inlist"]))
    if kind == "cmp":
        op = draw(st.sampled_from(["=", "<", "<=", ">", ">="]))
        v = draw(ints)
        return f"{col} {op} {v}", col, ("cmp", op, v)
    if kind == "between":
        lo, hi = sorted([draw(ints), draw(ints)])
        return f"{col} between {lo} and {hi}", col, ("range", lo, hi)
    vals = draw(st.lists(ints, min_size=1, max_size=5))
    return f"{col} in ({', '.join(map(str, vals))})", col, ("in", tuple(vals))


def _holds(term, x) -> bool:
    kind = term[0]
    if kind == "cmp":
        _, op, v = term
        return {"=": x == v, "<": x < v, "<=": x <= v, ">": x > v, ">=": x >= v}[op]
    if kind == "range":
        return term[1] <= x <= term[2]
    return x in term[1]


@given(st.lists(simple_pred(), min_size=1, max_size=4), ints, ints, ints, ints)
@settings(max_examples=300, deadline=None)
def test_pruned_zone_provably_has_no_matching_value(terms, a_lo, a_hi, b_lo, b_hi):
    where = " and ".join(t[0] for t in terms)
    preds = LakeTable._parse_zone_preds(where)
    if preds is None:
        return  # parser declined: pruning off, trivially safe
    zones = {"a": sorted([a_lo, a_hi]), "b": sorted([b_lo, b_hi])}
    if LakeTable._zones_may_match(zones, preds):
        return  # not pruned: nothing to verify
    # PRUNED: no (a, b) inside the zone ranges may satisfy the conjunction.
    # The conjunction factors per column, so it is wrongly pruned iff EVERY
    # column's terms are satisfiable somewhere in that column's range.
    def satisfiable(col):
        zlo, zhi = zones[col]
        col_terms = [t for _, c, t in terms if c == col]
        if not col_terms:
            return True
        return any(
            all(_holds(t, x) for t in col_terms) for x in range(zlo, zhi + 1)
        )

    assert not (satisfiable("a") and satisfiable("b")), (where, zones)


@given(simple_pred(), ints, ints)
@settings(max_examples=300, deadline=None)
def test_unpruned_when_some_value_matches(term, lo, hi):
    """Converse sanity (not required for correctness, but catches a parser
    that prunes everything): if SOME value in the zone satisfies the
    single-column predicate, the zone must survive."""
    where, col, t = term
    preds = LakeTable._parse_zone_preds(where)
    if preds is None:
        return
    zlo, zhi = sorted([lo, hi])
    zones = {col: [zlo, zhi]}
    if any(_holds(t, x) for x in range(zlo, zhi + 1)):
        assert LakeTable._zones_may_match(zones, preds), (where, zones)


@st.composite
def trainer_shaped_table(draw):
    """Merge tables with the trainer's structural invariant: each merge's
    components are single chars or previously-produced symbols, merged
    strings unique — the precondition of encode_word's pair-priority
    equivalence argument."""
    symbols = list("abcd")
    merges, produced = [], set()
    for _ in range(draw(st.integers(1, 14))):
        a = draw(st.sampled_from(symbols))
        b = draw(st.sampled_from(symbols))
        s = a + b
        if s in produced or len(s) > 10:
            continue
        merges.append((a, b))
        produced.add(s)
        symbols.append(s)
    return merges


@given(trainer_shaped_table(), st.text(alphabet="abcd", min_size=1, max_size=14))
@settings(max_examples=300, deadline=None)
def test_bpe_priority_encode_equals_rankscan_on_trainer_shaped_tables(merges, word):
    """The pair-priority shortcut must equal the documented sequential
    rank-order contract for every table satisfying the trainer invariant
    (the deterministic tests cover the shipped + 5k-merge tables; this
    fuzzes the structural claim itself)."""
    if not merges or bpe._merge_collisions(merges):
        return
    alpha = sorted(set("abcd"))
    ids = {s: i for i, s in enumerate(bpe.build_vocab(merges, alpha))}
    assert bpe.encode_word(word, merges, ids) == bpe.encode_word_rankscan(word, merges, ids)
