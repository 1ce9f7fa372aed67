"""BPE tokenizer: training determinism, greedy rank-order encode semantics,
the shipped merges table, and the oracle's delimiter-encoding precondition."""

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from geopetl_spark.functions import bpe  # noqa: E402


def test_merge_pass_left_to_right_non_overlapping():
    assert bpe._merge_pass(list("aaa"), "a", "a") == ["aa", "a"]
    assert bpe._merge_pass(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert bpe._merge_pass(list("abab"), "a", "b") == ["ab", "ab"]
    assert bpe._merge_pass(list("xaby"), "a", "b") == ["x", "ab", "y"]


def test_encode_word_rank_order():
    # merges: rank0 (e,r)->er, rank1 (t,er)->ter
    merges = [("e", "r"), ("t", "er")]
    vocab = bpe.build_vocab(merges, sorted(set("water")))
    ids = {s: i for i, s in enumerate(vocab)}
    assert bpe.encode_word("water", merges, ids) == [ids["w"], ids["a"], ids["ter"]]
    # unknown char -> <unk> (0)
    assert bpe.encode_word("wq", merges, ids) == [ids["w"], 0]


def test_train_is_deterministic_and_frequency_greedy(spark):
    df = spark.createDataFrame(
        [("low low low lower",), ("newest newest",)], "text string"
    )
    m1, a1 = bpe.train_bpe_merges(df, n_merges=5)
    m2, a2 = bpe.train_bpe_merges(df, n_merges=5)
    assert (m1, a1) == (m2, a2)
    # 'lo'/'ow' dominate (4 occurrences each); count ties break lexicographic
    assert m1[0] == ("l", "o")
    assert ("lo", "w") in m1


def test_shipped_merges_roundtrip_and_encode(spark):
    merges, alphabet = bpe.load_merges()
    assert len(merges) == 48 and len(alphabet) >= 20
    df = spark.createDataFrame([("1", "the water is here"), ("2", "")], "doc_id string, text string")
    out = {r.doc_id: r.bpe_tokens for r in bpe.bpe_encode(df).collect()}
    assert out["2"] == []
    assert len(out["1"]) > 0
    # ids are valid vocabulary indexes
    vocab = bpe.build_vocab(merges, alphabet)
    assert all(0 <= t < len(vocab) for t in out["1"])
    # encode is pure: same text -> same ids
    out2 = {r.doc_id: r.bpe_tokens for r in bpe.bpe_encode(df).collect()}
    assert out == out2


def _naive_train(word_counts, n_merges, min_pair_count=2):
    """The textbook full-rescan merge loop — the reference the incremental
    trainer must reproduce exactly (same counts, same tie-breaks)."""
    words = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc = {}
        for w, syms in words.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        best, bc = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if bc < min_pair_count:
            break
        merges.append(best)
        words = {w: bpe._merge_pass(s, *best) for w, s in words.items()}
    return merges


def test_incremental_trainer_matches_full_rescan(spark):
    rows = [
        ("the quick brown fox jumps over the lazy dog the fox",),
        ("pack my box with five dozen liquor jugs the box",),
        ("how vexingly quick daft zebras jump the quick",),
        ("sphinx of black quartz judge my vow the sphinx",),
    ]
    df = spark.createDataFrame(rows, "text string")
    got, _ = bpe.train_bpe_merges(df, n_merges=40, min_count=1, max_vocab=None)
    wc = {}
    for (t,) in rows:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    assert got == _naive_train(wc, 40)


def test_max_vocab_cap_bounds_driver_vocabulary(spark):
    # heavy tail: 2 hot words + 300 rare (count-2) words; the top-K cap must
    # keep only the hot words, so rare-word characters never reach training
    hot = " ".join(["alpha beta"] * 50)
    rare = " ".join(f"xq{i}z xq{i}z" for i in range(300))
    df = spark.createDataFrame([(hot,), (rare,)], "text string")
    merges, alphabet = bpe.train_bpe_merges(df, n_merges=10, max_vocab=2)
    assert set(alphabet) == set("alphbet")  # chars of 'alpha'/'beta' only
    assert all(set(a + b) <= set("alphbet") for a, b in merges)
    # rare-only characters encode as <unk> under the capped table
    ids = {s: i for i, s in enumerate(bpe.build_vocab(merges, alphabet))}
    assert bpe.encode_word("xq9z", merges, ids) == [0, 0, 0, 0]


def _seq_encode(word, merges, ids):
    """Sequential rank-order scan — the contract semantics the
    pair-priority encode must reproduce on trainer-produced tables."""
    syms = list(word)
    for a, b in merges:
        if len(syms) < 2:
            break
        syms = bpe._merge_pass(syms, a, b)
    return [ids.get(s, 0) for s in syms]


def test_priority_encode_equals_rank_scan_shipped_and_5k(spark):
    import hashlib

    # shipped 48-merge table
    merges, alphabet = bpe.load_merges()
    ids = {s: i for i, s in enumerate(bpe.build_vocab(merges, alphabet))}
    for w in ["water", "the", "incomprehensibilities", "zzzz", "a"]:
        assert bpe.encode_word(w, merges, ids) == _seq_encode(w, merges, ids)

    # synthetic large table: 3000 distinct hex words x2 -> thousands of merges
    words = [hashlib.md5(str(i).encode()).hexdigest()[:12] for i in range(3000)]
    df = spark.createDataFrame([(" ".join(words + words),)], "text string")
    big_merges, big_alpha = bpe.train_bpe_merges(df, n_merges=5000, min_count=1)
    assert len(big_merges) >= 1000
    big_ids = {s: i for i, s in enumerate(bpe.build_vocab(big_merges, big_alpha))}
    ranks = {p: i for i, p in enumerate(big_merges)}
    for w in words[::97] + ["deadbeef00", "0123456789ab"]:
        assert bpe.encode_word(w, big_merges, big_ids, ranks) == _seq_encode(
            w, big_merges, big_ids
        )


def test_collision_table_routes_to_rankscan(spark):
    """ADVICE r4: a hand-built table where two merges produce the same
    symbol string ('b'+'c' then 'a'+'bc' vs 'a'+'b' then 'ab'+'c' -> 'abc')
    must encode under the documented sequential rank-order contract — the
    pair-priority shortcut's equivalence argument doesn't cover it."""
    merges = [("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c")]
    assert bpe._merge_collisions(merges) == {"abc"}
    alpha = sorted(set("abc"))
    ids = {s: i for i, s in enumerate(bpe.build_vocab(merges, alpha))}
    df = spark.createDataFrame([("abc ababc bcabc",)], "text string")
    out = bpe.bpe_encode(df, merges=merges, alphabet=alpha).collect()[0]["bpe_tokens"]
    exp = []
    for w in "abc ababc bcabc".split():
        exp.extend(bpe.encode_word_rankscan(w, merges, ids))
    assert out == exp


def test_trainer_rejects_colliding_merges():
    """The trainer enforces merged-symbol uniqueness (the precondition of
    the pair-priority encode) — verified via the collision detector the
    trainer calls, plus a collision-free real training run."""
    assert bpe._merge_collisions([("a", "b"), ("ab", "c"), ("x", "y")]) == set()
    shipped, _ = bpe.load_merges()
    assert bpe._merge_collisions(shipped) == set()


def test_encode_memo_bounded_identical_output(spark):
    """Round-4 directive #9: a high-cardinality partition (every word
    distinct) under a tiny cache_limit must produce identical output to the
    unbounded memo — the memo is a pure cache, never semantics."""
    text = " ".join(f"w{i}x{i % 7}" for i in range(500))
    df = spark.createDataFrame([(text,), (text[: len(text) // 2],)], "text string").coalesce(1)
    capped = [r["bpe_tokens"] for r in bpe.bpe_encode(df, cache_limit=8).collect()]
    unbounded = [r["bpe_tokens"] for r in bpe.bpe_encode(df).collect()]
    assert capped == unbounded
    assert all(len(t) > 0 for t in capped)


def test_corpus_has_no_delimiter_chars(spark, sf_dir):
    """The oracle's '|'-delimited symbol encoding requires no '|' in any
    document (documented precondition in __spark_entry__._bpe_oracle_sql)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert d.filter(F.col("text").contains("|")).count() == 0


def test_encode_fewer_tokens_than_chars(spark, sf_dir):
    """BPE must actually compress: merged subwords mean fewer tokens than
    characters for natural text."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    enc = bpe.bpe_encode(d.select("doc_id", "text"))
    row = (
        enc.select(
            F.sum(F.size("bpe_tokens")).alias("n_tok"),
            F.sum(F.length(F.regexp_replace("text", r"\s+", ""))).alias("n_chars"),
        ).collect()[0]
    )
    assert 0 < row.n_tok < row.n_chars
