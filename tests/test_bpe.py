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
