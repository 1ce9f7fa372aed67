"""Operator tests: dedup (exact/jaccard/minhash/simhash), ANN, text
functions, transforms — on small planted data where the expected answer is
known by construction (the reference's golden-CSV strategy, SURVEY §5,
recast: edge cases planted in fixtures, field-by-field asserts)."""

import pytest
from pyspark.sql import functions as F

from geopetl_spark.functions import text as TXT
from geopetl_spark.operators import ann as ANN
from geopetl_spark.operators import dedup_text as DD
from geopetl_spark.transforms import normalize_strings, reproject_tokens, sanitize_tokens


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
        (4, "completely different words appear here tonight okay"),
        (5, ""),  # empty doc (null-ish payload, ≈ POINT EMPTY row in point.csv)
        (6, "el la de que y palabras en espanol aqui"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_groups(docs):
    out = {r["doc_id"]: (r["dup_group"], r["group_size"], r["is_canonical"]) for r in DD.exact_dup_groups(docs).collect()}
    assert out[1] == (1, 2, True)
    assert out[2] == (1, 2, False)
    assert out[3][1] == 1 and out[3][2]


def test_ngram_jaccard_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in DD.ngram_jaccard_pairs(docs, threshold=0.3, n=2).collect()}
    assert pairs[(1, 2)] == 1.0  # exact dup
    assert 0.5 < pairs[(1, 3)] < 1.0  # near dup
    assert (1, 4) not in pairs


def test_ngram_df_cap_prunes_candidates_not_results(spark):
    """A planted high-df shingle (every doc shares one phrase) must be
    dropped from candidate generation by the df cap — candidate count falls
    to only truly-similar pairs — while surviving pairs keep their EXACT
    full-set Jaccard values."""
    common = "zz yy xx"  # one shared 3-shingle across all docs
    rows = [(i, f"{common} unique{i}a unique{i}b unique{i}c") for i in range(1, 9)]
    rows += [(100, "alpha beta gamma delta epsilon"), (101, "alpha beta gamma delta zeta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def cand_count(cap):
        sh = DD._shingles(docs, "text", "doc_id", 3)
        index = sh
        if cap is not None:
            keep = sh.groupBy("shingle").agg(F.count("*").alias("_df")).filter(F.col("_df") <= cap).select("shingle")
            index = sh.join(keep, "shingle")
        a, b = index.alias("a"), index.alias("b")
        return (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")))
            .select("a._id", "b._id").distinct().count()
        )

    assert cand_count(None) >= 28  # the planted shingle alone makes 8*7/2 pairs
    assert cand_count(4) == 1      # cap kills the hot shingle; only (100,101) remains
    capped = {(r["id_a"], r["id_b"]): r["jaccard"]
              for r in DD.ngram_jaccard_pairs(docs, threshold=0.3, n=3, max_shingle_df=4).collect()}
    full = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in DD.ngram_jaccard_pairs(docs, threshold=0.3, n=3, max_shingle_df=None).collect()}
    assert (100, 101) in capped
    # surviving pairs carry identical exact-Jaccard values in both modes
    assert all(full[k] == v for k, v in capped.items())


def test_minhash_lsh_finds_planted_neardups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in DD.minhash_lsh_pairs(docs, threshold=0.5, n=2).collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs


def test_simhash_pairs(docs):
    sh = {r["doc_id"]: r["simhash"] for r in DD.simhash(docs).collect()}
    assert sh[1] == sh[2]  # identical text -> identical simhash
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in DD.simhash_pairs(docs, max_hamming=8).collect()}
    assert pairs[(1, 2)] == 0


def test_lang_id_and_quality(docs):
    out = {r["doc_id"]: (r["lang"], r["q"]) for r in docs.select(
        "doc_id", TXT.lang_id(F.col("text")).alias("lang"), TXT.quality_score(F.col("text")).alias("q")
    ).collect()}
    assert out[1][0] == "en"
    assert out[6][0] == "es"
    assert out[5][0] == "und"
    assert 0.0 <= out[5][1] <= 1.0 and out[1][1] > out[5][1]


def test_token_counts_and_fingerprint(docs):
    out = docs.select(
        "doc_id",
        TXT.token_count(F.col("text")).alias("tc"),
        TXT.fingerprint(F.col("text")).alias("fp"),
    ).collect()
    d = {r["doc_id"]: (r["tc"], r["fp"]) for r in out}
    assert d[1][0] == 9
    assert d[5][0] == 0
    assert d[1][1] == d[2][1] != d[3][1]  # fingerprint: dup-stable, content-sensitive


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),   # near 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),   # opposite of 0
        (4, [0.7, 0.7, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk(vectors):
    out = ANN.cosine_topk(vectors.filter("vec_id = 0"), vectors, k=2).collect()
    ranked = [(r["neighbor_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [(1, 1), (4, 2)]
    assert all(-1.0 <= r["similarity"] <= 1.0 for r in out)


def test_embedding_near_dup_pairs(vectors):
    pairs = {(r["id_a"], r["id_b"]) for r in ANN.embedding_near_dup_pairs(vectors, threshold=0.9).collect()}
    assert (0, 1) in pairs and (0, 3) not in pairs


def test_lsh_bucketed_topk_recall_on_planted(vectors):
    # near-identical vectors land in the same hyperplane bucket
    out = ANN.lsh_bucketed_topk(vectors.filter("vec_id = 0"), vectors, k=2, n_bits=2, dim=4).collect()
    assert any(r["neighbor_id"] == 1 for r in out)


def test_sanitize_tokens(spark):
    df = spark.createDataFrame(
        [("a", [1, None, 99999], 3), ("b", None, None)],
        "doc_id string, tokens array<int>, n_tok int",
    )
    out = {r["doc_id"]: (r["tokens"], r["n_tok"]) for r in sanitize_tokens(df, vocab_size=100).collect()}
    assert out["a"] == ([1, 99], 2)  # null element dropped, 99999 clamped to 99
    assert out["b"] == ([], 0)  # null array -> empty (≈ 'POINT EMPTY')


def test_normalize_strings(spark):
    df = spark.createDataFrame([(" x ",), ("",), ("  ",)], "s string")
    vals = [r["s"] for r in normalize_strings(df, ["s"]).collect()]
    assert vals == ["x", None, None]  # empty-string -> NULL (prepare_val parity)


def test_publish_csv_dry_run_and_publisher(spark, tmp_path):
    """S7 tail (tocarto, carto.py:7-38): canonicalize payload -> single CSV
    -> publisher boundary. No publisher = dry-run manifest; a publisher
    callable receives the file and its manifest."""
    from geopetl_spark.sources.publish import publish_csv

    df = spark.createDataFrame(
        [("a", [1, 2], "s1"), ("b", None, "s2")], "doc_id string, tokens array<int>, source string"
    )
    man = publish_csv(df, str(tmp_path), "dump", payload_version=2)
    assert man["published"] is False and man["bytes"] > 0
    body = open(man["path"]).read()
    assert "the_payload" in body and "V2;1,2" in body

    calls = []
    man2 = publish_csv(df, str(tmp_path), "dump2", publisher=lambda p, m: calls.append((p, m)) or {"id": 7})
    assert man2["published"] is True and man2["publish_result"] == {"id": 7}
    assert calls and calls[0][0].endswith("dump2.csv")


def test_capabilities_probe_cached(spark):
    from geopetl_spark.catalog import capabilities

    caps = capabilities(spark)
    assert caps["arrow_enabled"] and caps["aqe_enabled"]  # session.py turns these on
    assert caps["session_timezone"] == "UTC"
    assert capabilities(spark) is caps  # cached, like the reference's probes


def test_payload_tag_roundtrip(spark):
    """P8 analog of EWKT 'SRID=n;' tagging (oracle_sde.py:1149-1150): tag,
    then strip -> identical arrays + recovered version; untagged input
    parses with NULL version."""
    from geopetl_spark.transforms import strip_payload_tag, tag_payload

    df = spark.createDataFrame(
        [("a", [1, 2, 3]), ("b", []), ("c", None)], "doc_id string, tokens array<int>"
    )
    tagged = tag_payload(df, "tokens", version=4, out_col="payload")
    vals = {r["doc_id"]: r["payload"] for r in tagged.collect()}
    assert vals == {"a": "V4;1,2,3", "b": "V4;", "c": None}
    back = strip_payload_tag(tagged.drop("tokens"), "payload")
    out = {r["doc_id"]: (r["tokens"], r["payload_version"]) for r in back.collect()}
    assert out == {"a": ([1, 2, 3], 4), "b": ([], 4), "c": (None, None)}
    # untagged strings parse too (tag-optional strip, oracle_sde.py:755-758)
    untagged = spark.createDataFrame([("x", "5,6")], "doc_id string, payload string")
    r = strip_payload_tag(untagged, "payload").collect()[0]
    assert r["tokens"] == [5, 6] and r["payload_version"] is None


def test_reproject_tokens_jvm_transform(spark):
    """The documented reproject analog is the JVM-side transform() — no
    Python UDF in the plan."""
    df = spark.createDataFrame([("a", [1, 2, 3])], "doc_id string, tokens array<int>")
    out = reproject_tokens(df, "tokens", scale=2.0, offset=10)
    assert out.collect()[0]["tokens"] == [12, 14, 16]
    assert "Python" not in out._jdf.queryExecution().executedPlan().toString()


def test_affine_pandas_udf_batch_template(spark):
    """The pandas-UDF template (for genuinely-Python transforms) matches the
    JVM path, including NULL arrays, empty arrays, and multi-row batches."""
    from geopetl_spark.transforms import make_affine_transform_udf

    df = spark.createDataFrame(
        [("a", [1, 2, 3]), ("b", None), ("c", []), ("d", [0, 7])],
        "doc_id string, tokens array<int>",
    )
    udf = make_affine_transform_udf(2.0, 10)
    out = {r["doc_id"]: r["t"] for r in df.select("doc_id", udf("tokens").alias("t")).collect()}
    assert out == {"a": [12, 14, 16], "b": None, "c": [], "d": [10, 24]}
