"""Text-analysis column functions for training-data pipelines.

All JVM-side column expressions (no UDFs): language-ID by stopword-hit
heuristic, quality scoring from length/punctuation/stopword ratios, token
counting (whitespace + BPE-ish regex), and polynomial document
fingerprinting. Every function here is mirrored by ANSI SQL in
``__spark_entry__.oracle_sql`` — determinism across engines is part of the
design (md5-derived word hashes, explicit fold order, integer mod arithmetic
kept far from 2^63 so ANSI overflow checking never trips).

Reference parity: geopetl has no text functions; these are the
training-pipeline extension required by the build spec, filling SURVEY §2.7's
"string scalar functions" gap.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists chosen from words that actually occur in
# the synthetic corpus vocabulary, so the heuristic exercises real code paths.
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "un"],
    "de": ["der", "die", "das", "und", "ein"],
}

BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def words(text: Column) -> Column:
    """Whitespace tokenization (empty-safe)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(words(text)))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs, single digits, single punctuation."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang`` (occurrence count,
    not distinct — array_intersect would dedup)."""
    sw = STOPWORDS[lang]
    return F.size(F.filter(words(text), lambda w: w.isin(*sw)))


def lang_id(text: Column) -> Column:
    """n-gram/stopword heuristic language ID: the language with the most
    stopword hits wins; ties break alphabetically; zero hits -> 'und'.

    r7 expression shape (value-identical): the old CASE-WHEN fold nested
    each comparison inside the next, duplicating every ``stopword_hits``
    subtree exponentially — the physical plan carried ~40 interpreted
    array passes PER ROW (higher-order functions are CodegenFallback, so
    codegen subexpression elimination never sees them; measured 2-3.6 s
    for a 5k-doc noop at sf0.1, guide §4.1). Now each language's hit count
    appears exactly once inside an ``array_max`` over (hits, -index)
    structs: lexicographic struct comparison picks the maximum hit count
    and, on ties, the smallest index = alphabetically first language —
    precisely the fold's strictly-greater-wins discipline. Zero hits still
    maps to 'und' (the struct max carries the max hit count)."""
    langs = sorted(STOPWORDS)
    entries = [
        F.struct(stopword_hits(text, lang).alias("h"), F.lit(-i).alias("ni"))
        for i, lang in enumerate(langs)
    ]
    best = F.array_max(F.array(*entries))
    lang_arr = F.array(*[F.lit(lang) for lang in langs])
    return F.when(best["h"] <= 0, F.lit("und")).otherwise(
        F.element_at(lang_arr, (-best["ni"]).cast("int") + 1)
    )


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct / n)


def mean_word_len(text: Column) -> Column:
    tc = token_count(text)
    return F.when(tc == 0, F.lit(0.0)).otherwise(F.length(F.regexp_replace(text, r"\s+", "")) / tc)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]-ish: favors mid-length docs with
    low punctuation and a healthy stopword ratio. Deterministic arithmetic
    only — mirrored 1:1 in the oracle SQL."""
    tc = token_count(text)
    sw = stopword_hits(text, "en")
    sw_ratio = F.when(tc == 0, F.lit(0.0)).otherwise(sw / tc)
    len_score = F.least(tc / F.lit(100.0), F.lit(1.0))
    return F.round(
        0.5 * len_score + 0.3 * (1.0 - punct_ratio(text)) + 0.2 * F.least(sw_ratio * 5.0, F.lit(1.0)),
        6,
    )


# ---------------------------------------------------------------------------
# Fingerprinting: md5-derived word hashes folded with a polynomial rolling
# hash mod a prime. Everything stays < 2^35 so ANSI integer overflow can
# never trip, and DuckDB reproduces it bit-for-bit.
# ---------------------------------------------------------------------------

_FP_MOD = 1_000_000_007
_FP_MULT = 31


def word_hash(w: Column) -> Column:
    """Deterministic 56-bit word hash from md5 (cross-engine reproducible)."""
    return F.conv(F.substring(F.md5(w), 1, 14), 16, 10).cast("long")


def fingerprint(text: Column) -> Column:
    """Rolling polynomial hash over the word-hash sequence:
    ``fold(words, 0, (acc, h) -> (acc*31 + h%M) % M)``."""
    hashes = F.transform(words(text), lambda w: word_hash(w) % _FP_MOD)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * _FP_MULT + h) % _FP_MOD,
    )


# ---------------------------------------------------------------------------
# normalization / redaction (training-data cleaning stage)
# ---------------------------------------------------------------------------

# RE2-compatible patterns (no backrefs/lookarounds) so the DuckDB oracles and
# any regex-pushdown engine reproduce them exactly.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9 ()-]{6,}[0-9]"


def normalize_text(text: Column) -> Column:
    """Canonical text normalization for dedup/training: lowercase, strip
    non-alphanumerics (keeping spaces), collapse whitespace runs, trim.
    Pure JVM regexp expressions — the order (lower → strip → collapse → trim)
    is part of the contract and mirrored in the SQL oracle."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def redact_pii(text: Column) -> Column:
    """Replace email addresses then phone-number-shaped digit runs with
    placeholder tokens. Heuristic by design (a training-data hygiene pass,
    not a compliance guarantee)."""
    t = F.regexp_replace(text, EMAIL_PATTERN, "[EMAIL]")
    return F.regexp_replace(t, PHONE_PATTERN, "[PHONE]")


def pii_count(text: Column) -> Column:
    """Number of redactable spans (emails + phone runs) in the raw text."""
    return (F.regexp_count(text, F.lit(EMAIL_PATTERN)) + F.regexp_count(text, F.lit(PHONE_PATTERN))).cast("long")


def word_repetition_stats(
    docs: "DataFrame", text_col: str = "text", id_col: str = "doc_id", flag_threshold: float = 0.3
) -> "DataFrame":
    """Intra-document repetition metrics — the Gopher/RefinedWeb-style
    repetition filter stage: heavily self-repeating documents (boilerplate,
    keyword stuffing, generation loops) are poison for LM training.

    Per doc: ``n_words``, ``n_distinct_words``, ``dup_word_frac``
    (= 1 − distinct/total), ``top_word_frac`` (most frequent word's share),
    and ``is_repetitive`` (dup_word_frac > ``flag_threshold``). Shape: one
    words-explode → (doc, word) count → per-doc aggregate — two map-side-
    combinable aggregations, no window, no shuffle beyond the groupBys.
    Ratios round to 6dp (cross-engine hash determinism, same discipline as
    the Jaccard operators)."""
    from pyspark.sql import functions as F

    w = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_w"),
    ).filter(F.length("_w") > 0)
    wc = w.groupBy("_id", "_w").agg(F.count("*").alias("_c"))
    agg = wc.groupBy("_id").agg(
        F.sum("_c").cast("long").alias("n_words"),
        F.count("*").cast("long").alias("n_distinct_words"),
        F.max("_c").cast("long").alias("_top"),
    )
    dup_frac = F.round(1.0 - F.col("n_distinct_words") / F.col("n_words"), 6)
    return agg.select(
        F.col("_id").alias(id_col),
        "n_words",
        "n_distinct_words",
        dup_frac.alias("dup_word_frac"),
        F.round(F.col("_top") / F.col("n_words"), 6).alias("top_word_frac"),
        (dup_frac > F.lit(flag_threshold)).alias("is_repetitive"),
    )


def unigram_logprob_scores(
    docs: "DataFrame", text_col: str = "text", id_col: str = "doc_id"
) -> "DataFrame":
    """Unigram-LM document scoring — the perplexity-filter stage: score
    each document by its mean per-word log-probability under an add-one-
    smoothed unigram model trained on the corpus itself (documents full of
    rare/garbled tokens score low; pass a precomputed vocabulary at scale
    by training once and reusing, same economics as the BPE merges table).

    Determinism across engines: per-word ``logp = round(ln((c+1)/(N+V)),
    6)`` (the one float op; 6dp rounding absorbs last-ulp libm
    differences), then summed as DECIMAL(20,6) — exact, order-independent
    — and only the final mean is a float division, rounded to 6dp.

    Shape: one corpus word-count aggregation (map-side combinable; the
    model is O(vocab), never O(corpus)), one words→vocab equi-join, one
    per-doc aggregate."""
    from pyspark.sql import functions as F

    w = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_w"),
    ).filter(F.length("_w") > 0)
    vocab = w.groupBy("_w").agg(F.count("*").alias("_c"))
    totals = vocab.agg(
        F.sum("_c").cast("long").alias("_n"), F.count("*").cast("long").alias("_v")
    )
    scored = vocab.crossJoin(F.broadcast(totals)).select(
        "_w",
        F.round(F.log((F.col("_c") + 1) / (F.col("_n") + F.col("_v")))
                .cast("double"), 6).cast("decimal(20,6)").alias("_logp"),
    )
    return (
        w.join(scored, "_w")
        .groupBy("_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("_logp").alias("_sum"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_words",
            F.round(F.col("_sum").cast("double") / F.col("n_words"), 6).alias("avg_logprob"),
        )
    )
