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
    stopword hits wins; ties break alphabetically; zero hits -> 'und'."""
    pairs = [(lang, stopword_hits(text, lang)) for lang in sorted(STOPWORDS)]
    best = pairs[0]
    # fold: strictly-greater wins, so earlier (alphabetical) language keeps ties
    expr = F.lit(pairs[0][0])
    best_hits = pairs[0][1]
    for lang, hits in pairs[1:]:
        expr = F.when(hits > best_hits, F.lit(lang)).otherwise(expr)
        best_hits = F.when(hits > best_hits, hits).otherwise(best_hits)
    return F.when(best_hits <= 0, F.lit("und")).otherwise(expr)


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
