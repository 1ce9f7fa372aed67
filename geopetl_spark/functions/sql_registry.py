"""SQL function registration surface (the UDF/UDAF registry gap, SURVEY §2.7).

Registers the engine's scalar functions as SQL-callable **SQL UDFs**
(``CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN <expr>``, Spark 4 SQL
scalar functions) so ``spark.sql`` users get the same functions as DataFrame
users — and they stay JVM expressions (no Python round-trip), unlike
``spark.udf.register`` of a Python lambda.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FP_MOD = 1_000_000_007  # keep in sync with functions.text

_SQL_FUNCTIONS = {
    # word hash (md5-derived, cross-engine reproducible)
    "gp_word_hash": """
        CREATE OR REPLACE TEMPORARY FUNCTION gp_word_hash(w STRING)
        RETURNS BIGINT
        RETURN cast(conv(substring(md5(w), 1, 14), 16, 10) as bigint)
    """,
    # whitespace token count
    "gp_token_count": """
        CREATE OR REPLACE TEMPORARY FUNCTION gp_token_count(t STRING)
        RETURNS INT
        RETURN case when length(trim(t)) = 0 then 0 else size(split(trim(t), '\\\\s+')) end
    """,
    # rolling polynomial document fingerprint
    "gp_fingerprint": f"""
        CREATE OR REPLACE TEMPORARY FUNCTION gp_fingerprint(t STRING)
        RETURNS BIGINT
        RETURN aggregate(
            transform(split(trim(t), '\\\\s+'),
                      w -> cast(conv(substring(md5(w), 1, 14), 16, 10) as bigint) % {_FP_MOD}),
            cast(0 as bigint),
            (acc, h) -> (acc * 31 + h) % {_FP_MOD})
    """,
    # cosine similarity of two double arrays
    "gp_cosine": """
        CREATE OR REPLACE TEMPORARY FUNCTION gp_cosine(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
        RETURNS DOUBLE
        RETURN aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (s, v) -> s + v)
             / (sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), cast(0.0 as double), (s, v) -> s + v))
              * sqrt(aggregate(zip_with(b, b, (x, y) -> x * y), cast(0.0 as double), (s, v) -> s + v)))
    """,
    # token-array sanitization (null -> [], drop null elements)
    "gp_sanitize_tokens": """
        CREATE OR REPLACE TEMPORARY FUNCTION gp_sanitize_tokens(t ARRAY<INT>)
        RETURNS ARRAY<INT>
        RETURN filter(coalesce(t, array()), x -> x is not null)
    """,
    # canonical normalization (mirrors functions.text.normalize_text)
    "gp_normalize_text": """
        CREATE OR REPLACE TEMPORARY FUNCTION gp_normalize_text(t STRING)
        RETURNS STRING
        RETURN trim(regexp_replace(regexp_replace(lower(t), '[^a-z0-9\\\\s]', ''), '\\\\s+', ' '))
    """,
    # PII redaction (mirrors functions.text.redact_pii)
    "gp_redact_pii": """
        CREATE OR REPLACE TEMPORARY FUNCTION gp_redact_pii(t STRING)
        RETURNS STRING
        RETURN regexp_replace(
            regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\\\.[A-Za-z]{2,}', '[EMAIL]'),
            '\\\\+?[0-9][0-9 ()-]{6,}[0-9]', '[PHONE]')
    """,
    # stable split bucket (mirrors operators.sample.hash_bucket)
    "gp_hash_bucket": """
        CREATE OR REPLACE TEMPORARY FUNCTION gp_hash_bucket(id STRING, n INT)
        RETURNS BIGINT
        RETURN cast(conv(substring(md5(id), 1, 14), 16, 10) as bigint) % n
    """,
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Install all engine SQL functions into the session; returns names."""
    for ddl in _SQL_FUNCTIONS.values():
        spark.sql(ddl)
    return sorted(_SQL_FUNCTIONS)
