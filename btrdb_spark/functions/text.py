"""Text-analysis operators: quality scoring, token counting, language ID,
document fingerprinting.

All pure built-in Spark SQL expressions (no Python in the hot path): at
100 TB these run inside whole-stage codegen as a single scan-project, no
shuffle at all except the final order (which a real pipeline would drop).
DuckDB oracle mirrors use the identical arithmetic so results match
bit-for-bit (integer counts; ratios are single double divisions of ints).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic mini stopword lists per language (operator demo — a real
# deployment would broadcast a proper lexicon table)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "y", "de", "que"],
    "de": ["der", "die", "und", "das", "zu"],
    "zh": ["shi", "de", "le", "bu", "zai"],
}


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def quality_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: token count, char stats, ratios.

    Output columns: doc_id, n_tokens, n_chars_measured, avg_token_len,
    stopword_ratio, distinct_token_ratio.
    """
    toks = _tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    return documents.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars_measured"),
        ((n_chars - (n_tokens - F.lit(1))) / n_tokens).alias("avg_token_len"),
        (n_stop / n_tokens).alias("stopword_ratio"),
        (n_distinct / n_tokens).alias("distinct_token_ratio"),
    ).orderBy("doc_id")


def token_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate (len/4 heuristic)."""
    toks = _tokens(F.col(text_col))
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        (F.length(F.col(text_col)) / F.lit(4)).cast("long").alias("est_bpe_tokens"),
    ).orderBy("doc_id")


def lang_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language ID: argmax language by distinct-stopword hits.

    Deterministic tie-break: lexicographically smallest language code.
    Output: (doc_id, pred_lang, pred_hits).
    """
    toks = F.array_distinct(_tokens(F.col(text_col)))
    scored = F.array(*[
        F.struct(
            (-F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws])))).alias("neg_hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(STOPWORDS.items())
    ])
    best = F.array_min(scored)
    return documents.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        (-best["neg_hits"]).cast("long").alias("pred_hits"),
    ).orderBy("doc_id")


def fingerprint(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Stable 64-bit-ish document fingerprint (md5-derived, portable)."""
    return documents.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10).cast("long").alias("fp"),
    ).orderBy("doc_id")


# ---------------- DuckDB oracle mirrors ----------------

_STOP_EN = "['the','a','and','of','to']"

ORACLES = {
    "text_quality": f"""
        WITH t AS (
            SELECT doc_id, text, string_split(text, ' ') AS toks, LENGTH(text) AS n_chars_m
            FROM documents
        )
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(n_chars_m AS BIGINT) AS n_chars_measured,
               (n_chars_m - (len(toks) - 1)) / len(toks) AS avg_token_len,
               len(list_filter(toks, x -> list_contains({_STOP_EN}, x))) / len(toks) AS stopword_ratio,
               len(list_distinct(toks)) / len(toks) AS distinct_token_ratio
        FROM t ORDER BY doc_id
    """,
    "lang_id": f"""
        WITH t AS (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
        ), scored AS (
            SELECT doc_id, lang, hits FROM (
                SELECT doc_id, 'de' AS lang, len(list_intersect(toks, ['der','die','und','das','zu'])) AS hits FROM t
                UNION ALL
                SELECT doc_id, 'en', len(list_intersect(toks, {_STOP_EN})) FROM t
                UNION ALL
                SELECT doc_id, 'es', len(list_intersect(toks, ['el','la','y','de','que'])) FROM t
                UNION ALL
                SELECT doc_id, 'zh', len(list_intersect(toks, ['shi','de','le','bu','zai'])) FROM t
            )
        ), ranked AS (
            SELECT doc_id, lang, hits,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rn
            FROM scored
        )
        SELECT doc_id, lang AS pred_lang, CAST(hits AS BIGINT) AS pred_hits
        FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
}
