"""Text-analysis column builders (LLM-data-pipeline operators +
SURVEY §2.8 F1-F4 string family).

All builders are pure JVM column expressions (no Python UDFs) so
they stay inside whole-stage codegen — at 100 TB of documents the
difference between an expression and a row-wise UDF is the whole
job. Tokenization is whitespace-normalized single-space split,
chosen because it has identical semantics in Spark and ANSI-ish SQL
engines (regex-split dialects differ; plain-space split doesn't).

Builders taking a ``toks_col_name`` expect the caller to have
materialized a token-array column first (``tokens()``) so the split
happens once per row, not once per feature.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# deterministic marker-word profiles for the language-ID heuristic
# (synthetic corpora: profiles are configuration, not linguistics)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast"),
    "es": ("data", "agg"),
    "de": ("batch", "hash"),
    "fr": ("query", "merge"),
    "zh": ("spark", "window"),
}


def normalize_ws(col: Column) -> Column:
    """Whitespace collapse + trim (F3;
    transform_insider_transactions.py:125-130)."""
    return F.regexp_replace(F.trim(col), r"\s+", " ")


def tokens(col: Column) -> Column:
    return F.split(normalize_ws(col), " ")


def word_count(toks_col_name: str, words: tuple[str, ...]) -> Column:
    """Count of tokens in a fixed word list (stopwords, markers).
    Words are SQL-escaped, so contractions ("don't") are safe."""
    in_list = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return F.expr(f"size(filter({toks_col_name}, t -> t in ({in_list})))")


def type_token_ratio(toks_col_name: str) -> Column:
    # NULL-guarded: with legacy sizeOfNull, size(NULL) = -1 and the
    # ratio would evaluate -1/-1 = 1.0 — a null document would score
    # as maximally diverse instead of missing
    return F.expr(
        f"CASE WHEN {toks_col_name} IS NOT NULL THEN"
        f" size(array_distinct({toks_col_name})) / CAST(size({toks_col_name}) AS DOUBLE)"
        " END"
    )


def shingles(toks_col_name: str, k: int = 3) -> Column:
    """Distinct k-gram word shingles (MinHash/Jaccard input).
    1-based positions to match SQL list semantics. Arrays shorter
    than k yield an EMPTY array: without the guard,
    sequence(1, size-k+1) DESCENDS through 0 for short docs and
    slice(toks, 0, k) aborts the stage with
    INVALID_PARAMETER_VALUE.START."""
    return F.expr(
        f"CASE WHEN size({toks_col_name}) >= {k} THEN"
        f" array_distinct(transform(sequence(1, size({toks_col_name}) - {k - 1}),"
        f" i -> concat_ws(' ', slice({toks_col_name}, i, {k}))))"
        f" WHEN {toks_col_name} IS NOT NULL THEN array()"
        " END"
    )


def ngrams(toks_col_name: str, k: int) -> Column:
    """All k-gram word shingles WITH multiplicity (repetition
    metrics need occurrence counts; ``shingles`` dedups for set
    semantics)."""
    return F.expr(
        f"transform(sequence(1, size({toks_col_name}) - {k - 1}),"
        f" i -> concat_ws(' ', slice({toks_col_name}, i, {k})))"
    )


def content_hash(col: Column) -> Column:
    """MD5 content fingerprint (F4; postgres_stock_db_schema.sql:389)."""
    return F.md5(normalize_ws(col))
