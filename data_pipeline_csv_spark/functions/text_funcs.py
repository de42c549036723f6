"""Text column-expression builders (all JVM-side built-ins, no UDFs).

Every helper returns a ``pyspark.sql.Column`` so the expressions stay
inside whole-stage codegen; the DuckDB oracles re-express the same
arithmetic so results are bit-identical (ratios are single IEEE ops on
integer counts).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic. Deliberately small and deterministic.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "du", "que"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "de", "que"),
}


def normalize_text(col) -> Column:
    """lower -> strip non-alphanumerics -> collapse whitespace -> trim."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def tokens(col) -> Column:
    """Whitespace tokens of normalized text ('' -> empty array)."""
    norm = normalize_text(col)
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(F.split(norm, " "))


def token_count(col) -> Column:
    return F.size(tokens(col)).cast("bigint")


def word_shingles(tok_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token-array column (distinct NOT applied)."""
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(tok_col) - n, F.lit(-1))),
        lambda i: F.concat_ws(" ", *[F.element_at(tok_col, i + j + 1) for j in range(n)]),
    )


def stopword_hits(tok_col: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tok_col, lambda t: t.isin(*words))).cast("bigint")


def alpha_ratio(col) -> Column:
    """Fraction of characters that are ASCII letters (on raw text)."""
    raw = F.col(col) if isinstance(col, str) else col
    n_alpha = F.length(F.regexp_replace(raw, "[^A-Za-z]", ""))
    return n_alpha.cast("double") / F.nullif(F.length(raw), F.lit(0))


def token_count_bpe(col) -> Column:
    """BPE-ish token count: alnum runs + individual punctuation marks."""
    norm = F.lower(F.col(col) if isinstance(col, str) else col)
    return F.regexp_count(norm, F.lit("[a-z0-9]+|[^a-z0-9 ]")).cast("bigint")


# PII patterns, written to the common subset of Java regex (Spark) and
# RE2 (DuckDB oracle): no lookaround, no backrefs. Scrub order is
# email -> IPv4 -> phone on both sides so nested matches can't differ.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 ()-]{5,}[0-9]", "<PHONE>"),
)


def pii_counts(col) -> dict[str, Column]:
    """Per-kind PII match counts on the raw text (bigint columns)."""
    raw = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.regexp_count(raw, F.lit(pat)).cast("bigint")
        for kind, pat, _ in PII_PATTERNS
    }


def pii_scrub(col) -> Column:
    """Text with every PII match replaced by its <KIND> token."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c
