"""Text-analysis column expressions for training-data pipelines:
tokenization, language-ID heuristic, quality scoring, token counting,
document fingerprinting. All pure ``pyspark.sql.functions`` — no UDFs
in the hot path, so whole-stage codegen applies at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# language marker words for the n-gram/stopword heuristic; scoring is
# count of marker hits per language over whitespace tokens.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "un"),
    "zh": ("的", "是", "不", "了", "在"),
}

STOPWORDS = ("the", "a", "an", "of", "and", "or", "is", "are", "to", "in")


def normalize_ws(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens as array<string>."""
    return F.split(normalize_ws(col), " ")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count: alpha runs, digit runs, and single
    non-alphanumeric marks each count as one token — a cheap,
    deterministic proxy for subword tokenizers."""
    return F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def marker_score(col: Column, markers: tuple[str, ...]) -> Column:
    """Number of tokens that are language-marker words."""
    toks = tokens(F.lower(col))
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id(col: Column) -> Column:
    """Argmax language over marker scores; 'und' when all zero.
    Deterministic tiebreak: language name ascending."""
    scored = [
        F.struct(marker_score(col, m).alias("score"),
                 F.lit(lang).alias("lang"))
        for lang, m in sorted(LANG_MARKERS.items(), reverse=True)
    ]
    # array_max picks max score; on ties the LAST struct in sorted
    # order wins under max semantics, so feed reverse-sorted to make
    # the tiebreak ascending-name.
    best = F.array_max(F.array(*scored))
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise("und")


def quality_features(col: Column) -> dict[str, Column]:
    """Length/punctuation/stopword features, the standard cheap
    quality signals for corpus filtering."""
    n_chars = F.length(col)
    toks = tokens(col)
    n_tokens = F.size(toks)
    n_punct = F.regexp_count(col, F.lit(r"[^\w\s]"))
    n_stop = F.size(F.filter(tokens(F.lower(col)), lambda t: t.isin(*STOPWORDS)))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_token_len": F.when(
            n_tokens > 0,
            (n_chars - (n_tokens - 1)).cast("double") / n_tokens.cast("double")
        ).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(
            n_chars > 0, n_punct.cast("double") / n_chars.cast("double")
        ).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(
            n_tokens > 0, n_stop.cast("double") / n_tokens.cast("double")
        ).otherwise(F.lit(0.0)),
    }


def fingerprint64(col: Column) -> Column:
    """Deterministic 48-bit content fingerprint: md5 of the
    whitespace-normalized lowercase text, upper 12 hex chars as a
    BIGINT. Used for exact-dup detection across shards without
    carrying full text through the shuffle."""
    return F.conv(F.substring(F.md5(F.lower(normalize_ws(col))), 1, 12), 16, 10).cast("long")
