"""Text-analysis operators for training-data pipelines.

Language ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting.  Every
operator is a pure Catalyst expression pipeline over the ``documents``
table schema — no Python, fully codegen'd, safe at 100 TB.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword seeds for the n-gram/stopword heuristic.
LANG_STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "que", "de", "en", "una", "es", "por", "con"],
}

_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text_col: str) -> F.Column:
    """Whitespace tokens (lowercased)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )


def token_count(df: DataFrame, text_col: str = "text", out_col: str = "n_tokens") -> DataFrame:
    """Whitespace token count plus a BPE-ish regex token count
    (letter runs / digit runs / single punctuation)."""
    bpe_ish = F.size(
        F.filter(
            F.split(F.col(text_col), rf"(?<=\s)|(?=\s)"), lambda t: t.rlike(r"\S")
        )
    )
    return df.withColumn(out_col, F.size(tokens_col(text_col))).withColumn(
        f"{out_col}_bpe",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(_TOKEN_REGEX), 0)),
    )


def language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Heuristic language ID: language with the most stopword hits.

    ``array_intersect`` against tiny literal stopword arrays, then a
    ``greatest``-based argmax — one projection, no shuffle.
    """
    toks = tokens_col(text_col)
    hit_cols = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in LANG_STOPWORDS.items()
    }
    langs = list(hit_cols)
    best = F.greatest(*[hit_cols[l] for l in langs])
    pred = F.lit("unknown")
    # reverse order so earlier languages win ties deterministically
    for lang in reversed(langs):
        pred = F.when(
            (hit_cols[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return df.withColumn(out_col, pred)


def quality_score(
    df: DataFrame, text_col: str = "text", out_col: str = "quality"
) -> DataFrame:
    """Heuristic quality in [0, 1] from length, punctuation density,
    stopword ratio and mean word length; components exposed as columns."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    n_punct = F.size(
        F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0)
    )
    en_stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_ratio = F.size(F.array_intersect(toks, en_stop)) / F.greatest(
        F.least(n_tokens, F.lit(len(LANG_STOPWORDS["en"]))), F.lit(1)
    )
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    mean_word_len = n_chars / F.greatest(n_tokens, F.lit(1))
    length_score = F.least(n_chars / F.lit(1000.0), F.lit(1.0))
    word_len_score = F.when(
        (mean_word_len >= 3) & (mean_word_len <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.3))
    punct_score = F.when(punct_ratio < 0.2, F.lit(1.0)).otherwise(
        F.greatest(F.lit(1.0) - (punct_ratio - 0.2) * 2, F.lit(0.0))
    )
    score = (
        length_score * 0.3
        + word_len_score * 0.2
        + punct_score * 0.2
        + F.least(stop_ratio, F.lit(1.0)) * 0.3
    )
    return (
        df.withColumn("punct_ratio", punct_ratio.cast("double"))
        .withColumn("stopword_ratio", F.least(stop_ratio, F.lit(1.0)).cast("double"))
        .withColumn("mean_word_len", mean_word_len.cast("double"))
        .withColumn(out_col, score.cast("double"))
    )


def document_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "fingerprint",
    shingle_size: int = 8,
) -> DataFrame:
    """Content fingerprint: xxhash64 of the text plus a winnowed
    min-shingle-hash robust to small edits (the rolling-hash analogue
    expressed with sequence/transform/min)."""
    from .dedup import _shingle_expr

    min_shingle = F.array_min(
        F.transform(
            _shingle_expr(text_col, shingle_size), lambda s: F.xxhash64(s)
        )
    )
    return df.withColumn(
        out_col, F.xxhash64(F.col(text_col))
    ).withColumn(f"{out_col}_robust", min_shingle)


# RE2-compatible patterns (no backreferences/lookaround): identical
# semantics in Spark's Java regex and DuckDB's RE2, which is what lets
# the redaction oracle compare transformed text byte-for-byte.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9]{1,3}[ .\-]?\(?[0-9]{3}\)?[ .\-][0-9]{3}[ .\-][0-9]{4}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
    kinds: tuple = ("email", "ipv4", "phone"),
) -> DataFrame:
    """Replace email/IPv4/phone-shaped substrings with ``[KIND]``
    tokens and count replacements per kind — the scrubbing pass of a
    training-data pipeline.  Pure Catalyst ``regexp_replace`` chains
    (whole-stage codegen, no shuffle, no Python); counts are derived
    from length deltas of a single-kind redaction, so one scan
    computes text and counts together.
    """
    out = df
    redacted = F.col(text_col)
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        token = f"[{kind.upper()}]"
        # matches collapse to a fixed token; count = how many times a
        # lone-kind replace shrinks the remaining text, recovered as
        # the occurrence count via split-size (RE2-safe, no lookaround)
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.split(redacted, pat)) - 1,
        )
        redacted = F.regexp_replace(redacted, pat, token)
    return out.withColumn(out_col, redacted)
