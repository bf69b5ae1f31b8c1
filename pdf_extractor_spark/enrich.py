"""Post-extraction enrichment: quality metadata for the training-corpus path.

A production corpus build doesn't stop at extracted_text — it filters on
quality signals. This stage adds them as PURE COLUMN EXPRESSIONS (JVM-side,
whole-stage codegen, no Python) so enrichment costs one projection, never a
second UDF pass. Mirrors the operator-library text suite (operators/
textstats.py) but applied to the engine's own output table.

Columns added:
  n_chars        length of extracted_text
  n_tokens       whitespace tokens
  avg_token_len  chars per token (quality signal: ~4-7 for natural language)
  punct_ratio    punctuation chars / total (junk detector)
  upper_ratio    uppercase chars / letters (SHOUTING / nav-menu detector)
  lang_guess     tiny stopword-vote language id (en/fr/es/de; null if no hit)
  quality_ok     composite boolean gate (the corpus-filter predicate)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# per-language stopword probes (same idea as operators/textstats.text_lang_id)
_LANG_PROBES = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "que"],
    "de": ["der", "und", "die"],
}

MIN_TOKENS = 5
MAX_AVG_TOKEN_LEN = 14.0
MAX_PUNCT_RATIO = 0.25
MAX_UPPER_RATIO = 0.5


_WS = r"[ \t\n\r\f\x0B]"  # same explicit class as the rest of the engine


def _count_word(col, word: str):
    # lookaround boundaries so the shared separator between adjacent
    # occurrences ("the the the") isn't consumed — a split-based count
    # collapses each adjacent pair and undercounts the vote
    return F.regexp_count(
        F.concat(F.lit(" "), col, F.lit(" ")),
        F.lit(rf"(?<={_WS}){word}(?={_WS})"),
    )


def enrich_extracted(extracted: DataFrame, text_col: str = "extracted_text") -> DataFrame:
    """Add quality-metadata columns to an extracted table. One projection."""
    t = F.col(text_col)
    lower = F.lower(t)
    n_chars = F.length(t)
    n_tokens = F.when(n_chars > 0, F.size(F.split(F.trim(t), r"[ \t\n\r\f\x0B]+"))).otherwise(0)
    # À-ÿ minus × (U+00D7) and ÷ (U+00F7): the two non-letters inside the
    # Latin-1 letter range would otherwise skew the ratios
    letters = F.length(F.regexp_replace(t, r"[^A-Za-zÀ-ÖØ-öø-ÿ]", ""))
    uppers = F.length(F.regexp_replace(t, r"[^A-ZÀ-ÖØ-Þ]", ""))
    punct = F.length(t) - F.length(F.regexp_replace(t, r"""[.,;:!?()\[\]{}"'/\\|@#$%^&*_+=~`<>-]""", ""))

    votes = [
        (lang, sum((_count_word(lower, w) for w in ws[1:]), _count_word(lower, ws[0])))
        for lang, ws in _LANG_PROBES.items()
    ]
    best = F.greatest(*[v for _, v in votes])
    lang_guess = F.when(best <= 0, F.lit(None))
    for lang, v in votes:
        lang_guess = lang_guess.when(v == best, F.lit(lang))

    df = extracted.withColumns(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "avg_token_len": F.when(n_tokens > 0, (n_chars / n_tokens)).otherwise(0.0),
            "punct_ratio": F.when(n_chars > 0, punct / n_chars).otherwise(0.0),
            "upper_ratio": F.when(letters > 0, uppers / letters).otherwise(0.0),
            "lang_guess": lang_guess,
        }
    )
    return df.withColumn(
        "quality_ok",
        (F.col("parse_status") == "ok")
        & (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("avg_token_len") <= MAX_AVG_TOKEN_LEN)
        & (F.col("punct_ratio") <= MAX_PUNCT_RATIO)
        & (F.col("upper_ratio") <= MAX_UPPER_RATIO),
    )
