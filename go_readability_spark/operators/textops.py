"""Text-analysis operators: language ID, quality scoring, token counts,
document fingerprints. All pure Catalyst; formulas shared with the DuckDB
oracles via functions/text.py + the constants below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import (
    bpe_token_count,
    norm_fingerprint,
    rolling_hash,
    tokens,
    ws_token_count,
)

__all__ = [
    "STOPWORDS",
    "LANG_MARKERS",
    "PUNCT_RE",
    "text_profile",
    "language_id",
    "fingerprints",
]

# quality-scoring stopwords (english-ish; the corpus vocabulary is synthetic
# so these measure "function-word density", not real language)
STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

# language-ID marker families, checked in this priority order
LANG_MARKERS = (
    ("en", ("the", "and", "of", "to", "is")),
    ("de", ("der", "die", "und", "das", "ist")),
    ("es", ("el", "la", "que", "los", "es")),
    ("fr", ("le", "la", "et", "les", "est")),
)

PUNCT_RE = r"[.,;:!?]"


def _count_in(tokens_col, words: tuple[str, ...]):
    lits = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens_col, lambda t: F.array_contains(lits, t)))


def text_profile(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_bpe_tokens, punct_ratio,
    stopword_ratio, quality) — quality ∈ [0,1], higher = cleaner prose.

    All ratios are exact integer quotients in double precision; the final
    blend uses the same operation order as the SQL oracle."""
    toks = tokens(F.col(text_col))
    n_tokens = ws_token_count(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(PUNCT_RE), 0))
    n_stop = _count_in(toks, STOPWORDS)
    # quality blends the UNROUNDED ratios: multiplying a 6-digit-rounded
    # ratio by 5/10 lands exactly on a .5 at digit 7 whenever the rounded
    # ratio's last digit is odd, and Spark/DuckDB break double round-half
    # ties differently — unrounded inputs avoid the systematic tie
    punct_raw = n_punct / F.greatest(n_chars, F.lit(1))
    stop_raw = n_stop / F.greatest(n_tokens, F.lit(1))
    punct_ratio = F.round(punct_raw, 6)
    stop_ratio = F.round(stop_raw, 6)
    quality = F.round(
        F.lit(0.4) * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_raw * 10, F.lit(1.0)))
        + F.lit(0.3) * F.least(stop_raw * 5, F.lit(1.0)),
        6,
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        bpe_token_count(F.col(text_col)).alias("n_bpe_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_hits) — argmax of marker-word hits with
    fixed priority tie-break; 'und' when no family matches."""
    toks = tokens(F.col(text_col))
    scores = {
        lang: _count_in(toks, words) for lang, words in LANG_MARKERS
    }
    langs = [lang for lang, _ in LANG_MARKERS]
    pred = F.lit("und")
    best = F.lit(0)
    # iterate in reverse priority so earlier families win ties
    for lang in reversed(langs):
        s = scores[lang]
        pred = F.when(s >= best, F.lit(lang)).otherwise(pred)
        best = F.greatest(best, s)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("lang_pred"),
        best.alias("lang_hits"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, norm_md5, rolling) — exact-dup key + 31-base rolling hash."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        norm_fingerprint(F.col(text_col)).alias("norm_md5"),
        rolling_hash(F.col(text_col)).alias("rolling"),
    )
