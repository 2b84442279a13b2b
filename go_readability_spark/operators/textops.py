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
    "quality_filter",
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


# Gopher-style document-quality gates (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", §A1.1 — public heuristics). Thresholds are the
# paper's, except min_words which is scaled to the short synthetic docs.
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1  # per symbol family, as in the paper
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MAX_DUP_LINE_FRAC = 0.3


def quality_filter(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style keep/reject gates, one boolean per rule + verdict.

    Pure Catalyst: word stats from the shared tokens(); the duplicate-
    line fraction (the one corpus-statistic-free repetition signal) is
    computed per document with array ops — lines that occur more than
    once, as a fraction of all non-empty lines. The symbol gate follows
    the paper: '#' and '...' ratios are computed and thresholded
    SEPARATELY (a doc passes only if both are <= the cap). Output:
    (doc_id, n_words, mean_word_len, hash_ratio, ellipsis_ratio,
    alpha_word_frac, dup_line_frac, pass_*, keep)."""
    toks = tokens(F.col(text_col))
    n_words = ws_token_count(F.col(text_col))
    # mean word length over the words themselves (not chars/words — that
    # would count whitespace); left as exact double quotient.
    # Σ length(token) == length(concat of tokens) — an exact integer
    # identity that swaps the interpreted per-token aggregate() lambda
    # (~30 µs/element, outside whole-stage codegen) for one codegen'd
    # concat_ws+length
    total_word_chars = F.length(F.concat_ws("", toks))
    mean_wl = total_word_chars / F.greatest(n_words, F.lit(1)).cast("double")
    text_nn = F.coalesce(F.col(text_col), F.lit(""))
    n_hash = F.size(F.regexp_extract_all(text_nn, F.lit(r"#"), 0))
    n_ellipsis = F.size(F.regexp_extract_all(text_nn, F.lit(r"\.\.\."), 0))
    denom_w = F.greatest(n_words, F.lit(1)).cast("double")
    hash_ratio = n_hash / denom_w
    ellipsis_ratio = n_ellipsis / denom_w
    # tokens-containing-a-letter counted directly on the text: \S runs
    # are exactly the \s+-split tokens, and `[A-Za-z]\S*` yields exactly
    # one match per run containing a letter (first letter anchors, \S*
    # consumes to the run's end so no second match can start inside it)
    # — same count as the filter(rlike) HOF without the interpreted
    # per-token lambda. A leading \S* would backtrack O(n^2) on long
    # letterless runs (100 KB digit blobs); this form fails each
    # non-letter start position in O(1).
    n_alpha_words = F.size(
        F.regexp_extract_all(text_nn, F.lit(r"[A-Za-z]\S*"), 0)
    )
    alpha_frac = n_alpha_words / F.greatest(n_words, F.lit(1)).cast("double")
    lines = F.filter(
        F.transform(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n"),
            lambda l: F.trim(l),
        ),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    n_distinct_lines = F.size(F.array_distinct(lines))
    dup_line_frac = (n_lines - n_distinct_lines) / F.greatest(
        n_lines, F.lit(1)
    ).cast("double")

    p_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    p_wl = (mean_wl >= GOPHER_MIN_MEAN_WORD_LEN) & (
        mean_wl <= GOPHER_MAX_MEAN_WORD_LEN
    )
    p_sym = (hash_ratio <= GOPHER_MAX_SYMBOL_RATIO) & (
        ellipsis_ratio <= GOPHER_MAX_SYMBOL_RATIO
    )
    p_alpha = alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC
    p_dup = dup_line_frac <= GOPHER_MAX_DUP_LINE_FRAC
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(hash_ratio, 6).alias("hash_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        p_words.alias("pass_n_words"),
        p_wl.alias("pass_mean_word_len"),
        p_sym.alias("pass_symbol_ratio"),
        p_alpha.alias("pass_alpha_words"),
        p_dup.alias("pass_dup_lines"),
        (p_words & p_wl & p_sym & p_alpha & p_dup).alias("keep"),
    )
