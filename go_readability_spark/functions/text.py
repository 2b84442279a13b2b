"""Cross-engine text-analysis expressions (tokens, shingles, fingerprints).

Paired Spark-Column / DuckDB-SQL builders; shared regexes and constants.
Token counting and quality scoring are pure integer/regex arithmetic so the
two engines agree exactly; fingerprints are md5 (byte-identical) and a
31-base rolling hash folded left in array order on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "WS_SPLIT",
    "BPE_TOKEN_RE",
    "ROLLING_P",
    "tokens",
    "tokens_sql",
    "shingles",
    "shingles_sql",
    "ws_token_count",
    "ws_token_count_sql",
    "bpe_token_count",
    "bpe_token_count_sql",
    "norm_fingerprint",
    "norm_fingerprint_sql",
    "rolling_hash",
    "rolling_hash_sql",
]

WS_SPLIT = r"\s+"
# BPE-ish pre-tokenizer: word pieces OR single non-space symbols
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
ROLLING_P = 1_000_000_007


def tokens(col: Column) -> Column:
    """Whitespace tokens of trimmed text (array<string>).

    NULL text coalesces to '' on BOTH engines (here and tokens_sql) —
    otherwise Spark's legacy size(NULL) = -1 vs SQL NULL propagation
    makes every token-derived column diverge for null rows."""
    return F.split(F.trim(F.coalesce(col, F.lit(""))), WS_SPLIT)


def tokens_sql(expr: str) -> str:
    return f"regexp_split_to_array(trim(coalesce({expr}, '')), '{WS_SPLIT}')"


def ws_token_count(col: Column) -> Column:
    return F.when(F.trim(F.coalesce(col, F.lit(""))) == "", F.lit(0)).otherwise(
        F.size(tokens(col))
    )


def ws_token_count_sql(expr: str) -> str:
    return (
        f"case when trim(coalesce({expr}, '')) = '' then 0 "
        f"else len({tokens_sql(expr)}) end"
    )


def bpe_token_count(col: Column) -> Column:
    return F.size(
        F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(BPE_TOKEN_RE), 0)
    )


def bpe_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all(coalesce({expr}, ''), '{BPE_TOKEN_RE}'))"


def shingles(tokens_col: Column, n: int = 3) -> Column:
    """Distinct sorted word n-grams (array<string>) from a tokens column.

    Takes the already-computed ``tokens(...)`` column (mirroring the SQL
    side, where tokens live in a prior CTE). 1-based indexing on both
    engines; documents shorter than n yield an empty array."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tokens_col) - n + 1, F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens_col, i + F.lit(j)) for j in range(n)]
        ),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(tokens_col) < n, empty).otherwise(
        F.array_sort(F.array_distinct(grams))
    )


def shingles_sql(tokens_ref: str, n: int = 3) -> str:
    """Same n-grams from a tokens array column reference (e.g. a CTE col)."""
    parts = " || ' ' || ".join(f"{tokens_ref}[i + {j}]" for j in range(n))
    return (
        f"case when len({tokens_ref}) < {n} then [] "
        f"else list_sort(list_distinct(list_transform("
        f"range(1, greatest(len({tokens_ref}) - {n} + 1, 0) + 1), "
        f"i -> {parts}))) end"
    )


def norm_fingerprint(col: Column) -> Column:
    """md5 of whitespace-normalized lowercase text — exact-dup key."""
    return F.md5(
        F.regexp_replace(
            F.lower(F.trim(F.coalesce(col, F.lit("")))), WS_SPLIT, " "
        )
    )


def norm_fingerprint_sql(expr: str) -> str:
    return (
        f"md5(regexp_replace(lower(trim(coalesce({expr}, ''))), "
        f"'{WS_SPLIT}', ' ', 'g'))"
    )


def rolling_hash(col: Column) -> Column:
    """31-base rolling hash over the md5-prefix hashes of the whitespace
    tokens (document fingerprint; left fold in token order).

    Token-level, not char-level: a char-level fold over split('') pairs
    Spark's UTF-16 code units against DuckDB's code points, diverging on
    non-BMP text; md5-prefix token hashes are verified engine-exact."""
    from .hashing import md5_prefix_hash

    hashes = F.transform(tokens(col), md5_prefix_hash)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % ROLLING_P,
    )


def rolling_hash_sql(expr: str) -> str:
    from .hashing import md5_prefix_hash_sql

    h = md5_prefix_hash_sql("t")
    return (
        f"list_reduce(list_prepend(0::bigint, "
        f"list_transform({tokens_sql(expr)}, t -> {h})), "
        f"(acc, h) -> (acc * 31 + h) % {ROLLING_P})"
    )
