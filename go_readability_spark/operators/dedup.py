"""Deduplication operators for the training-data pipeline.

Five strategies, all pure Catalyst (no Python UDFs), each with a matching
DuckDB oracle in queries.py (the formulas live in functions/ so the two
engines share constants):

- exact        — hash-groupBy on normalized md5 (one shuffle on the hash)
- n-gram Jaccard — explode shingles → equi-join on shingle → count/union
- MinHash+LSH  — signature in one map pass; candidate pairs via equi-join
                 on (band, band_hash): the 100 TB path — no O(n²) anywhere
- SimHash      — token hash → per-bit majority vote → 16-bit fingerprint
- embedding    — cosine near-dup pairs (bounded block here; LSH-bucketed
                 variant in similarity.py for scale)

Persist lifecycle: ngram_jaccard_pairs and minhash_lsh_candidates
persist intermediates their returned (lazy) plans reference — the
caller releases them with ``spark.catalog.clearCache()`` after
materializing (bench.py does; the driver's one-shot query runs exit the
session anyway).

Scale notes: the shingle-explode join is the dominant cost; its key
distribution is zipfian, so very frequent shingles (stop-shingles) are the
skew — ``max_df`` prunes them before the join (AQE skew-split catches the
rest). Pair aggregation keys on (doc_a, doc_b), naturally spread.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import (
    band_hash,
    md5_prefix_hash,
    minhash_signature_from_hashes,
)
from ..functions.text import norm_fingerprint, shingles, tokens

__all__ = [
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_lsh_candidates",
    "simhash_fingerprints",
    "embedding_near_dups",
]


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: (text_hash, keeper_id, n_copies).

    The keeper is min(id). One shuffle, map-side partial agg for free."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            norm_fingerprint(F.col(text_col)).alias("text_hash"),
        )
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )


def _shingle_table(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    # Explicit repartition before the CPU-heavy shingle expressions: the
    # rows are tiny, so AQE would otherwise coalesce them into one
    # partition and run ~2ms/doc of per-row compute on a single core.
    # An explicit numPartitions is exempt from AQE coalescing.
    num = docs.sparkSession.sparkContext.defaultParallelism
    toks = docs.repartition(num).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t")
    )
    return toks.select("doc_id", shingles(F.col("t"), n).alias("sh"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: Optional[int] = None,
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard ≥ threshold.

    (doc_a, doc_b, jaccard) with doc_a < doc_b. Jaccard is an exact ratio
    of integer counts — identical across engines. ``max_df`` drops
    shingles occurring in more than that many docs (skew control; changes
    results, so the oracle-checked query leaves it None)."""
    # persisted: sizes + both join sides scan this (3 consumers); without
    # it every consumer recomputes tokenization + shingling from the scan
    sh = _shingle_table(docs, id_col, text_col, n).persist()
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    exploded = sh.select("doc_id", F.explode("sh").alias("shingle"))
    if max_df is not None:
        freq = exploded.groupBy("shingle").agg(F.count("*").alias("df"))
        exploded = exploded.join(
            freq.filter(F.col("df") <= max_df).select("shingle"), "shingle"
        )
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    n: int = 3,
    k: int = 16,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-dup pairs via MinHash signatures + LSH banding.

    Output (doc_a, doc_b, n_bands_hit): pairs sharing ≥1 band bucket.
    No O(n²): one map pass for signatures, one union of ``bands``
    equi-joins on (band_hash). Empty shingle sets are dropped (their
    signature is undefined)."""
    rows_per_band = k // bands
    # Materialize the per-shingle hashes as a real column before the k
    # permutations: inside one projection Catalyst does not reliably CSE
    # `transform(sh, md5(...))` across the k array_min() expressions, and
    # recomputing md5 k× dominated the runtime.
    hashed = (
        _shingle_table(docs, id_col, text_col, n)
        .filter(F.size("sh") > 0)
        .withColumn("hs", F.transform(F.col("sh"), md5_prefix_hash))
    )
    sig = hashed.select(
        "doc_id", minhash_signature_from_hashes(F.col("hs"), k).alias("sig")
    )
    # One band-hash array + posexplode = a single pass over the signatures
    # (a per-band union would recompute the whole upstream plan per band);
    # persisted because the self-join scans it twice.
    band_arr = F.array(
        *[band_hash(F.col("sig"), b, rows_per_band) for b in range(bands)]
    )
    buckets = sig.select(
        "doc_id", F.posexplode(band_arr).alias("band", "bh")
    ).persist()
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_bands_hit"))
    )


def simhash_fingerprints(
    docs: DataFrame,
    bits: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc SimHash fingerprint (frequency-weighted majority vote per
    bit over token hashes). (doc_id, simhash)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", md5_prefix_hash(F.col("tok")))
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    fingerprint = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return bit_sums.select("doc_id", fingerprint.cast("long").alias("simhash"))


def embedding_near_dups_lsh(
    embeddings: DataFrame,
    threshold: float = 0.3,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs via sign-projection LSH buckets — the scale path.

    One map pass assigns each vector a bucket; candidate pairs come from
    an equi-join on the bucket (plus exact cosine verification), so the
    cost is Σ bucket² instead of n² — with 2^n_planes buckets and
    near-uniform hashing that is ~n²/2^n_planes. Approximate: pairs whose
    vectors land in different buckets are missed (recall tunable via
    n_planes and multiprobe; see similarity.ann_topk_lsh)."""
    from ..functions.vectors import cosine_similarity
    from .similarity import lsh_bucket_col

    emb = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_col(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.round(
                cosine_similarity(F.col("a.vec"), F.col("b.vec")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.3,
    id_limit: Optional[int] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-dup pairs (vec_a, vec_b, cos) with vec_a < vec_b.

    Quadratic in the block size — callers bound it (``id_limit``) or use
    similarity.py's LSH-bucketed variant for full-corpus scale."""
    from ..functions.vectors import cosine_similarity

    emb = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    )
    if id_limit is not None:
        emb = emb.filter(F.col("vid") < id_limit)
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.round(
                cosine_similarity(F.col("a.vec"), F.col("b.vec")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
