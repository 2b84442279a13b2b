"""Dedup operator tests: NGram shingle parity + minhash/jaccard sanity.

The production gram builder is pyspark.ml.feature.NGram (JVM sliding
window); `functions.text.shingles()` is the Catalyst reference
formulation the DuckDB oracles mirror. These tests pin the two paths
byte-identical so swapping the builder for speed (round 2) can never
drift from the oracle semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_readability_spark.functions.text import shingles, tokens
from go_readability_spark.operators.dedup import (
    _shingle_table,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)

TEXTS = [
    ("a", "the quick brown fox jumps over the lazy dog"),
    ("b", "the quick brown fox jumps over the lazy cat"),
    ("c", "completely different words entirely here now"),
    ("d", "the quick brown fox jumps over the lazy dog"),  # dup of a
    ("e", "short"),  # < n tokens -> empty shingles
    ("f", ""),  # empty text
    ("g", "  leading   and trailing   whitespace   everywhere  "),
    ("h", "rep rep rep rep rep rep"),  # degenerate: 1 distinct shingle
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, ["doc_id", "text"])


def test_ngram_shingles_match_reference_hof(spark, docs):
    """NGram-built shingle table == the Catalyst shingles() reference."""
    via_ngram = {
        r["doc_id"]: r["sh"] for r in _shingle_table(docs, "doc_id", "text", 3).collect()
    }
    via_hof = {
        r["doc_id"]: r["sh"]
        for r in docs.select(
            "doc_id", shingles(tokens(F.col("text")), 3).alias("sh")
        ).collect()
    }
    assert via_ngram == via_hof


def test_ngram_shingles_match_on_corpus(spark):
    """Same parity over the synthetic corpus population (real doc text)."""
    from go_readability_spark.corpus import generate_corpus

    rows = [
        (doc_id, " ".join(s["text"] or "" for s in spans))
        for doc_id, spans in generate_corpus(40)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    a = _shingle_table(docs, "doc_id", "text", 3).collect()
    b = docs.select(
        "doc_id", shingles(tokens(F.col("text")), 3).alias("sh")
    ).collect()
    assert {r["doc_id"]: r["sh"] for r in a} == {r["doc_id"]: r["sh"] for r in b}


def test_minhash_exact_dups_hit_all_bands(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_bands_hit"]
        for r in minhash_lsh_candidates(docs, n=3, k=16, bands=8).collect()
    }
    assert pairs[("a", "d")] == 8  # identical docs agree on every band
    assert ("a", "c") not in pairs  # disjoint shingles share no bucket


def test_jaccard_max_df_prunes_stop_shingles(spark):
    # 5 docs all sharing one stop-shingle; only two of them are near-dups
    rows = [
        ("d1", "common stop shingle alpha beta gamma"),
        ("d2", "common stop shingle delta epsilon zeta"),
        ("d3", "common stop shingle eta theta iota"),
        ("d4", "unique text one two three common stop shingle"),
        ("d5", "unique text one two three common stop shingle"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # cap df at 4: 'common stop shingle' appears in 5 docs -> pruned
    pruned = {
        (r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs, 3, 0.9, max_df=4).collect()
    }
    assert ("d4", "d5") in pruned
    assert all(p == ("d4", "d5") for p in pruned)
    # uncapped path still reports every pair sharing the stop shingle
    full = ngram_jaccard_pairs(docs, 3, 0.01, max_df=None).count()
    assert full == 10  # all C(5,2) pairs share >= 1 shingle


class TestAnnVariants:
    def test_ivf_matches_bruteforce_within_probed_cells(self, spark):
        """IVF results are exactly the brute-force ranking restricted to
        the probed cells — and recall against full brute force is
        reasonable on the real embeddings table."""
        from go_readability_spark.operators.similarity import (
            ann_topk_bruteforce,
            ann_topk_ivf,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        exact = [r["vec_id"] for r in ann_topk_bruteforce(emb, 0, 10).collect()]
        ivf = [r["vec_id"] for r in ann_topk_ivf(emb, 0, 10).collect()]
        assert len(ivf) == 10
        # approximate: some overlap expected, exact ordering within probe
        overlap = len(set(exact) & set(ivf))
        assert overlap >= 1
        # determinism: re-running yields the identical list
        assert ivf == [r["vec_id"] for r in ann_topk_ivf(emb, 0, 10).collect()]


class TestQualityFilter:
    def test_gopher_gates(self, spark):
        from go_readability_spark.operators.textops import quality_filter

        rows = [
            (1, "the quick brown fox jumps over the lazy dog and then "
                "runs far away into the green forest tonight again soon"),  # clean
            (2, "ok"),  # too few words
            (3, "### ### ### " + "word " * 30),  # symbol-heavy
            (4, ("line one\nline one\nline one\nline two\n" + "w " * 30)),  # dup lines
            (5, "123 456 789 " * 10),  # no alpha words
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in quality_filter(docs).collect()}
        assert out[1]["keep"] is True
        assert out[2]["pass_n_words"] is False and out[2]["keep"] is False
        assert out[3]["pass_symbol_ratio"] is False
        assert out[4]["pass_dup_lines"] is False
        assert out[5]["pass_alpha_words"] is False

    def test_alpha_word_count_matches_token_filter_reference(self, spark):
        """The codegen'd `[A-Za-z]\\S*` count must equal the per-token
        filter(rlike) HOF reference — one match per letter-containing
        \\S-run — including on a long letterless blob (the input where
        a leading \\S* would backtrack O(n^2) and stall an executor)."""
        from go_readability_spark.operators.textops import quality_filter

        rows = [
            (1, "abc 123 a1b 1a1 --- ...x x... ## #a#"),
            (2, "1234567890" * 20_000),          # 200 KB letterless run
            (3, ("9" * 5000 + "z" + "8" * 5000 + " ") * 3),
            (4, ""),
            (5, None),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        ref = docs.select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.trim(F.coalesce("text", F.lit(""))), r"\s+"),
                    lambda w: w.rlike("[A-Za-z]"),
                )
            ).alias("n_alpha_ref"),
            F.size(
                F.filter(
                    F.split(F.trim(F.coalesce("text", F.lit(""))), r"\s+"),
                    lambda w: w != "",
                )
            ).alias("n_words_ref"),
        )
        got = quality_filter(docs).select(
            "doc_id", "n_words", "alpha_word_frac"
        )
        for r in got.join(ref, "doc_id").collect():
            denom = max(r["n_words_ref"], 1)
            assert r["n_words"] == r["n_words_ref"], r
            assert r["alpha_word_frac"] == round(
                r["n_alpha_ref"] / denom, 6
            ), r


class TestComponents:
    def test_chain_needs_multiple_iterations(self, spark):
        """A path graph is the worst case for min-label propagation
        (diameter = n-1); the loop must still converge to one component."""
        from go_readability_spark.operators.dedup import dedup_components

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(9)], "doc_a long, doc_b long"
        )
        rows = {r["doc_id"]: r for r in dedup_components(pairs).collect()}
        assert len(rows) == 10
        assert all(r["component_id"] == 0 for r in rows.values())
        assert all(r["component_size"] == 10 for r in rows.values())

    def test_disjoint_components(self, spark):
        from go_readability_spark.operators.dedup import dedup_components

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 8), (20, 21), (21, 22), (20, 22)],
            "doc_a long, doc_b long",
        )
        rows = {r["doc_id"]: (r["component_id"], r["component_size"])
                for r in dedup_components(pairs).collect()}
        assert rows[1] == rows[2] == rows[3] == (1, 3)
        assert rows[7] == rows[8] == (7, 2)
        assert rows[20] == rows[21] == rows[22] == (20, 3)

    def test_worst_case_chain_converges_in_log_rounds(self, spark):
        """A 256-node path graph: O(diameter) min-label propagation
        needs 255 rounds; large-star/small-star must finish in
        O(log2 n) + c — the scale property the operator claims."""
        import math

        from go_readability_spark.operators.dedup import dedup_components

        n = 256
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
        )
        stats: dict = {}
        rows = {
            r["doc_id"]: r
            for r in dedup_components(pairs, stats=stats).collect()
        }
        assert len(rows) == n
        assert all(r["component_id"] == 0 for r in rows.values())
        assert all(r["component_size"] == n for r in rows.values())
        assert stats["rounds"] <= int(math.log2(n)) + 4

    def test_mega_chain_converges_in_log_rounds_bounded_edges(self, spark):
        """One order of magnitude up (tools/dedup_scale.py scale): a
        4096-node path — diameter 4095, so plain min-label propagation
        needs ~4095 rounds — must close in <= log2(n)+4 = 16 rounds,
        and the per-round shuffled edge count (stats['edge_counts'],
        read for free from the convergence Observation) must never
        exceed 2x the input edges: star rewiring reshapes the edge
        set, it does not blow it up. This is the empirical bounded-
        state proof for the 100 TB chain-of-templated-pages shape."""
        import math

        from go_readability_spark.operators.dedup import dedup_components

        n = 4096
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
        ).repartition(8)
        stats: dict = {}
        out = dedup_components(pairs, max_iter=20, stats=stats)
        agg = out.groupBy("component_id", "component_size").count().collect()
        assert len(agg) == 1
        assert agg[0]["component_id"] == 0
        assert agg[0]["component_size"] == n
        assert agg[0]["count"] == n
        assert stats["rounds"] <= int(math.log2(n)) + 4
        assert len(stats["edge_counts"]) == stats["rounds"]
        assert max(stats["edge_counts"]) <= 2 * (n - 1)

    def test_random_graphs_match_bruteforce(self, spark):
        """Randomized cross-check: star-algorithm labels equal a
        driver-side union-find ground truth on arbitrary graphs."""
        import random

        from go_readability_spark.operators.dedup import dedup_components

        rng = random.Random(42)
        for trial in range(3):
            n = 60
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(70)
            ]
            edges = [(a, b) for a, b in edges if a != b]
            parent = list(range(n))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in edges:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            touched = sorted({v for e in edges for v in e})
            truth = {v: find(v) for v in touched}
            pairs = spark.createDataFrame(
                edges, "doc_a long, doc_b long"
            )
            got = {
                r["doc_id"]: r["component_id"]
                for r in dedup_components(pairs).collect()
            }
            assert got == truth, f"trial {trial}"

    def test_nonconvergence_raises(self, spark):
        from go_readability_spark.operators.dedup import dedup_components

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(63)], "doc_a long, doc_b long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            dedup_components(pairs, max_iter=1).count()

    def test_checkpoint_blocks_released(self, spark):
        """The operator owns its persist lifecycle: after collecting the
        result, only the result's own checkpoint blocks may remain."""
        from go_readability_spark.operators.dedup import (
            _persistent_rdd_ids,
            _unpersist_rdd_ids,
            dedup_components,
        )

        sc = spark.sparkContext
        before = _persistent_rdd_ids(sc)
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
        )
        out = dedup_components(pairs)
        assert out.count() == 41
        leftover = _persistent_rdd_ids(sc) - before
        # the self-contained result = exactly one checkpointed RDD
        assert len(leftover) <= 1
        _unpersist_rdd_ids(sc, leftover)


def test_persist_scope_frees_operator_persists(spark):
    """persist_scope gives callers ownership of the eager persists the
    self-joining operators create (which must outlive their returned
    plan, so the operators themselves can never free them) — including
    localCheckpoint blocks clearCache never touches."""
    from go_readability_spark.operators.dedup import (
        dedup_components,
        minhash_lsh_candidates,
    )
    from go_readability_spark.plans import persist_scope
    from go_readability_spark.plans.cache import persistent_rdd_ids

    sc = spark.sparkContext
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * 3)
         for i in range(6)],
        "doc_id long, text string",
    )
    before = persistent_rdd_ids(sc)
    with persist_scope(spark):
        pairs = minhash_lsh_candidates(docs)
        assert pairs.count() > 0          # materialized inside the scope
        comp = dedup_components(pairs.selectExpr(
            "cast(doc_a as long) doc_a", "cast(doc_b as long) doc_b"))
        assert comp.count() > 0
        assert persistent_rdd_ids(sc) - before  # persists exist in-scope
    assert persistent_rdd_ids(sc) - before == set()  # all freed on exit

    # pre-existing persists are NOT the scope's to free
    keep = docs.persist()
    keep.count()
    held = persistent_rdd_ids(sc) - before
    assert held
    with persist_scope(spark):
        minhash_lsh_candidates(docs).count()
    assert held <= persistent_rdd_ids(sc)
    keep.unpersist()


def test_dedup_components_string_ids(spark):
    """Ids keep their native type: string ids (md5 keepers, URLs) must
    cluster correctly — a numeric cast would NULL them out and silently
    return an empty result."""
    from go_readability_spark.operators.dedup import dedup_components

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("q", "q")],
        "doc_a string, doc_b string",
    )
    rows = dedup_components(pairs).collect()
    comp = {r["doc_id"]: r["component_id"] for r in rows}
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    sizes = {r["doc_id"]: r["component_size"] for r in rows}
    assert sizes == {"a": 3, "b": 3, "c": 3, "x": 2, "y": 2}


def test_dedup_semantic_decision_table_invariants(spark):
    """The composed SemDeDup query (LSH pairs -> components -> keeper)
    must produce a total decision table: one row per corpus vector,
    exactly one keeper per cluster, the keeper is the cluster minimum,
    cluster_size counts its members, and singletons keep themselves."""
    from go_readability_spark.plans.cache import persist_scope
    from go_readability_spark.queries import q_dedup_semantic

    sf = "/root/testdata/sf0.001"
    with persist_scope(spark):
        rows = q_dedup_semantic(spark, sf).collect()
    n_corpus = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    assert len(rows) == n_corpus
    assert len({r["vec_id"] for r in rows}) == n_corpus  # total, no dups

    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        sizes = {r["cluster_size"] for r in members}
        assert sizes == {len(members)}, (cid, sizes, len(members))
        keepers = [r for r in members if r["keep"]]
        assert len(keepers) == 1, (cid, keepers)
        assert keepers[0]["vec_id"] == cid == min(
            r["vec_id"] for r in members
        )
    # the corpus engineers real near-dup structure: some multi-member
    # cluster must exist AND some singleton must exist, or the test
    # corpus stopped exercising the join/coalesce paths
    sizes = sorted(len(m) for m in by_cluster.values())
    assert sizes[0] == 1 and sizes[-1] > 1


def test_blocked_exact_pairs_match_pairwise_reference(spark):
    """embedding_near_dups_blocked must reproduce the nested-loop
    reference EXACTLY — pair set and bit-level cosines — including on
    hostile rows: NULL vectors and mixed-length vectors (same-length
    ragged pairs compute, cross-length pairs drop), zero-norm vectors
    (NULL cosine, dropped), NaN elements (NaN cosine, KEPT by total
    ordering), and ids spanning multiple id-range blocks."""
    from go_readability_spark.operators.dedup import (
        embedding_near_dups,
        embedding_near_dups_blocked,
    )

    rows = []
    # clusters of near-identical vectors across block boundaries
    # (block_size=4 below -> ids 0..19 span 5 blocks)
    for i in range(16):
        rows.append((i, [1.0 + 0.01 * i, 2.0, 3.0 - 0.01 * i]))
    rows += [
        (16, None),                      # NULL vector
        (17, [5.0, 5.0]),                # len-2 ...
        (18, [5.0, 5.00001]),            # ... pairs with 17 (same len)
        (19, [0.0, 0.0, 0.0]),           # zero norm: NULL cos, dropped
        (20, [float("nan"), 1.0, 1.0]),  # NaN data: kept pairs
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ref = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in embedding_near_dups(emb, 0.3).collect()
    }
    blk = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in embedding_near_dups_blocked(
            emb, 0.3, block_size=4
        ).collect()
    }
    assert set(ref) == set(blk)
    for k in ref:
        rv, bv = ref[k], blk[k]
        assert (rv == bv) or (rv != rv and bv != bv), (k, rv, bv)
    # sanity on the hostile semantics themselves (not just agreement)
    assert (17, 18) in ref                     # same-length ragged pair
    assert not any(16 in k or 19 in k for k in ref)  # NULL/zero dropped
    assert any(20 in k for k in ref)           # NaN pairs kept


def test_blocked_null_ids_drop_like_pairwise(spark):
    """A NULL id row drops from the blocked operator's output exactly
    as the pairwise reference drops it (its a.vid < b.vid condition is
    NULL) — it must not crash the driver-side block enumeration."""
    from go_readability_spark.operators.dedup import (
        embedding_near_dups,
        embedding_near_dups_blocked,
    )

    rows = [
        (0, [1.0, 2.0, 3.0]),
        (1, [1.01, 2.0, 2.99]),
        (None, [1.0, 2.0, 3.0]),  # would pair with both if id were set
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ref = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dups(emb, 0.3).collect()
    }
    blk = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dups_blocked(emb, 0.3, block_size=4).collect()
    }
    assert ref == blk == {(0, 1)}


def test_blocked_rejects_non_integral_ids(spark):
    """Non-integral ids would be silently truncated by the block cast
    (5.2 and 5.7 both become vid=5, merging distinct vectors); the
    operator must refuse instead of diverging from the pairwise form."""
    import pytest

    from go_readability_spark.operators.dedup import (
        embedding_near_dups_blocked,
    )

    emb = spark.createDataFrame(
        [(5.2, [1.0, 2.0]), (5.7, [1.0, 2.0])],
        "vec_id double, embedding array<double>",
    )
    with pytest.raises(ValueError, match="integral"):
        embedding_near_dups_blocked(emb, 0.3, block_size=4)
