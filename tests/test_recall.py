"""ANN quality gates: recall floors, codebook training, planted pairs.

The approximate operators (LSH, IVF, stored twins) are oracle-verified
DETERMINISTIC — these tests additionally pin how GOOD they are: recall@k
against the exact top-k must clear empirical floors on the synthetic
corpus (near-isotropic unit vectors, so the floors are modest — sign-LSH
and IVF pruning beat random candidate selection by 2-4× but cannot reach
0.9 on structureless data; the planted-twin test covers the
true-near-dup regime where recall IS high). Everything here is
deterministic (fixed panel, fixed hyperplanes/codebook arithmetic), so
failures mean the algorithm changed, not noise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_readability_spark.plans.cache import persist_scope

SF = "/root/testdata/sf0.01"
QIDS = tuple(range(3, 448, 7))  # the registry panel (queries.ANN_RECALL_QIDS)


@pytest.fixture(scope="module")
def recall_rows(spark):
    from go_readability_spark.operators.ann_eval import ann_recall_table

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with persist_scope(spark):
        rows = ann_recall_table(emb, QIDS, k=10).collect()
    return {r["variant"]: r for r in rows}


class TestRecallFloors:
    def test_panel_shape(self, recall_rows):
        assert set(recall_rows) == {
            "lsh_single", "lsh_multi",
            "ivf_seed_np1", "ivf_seed_np2", "ivf_seed_np4", "ivf_seed_np8",
            "ivf_trained_np1", "ivf_trained_np2", "ivf_trained_np4",
            "ivf_trained_np8",
        }
        for r in recall_rows.values():
            assert r["n_queries"] == 64 and r["k"] == 10

    def test_recall_floors(self, recall_rows):
        """Empirical floors (measured 2026-08, sf0.01: lsh_multi 0.481,
        ivf_seed_np4 0.500, ivf_seed_np8 0.738, ivf_trained_np4 0.567,
        ivf_trained_np8 0.781) with a safety margin — a drop below
        means the bucketing/assignment/rerank algorithm regressed."""
        assert recall_rows["lsh_multi"]["recall_at_k"] >= 0.40
        assert recall_rows["ivf_seed_np4"]["recall_at_k"] >= 0.42
        assert recall_rows["ivf_seed_np8"]["recall_at_k"] >= 0.65
        assert recall_rows["ivf_trained_np4"]["recall_at_k"] >= 0.48
        assert recall_rows["ivf_trained_np8"]["recall_at_k"] >= 0.70

    def test_recall_monotone_in_nprobe(self, recall_rows):
        for fam in ("ivf_seed", "ivf_trained"):
            rs = [recall_rows[f"{fam}_np{p}"]["recall_at_k"] for p in (1, 2, 4, 8)]
            assert rs == sorted(rs), rs
        assert (
            recall_rows["lsh_multi"]["recall_at_k"]
            >= recall_rows["lsh_single"]["recall_at_k"]
        )

    def test_training_improves_recall_at_equal_cost(self, recall_rows):
        """Lloyd's codebook must beat the seed codebook at every nprobe
        (measured gap +0.04..+0.09) at ~equal candidate fraction."""
        for p in (1, 2, 4, 8):
            seed = recall_rows[f"ivf_seed_np{p}"]
            tr = recall_rows[f"ivf_trained_np{p}"]
            assert tr["recall_at_k"] >= seed["recall_at_k"] + 0.02, (
                p, seed["recall_at_k"], tr["recall_at_k"],
            )
            # equal-cost claim: scanned fraction within 2 points
            assert abs(tr["candidate_frac"] - seed["candidate_frac"]) < 0.02

    def test_candidate_fractions_match_design(self, recall_rows):
        """The scan-cost side of the trade: nprobe/K of the corpus for
        IVF, (1 + planes)/2^planes buckets for multiprobe LSH."""
        assert abs(recall_rows["ivf_seed_np4"]["candidate_frac"] - 4 / 16) < 0.05
        assert abs(recall_rows["lsh_multi"]["candidate_frac"] - 5 / 16) < 0.07
        assert recall_rows["lsh_single"]["candidate_frac"] < 0.12


class TestPairRecall:
    def test_planted_twins_found(self, spark):
        """Every vector gets a deterministic jittered twin (cos≈0.995);
        6-plane sign-LSH must find ≥70% of the planted pairs (theory:
        (1 - θ/π)^6 ≈ 0.84, measured 0.818) and every LSH pair must be
        an exact pair (subset property — precision 1 by construction)."""
        from go_readability_spark.operators.ann_eval import (
            embedding_pair_recall,
            jittered_embeddings,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        with persist_scope(spark):
            row = embedding_pair_recall(
                jittered_embeddings(emb), 0.9, 6, 64
            ).collect()[0]
        assert row["n_exact"] == emb.count()  # exactly the planted pairs
        assert row["n_common"] == row["n_lsh"]  # subset property holds
        assert row["pair_recall"] >= 0.70

    def test_jitter_rejects_colliding_id_offset(self, spark):
        """Twin ids colliding with original ids would corrupt the
        planted ground truth SILENTLY (the DuckDB oracle shares the
        offset, so the hash check would pass on wrong numbers) — the
        builder must refuse instead."""
        import pytest

        from go_readability_spark.operators.ann_eval import (
            jittered_embeddings,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        with pytest.raises(ValueError, match="id_offset"):
            jittered_embeddings(emb, id_offset=10)

    def test_jitter_twins_are_near_duplicates(self, spark):
        from go_readability_spark.functions.vectors import (
            cosine_similarity_pandas,
        )
        from go_readability_spark.operators.ann_eval import (
            jittered_embeddings,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        j = jittered_embeddings(emb)
        pairs = (
            j.filter(F.col("vec_id") < 100000)
            .alias("a")
            .join(
                j.filter(F.col("vec_id") >= 100000).alias("b"),
                F.col("a.vec_id") + 100000 == F.col("b.vec_id"),
            )
            .select(
                cosine_similarity_pandas(
                    F.col("a.embedding"), F.col("b.embedding")
                ).alias("cos")
            )
        )
        stats = pairs.agg(
            F.min("cos").alias("lo"), F.avg("cos").alias("mean")
        ).collect()[0]
        assert stats["lo"] > 0.99 and stats["mean"] > 0.994


class TestBatchTopk:
    def test_batch_matches_single_query(self, spark):
        """The batched exact top-k must agree with the single-query
        brute-force operator for every panel member."""
        from go_readability_spark.operators.ann_eval import ann_topk_batch
        from go_readability_spark.operators.similarity import (
            ann_topk_bruteforce,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        got = {
            (r["qid"], r["rank"]): (r["vec_id"], r["cos"])
            for r in ann_topk_batch(emb, (5, 105), k=5).collect()
        }
        assert len(got) == 10
        for qid in (5, 105):
            single = ann_topk_bruteforce(emb, qid, 5).collect()
            for rank, r in enumerate(single, start=1):
                assert got[(qid, rank)] == (r["vec_id"], r["cos"])

    def test_batch_topk_uses_window_group_limit(self, spark):
        """The rank filter must be pushed into WindowGroupLimit —
        per-partition partial top-k BEFORE the shuffle, so the shuffle
        carries O(queries × k) rows per partition, not every scored
        pair (the batched analog of single-query TakeOrdered)."""
        from go_readability_spark.operators.ann_eval import ann_topk_batch

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        plan = (
            ann_topk_batch(emb, (5, 105), k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan


class TestTrainCodebook:
    def test_empty_cells_keep_previous_centroid(self, spark):
        """A centroid that captures no vectors must survive training
        unchanged. Seeds 2 and 3 are EXACT duplicates, so every vector
        ties to the smaller cid and cell 3 is empty after the first
        assignment — it must keep its seed value, not vanish or NaN."""
        from go_readability_spark.operators.ann_eval import train_codebook

        rows = [
            (0, [0.0, 0.0]), (1, [0.1, 0.0]),
            (2, [10.0, 10.0]), (3, [10.0, 10.0]),
            (4, [0.05, 0.0]), (5, [10.05, 10.0]),
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = dict(train_codebook(emb, n_centroids=4, iters=1))
        assert set(cents) == {0, 1, 2, 3}
        # cell 3 lost the tie for its own seed vector → kept verbatim
        assert cents[3] == [10.0, 10.0]
        # cell 2 absorbed vectors 2, 3, 5 — sequential-fold mean
        expected = ((0.0 + 10.0) + 10.0 + 10.05) / 3
        assert cents[2] == [expected, 10.0]
        assert all(len(v) == 2 for v in cents.values())

    def test_missing_query_id_raises_diagnostic(self, spark):
        """Both IVF probe entry points share seed_and_query, so a
        missing query id must produce the same diagnostic ValueError
        from each (not a bare StopIteration from one of two drifted
        copies)."""
        import pytest

        from go_readability_spark.operators.ann_eval import (
            ann_topk_ivf_trained,
        )
        from go_readability_spark.operators.similarity import ann_topk_ivf

        emb = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(8)],
            "vec_id long, embedding array<double>",
        )
        for fn in (ann_topk_ivf, ann_topk_ivf_trained):
            with pytest.raises(ValueError, match="not found"):
                fn(emb, 9999, n_centroids=4)

    def test_training_is_deterministic(self, spark):
        from go_readability_spark.operators.ann_eval import train_codebook

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        a = train_codebook(emb, 16, 2)
        b = train_codebook(emb, 16, 2)
        assert a == b


class TestClusteredRecall:
    """Round 5: the clustered corpus is where an index DEMONSTRATES
    value — recall must far exceed scan fraction (the isotropic corpus
    above caps recall ≈ scan fraction by construction, BENCH.md). All
    numbers deterministic (md5-generated corpus, fixed panel)."""

    @pytest.fixture(scope="class")
    def clustered_rows(self, spark):
        from go_readability_spark.operators.ann_eval import (
            ann_recall_table,
            clustered_embeddings,
        )
        from go_readability_spark.queries import (
            ANN_RECALL_CLUSTERED_QIDS,
            CLUSTER_K,
            CLUSTER_N,
            CLUSTER_SPREAD,
        )

        with persist_scope(spark):
            rows = ann_recall_table(
                clustered_embeddings(
                    spark, CLUSTER_N, CLUSTER_K, 64, CLUSTER_SPREAD
                ),
                ANN_RECALL_CLUSTERED_QIDS,
                k=10,
            ).collect()
        return {r["variant"]: r for r in rows}

    def test_index_value_recall_far_exceeds_scan(self, clustered_rows):
        """The round-4 verdict's 'done' bar: recall@10 >= 0.8 at <= 15%
        scan (measured: IVF np1 recall 1.0 at 6.2% scan)."""
        for fam in ("ivf_seed_np1", "ivf_trained_np1"):
            r = clustered_rows[fam]
            assert r["recall_at_k"] >= 0.8, r
            assert r["candidate_frac"] <= 0.15, r
            # value = recall/scan >= 5x (random candidates give ~frac)
            assert r["recall_at_k"] >= 5 * r["candidate_frac"], r

    def test_lsh_gradient_present(self, clustered_rows):
        """Partial cluster overlap (spread 0.3) leaves LSH a real
        single-vs-multiprobe trade (measured 0.68 vs 0.98) instead of
        a saturated all-1.0 table."""
        single = clustered_rows["lsh_single"]
        multi = clustered_rows["lsh_multi"]
        assert single["recall_at_k"] >= 0.5
        assert multi["recall_at_k"] >= single["recall_at_k"] + 0.1
        assert multi["recall_at_k"] >= 0.9

    def test_clustered_beats_isotropic_value(self, clustered_rows, recall_rows):
        """Same index arithmetic, structured vs structureless corpus:
        recall-per-scanned-fraction must be decisively higher on the
        clustered corpus (the whole point of the population)."""
        iso = recall_rows["ivf_trained_np1"]
        clu = clustered_rows["ivf_trained_np1"]
        iso_value = iso["recall_at_k"] / max(iso["candidate_frac"], 1e-9)
        clu_value = clu["recall_at_k"] / max(clu["candidate_frac"], 1e-9)
        assert clu_value >= 3 * iso_value, (iso_value, clu_value)
