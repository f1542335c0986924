"""End-to-end near-dup pipeline: banding candidates → pair-driven Jaccard
verification → connected-components keeper assignment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops import dedup, similarity


@pytest.fixture(scope="module")
def dup_corpus(spark):
    base = "spark engine builds partitioned posting segments with salted shuffle keys"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + " and adaptive query execution"),  # near dup of 1/2
        (4, "completely different text about embedding similarity search methods here"),
        (5, "another unrelated document mentioning streaming watermark semantics only"),
        (6, "completely different text about embedding similarity search methods here"),  # dup of 4
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pair_driven_jaccard_matches_full_scan_on_candidates(spark, dup_corpus):
    cand = dedup.minhash_band_pairs(dup_corpus)
    restricted = dedup.ngram_jaccard_pairs(dup_corpus, w=3, tau=0.2, candidates=cand)
    full = dedup.ngram_jaccard_pairs(dup_corpus, w=3, tau=0.2)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in restricted.collect()}
    want = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in full.collect()}
    cand_set = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    assert got == {p: j for p, j in want.items() if p in cand_set}
    # LSH recall on exact/near dups: the interesting pairs survived banding
    assert (1, 2) in got and (4, 6) in got


def test_components_keeper_assignment(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["keep_doc_id"] for r in dedup.dedup_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_components_chain_converges(spark):
    # a 12-node path graph needs several propagation rounds — exercises the
    # fixpoint detection, not just one hop
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["keep_doc_id"] for r in dedup.dedup_components(pairs).collect()}
    assert got == {i: 100 for i in range(100, 113)}


def test_components_reliable_checkpoint_identical(spark, tmp_path):
    """checkpoint_dir switches the rounds to RELIABLE checkpoints (survive
    executor loss — the 10^12-edge requirement): output identical to the
    localCheckpoint default, and the checkpoint data actually lands in the
    directory (lineage is cut there, not on executor block storage)."""
    import os

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)] + [(1, 2), (2, 3)],
        "doc_a long, doc_b long",
    )
    ckdir = str(tmp_path / "cc_ckpt")
    reliable = {
        r["doc_id"]: r["keep_doc_id"]
        for r in dedup.dedup_components(pairs, checkpoint_dir=ckdir).collect()
    }
    default = {
        r["doc_id"]: r["keep_doc_id"]
        for r in dedup.dedup_components(pairs).collect()
    }
    assert reliable == default
    assert reliable[111] == 100 and reliable[3] == 1
    written = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckdir) for f in fs
    ]
    assert written, "no reliable checkpoint files written"


def test_pipeline_end_to_end(spark, dup_corpus):
    out = {r["doc_id"]: r["keep_doc_id"] for r in
           dedup.dedup_pipeline(dup_corpus, w=3, tau=0.2).collect()}
    # docs 1/2/3 collapse to keeper 1; 4/6 to keeper 4; 5 has no dup → absent
    assert out[1] == 1 and out[2] == 1 and out[3] == 1
    assert out[4] == 4 and out[6] == 4
    assert 5 not in out


def test_bucket_cap_observability(spark, dup_corpus):
    stats = dedup.band_bucket_stats(dup_corpus, max_bucket=1)
    rows = stats.collect()
    assert all(r["n_docs"] >= 1 for r in rows)
    # the dup docs share band buckets → capping at 1 doc/bucket is visible
    assert any(r["capped"] for r in rows)
    assert not any(
        r["capped"] for r in dedup.band_bucket_stats(dup_corpus, max_bucket=10_000).collect()
    )


def test_bucket_cap_mirrored_in_sql_oracle(spark, dup_corpus, tmp_path):
    """With a tiny max_bucket the cap actually truncates — Spark and the
    DuckDB twin must truncate IDENTICALLY (smallest doc_ids per bucket)."""
    import duckdb

    pq = str(tmp_path / "docs.parquet")
    dup_corpus.write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    for cap in (2, 10_000):
        got = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.minhash_band_pairs(dup_corpus, max_bucket=cap).collect()
        }
        exp = {
            (a, b)
            for a, b in con.execute(
                dedup.minhash_band_pairs_sql("documents", max_bucket=cap)
            ).fetchall()
        }
        assert got == exp, cap
    # cap=2 must differ from uncapped on this corpus (3 near-dup docs share
    # buckets) — proves the cap is exercised, not vacuous
    capped = dedup.minhash_band_pairs(dup_corpus, max_bucket=2).count()
    full = dedup.minhash_band_pairs(dup_corpus, max_bucket=10_000).count()
    assert capped < full


def test_neardup_requires_candidates_or_optin(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.1])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="cross join"):
        similarity.cosine_neardup(df, tau=0.5)
    full = similarity.cosine_neardup(df, tau=0.5, allow_full_scan=True)
    lsh = similarity.cosine_neardup_lsh(df, tau=0.5, n_planes=4, dim=2)
    fp = {(r["vec_a"], r["vec_b"]): r["cos"] for r in full.collect()}
    lp = {(r["vec_a"], r["vec_b"]): r["cos"] for r in lsh.collect()}
    # LSH output is a subset of the exact pairs with identical cosines
    assert set(lp) <= set(fp)
    assert all(fp[p] == c for p, c in lp.items())
    # these two near-identical vectors share every hyperplane side → found
    assert (1, 2) in lp


def test_mmr_rerank_diversifies(spark):
    """MMR must demote a near-duplicate of an already-selected hit below
    a less relevant but novel one; λ=1 reduces to pure relevance order."""
    from searchengine_spark.ops.similarity import mmr_rerank

    embs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.04, 0.0]),   # near-dup of 1
            (3, [0.0, 1.0, 0.0]),      # novel
            (4, [0.0, 0.0, 1.0]),      # novel
        ],
        "vec_id long, embedding array<float>",
    )
    hits = [(1, 10.0), (2, 9.9), (3, 5.0), (4, 4.0)]
    out = mmr_rerank(hits, embs, lam=0.5, k=3)
    assert [d for d, _ in out] == [1, 3, 4]  # 2 demoted: too similar to 1
    pure = mmr_rerank(hits, embs, lam=1.0, k=4)
    assert [d for d, _ in pure] == [1, 2, 3, 4]


def test_reassign_keepers_picks_best_quality(spark):
    """Toy clusters: keeper becomes the max-score member (tie -> smallest
    id); membership is untouched; unscored docs rank last."""
    from searchengine_spark.ops.dedup import reassign_keepers

    assign = spark.createDataFrame(
        # cluster A = {1,2,3} keeper 1; cluster B = {10,11} keeper 10
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, keep_doc_id long",
    )
    scores = spark.createDataFrame(
        # cluster A: doc 3 best; cluster B: tie between 10 and 11 -> 10;
        # doc 2 unscored -> ranks last in A
        [(1, 0.5), (3, 0.9), (10, 0.7), (11, 0.7)],
        "doc_id long, score double",
    )
    got = {
        r["doc_id"]: r["keep_doc_id"]
        for r in reassign_keepers(assign, scores).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 10: 10, 11: 10}


def test_reassign_keepers_preserves_membership(spark, dup_corpus):
    """Real pipeline output: reassignment maps every doc of a cluster to
    the SAME new keeper, and the partition of docs into clusters is
    identical before and after."""
    from searchengine_spark.ops import textstats
    from searchengine_spark.ops.dedup import dedup_pipeline, reassign_keepers

    assign = dedup_pipeline(dup_corpus, w=3, tau=0.2)
    q = textstats.quality_score(dup_corpus).select(
        "doc_id", F.col("quality").alias("score")
    )
    before = {r["doc_id"]: r["keep_doc_id"] for r in assign.collect()}
    after = {
        r["doc_id"]: r["keep_doc_id"]
        for r in reassign_keepers(assign, q).collect()
    }
    assert set(before) == set(after)

    def clusters(m):
        inv = {}
        for d, kd in m.items():
            inv.setdefault(kd, set()).add(d)
        return {frozenset(v) for v in inv.values()}

    assert clusters(before) == clusters(after)
    # every new keeper belongs to its own cluster
    for d, kd in after.items():
        assert after[kd] == kd


def test_mmr_rerank_all_negative_scores(spark):
    """Divide-by-max normalization inverted the relevance order when every
    candidate score was negative; min-max normalization keeps it."""
    from searchengine_spark.ops.similarity import mmr_rerank

    embs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = mmr_rerank([(1, -0.1), (2, -0.9)], embs, lam=1.0, k=2)
    assert [d for d, _ in out] == [1, 2]  # most-relevant first
